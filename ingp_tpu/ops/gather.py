"""Mixed-precision table gather with f32 master-weight backward.

Hash/brick-table gathers are the throughput bound of the whole framework
(PERF_NOTES.md), so tables are *read* in bfloat16 to halve the random-row
HBM traffic. Storing the parameters themselves in bf16, however, breaks
optimization two ways:

  1. Adam updates smaller than ~0.4% of a weight's magnitude round to
     zero in bf16 (7 mantissa bits), stalling late training.
  2. The backward scatter-add accumulates thousands of per-sample
     cotangents into the same coarse-level row; bf16 accumulation loses
     whatever the largest addend doesn't cover.

The TPU-native fix is the classic master-weight split: parameters (and
Adam moments) stay float32, and the gather reads a bf16 *storage cast*
made once per step. `_gather`'s custom VJP routes the backward
scatter-add directly into the f32 master layout, so both problems vanish
while the forward keeps bf16 gather bandwidth. (The reference keeps
fp32 torch parameters in front of tinycudann's half-precision tables —
networks.py:40-76 — this is the same scheme expressed functionally.)
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _take_ib(src, rows, axis):
    """take() promising in-bounds indices: every row id here is a
    hash `& mask` or an in-range dense coordinate plus a level offset
    (ops/brickgrid.brick_coords, ops/hashgrid), so XLA's OOB fill
    select / index clamp (measured as a full extra pass over the
    gathered block) is dead weight."""
    if axis == 0:
        return src.at[rows].get(mode="promise_in_bounds")
    if axis == 1:
        return src.at[:, rows].get(mode="promise_in_bounds")
    raise NotImplementedError(f"axis={axis}")


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gather(master, storage, rows, axis, keep_storage_dtype):
    del master  # forward reads the low-precision copy only
    out = _take_ib(storage, rows, axis)
    return out if keep_storage_dtype else out.astype(jnp.float32)


def _gather_fwd(master, storage, rows, axis, keep_storage_dtype):
    out = _gather(master, storage, rows, axis, keep_storage_dtype)
    # master/storage are stored only for shape/dtype — they are live
    # parameter buffers, so these residuals cost no extra memory
    return out, (rows, master, storage)


def _gather_bwd(axis, keep_storage_dtype, res, ct):
    rows, master, storage = res
    g = jnp.zeros(master.shape, master.dtype)
    ct = ct.astype(master.dtype)
    if axis == 0:
        g = g.at[rows].add(ct, mode="promise_in_bounds")
    elif axis == 1:
        g = g.at[:, rows].add(ct, mode="promise_in_bounds")
    else:
        raise NotImplementedError(f"axis={axis}")
    # storage came through stop_gradient: its zero cotangent is DCE'd
    return (g, jnp.zeros(storage.shape, storage.dtype),
            np.zeros(np.shape(rows), jax.dtypes.float0))


_gather.defvjp(_gather_fwd, _gather_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_multi(master, storage, rows_tuple, keep_flags):
    del master
    outs = []
    for rows, keep in zip(rows_tuple, keep_flags):
        out = _take_ib(storage, rows, 0)
        # the f32 convert fuses into the gather's output write; an
        # astype on the result would materialize an extra full pass
        outs.append(out if keep else out.astype(jnp.float32))
    return tuple(outs)


def _gather_multi_fwd(master, storage, rows_tuple, keep_flags):
    outs = _gather_multi(master, storage, rows_tuple, keep_flags)
    return outs, (rows_tuple, master, storage)


def _gather_multi_bwd(keep_flags, res, cts):
    rows_tuple, master, storage = res
    # ONE accumulator, chained in-place scatter-adds: k separate
    # gathers differentiated by AD would each materialize a zeros
    # table + scatter, then add_any-combine k full tables (measured
    # ~16 ms/step of pure full-table passes at the bench op-point);
    # the chain is k scatters into a single zeros buffer.
    g = jnp.zeros(master.shape, master.dtype)
    for rows, ct in zip(rows_tuple, cts):
        g = g.at[rows].add(ct.astype(master.dtype),
                           mode="promise_in_bounds")
    return (g, jnp.zeros(storage.shape, storage.dtype),
            tuple(np.zeros(np.shape(r), jax.dtypes.float0)
                  for r in rows_tuple))


_gather_multi.defvjp(_gather_multi_fwd, _gather_multi_bwd)


def table_gather_multi(table, rows_list, storage=None,
                       keep_storage_dtype=False):
    """Gather several index vectors from ONE table with a fused
    backward: a single zeros accumulator receives every cotangent via
    chained in-place scatter-adds (axis 0 only).

    Returns a tuple of gathered blocks, one per rows_list entry, each
    at f32 (or the storage dtype where keep_storage_dtype — a bool or
    a per-entry sequence of bools)."""
    st = storage if storage is not None \
        else jax.lax.stop_gradient(table)
    if isinstance(keep_storage_dtype, bool):
        keep_storage_dtype = [keep_storage_dtype] * len(rows_list)
    keeps = tuple(bool(k) and st.dtype != jnp.float32
                  for k in keep_storage_dtype)
    return _gather_multi(table, st, tuple(rows_list), keeps)


def storage_cast(table, storage_dtype=None):
    """Low-precision read copy of a master table, or None if the table
    is already stored at (or below) the requested precision."""
    if storage_dtype is None:
        return None
    sd = jnp.dtype(storage_dtype)
    if sd == table.dtype:
        return None
    return jax.lax.stop_gradient(table).astype(sd)


def table_gather(table, rows, axis=0, storage=None,
                 keep_storage_dtype=False):
    """take(table, rows, axis) in f32, reading `storage` when given.

    keep_storage_dtype=True returns rows at the storage precision
    (e.g. bf16) instead of f32 — for consumers that run their math in
    that precision anyway, it halves the gathered block's HBM footprint
    and removes a full convert pass. Backward is unchanged: the
    cotangent scatter-adds into the f32 master layout either way.

    Callers that loop over chunks should build `storage` ONCE with
    storage_cast() outside the loop — casting a multi-hundred-MB table
    per chunk would swamp the gather it accelerates.
    """
    if storage is None:
        out = _take_ib(table, rows, axis)
        return out if keep_storage_dtype else out.astype(jnp.float32)
    return _gather(table, storage, rows, axis, keep_storage_dtype)
