"""Bit packing and fixed-shape sample compaction.

Two jobs:

1. `packbits_u32` / `bitfield_lookup`: the occupancy bitfield. The
   reference packs the density grid into a uint8 bitfield with one CUDA
   thread per byte (models/csrc/raymarching.cu:122-161). Here it's a
   vectorized reshape+shift into uint32 words (TPU-friendly word size).

2. The ragged->fixed-shape bridge. The reference compacts variable
   per-ray samples with atomicAdd slot assignment
   (raymarching.cu:237-241), producing nondeterministic ray order. On
   TPU we march into dense (R, S) buffers with a validity mask, then
   deterministically pack the valid samples to the front of a fixed
   (K,) batch.

   TPU-critical design (PERF_NOTES.md): element-wise scatters run at
   ~11M idx/s on TPU — pathological. Every mapping here is a bijection
   between valid (ray, slot) cells and compact slots, so BOTH transfer
   directions (and both backward passes, via custom_vjp) are expressed
   as gathers: the forward map comes from a cumulative count +
   vectorized searchsorted, the inverse map is the cumsum itself. No
   scatter appears anywhere in the compaction, forward or backward.

   Flattening is **sample-major** (index = s * R + r): if the batch
   overflows K, the *deepest* samples of all rays are dropped uniformly,
   rather than all samples of the last rays (ray-major would do that).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def packbits_u32(density_grid: jnp.ndarray, threshold) -> jnp.ndarray:
    """(M,) float density -> (M//32,) uint32 bitfield, bit i of word w
    corresponds to cell w*32+i (little-endian bit order, matching the
    uint8 convention of packbits_kernel scaled up to words)."""
    occ = (density_grid.reshape(-1, 32) > threshold).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :]
    return jnp.sum(occ << shifts, axis=1, dtype=jnp.uint32)


def bitfield_lookup(bitfield: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather occupancy bits. bitfield: (W,) uint32; idx: any-shape int32
    cell index. Returns bool of idx's shape."""
    word = jnp.take(bitfield, idx >> 5, axis=0)
    bit = (word >> (idx.astype(jnp.uint32) & jnp.uint32(31))) & jnp.uint32(1)
    return bit.astype(jnp.bool_)


class CompactPlan(NamedTuple):
    """Bijective index maps between valid (R, S) cells and (K,) slots.

    Shapes carry the static dims: src is (K,), slot_grid is (R, S)."""
    src: jnp.ndarray         # (K,) sample-major flat index per slot
    slot_valid: jnp.ndarray  # (K,) slot holds a real sample
    slot_grid: jnp.ndarray   # (R, S) compact slot per cell (valid cells)
    cell_valid: jnp.ndarray  # (R, S) cell is valid AND kept (slot < K)
    n_valid: jnp.ndarray     # () kept sample count


@partial(jax.jit, static_argnames=("capacity",))
def compact_samples(valid: jnp.ndarray, capacity: int) -> CompactPlan:
    """Plan the pack of valid (R, S) cells into a fixed (K,) batch.

    Gather-only: slots are assigned by an exclusive count (cumsum) and
    the forward map src[i] = index of the i-th valid sample comes from a
    vectorized searchsorted on the inclusive count.
    """
    R, S = valid.shape
    K = capacity
    flat = valid.T.reshape(-1)                        # sample-major (S*R,)
    inc = jnp.cumsum(flat.astype(jnp.int32))          # inclusive count
    n_valid_all = inc[-1]

    # forward map: one small scatter of the slot assignments (measured
    # 3x faster than a flat searchsorted at this size); this is the ONLY
    # scatter in the compaction and it moves indices, not data
    dest = jnp.where(flat & (inc - 1 < K), inc - 1, K)
    src = jnp.full((K + 1,), S * R, dtype=jnp.int32)
    src = src.at[dest].set(jnp.arange(S * R, dtype=jnp.int32),
                           mode="drop")[:K]
    n_valid = jnp.minimum(n_valid_all, K)
    slot_valid = jnp.arange(K, dtype=jnp.int32) < n_valid

    # inverse map: slot of each cell (only meaningful where valid)
    slot_flat = inc - 1
    slot_grid = jnp.swapaxes(slot_flat.reshape(S, R), 0, 1)
    cell_valid = valid & (slot_grid < K)
    return CompactPlan(src, slot_valid, slot_grid, cell_valid, n_valid)


def _gather_fwd(arr, plan: CompactPlan):
    R, S = plan.slot_grid.shape
    tail = arr.shape[2:]
    flat = jnp.swapaxes(arr, 0, 1).reshape((R * S,) + tail)
    safe = jnp.minimum(plan.src, R * S - 1)
    out = jnp.take(flat, safe, axis=0)
    pad = ~plan.slot_valid
    return jnp.where(pad.reshape((-1,) + (1,) * len(tail)),
                     jnp.zeros((), arr.dtype), out)


def _scatter_fwd(values, plan: CompactPlan):
    tail = values.shape[1:]
    R, S = plan.slot_grid.shape
    K = values.shape[0]
    safe_slot = jnp.minimum(plan.slot_grid, K - 1)
    out = jnp.take(values, safe_slot.reshape(-1), axis=0
                   ).reshape((R, S) + tail)
    mask = plan.cell_valid.reshape((R, S) + (1,) * len(tail))
    return jnp.where(mask, out, jnp.zeros((), values.dtype))


@jax.custom_vjp
def gather_samples(arr: jnp.ndarray, plan: CompactPlan):
    """(R, S, ...) -> compact (K, ...); padding slots are zeros.

    Backward is the inverse gather (scatter-free, deterministic)."""
    return _gather_fwd(arr, plan)


def _gather_vjp_fwd(arr, plan):
    return _gather_fwd(arr, plan), plan


def _gather_vjp_bwd(plan, g):
    return (_scatter_fwd(g, plan), None)


gather_samples.defvjp(_gather_vjp_fwd, _gather_vjp_bwd)


@jax.custom_vjp
def scatter_back(values: jnp.ndarray, plan: CompactPlan):
    """Compact (K, ...) -> (R, S, ...); unmapped cells are zeros.

    Implemented as a gather through the inverse map; backward is the
    forward gather."""
    return _scatter_fwd(values, plan)


def _scatter_vjp_fwd(values, plan):
    return _scatter_fwd(values, plan), plan


def _scatter_vjp_bwd(plan, g):
    return (_gather_fwd(g, plan), None)


scatter_back.defvjp(_scatter_vjp_fwd, _scatter_vjp_bwd)


def ray_ids_for(plan: CompactPlan):
    """Ray index of each compact slot (sample-major flattening)."""
    R, S = plan.slot_grid.shape
    return (jnp.minimum(plan.src, R * S - 1) % R).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Channel-major variants: (C, K) <-> (C, R, S).
#
# TPU pads the minor (lane) dimension of every HBM array to 128, so a
# trailing channel axis of 3 (rgb/normals) or 7 (semantics) inflates
# memory and bandwidth 18-42x — measured 60+ ms of the train step was
# spent streaming that padding. Keeping channels on the LEADING axis
# makes K / S the lane dimension: fully dense.
# ---------------------------------------------------------------------------

def _gather_fwd_cm(arr, plan: CompactPlan):
    C = arr.shape[0]
    R, S = plan.slot_grid.shape
    flat = jnp.swapaxes(arr, 1, 2).reshape(C, R * S)   # sample-major
    safe = jnp.minimum(plan.src, R * S - 1)
    out = jnp.take(flat, safe, axis=1)
    return jnp.where(plan.slot_valid[None], out, jnp.zeros((), arr.dtype))


def _scatter_fwd_cm(values, plan: CompactPlan):
    R, S = plan.slot_grid.shape
    C, K = values.shape
    safe_slot = jnp.minimum(plan.slot_grid, K - 1)
    out = jnp.take(values, safe_slot.reshape(-1), axis=1).reshape(C, R, S)
    return jnp.where(plan.cell_valid[None], out,
                     jnp.zeros((), values.dtype))


@jax.custom_vjp
def gather_samples_cm(arr: jnp.ndarray, plan: CompactPlan):
    """(C, R, S) -> compact (C, K); padding slots are zeros."""
    return _gather_fwd_cm(arr, plan)


gather_samples_cm.defvjp(
    lambda arr, plan: (_gather_fwd_cm(arr, plan), plan),
    lambda plan, g: (_scatter_fwd_cm(g, plan), None))


@jax.custom_vjp
def scatter_back_cm(values: jnp.ndarray, plan: CompactPlan):
    """Compact (C, K) -> (C, R, S); unmapped cells are zeros."""
    return _scatter_fwd_cm(values, plan)


scatter_back_cm.defvjp(
    lambda values, plan: (_scatter_fwd_cm(values, plan), plan),
    lambda plan, g: (_gather_fwd_cm(g, plan), None))
