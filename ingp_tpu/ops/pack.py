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

   KEPT SET vs ORDER: when the batch overflows K, the kept samples are
   chosen in **sample-major** order (index = s * R + r) — the *deepest*
   samples of all rays are dropped uniformly, rather than all samples
   of the last rays. The kept samples are then PACKED in **ray-major**
   order (index = r * S + s): each ray's samples sit contiguously and
   t-ordered in the compact batch, which is what lets the stream-dedup
   encoder (ops/streambrick.py) share brick-row fetches between
   consecutive samples. The order is free — every consumer maps through
   the plan's index arrays.
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
    src: jnp.ndarray         # (K,) ray-major flat index per slot
    slot_valid: jnp.ndarray  # (K,) slot holds a real sample
    slot_grid: jnp.ndarray   # (R, S) compact slot per cell (valid cells)
    cell_valid: jnp.ndarray  # (R, S) cell is valid AND kept (slot < K)
    n_valid: jnp.ndarray     # () kept sample count


@partial(jax.jit, static_argnames=("capacity",))
def compact_samples(valid: jnp.ndarray, capacity: int) -> CompactPlan:
    """Plan the pack of valid (R, S) cells into a fixed (K,) batch.

    Kept set: the first K valid cells in sample-major order (deepest
    samples dropped uniformly on overflow). Slot order: ray-major, so
    the compact batch is ray-contiguous (see module docstring).

    Gather-only: slots are assigned by cumulative counts; the only
    scatter moves indices, not data.
    """
    R, S = valid.shape
    K = capacity
    flat_sm = valid.T.reshape(-1)                     # sample-major (S*R,)
    inc_sm = jnp.cumsum(flat_sm.astype(jnp.int32))
    n_valid_all = inc_sm[-1]
    kept_sm = flat_sm & (inc_sm - 1 < K)
    kept = jnp.swapaxes(kept_sm.reshape(S, R), 0, 1)  # (R, S)

    flat = kept.reshape(-1)                           # ray-major (R*S,)
    inc = jnp.cumsum(flat.astype(jnp.int32))
    dest = jnp.where(flat, inc - 1, K)
    src = jnp.full((K + 1,), S * R, dtype=jnp.int32)
    src = src.at[dest].set(jnp.arange(S * R, dtype=jnp.int32),
                           mode="drop")[:K]
    n_valid = jnp.minimum(n_valid_all, K)
    slot_valid = jnp.arange(K, dtype=jnp.int32) < n_valid

    # inverse map: slot of each cell (only meaningful where kept)
    slot_grid = (inc - 1).reshape(R, S)
    return CompactPlan(src, slot_valid, slot_grid, kept, n_valid)


def _gather_fwd(arr, plan: CompactPlan):
    R, S = plan.slot_grid.shape
    tail = arr.shape[2:]
    flat = arr.reshape((R * S,) + tail)               # ray-major
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
    """Ray index of each compact slot (ray-major flattening)."""
    R, S = plan.slot_grid.shape
    return (jnp.minimum(plan.src, R * S - 1) // S).astype(jnp.int32)


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
    flat = arr.reshape(C, R * S)                       # ray-major
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
