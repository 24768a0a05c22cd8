"""Bit packing and fixed-shape sample compaction.

Two jobs:

1. `packbits_u32` / `bitfield_lookup`: the occupancy bitfield. The
   reference packs the density grid into a uint8 bitfield with one CUDA
   thread per byte (models/csrc/raymarching.cu:122-161). Here it's a
   vectorized reshape+shift into uint32 words (TPU-friendly word size).

2. `compact_samples` / `scatter_back`: the ragged->fixed-shape bridge.
   The reference compacts variable per-ray samples with atomicAdd slot
   assignment (raymarching.cu:237-241), producing nondeterministic ray
   order. On TPU we march into dense (R, S) buffers with a validity
   mask, then deterministically pack the valid samples to the front of a
   fixed-capacity (K,) batch with a cumsum -> scatter, run the (MXU-heavy)
   network on exactly K samples, and scatter results back to (R, S).

   Flattening is **sample-major** (index = s * R + r): if the batch
   overflows K, the *deepest* samples of all rays are dropped uniformly,
   rather than all samples of the last rays (ray-major would do that).
"""
from __future__ import annotations

from functools import partial

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


@partial(jax.jit, static_argnames=("capacity",))
def compact_samples(valid: jnp.ndarray, capacity: int):
    """Pack valid sample slots of an (R, S) grid to the front of a fixed
    (capacity,) list.

    Args:
      valid: (R, S) bool — which (ray, slot) cells hold a real sample.
      capacity: K, static output length.

    Returns:
      src: (K,) int32 flat indices into the sample-major flattening
           (s * R + r) of the (R, S) grid; entries >= R*S are padding.
      slot_valid: (K,) bool — src[i] is a real sample.
      n_valid: () int32 — total number of valid samples kept
               (min(#valid, K)).
    """
    R, S = valid.shape
    flat = valid.T.reshape(-1)                       # sample-major (S*R,)
    n_total = flat.shape[0]
    dest = jnp.cumsum(flat.astype(jnp.int32)) - 1    # target slot per sample
    n_valid_all = dest[-1] + 1
    # invalid samples and overflow both go to the dump slot `capacity`
    dest = jnp.where(flat & (dest < capacity), dest, capacity)
    src = jnp.full((capacity + 1,), n_total, dtype=jnp.int32)
    src = src.at[dest].set(jnp.arange(n_total, dtype=jnp.int32),
                           mode="drop", unique_indices=False)
    src = src[:capacity]
    n_valid = jnp.minimum(n_valid_all, capacity).astype(jnp.int32)
    slot_valid = jnp.arange(capacity, dtype=jnp.int32) < n_valid
    # all pad slots keep the sentinel n_total; keep src in-bounds for take
    return src, slot_valid, n_valid


def gather_samples(arr: jnp.ndarray, src: jnp.ndarray):
    """Gather per-sample rows of an (R, S, ...) array into the compact
    (K, ...) batch. Padding slots return zeros."""
    R, S = arr.shape[:2]
    tail = arr.shape[2:]
    flat = jnp.swapaxes(arr, 0, 1).reshape((R * S,) + tail)
    safe = jnp.minimum(src, R * S - 1)
    out = jnp.take(flat, safe, axis=0)
    pad = (src >= R * S)
    return jnp.where(pad.reshape((-1,) + (1,) * len(tail)),
                     jnp.zeros((), arr.dtype), out)


def scatter_back(values: jnp.ndarray, src: jnp.ndarray, R: int, S: int):
    """Scatter compact (K, ...) results back into an (R, S, ...) grid.
    Pad slots (src >= R*S) are dropped. Unwritten cells are zero."""
    tail = values.shape[1:]
    flat = jnp.zeros((R * S,) + tail, dtype=values.dtype)
    flat = flat.at[src].set(values, mode="drop", unique_indices=True)
    return jnp.swapaxes(flat.reshape((S, R) + tail), 0, 1)


def ray_ids_for(src: jnp.ndarray, R: int):
    """Ray index of each compact slot (sample-major flattening)."""
    return (src % R).astype(jnp.int32)
