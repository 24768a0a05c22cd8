"""3D Morton (Z-order) encode/decode (replaces vren.morton3D[_invert]).

Bit-interleave via the shift-mask expansion; vectorized jnp int32 ops
instead of one CUDA thread per coordinate (models/csrc/raymarching.cu:34-60).

Note: the TPU occupancy grid stores cells in plain row-major order (Morton
order only helps GPU cache locality); these utilities exist for parity,
tests, and for importing/exporting reference-format grids.
"""
from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v):
    """Spread the low 10 bits of v so there are 2 zero bits between each.

    Same bit trick as raymarching.cu:35-42, written with shifts (the
    multiply form relies on uint32 wraparound; shifts are equivalent and
    well-defined in int32).
    """
    v = v.astype(jnp.uint32)
    v = (v | (v << 16)) & jnp.uint32(0xFF0000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0F00F00F)
    v = (v | (v << 4)) & jnp.uint32(0xC30C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords):
    """(N, 3) int coords (< 1024) -> (N,) morton codes (int32)."""
    coords = jnp.asarray(coords)
    x = _expand_bits(coords[..., 0])
    y = _expand_bits(coords[..., 1])
    z = _expand_bits(coords[..., 2])
    return (x | (y << 1) | (z << 2)).astype(jnp.int32)


def _compact_bits(x):
    """Inverse of _expand_bits (raymarching.cu:52-60)."""
    x = x.astype(jnp.uint32) & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(codes):
    """(N,) morton codes -> (N, 3) int32 coords."""
    codes = jnp.asarray(codes)
    return jnp.stack([
        _compact_bits(codes),
        _compact_bits(codes >> 1),
        _compact_bits(codes >> 2),
    ], axis=-1).astype(jnp.int32)
