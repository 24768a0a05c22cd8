"""Cascade (mip) geometry of the multi-level occupancy grid.

TPU-native port of the device helpers in models/csrc/raymarching.cu:11-32
(calc_dt / mip_from_pos / mip_from_dt) and the cell addressing used by the
marching kernels (raymarching.cu:211-219).

Cascade k covers the cube [-min(2^(k-1), scale), min(2^(k-1), scale)]^3 at
grid_size^3 resolution (networks.py:28-30). The reference addresses cells
by Morton code inside each cascade; on TPU we use plain row-major order
(x fastest) — Morton only exists for GPU cache locality and for converting
reference-format grids (see core/morton.py).
"""
from __future__ import annotations

import jax.numpy as jnp

SQRT3 = 1.7320508075688772


def n_cascades(scale: float) -> int:
    """max(1+ceil(log2(2*scale)), 1) — networks.py:29."""
    import numpy as np
    return max(1 + int(np.ceil(np.log2(2 * scale))), 1)


def calc_dt(t, exp_step_factor: float, max_samples: int, grid_size: int,
            scale: float):
    """Exponential step size, clamped (raymarching.cu:11-13)."""
    return jnp.clip(t * exp_step_factor,
                    SQRT3 / max_samples,
                    SQRT3 * 2 * scale / grid_size)


def mip_from_pos(x, cascades: int):
    """Cascade level from position: |x| in [2^(m-2), 2^(m-1)) -> m.

    Matches raymarching.cu:19-23 (frexp exponent + 1, clamped). x: (..., 3).
    """
    mx = jnp.max(jnp.abs(x), axis=-1)
    _, e = jnp.frexp(mx)
    return jnp.clip(e + 1, 0, cascades - 1)


def mip_from_dt(dt, grid_size: int, cascades: int):
    """Cascade level such that the step spans <= one cell
    (raymarching.cu:29-32): dt*grid_size in [2^(m-1), 2^m) -> m."""
    _, e = jnp.frexp(dt * grid_size)
    return jnp.clip(e, 0, cascades - 1)


def mip_bound(mip, scale: float):
    """Half-extent of cascade `mip`'s cube: min(2^(mip-1), scale)."""
    return jnp.minimum(jnp.exp2(mip.astype(jnp.float32) - 1.0),
                       jnp.float32(scale))


def cell_coord(x, mip, grid_size: int, scale: float):
    """Integer cell coordinate of position x at cascade `mip`.

    Matches raymarching.cu:215-217: floor(0.5*(x/bound+1)*gs) clamped to
    [0, gs-1]. Returns (coords int32 (..., 3), bound (...,)).
    """
    bound = mip_bound(mip, scale)
    f = 0.5 * (x / bound[..., None] + 1.0) * grid_size
    n = jnp.clip(f, 0.0, grid_size - 1.0).astype(jnp.int32)
    return n, bound


def cell_index(coord, mip, grid_size: int):
    """Flat row-major cell id: mip*gs^3 + (z*gs + y)*gs + x.

    (The reference uses mip*gs^3 + morton3D(x,y,z), raymarching.cu:219;
    our grid arrays are laid out row-major instead.)
    """
    gs = grid_size
    return ((mip * gs + coord[..., 2]) * gs + coord[..., 1]) * gs \
        + coord[..., 0]


def cell_exit_t(x, t, coord, bound, rays_d, inv_d, grid_size: int):
    """March distance to the exit face of the current cell.

    Matches the skip computation in raymarching.cu:225-229: the next cell
    boundary along each axis in the marching direction, min over axes,
    clamped >= 0, *relative* target added to t.
    """
    sgn = jnp.where(rays_d >= 0, 0.5, -0.5)
    face = ((coord.astype(jnp.float32) + 0.5 + sgn) / grid_size * 2.0 - 1.0) \
        * bound[..., None]
    t_side = (face - x) * inv_d
    return t + jnp.maximum(jnp.min(t_side, axis=-1), 0.0)
