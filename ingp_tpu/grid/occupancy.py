"""Occupancy-grid lifecycle: visibility marking, periodic density refresh,
bit packing.

TPU-native port of the grid maintenance in models/networks.py:293-408
(get_all_cells / sample_uniform_and_occupied_cells / mark_invisible_cells /
update_density_grid) plus vren.packbits. Differences from the reference:

  - cells are addressed row-major (x fastest) instead of Morton order;
    the bitfield is uint32 words (ops/pack.packbits_u32), consumed by
    ops/march.march_rays through the same layout.
  - "sample M random occupied cells" (networks.py:324-328) uses inverse-CDF
    sampling (searchsorted on the occupancy cumsum) instead of
    torch.nonzero + randint — static shapes, jit-safe.
  - everything runs under jit; the EMA/max update uses scatter-max, so
    duplicate sampled cells are deterministic (the reference's last-write
    -wins is nondeterministic on GPU).

Grid state pytree:
  density_grid: (C, G3) float32; -1 marks camera-invisible cells
  count_grid:   (C, G3) float32 visibility counts (for erode)
  bitfield:     (C*G3/32,) uint32 occupancy bits
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.pack import packbits_u32
from ..ops.march import build_block_table

NEAR_DISTANCE = 0.01  # models/rendering.py:10


def _g3(grid_size):
    return grid_size ** 3


def all_cell_coords(grid_size: int):
    """(G3, 3) int32 cell coords matching the row-major flat index
    (z*gs + y)*gs + x used by core/cascade.cell_index."""
    idx = jnp.arange(_g3(grid_size), dtype=jnp.int32)
    x = idx % grid_size
    y = (idx // grid_size) % grid_size
    z = idx // (grid_size * grid_size)
    return jnp.stack([x, y, z], axis=-1)


def grid_init(cascades: int, grid_size: int):
    g3 = _g3(grid_size)
    return {
        "density_grid": jnp.zeros((cascades, g3), jnp.float32),
        "count_grid": jnp.zeros((cascades, g3), jnp.float32),
        "bitfield": jnp.zeros((cascades * g3 // 32,), jnp.uint32),
        # neighborhood rows for the block marcher (ops/march.py); zeros
        # are consistent with an all-empty bitfield
        "block_table": jnp.zeros(
            (cascades, (grid_size // 4) ** 3, 128), jnp.uint32),
    }


def _cascade_world_coords(coords, c: int, grid_size: int, scale: float):
    """Cell-center world positions for cascade c (networks.py:355-358)."""
    s = min(2.0 ** (c - 1), scale)
    half = s / grid_size
    unit = coords.astype(jnp.float32) / (grid_size - 1) * 2.0 - 1.0
    return unit * (s - half), half


@partial(jax.jit, static_argnames=("grid_size", "cascades", "scale",
                                   "img_w", "img_h"))
def mark_invisible_cells(grid, K, poses, img_w: int, img_h: int,
                         grid_size: int, cascades: int, scale: float):
    """Mark camera-invisible cells with density -1; fill count_grid.

    Vectorized projection of every cell center into every camera
    (networks.py:335-376). K: (3,3); poses: (N, 3, 4) c2w.
    """
    N_cams = poses.shape[0]
    hi = jax.lax.Precision.HIGHEST
    w2c_R = jnp.swapaxes(poses[:, :3, :3], 1, 2)            # (N, 3, 3)
    w2c_T = -jnp.einsum("nij,nj->ni", w2c_R, poses[:, :3, 3],
                        precision=hi)                        # (N, 3)
    coords = all_cell_coords(grid_size)

    density = []
    counts = []
    for c in range(cascades):
        xyzs_w, _ = _cascade_world_coords(coords, c, grid_size, scale)
        # (N_cams, G3, 3) camera coords -> pixel coords
        xyzs_c = jnp.einsum("nij,gj->ngi", w2c_R, xyzs_w, precision=hi) \
            + w2c_T[:, None, :]
        uvd = jnp.einsum("ij,ngj->ngi", K, xyzs_c, precision=hi)
        depth = uvd[..., 2]
        uv = uvd[..., :2] / jnp.where(depth[..., None] == 0, 1e-9,
                                      depth[..., None])
        in_image = ((depth >= 0)
                    & (uv[..., 0] >= 0) & (uv[..., 0] < img_w)
                    & (uv[..., 1] >= 0) & (uv[..., 1] < img_h))
        covered = (depth >= NEAR_DISTANCE) & in_image        # (N, G3)
        count = jnp.sum(covered, axis=0) / N_cams
        too_near_any = jnp.any((depth < NEAR_DISTANCE) & in_image, axis=0)
        valid = (count > 0) & (~too_near_any)
        density.append(jnp.where(valid, 0.0, -1.0))
        counts.append(count)

    return {
        "density_grid": jnp.stack(density),
        "count_grid": jnp.stack(counts),
        "bitfield": grid["bitfield"],
        "block_table": grid["block_table"],
    }


def _eval_density_chunked(density_fn, params, xyz, chunk: int = 65536):
    """Evaluate density over a big cell batch in fixed-size chunks with
    lax.map, bounding the encoder's intermediate memory (the reference
    chunks its cell sweep the same way, networks.py:336, 354). A 128^3
    warmup sweep through a 16-level F=8 encoder would otherwise
    materialize ~10^2 GB of gather intermediates."""
    n = xyz.shape[0]
    if n <= chunk:
        return density_fn(params, xyz)
    pad = (-n) % chunk
    x = jnp.pad(xyz, ((0, pad), (0, 0)))
    out = jax.lax.map(lambda c: density_fn(params, c),
                      x.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]


def _sample_occupied(key, mask, M: int):
    """Inverse-CDF draw of M cell ids from the occupied set (jit-safe
    replacement for networks.py:324-329). mask: (G3,) bool."""
    cdf = jnp.cumsum(mask.astype(jnp.int32))
    n_occ = cdf[-1]
    u = jax.random.uniform(key, (M,)) * jnp.maximum(n_occ, 1)
    idx = jnp.searchsorted(cdf, u.astype(jnp.int32), side="right")
    return jnp.clip(idx, 0, mask.shape[0] - 1), n_occ


@partial(jax.jit,
         static_argnames=("density_fn", "grid_size", "cascades", "scale",
                          "warmup", "erode"))
def update_density_grid(density_fn, params, grid, key, density_threshold,
                        grid_size: int, cascades: int, scale: float,
                        warmup: bool, decay: float = 0.95,
                        erode: bool = False):
    """One periodic grid refresh (networks.py:378-408).

    density_fn(params, x) -> (N,) sigma at world coords. warmup sweeps all
    cells; otherwise G3/4 uniform + G3/4 occupied cells per cascade.
    Returns the new grid state.
    """
    g3 = _g3(grid_size)
    coords_all = all_cell_coords(grid_size)
    dg = grid["density_grid"]
    # unsampled cells see tmp=0, i.e. pure decay (networks.py:380, 400-403)
    tmp = jnp.zeros_like(dg)

    for c in range(cascades):
        key, k_cells, k_occ, k_jit = jax.random.split(key, 4)
        if warmup:
            idx = jnp.arange(g3, dtype=jnp.int32)
            coords = coords_all
        else:
            M = g3 // 4
            idx_u = jax.random.randint(k_cells, (M,), 0, g3,
                                       dtype=jnp.int32)
            occ_mask = dg[c] > density_threshold
            idx_o, n_occ = _sample_occupied(k_occ, occ_mask, M)
            # reference keeps the occupied half empty when nothing is
            # occupied yet (networks.py:325-328)
            idx_o = jnp.where(n_occ > 0, idx_o, idx_u)
            idx = jnp.concatenate([idx_u, idx_o])
            coords = coords_all[idx]

        xyzs_w, half = _cascade_world_coords(coords, c, grid_size, scale)
        jitter = jax.random.uniform(k_jit, xyzs_w.shape, minval=-1.0,
                                    maxval=1.0) * half
        sigmas = _eval_density_chunked(density_fn, params,
                                       xyzs_w + jitter)
        if warmup:
            # idx is the identity sweep: the scatter-max degenerates to
            # an elementwise max (the 2M-index scatter alone cost ~4 min
            # of XLA compile time)
            tmp = tmp.at[c].set(jnp.maximum(tmp[c], sigmas))
        else:
            tmp = tmp.at[c].max(jnp.zeros((g3,)).at[idx].max(sigmas))

    if erode:
        # decay more the cells seen by few cameras (networks.py:397-399)
        decay_v = jnp.clip(
            decay ** (1.0 / jnp.maximum(grid["count_grid"], 1e-6)),
            0.1, 0.95)
    else:
        decay_v = decay

    new_dg = jnp.where(dg < 0, dg, jnp.maximum(dg * decay_v, tmp))

    pos = new_dg > 0
    mean_density = jnp.sum(jnp.where(pos, new_dg, 0.0)) \
        / jnp.maximum(jnp.sum(pos), 1)
    threshold = jnp.minimum(mean_density, density_threshold)
    bitfield = packbits_u32(new_dg.reshape(-1), threshold)

    return {
        "density_grid": new_dg,
        "count_grid": grid["count_grid"],
        "bitfield": bitfield,
        "block_table": build_block_table(bitfield, grid_size, cascades),
    }
