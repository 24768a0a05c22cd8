"""Block marcher (ops/march.march_rays_block) vs the lattice marcher.

The block march must agree EXACTLY with the per-point lattice march for
constant-dt lattices (exp_step_factor=0), and be conservative (a
superset of kept lattice points, same t values) otherwise.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ingp_tpu.ops.march import (MarchConfig, march_rays_lattice,
                                march_rays_block, build_block_table)
from ingp_tpu.ops.pack import packbits_u32
from ingp_tpu.core.intersect import ray_aabb_intersect


def _random_scene(key, cascades=1, grid_size=64, p=0.05):
    g3 = grid_size ** 3
    dens = jax.random.uniform(key, (cascades * g3,))
    bitfield = packbits_u32(dens, 1.0 - p)
    return bitfield


def _rays(key, R, scale):
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (R, 3), minval=-2 * scale,
                           maxval=2 * scale)
    d = jax.random.normal(k2, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hits = ray_aabb_intersect(o, d, jnp.zeros(3), jnp.full((3,), scale))
    return o, d, hits


@pytest.mark.parametrize("grid_size", [32, 64])
def test_block_matches_lattice_constant_dt(grid_size):
    cfg = MarchConfig(grid_size=grid_size, cascades=1, scale=0.5,
                      exp_step_factor=0.0, max_samples=256, capacity=64,
                      iters=256)
    key = jax.random.PRNGKey(0)
    bf = _random_scene(key, grid_size=grid_size)
    tb = build_block_table(bf, grid_size, 1)
    o, d, hits = _rays(jax.random.PRNGKey(1), 256, cfg.scale)
    noise = jax.random.uniform(jax.random.PRNGKey(2), (256,))

    lat = march_rays_lattice(cfg, bf, o, d, hits, noise)
    blk = march_rays_block(cfg, tb, o, d, hits, noise)

    np.testing.assert_array_equal(np.asarray(lat["valid"]),
                                  np.asarray(blk["valid"]))
    np.testing.assert_allclose(np.asarray(lat["ts"]),
                               np.asarray(blk["ts"]), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(lat["deltas"]),
                               np.asarray(blk["deltas"]))
    assert int(lat["total_samples"]) == int(blk["total_samples"])


def test_block_conservative_exp_stepping():
    """Exp-stepped marches (short runs): every lattice-kept point must
    appear in the block march at the same t (it may keep extras)."""
    cfg = MarchConfig(grid_size=32, cascades=2, scale=2.0,
                      exp_step_factor=1 / 256, max_samples=256,
                      capacity=96, iters=256)
    key = jax.random.PRNGKey(3)
    bf = _random_scene(key, cascades=2, grid_size=32, p=0.05)
    tb = build_block_table(bf, 32, 2)
    o, d, hits = _rays(jax.random.PRNGKey(4), 128, cfg.scale)
    noise = jnp.zeros(128)

    lat = march_rays_lattice(cfg, bf, o, d, hits, noise)
    blk = march_rays_block(cfg, tb, o, d, hits, noise)

    lat_ts = np.asarray(lat["ts"])
    lat_valid = np.asarray(lat["valid"])
    blk_ts = np.asarray(blk["ts"])
    blk_valid = np.asarray(blk["valid"])
    blk_n = blk_valid.sum(1)
    for r in range(lat_ts.shape[0]):
        kept = set(np.round(lat_ts[r][lat_valid[r]], 6).tolist())
        got = set(np.round(blk_ts[r][blk_valid[r]], 6).tolist())
        # rays whose block capacity overflowed may drop the tail
        if blk_n[r] < cfg.capacity:
            missing = kept - got
            assert not missing, (r, sorted(missing)[:4])


def test_block_table_rebuild_roundtrip():
    """grid update produces a table consistent with its bitfield."""
    from ingp_tpu.ops.march import _BLOCK_WIN
    gs = 32
    key = jax.random.PRNGKey(5)
    dens = jax.random.uniform(key, (gs ** 3,))
    bf = packbits_u32(dens, 0.9)
    tb = build_block_table(bf, gs, 1)
    assert tb.shape == (1, (gs // 4) ** 3, 128)
    # decode one anchor row and compare against raw bits
    occ = np.zeros(gs ** 3, bool)
    w = np.asarray(bf)
    for i in range(gs ** 3):
        occ[i] = (w[i // 32] >> (i % 32)) & 1
    occ3 = occ.reshape(gs, gs, gs)
    row = np.asarray(tb[0, 0])          # anchor (0,0,0)
    for lz in range(_BLOCK_WIN):
        for ly in range(_BLOCK_WIN):
            for lx in range(_BLOCK_WIN):
                word = row[lz * 8 + (ly >> 1)]
                bit = (word >> (((ly & 1) << 4) | lx)) & 1
                assert bool(bit) == bool(occ3[lz, ly, lx]), (lz, ly, lx)


def test_block_conservative_vs_exact_oracle_exp():
    """Block march at exp_step 1/256 (the real-scene op-point) vs the
    scalar oracle that replicates raymarching.cu:200-279 with the exact
    per-sub-step dt re-evaluation: every oracle sample must appear in
    the block march at the same t (extras allowed: out-of-window or
    mip-transition runs are conservatively kept and the network sees
    their true density)."""
    from tests.test_march_composite import (_oracle_march_exact,
                                            _make_grid)

    cfg = MarchConfig(grid_size=32, cascades=3, scale=2.0,
                      exp_step_factor=1 / 256, max_samples=512,
                      capacity=128, iters=512)
    dense, bf = _make_grid(
        cfg, lambda x, y, z: ((np.abs(x) < 0.7) & (np.abs(y) < 0.7)
                              & (np.abs(z) < 0.7))
        | ((x - 1.2) ** 2 + y ** 2 + z ** 2 < 0.36))
    tb = build_block_table(bf, 32, 3)
    rng = np.random.default_rng(7)
    R = 48
    o = np.stack([rng.uniform(-0.3, 0.3, R), rng.uniform(-0.3, 0.3, R),
                  np.full(R, -5.0)], -1).astype(np.float32)
    d = np.stack([rng.uniform(-0.25, 0.25, R),
                  rng.uniform(-0.25, 0.25, R),
                  np.ones(R)], -1).astype(np.float32)
    noise = rng.random(R).astype(np.float32)
    hits = ray_aabb_intersect(jnp.asarray(o), jnp.asarray(d),
                              jnp.zeros(3), jnp.full(3, cfg.scale))
    blk = march_rays_block(cfg, tb, jnp.asarray(o), jnp.asarray(d), hits,
                           jnp.asarray(noise))
    hits_np = np.asarray(hits)
    blk_ts = np.asarray(blk["ts"])
    blk_valid = np.asarray(blk["valid"])
    blk_n = blk_valid.sum(1)
    any_hit = False
    for r in range(R):
        want = _oracle_march_exact(dense, o[r], d[r], hits_np[r, 0],
                                   hits_np[r, 1], cfg, noise[r])
        any_hit |= len(want) > 0
        if blk_n[r] >= cfg.capacity:
            continue  # capacity-clipped tails can drop oracle samples
        got = np.sort(blk_ts[r][blk_valid[r]])
        for t_w, _ in want:
            j = np.searchsorted(got, t_w)
            cands = got[max(j - 1, 0):j + 1]
            assert cands.size and np.min(
                np.abs(cands - t_w)) <= 2e-4 * max(t_w, 1.0), (r, t_w)
    assert any_hit
