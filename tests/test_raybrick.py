"""Ray-run dedup encoder vs the per-sample brick encoder.

With per-level caps == S (a ray can never have more than S runs), the
dedup path must reproduce the per-sample encoder EXACTLY — same rows
gathered, same trilerp weights, same reduction. Overflowing caps only
degrades which brick an overflow sample reads; shapes and gradients
stay finite and consistent.
"""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ingp_tpu.ops.brickgrid import (BrickGridConfig, brickgrid_init,
                                    brickgrid_encode,
                                    brickgrid_encode_grad)
from ingp_tpu.ops.raybrick import (raybrick_encode, raybrick_encode_grad,
                                   run_caps)

CFG = BrickGridConfig(n_levels=6, n_features=4, log2_bricks=8,
                      base_resolution=16, per_level_scale=1.5)
R, S = 32, 12


def ray_positions(key, R=R, S=S, dt=np.sqrt(3) / 256):
    ko, kd, kt = jax.random.split(key, 3)
    d = jax.random.normal(kd, (R, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    o = jax.random.uniform(ko, (R, 3)) * 0.3 + 0.2
    t = jax.random.uniform(kt, (R, 1)) * 0.1 \
        + jnp.arange(S)[None, :] * dt
    x = o[:, None, :] + t[..., None] * d[:, None, :]
    return jnp.clip(jnp.transpose(x, (2, 0, 1)), 0.0, 1.0)  # (3, R, S)


def test_matches_per_sample_encoder_full_caps():
    key = jax.random.PRNGKey(0)
    table = brickgrid_init(key, CFG)
    x = ray_positions(key)
    valid = jnp.ones((R, S), bool)
    caps = (S,) * CFG.n_levels

    ref = brickgrid_encode(CFG, table, x.reshape(3, -1), x_cm=True)
    out = raybrick_encode(CFG, table, x, valid, caps)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)


def test_matches_with_chunking_and_partial_valid():
    key = jax.random.PRNGKey(1)
    table = brickgrid_init(key, CFG)
    x = ray_positions(key)
    n = jax.random.randint(key, (R,), 0, S + 1)
    valid = jnp.arange(S)[None, :] < n[:, None]
    caps = (S,) * CFG.n_levels

    ref = brickgrid_encode(CFG, table, x.reshape(3, -1), x_cm=True)
    ref = jnp.where(valid.reshape(-1, 1), ref, 0.0)
    out = raybrick_encode(CFG, table, x, valid, caps, chunk_rays=8)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)


def test_grad_variant_matches():
    key = jax.random.PRNGKey(2)
    table = brickgrid_init(key, CFG)
    x = ray_positions(key)
    valid = jnp.ones((R, S), bool)
    caps = (S,) * CFG.n_levels

    f_ref, j_ref = brickgrid_encode_grad(CFG, table, x.reshape(3, -1),
                                         x_cm=True)
    f, j = raybrick_encode_grad(CFG, table, x, valid, caps)
    np.testing.assert_allclose(f, f_ref, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(j, j_ref, rtol=1e-6, atol=1e-6)


def test_table_gradients_match():
    key = jax.random.PRNGKey(3)
    table = brickgrid_init(key, CFG)
    x = ray_positions(key)
    valid = jnp.ones((R, S), bool)
    caps = (S,) * CFG.n_levels
    w = jax.random.normal(key, (R * S, CFG.out_dim))

    g_ref = jax.grad(lambda t: jnp.sum(
        brickgrid_encode(CFG, t, x.reshape(3, -1), x_cm=True) * w))(table)
    g = jax.grad(lambda t: jnp.sum(
        raybrick_encode(CFG, t, x, valid, caps) * w))(table)
    np.testing.assert_allclose(g, g_ref, rtol=1e-5, atol=1e-6)


def test_bf16_storage_matches_per_sample_bf16():
    key = jax.random.PRNGKey(4)
    table = brickgrid_init(key, CFG)
    x = ray_positions(key)
    valid = jnp.ones((R, S), bool)
    caps = (S,) * CFG.n_levels

    ref = brickgrid_encode(CFG, table, x.reshape(3, -1), x_cm=True,
                           storage_dtype=jnp.bfloat16)
    out = raybrick_encode(CFG, table, x, valid, caps,
                          storage_dtype=jnp.bfloat16)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_tight_caps_graceful():
    key = jax.random.PRNGKey(5)
    table = brickgrid_init(key, CFG)
    x = ray_positions(key)
    valid = jnp.ones((R, S), bool)
    caps = (2,) * CFG.n_levels   # force overflow at fine levels

    out = raybrick_encode(CFG, table, x, valid, caps)
    assert out.shape == (R * S, CFG.out_dim)
    assert bool(jnp.all(jnp.isfinite(out)))
    g = jax.grad(lambda t: jnp.sum(
        raybrick_encode(CFG, t, x, valid, caps) ** 2))(table)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_run_caps_monotone_and_bounded():
    caps = run_caps(CFG, spr=24)
    assert len(caps) == CFG.n_levels
    assert all(1 <= c <= 24 for c in caps)
    assert list(caps) == sorted(caps)


def test_zero_valid_ray():
    key = jax.random.PRNGKey(6)
    table = brickgrid_init(key, CFG)
    x = ray_positions(key)
    valid = jnp.zeros((R, S), bool)
    caps = (S,) * CFG.n_levels
    out = raybrick_encode(CFG, table, x, valid, caps)
    assert float(jnp.abs(out).max()) == 0.0


def test_render_path_matches_compact_path():
    """render_rays with ray_dedup must reproduce the compact path
    (same samples, same math) at capacity == samples_per_ray."""
    from ingp_tpu.models import (NGPConfig, ngp_init, RenderConfig,
                                 render_rays)

    cfg = NGPConfig(scale=0.5, density_L=4, density_log2T=12, rgb_L=4,
                    rgb_log2T=12, classes=3, grid_size=32,
                    encoder="brick")
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    params["density_table"] = params["density_table"] * 2e3

    bitfield = jnp.full((cfg.cascades * cfg.grid_size ** 3 // 32,),
                        0xFFFFFFFF, jnp.uint32)
    rng = np.random.default_rng(3)
    Rr = 64
    ro = np.stack([rng.uniform(-0.3, 0.3, Rr),
                   rng.uniform(-0.3, 0.3, Rr),
                   np.full(Rr, -1.4)], -1).astype(np.float32)
    rd = np.stack([rng.uniform(-0.1, 0.1, Rr),
                   rng.uniform(-0.1, 0.1, Rr),
                   np.ones(Rr)], -1).astype(np.float32)
    args = (jnp.asarray(ro), jnp.asarray(rd), jnp.zeros(Rr))

    base = RenderConfig(capacity=64, march_iters=128, samples_per_ray=64)
    dd = dataclasses.replace(base, ray_dedup=True, dedup_slack=4.0)
    ref = render_rays(cfg, base, params, bitfield, *args)
    out = render_rays(cfg, dd, params, bitfield, *args)
    for k in ("rgb", "depth", "opacity", "normal_pred", "semantic",
              "Ro", "Rp", "distortion"):
        np.testing.assert_allclose(np.asarray(out[k]),
                                   np.asarray(ref[k]), rtol=2e-4,
                                   atol=2e-5, err_msg=k)

    # gradients agree too (the whole point: same math, fewer rows)
    def loss(fn_cfg):
        def f(p):
            r = render_rays(cfg, fn_cfg, p, bitfield, *args)
            return jnp.mean(r["rgb"] ** 2) + jnp.mean(r["Rp"])
        return f

    g_ref = jax.grad(loss(base))(params)
    g_out = jax.grad(loss(dd))(params)
    for k in ("density_table", "rgb_table"):
        np.testing.assert_allclose(np.asarray(g_out[k]),
                                   np.asarray(g_ref[k]), rtol=1e-3,
                                   atol=1e-7, err_msg=k)


def test_render_path_matches_compact_path_binding_budget():
    """capacity > samples_per_ray with the global budget BINDING: the
    dedup path must keep compact_samples' exact sample-major kept set,
    reproducing the compact path's outputs and table gradients."""
    from ingp_tpu.models import (NGPConfig, ngp_init, RenderConfig,
                                 render_rays)

    cfg = NGPConfig(scale=0.5, density_L=4, density_log2T=12, rgb_L=4,
                    rgb_log2T=12, classes=3, grid_size=32,
                    encoder="brick")
    params = ngp_init(jax.random.PRNGKey(1), cfg)
    params["density_table"] = params["density_table"] * 2e3

    bitfield = jnp.full((cfg.cascades * cfg.grid_size ** 3 // 32,),
                        0xFFFFFFFF, jnp.uint32)
    rng = np.random.default_rng(5)
    Rr = 64
    ro = np.stack([rng.uniform(-0.3, 0.3, Rr),
                   rng.uniform(-0.3, 0.3, Rr),
                   np.full(Rr, -1.4)], -1).astype(np.float32)
    rd = np.stack([rng.uniform(-0.1, 0.1, Rr),
                   rng.uniform(-0.1, 0.1, Rr),
                   np.ones(Rr)], -1).astype(np.float32)
    args = (jnp.asarray(ro), jnp.asarray(rd), jnp.zeros(Rr))

    # full bitfield + capacity 64 marches ~64 samples/ray; budget
    # K = 64*16 binds hard
    base = RenderConfig(capacity=64, march_iters=128, samples_per_ray=16)
    dd = dataclasses.replace(base, ray_dedup=True, dedup_slack=4.0)
    ref = render_rays(cfg, base, params, bitfield, *args)
    out = render_rays(cfg, dd, params, bitfield, *args)
    assert float(jnp.sum(ref["valid"])) == 64 * 16  # budget really binds
    for k in ("rgb", "depth", "opacity", "normal_pred", "semantic",
              "Ro", "Rp", "distortion"):
        np.testing.assert_allclose(np.asarray(out[k]),
                                   np.asarray(ref[k]), rtol=2e-4,
                                   atol=2e-5, err_msg=k)
    np.testing.assert_array_equal(np.asarray(out["valid"]),
                                  np.asarray(ref["valid"]))

    def loss(fn_cfg):
        def f(p):
            r = render_rays(cfg, fn_cfg, p, bitfield, *args)
            return jnp.mean(r["rgb"] ** 2) + jnp.mean(r["Rp"])
        return f

    g_ref = jax.grad(loss(base))(params)
    g_out = jax.grad(loss(dd))(params)
    for k in ("density_table", "rgb_table"):
        np.testing.assert_allclose(np.asarray(g_out[k]),
                                   np.asarray(g_ref[k]), rtol=1e-3,
                                   atol=1e-7, err_msg=k)
