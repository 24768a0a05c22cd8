"""Stream-dedup encoder (ops/streambrick.py) vs the per-sample brick
encoder — values must be exact wherever no tile cap overflows."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ingp_tpu.ops.brickgrid import (BrickGridConfig, brickgrid_init,
                                    brickgrid_encode,
                                    brickgrid_encode_grad)
from ingp_tpu.ops.streambrick import (streambrick_encode,
                                      streambrick_encode_grad,
                                      stream_caps, split_levels,
                                      group_levels, _unique_plan_uniform)

CFG = BrickGridConfig(n_levels=8, n_features=4, log2_bricks=10,
                      base_resolution=16, per_level_scale=1.45)


def ray_stream(key, n_rays=40, max_seg=24):
    """Ray-contiguous compact stream: concatenated t-ordered segments
    of varying length (like compact_samples' ray-major output)."""
    ks = jax.random.split(key, 3)
    lens = np.asarray(jax.random.randint(ks[0], (n_rays,), 4, max_seg))
    o = np.asarray(jax.random.uniform(ks[1], (n_rays, 3))) * 0.5 + 0.25
    d = np.array(jax.random.normal(ks[2], (n_rays, 3)))
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    xs = []
    for r in range(n_rays):
        t = np.arange(lens[r])[:, None] * (np.sqrt(3) / 1024)
        xs.append(np.clip(o[r] + t * d[r], 0, 1))
    x = np.concatenate(xs).astype(np.float32)
    return jnp.asarray(x.T)                       # (3, N)


def test_tile_class_split_matches_single_class():
    """Head/tail tile classes with IDENTICAL caps (seg_head == seg_est)
    reproduce the single-class encoder exactly — exercises the
    class-split plumbing (per-class plans, shared multi-gather
    accumulator, feats/jac/grad concatenation) with zero semantic
    change."""
    key = jax.random.PRNGKey(50)
    table = brickgrid_init(key, CFG)
    x = ray_stream(jax.random.PRNGKey(51), n_rays=220)
    f_ref, j_ref = streambrick_encode_grad(CFG, table, x, tile=128)
    f, j = streambrick_encode_grad(CFG, table, x, tile=128,
                                   seg_head=4, head_frac=0.5)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_ref),
                               rtol=1e-6, atol=1e-6)
    wf = jax.random.normal(jax.random.PRNGKey(52),
                           (x.shape[1], CFG.out_dim))
    g_ref = jax.grad(lambda t: jnp.sum(
        streambrick_encode(CFG, t, x, tile=128) * wf))(table)
    g = jax.grad(lambda t: jnp.sum(
        streambrick_encode(CFG, t, x, tile=128, seg_head=4,
                           head_frac=0.5) * wf))(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)


def test_tight_head_class_exact_on_long_segments():
    """A sorted stream of uniformly LONG segments: the tight head-class
    breaks budget (seg_head 20) never overflows, so the two-class
    encoder must match the per-sample brick encoder exactly on both
    classes."""
    key = jax.random.PRNGKey(54)
    table = brickgrid_init(key, CFG)
    rng = np.random.default_rng(55)
    n_rays, seg = 128, 24
    o = rng.random((n_rays, 3)) * 0.5 + 0.25
    d = rng.standard_normal((n_rays, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t = np.arange(seg)[None, :, None] * (np.sqrt(3) / 1024)
    x = np.clip(o[:, None] + t * d[:, None], 0, 1)
    x = jnp.asarray(x.reshape(-1, 3).astype(np.float32).T)
    ref = brickgrid_encode(CFG, table, x, x_cm=True)
    out = streambrick_encode(CFG, table, x, tile=128,
                             seg_head=20, head_frac=0.75)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_caps_and_split_are_sane():
    caps = stream_caps(CFG, 256)
    assert len(caps) == 8 and list(caps) == sorted(caps)
    lc = split_levels(caps, 256)
    assert 0 < lc <= 8        # some coarse dedup levels, fine go direct


def test_stream_encode_matches_per_sample():
    key = jax.random.PRNGKey(0)
    table = brickgrid_init(key, CFG)
    x = ray_stream(jax.random.PRNGKey(1))
    ref = brickgrid_encode(CFG, table, x, x_cm=True)
    out = streambrick_encode(CFG, table, x, tile=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_stream_encode_grad_matches_per_sample():
    key = jax.random.PRNGKey(2)
    table = brickgrid_init(key, CFG)
    x = ray_stream(jax.random.PRNGKey(3))
    f_ref, j_ref = brickgrid_encode_grad(CFG, table, x, x_cm=True)
    f, j = streambrick_encode_grad(CFG, table, x, tile=128)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_ref),
                               rtol=1e-5, atol=1e-5)


def test_stream_table_gradient_matches():
    key = jax.random.PRNGKey(4)
    table = brickgrid_init(key, CFG)
    x = ray_stream(jax.random.PRNGKey(5), n_rays=20)
    N = x.shape[1]
    wf = jax.random.normal(jax.random.PRNGKey(6), (N, CFG.out_dim))

    g_ref = jax.grad(lambda t: jnp.sum(
        brickgrid_encode(CFG, t, x, x_cm=True) * wf))(table)
    g_out = jax.grad(lambda t: jnp.sum(
        streambrick_encode(CFG, t, x, tile=128) * wf))(table)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_stream_jac_window():
    key = jax.random.PRNGKey(7)
    table = brickgrid_init(key, CFG)
    x = ray_stream(jax.random.PRNGKey(8), n_rays=16)
    f_ref, j_ref = brickgrid_encode_grad(CFG, table, x, x_cm=True,
                                         jac_lo=1, jac_hi=3)
    f, j = streambrick_encode_grad(CFG, table, x, tile=128,
                                   jac_lo=1, jac_hi=3)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_ref),
                               rtol=1e-5, atol=1e-5)


def test_stream_chunked_matches_single():
    key = jax.random.PRNGKey(9)
    table = brickgrid_init(key, CFG)
    x = ray_stream(jax.random.PRNGKey(10), n_rays=120)
    a = streambrick_encode(CFG, table, x, tile=128, chunk=512)
    b = streambrick_encode(CFG, table, x, tile=128, chunk=1 << 20)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-7)


def test_random_points_overflow_graceful():
    """A NON-contiguous stream (random points) overflows the coarse
    caps: values degrade gracefully (finite, grads finite), never
    crash — callers only route ray-contiguous streams here."""
    key = jax.random.PRNGKey(11)
    table = brickgrid_init(key, CFG)
    x = jax.random.uniform(jax.random.PRNGKey(12), (3, 640))
    out = streambrick_encode(CFG, table, x, tile=128)
    assert bool(jnp.all(jnp.isfinite(out)))
    g = jax.grad(lambda t: jnp.sum(
        streambrick_encode(CFG, t, x, tile=128) ** 2))(table)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_group_levels_partition():
    """Groups are contiguous, cover [0, Lc), caps aligned and >= the
    group max (caps monotone, the documented precondition)."""
    caps = (4, 6, 11, 30, 60, 120, 250, 256)
    groups = group_levels(caps, align=16)
    assert groups[0][0] == 0 and groups[-1][1] == len(caps)
    for (a, b, ug), (a2, b2, _) in zip(groups, groups[1:]):
        assert b == a2
    for lo, hi, ug in groups:
        assert ug % 16 == 0
        assert ug >= max(caps[lo:hi])
        assert ug < max(caps[lo:hi]) + 16
    assert group_levels(()) == []
    assert group_levels((5,)) == [(0, 1, 16)]


def test_unique_plan_uniform():
    rows = jnp.asarray([[[5, 5, 7, 7, 7, 2, 9, 9]]], jnp.int32)
    valid = jnp.ones((1, 8), bool)
    uid, urows, ovf = _unique_plan_uniform(rows, valid, 4)
    np.testing.assert_array_equal(np.asarray(uid[0]),
                                  [0, 0, 1, 1, 1, 2, 3, 3])
    np.testing.assert_array_equal(np.asarray(urows[0]), [5, 7, 2, 9])
    assert not np.asarray(ovf).any()
    # overflow: runs past the cap are MARKED (the caller zeroes their
    # weights) — not aliased onto the last slot
    uid2, urows2, ovf2 = _unique_plan_uniform(rows, valid, 3)
    np.testing.assert_array_equal(np.asarray(urows2[0]), [5, 7, 2])
    np.testing.assert_array_equal(np.asarray(ovf2[0, 0]),
                                  [0, 0, 0, 0, 0, 0, 1, 1])
    np.testing.assert_array_equal(np.asarray(uid2[0, :6]),
                                  [0, 0, 1, 1, 1, 2])


def test_grouped_overflow_degrades_to_zero_features(monkeypatch):
    """Force tiny caps: overflowed samples get ZERO features at the
    dedup levels (not another run's values), and table grads stay
    uncorrupted (match a reference computed on the kept prefix)."""
    monkeypatch.setenv("INGP_STREAM_GROUPED", "1")
    monkeypatch.setenv("INGP_STREAM_GROUPED_INTERPRET", "1")
    _clear_stream_caches()
    key = jax.random.PRNGKey(30)
    table = brickgrid_init(key, CFG)
    # a NON-contiguous stream (random points): nearly every sample is
    # its own run, so tile-size caps overflow immediately
    x = jax.random.uniform(jax.random.PRNGKey(31), (3, 2048))
    out = streambrick_encode(CFG, table, x, tile=256)
    assert bool(jnp.all(jnp.isfinite(out)))
    g = jax.grad(lambda t: jnp.sum(
        streambrick_encode(CFG, t, x, tile=256) ** 2))(table)
    assert bool(jnp.all(jnp.isfinite(g)))
    _clear_stream_caches()


def _clear_stream_caches():
    # _grouped_mode reads env at trace time; same-signature calls would
    # otherwise hit the jit cache from the other mode
    streambrick_encode.clear_cache()
    streambrick_encode_grad.clear_cache()


def test_grouped_interpret_matches_ungrouped(monkeypatch):
    """The grouped fused-kernel path (the default on real TPU) vs the
    ungrouped XLA fallback, exercised on CPU via the Pallas interpreter
    at a production-like tile shape (TS=256, T%8==0 after padding)."""
    key = jax.random.PRNGKey(20)
    table = brickgrid_init(key, CFG)
    x = ray_stream(jax.random.PRNGKey(21), n_rays=96)
    wf = jax.random.normal(jax.random.PRNGKey(22),
                           (x.shape[1], CFG.out_dim))

    def run():
        _clear_stream_caches()
        f, j = streambrick_encode_grad(CFG, table, x, tile=256)
        g = jax.grad(lambda t: jnp.sum(
            streambrick_encode(CFG, t, x, tile=256) * wf))(table)
        return f, j, g

    monkeypatch.setenv("INGP_STREAM_GROUPED", "0")
    f_ref, j_ref, g_ref = run()
    monkeypatch.setenv("INGP_STREAM_GROUPED", "1")
    monkeypatch.setenv("INGP_STREAM_GROUPED_INTERPRET", "1")
    f, j, g = run()
    _clear_stream_caches()

    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)
    # and against the per-sample reference encoder
    f_ps, j_ps = brickgrid_encode_grad(CFG, table, x, x_cm=True)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ps),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_ps),
                               rtol=1e-5, atol=1e-5)


def test_render_stream_matches_plain_compact():
    """render_rays (compact path) with stream_dedup on/off: identical
    outputs and table gradients — stream dedup is a transparent
    encoder-level optimization."""
    import dataclasses
    from ingp_tpu.models import (NGPConfig, ngp_init, RenderConfig,
                                 render_rays)

    base_cfg = NGPConfig(scale=0.5, density_L=4, density_log2T=12,
                         rgb_L=4, rgb_log2T=12, classes=3, grid_size=32,
                         encoder="brick", stream_tile=128)
    st_cfg = dataclasses.replace(base_cfg, stream_dedup=True,
                                 stream_slack=4.0)
    params = ngp_init(jax.random.PRNGKey(0), base_cfg)
    params["density_table"] = params["density_table"] * 2e3

    bitfield = jnp.full((base_cfg.cascades * 32 ** 3 // 32,),
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
    rcfg = RenderConfig(capacity=64, march_iters=128, samples_per_ray=32)

    ref = render_rays(base_cfg, rcfg, params, bitfield, *args)
    out = render_rays(st_cfg, rcfg, params, bitfield, *args)
    for k in ("rgb", "depth", "opacity", "normal_pred", "semantic",
              "Ro", "Rp", "distortion"):
        np.testing.assert_allclose(np.asarray(out[k]),
                                   np.asarray(ref[k]), rtol=2e-4,
                                   atol=2e-5, err_msg=k)

    def loss(cfg):
        def f(p):
            r = render_rays(cfg, rcfg, p, bitfield, *args)
            return jnp.mean(r["rgb"] ** 2) + jnp.mean(r["Rp"])
        return f

    g_ref = jax.grad(loss(base_cfg))(params)
    g_out = jax.grad(loss(st_cfg))(params)
    for k in ("density_table", "rgb_table"):
        np.testing.assert_allclose(np.asarray(g_out[k]),
                                   np.asarray(g_ref[k]), rtol=1e-3,
                                   atol=1e-7, err_msg=k)


def test_all_direct_mode_matches_per_sample():
    """direct_frac=0.0 (the per-sample-exact fallback,
    BENCH_DIRECT_FRAC=0.0; the bench default is the quality-validated
    dedup at seg 4 / slack 1.5): every level
    per-sample through the multi-gather plumbing — values, jacobian and
    table grads exactly match the plain brick encoder."""
    key = jax.random.PRNGKey(40)
    table = brickgrid_init(key, CFG)
    x = ray_stream(jax.random.PRNGKey(41), n_rays=64)
    f_ref, j_ref = brickgrid_encode_grad(CFG, table, x, x_cm=True)
    f, j = streambrick_encode_grad(CFG, table, x, tile=256,
                                   direct_frac=0.0)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_ref),
                               rtol=1e-6, atol=1e-6)
    wf = jax.random.normal(jax.random.PRNGKey(42),
                           (x.shape[1], CFG.out_dim))
    g_ref = jax.grad(lambda t: jnp.sum(
        brickgrid_encode(CFG, t, x, x_cm=True) * wf))(table)
    g = jax.grad(lambda t: jnp.sum(
        streambrick_encode(CFG, t, x, tile=256, direct_frac=0.0)
        * wf))(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)


def test_run_count_quantiles_and_caps_override():
    """run_count_quantiles measures the per-tile unique-run counts the
    caps must cover, and caps_override reproduces the formula path
    exactly when set to the formula caps (auto-calibration plumbing)."""
    import numpy as np
    import jax.numpy as jnp
    from ingp_tpu.ops.brickgrid import BrickGridConfig, brickgrid_init
    from ingp_tpu.ops.streambrick import (
        run_count_quantiles, stream_caps, streambrick_encode)

    cfg = BrickGridConfig(n_levels=6, n_features=4, log2_bricks=10,
                          base_resolution=16, per_level_scale=1.5)
    rng = np.random.default_rng(3)
    # ray-like stream: 16-sample segments along random directions
    segs = []
    dt = np.sqrt(3) / 256
    for _ in range(64):
        o = rng.random(3) * 0.5 + 0.25
        d = rng.standard_normal(3)
        d /= np.linalg.norm(d)
        t = np.arange(16)[:, None] * dt
        segs.append(np.clip(o + t * d, 0.0, 1.0))
    x = jnp.asarray(np.concatenate(segs).astype(np.float32).T)  # (3,1024)

    tile = 128
    q = np.asarray(run_count_quantiles(cfg, x, tile, q=1.0))
    assert q.shape == (cfg.n_levels,)
    # exact reference per tile
    from ingp_tpu.ops.brickgrid import brick_coords
    rows = np.asarray(brick_coords(cfg, x)[0])
    T = x.shape[1] // tile
    r3 = rows[:, :T * tile].reshape(cfg.n_levels, T, tile)
    runs = (np.concatenate([np.full((cfg.n_levels, T, 1), -1),
                            r3[:, :, :-1]], 2) != r3).sum(2)
    np.testing.assert_array_equal(q, runs.max(axis=1))

    # override == formula caps -> identical features
    table = brickgrid_init(jax.random.PRNGKey(0), cfg)
    caps = stream_caps(cfg, tile)
    a = streambrick_encode(cfg, table, x, tile=tile)
    b = streambrick_encode(cfg, table, x, tile=tile, caps_override=caps)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # generous measured caps (>= max runs everywhere): overflow-free,
    # so the encode must be exact vs the per-sample (direct) encoder
    gen = tuple(int(v) + 2 for v in q)
    c = streambrick_encode(cfg, table, x, tile=tile, caps_override=gen)
    from ingp_tpu.ops.brickgrid import brickgrid_encode
    ref = brickgrid_encode(cfg, table, x, x_cm=True)
    np.testing.assert_allclose(np.asarray(c), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)
