"""Brick-packed encoder tests: exact trilerp semantics, naive-oracle
agreement, gradient flow, chunking."""
import numpy as np
import jax
import jax.numpy as jnp

from ingp_tpu.ops.brickgrid import (BrickGridConfig, brickgrid_init,
                                    brickgrid_encode)


def small_cfg(**kw):
    d = dict(n_levels=1, n_features=2, log2_bricks=10, base_resolution=8,
             per_level_scale=2.0, brick_size=2)
    d.update(kw)
    return BrickGridConfig(**d)


def _naive_encode(cfg, table, x):
    """Scalar-loop oracle with identical brick semantics."""
    N = len(x)
    L, F, B = cfg.n_levels, cfg.n_features, cfg.brick_size
    P = B + 1
    out = np.zeros((N, L * F), np.float32)
    for n in range(N):
        for l in range(L):
            scale = cfg.scales[l]
            res = cfg.resolutions[l]
            pos = x[n] * scale + 0.5
            cell = np.clip(np.floor(pos), 0, res - 2).astype(int)
            frac = pos - cell
            bc = cell // B
            local = cell - bc * B
            if cfg.hashed[l]:
                h = (bc[0] * 1 ^ bc[1] * 2654435761 ^ bc[2] * 805459861)
                row = (h % (2 ** 32)) & ((1 << cfg.log2_bricks) - 1)
            else:
                br = cfg.brick_res[l]
                row = (bc[2] * br + bc[1]) * br + bc[0]
            row += cfg.offsets[l]
            acc = np.zeros(F)
            for c in range(8):
                d = np.array([c & 1, (c >> 1) & 1, (c >> 2) & 1])
                w = np.prod(np.where(d == 1, frac, 1 - frac))
                p = local + d
                lane_p = (p[0] * P + p[1]) * P + p[2]
                acc += w * np.asarray(
                    table[row, lane_p * F:(lane_p + 1) * F])
            out[n, l * F:(l + 1) * F] = acc
    return out


def test_brick_encode_matches_naive_oracle():
    cfg = small_cfg(n_levels=3)
    table = brickgrid_init(jax.random.PRNGKey(0), cfg) * 1e4
    x = np.random.default_rng(1).random((24, 3)).astype(np.float32)
    got = np.asarray(brickgrid_encode(cfg, table, jnp.asarray(x)))
    want = _naive_encode(cfg, np.asarray(table), x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_brick_encode_reproduces_linear_function():
    # table with lattice value == alpha . global_corner -> trilerp exact
    cfg = small_cfg()  # dense single level, res 8, bricks 4^3
    B, P, F = cfg.brick_size, cfg.brick_size + 1, cfg.n_features
    br = cfg.brick_res[0]
    alpha = np.array([0.3, -0.7, 1.1])
    table = np.zeros((cfg.total_bricks, cfg.row_width), np.float32)
    for bz in range(br):
        for by in range(br):
            for bx in range(br):
                row = (bz * br + by) * br + bx
                for i in range(P):
                    for j in range(P):
                        for k in range(P):
                            gx = np.array([bx * B + i, by * B + j,
                                           bz * B + k])
                            lane_p = (i * P + j) * P + k
                            table[row, lane_p * F] = alpha @ gx
    x = np.random.default_rng(0).random((32, 3)).astype(np.float32) * 0.8
    got = np.asarray(brickgrid_encode(cfg, jnp.asarray(table),
                                      jnp.asarray(x)))[:, 0]
    want = (x * cfg.scales[0] + 0.5) @ alpha
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_brick_encode_grads_flow():
    cfg = small_cfg(n_levels=2)
    table = brickgrid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))

    g_t = jax.grad(lambda t: jnp.sum(
        jnp.sin(brickgrid_encode(cfg, t, x))))(table)
    assert np.isfinite(np.asarray(g_t)).all()
    assert float(jnp.abs(g_t).sum()) > 0
    # padding lanes never receive gradient
    W = cfg.lattice_pts * cfg.n_features
    assert float(jnp.abs(g_t[:, W:]).sum()) == 0.0

    g_x = jax.grad(lambda xx: jnp.sum(
        brickgrid_encode(cfg, table * 1e3, xx)))(x)
    assert np.isfinite(np.asarray(g_x)).all()


def test_brick_encode_chunked_equals_direct():
    cfg = small_cfg(n_levels=2)
    table = brickgrid_init(jax.random.PRNGKey(0), cfg) * 1e3
    x = jax.random.uniform(jax.random.PRNGKey(2), (300, 3))
    a = brickgrid_encode(cfg, table, x, chunk=128)
    b = brickgrid_encode(cfg, table, x, chunk=4096)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_brick_encode_grad_matches_ad():
    from ingp_tpu.ops.brickgrid import brickgrid_encode_grad
    cfg = small_cfg(n_levels=2)
    table = brickgrid_init(jax.random.PRNGKey(0), cfg) * 100
    x = jax.random.uniform(jax.random.PRNGKey(5), (9, 3),
                           minval=0.05, maxval=0.95)
    feats, jac = brickgrid_encode_grad(cfg, table, x)
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(brickgrid_encode(cfg, table, x)),
        rtol=1e-5, atol=1e-6)
    ad_jac = jax.jacfwd(lambda xx: brickgrid_encode(cfg, table, xx[None])
                        [0])(x[0])                  # (LF, 3)
    np.testing.assert_allclose(np.asarray(jac[:, 0, :]).T,
                               np.asarray(ad_jac), rtol=1e-4, atol=1e-4)


def test_brick_encode_grad_chunked():
    from ingp_tpu.ops.brickgrid import brickgrid_encode_grad
    cfg = small_cfg(n_levels=2)
    table = brickgrid_init(jax.random.PRNGKey(0), cfg) * 100
    x = jax.random.uniform(jax.random.PRNGKey(6), (300, 3))
    f1, j1 = brickgrid_encode_grad(cfg, table, x, chunk=128)
    f2, j2 = brickgrid_encode_grad(cfg, table, x, chunk=4096)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), rtol=1e-6)


def test_brick_row_width_padding():
    cfg = small_cfg()  # 27 pts x 2F = 54 -> 128 lanes
    assert cfg.row_width == 128
    cfg8 = small_cfg(n_features=8)  # 216 -> 256
    assert cfg8.row_width == 256


def test_master_weight_storage_gather():
    """table_dtype='bfloat16' now means: f32 master params, bf16 gather
    storage (ops/gather.py). Forward must equal a plain bf16-table
    encode bitwise; backward must return f32 grads accumulated at full
    precision (bf16 scatter-add loses tiny per-sample cotangents)."""
    import jax.numpy as jnp
    from ingp_tpu.ops.brickgrid import brickgrid_encode_grad
    from ingp_tpu.ops.gather import storage_cast, table_gather

    cfg = small_cfg(n_levels=2)
    table = brickgrid_init(jax.random.PRNGKey(0), cfg) * 100
    x = jax.random.uniform(jax.random.PRNGKey(7), (300, 3))

    ref = brickgrid_encode(cfg, table.astype(jnp.bfloat16), x, chunk=128)
    new = brickgrid_encode(cfg, table, x, chunk=128,
                           storage_dtype="bfloat16")
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(new))

    g = jax.grad(lambda t: jnp.sum(brickgrid_encode(
        cfg, t, x, chunk=128, storage_dtype="bfloat16") ** 2))(table)
    assert g.dtype == jnp.float32

    f1, j1 = brickgrid_encode_grad(cfg, table, x, chunk=128,
                                   storage_dtype="bfloat16")
    f2, j2 = brickgrid_encode_grad(cfg, table.astype(jnp.bfloat16), x,
                                   chunk=128)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j2))

    # f32 accumulation: 10k cotangents of 1e-4 into one row must sum
    # to ~1.0 (bf16 accumulation saturates far below)
    tt = jnp.ones((4, 256), jnp.float32)
    rows = jnp.zeros(10000, jnp.int32)

    def loss(t):
        return jnp.sum(table_gather(
            t, rows, 0, storage_cast(t, "bfloat16"))) * 1e-4

    acc = float(jax.grad(loss)(tt)[0, 0])
    assert abs(acc - 1.0) < 1e-3
