"""Unit tests for ingp_tpu.ops: hash grid, SH, activations, packing."""
import numpy as np
import jax
import jax.numpy as jnp

from ingp_tpu.ops import (
    HashGridConfig, hashgrid_init, hashgrid_encode,
    sh_encode, trunc_exp, trunc_tanh,
    packbits_u32, bitfield_lookup, compact_samples, scatter_back,
)
from ingp_tpu.ops.pack import gather_samples, ray_ids_for


# ---------------------------------------------------------------------------
# hash grid
# ---------------------------------------------------------------------------

def _small_cfg(**kw):
    d = dict(n_levels=4, n_features=2, log2_hashmap_size=12,
             base_resolution=4, per_level_scale=2.0)
    d.update(kw)
    return HashGridConfig(**d)


def test_hashgrid_shapes_and_finite():
    cfg = _small_cfg()
    key = jax.random.PRNGKey(0)
    table = hashgrid_init(key, cfg)
    x = jax.random.uniform(key, (37, 3))
    f = hashgrid_encode(cfg, table, x)
    assert f.shape == (37, cfg.out_dim)
    assert np.all(np.isfinite(np.asarray(f)))


def test_hashgrid_dense_level_exact_trilerp():
    # single dense (non-hashed) level: encode must equal manual trilerp
    cfg = _small_cfg(n_levels=1, base_resolution=4)
    assert not cfg.hashed[0]
    res = cfg.resolutions[0]
    rng = np.random.default_rng(0)
    table = np.zeros((2, cfg.total_rows), np.float32)  # feature-major
    dense = rng.normal(size=(res, res, res, 2)).astype(np.float32)
    for z in range(res):
        for y in range(res):
            for xi in range(res):
                table[:, (z * res + y) * res + xi] = dense[xi, y, z]
    x = rng.random((20, 3)).astype(np.float32)

    f = np.asarray(hashgrid_encode(cfg, jnp.asarray(table), jnp.asarray(x)))

    scale = cfg.scales[0]
    pos = x * scale + 0.5
    lo = np.floor(pos).astype(int)
    frac = pos - lo
    want = np.zeros((20, 2), np.float32)
    for i in range(8):
        c = np.array([i & 1, (i >> 1) & 1, (i >> 2) & 1])
        corner = np.clip(lo + c, 0, res - 1)
        w = np.prod(np.where(c == 1, frac, 1 - frac), -1)
        want += w[:, None] * dense[corner[:, 0], corner[:, 1], corner[:, 2]]
    np.testing.assert_allclose(f, want, atol=1e-5)


def test_hashgrid_table_grad_finite_difference():
    cfg = _small_cfg(n_levels=2)
    key = jax.random.PRNGKey(1)
    table = hashgrid_init(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (5, 3))

    def loss(t):
        return jnp.sum(jnp.sin(hashgrid_encode(cfg, t, x)))

    g = jax.grad(loss)(table)
    # check a few touched rows by finite differences (feature-major)
    touched = np.nonzero(np.abs(np.asarray(g)).sum(0))[0][:5]
    eps = 1e-3
    for r in touched:
        t1 = table.at[0, r].add(eps)
        t2 = table.at[0, r].add(-eps)
        fd = (loss(t1) - loss(t2)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, r]), float(fd), atol=1e-2)


def test_hashgrid_input_grad_matches_fd():
    # d(feature)/dx must be the analytic trilerp derivative
    cfg = _small_cfg(n_levels=2)
    table = hashgrid_init(jax.random.PRNGKey(1), cfg) * 1e3  # amplify
    x = jnp.array([[0.33, 0.41, 0.57]])

    def loss(xx):
        return jnp.sum(hashgrid_encode(cfg, table, xx) ** 2)

    g = jax.grad(loss)(x)
    eps = 1e-4
    for k in range(3):
        xp = x.at[0, k].add(eps)
        xm = x.at[0, k].add(-eps)
        fd = (loss(xp) - loss(xm)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, k]), float(fd), rtol=2e-2,
                                   atol=1e-3)


def test_hashgrid_encode_grad_matches_ad():
    from ingp_tpu.ops.hashgrid import hashgrid_encode_grad
    cfg = _small_cfg(n_levels=3)
    table = hashgrid_init(jax.random.PRNGKey(1), cfg) * 100
    x = jax.random.uniform(jax.random.PRNGKey(5), (7, 3),
                           minval=0.05, maxval=0.95)
    feats, jac = hashgrid_encode_grad(cfg, table, x)
    np.testing.assert_allclose(np.asarray(feats),
                               np.asarray(hashgrid_encode(cfg, table, x)),
                               rtol=1e-5, atol=1e-6)
    # jac vs AD jacobian of the encode
    ad_jac = jax.jacfwd(lambda xx: hashgrid_encode(cfg, table, xx[None])
                        [0])(x[0])                  # (LF, 3)
    np.testing.assert_allclose(np.asarray(jac[:, 0, :]).T,
                               np.asarray(ad_jac), rtol=1e-4, atol=1e-4)


def test_hashgrid_grad_of_grad():
    # double backward through the encoder (needed for normals_raw = -grad
    # sigma and its gradient, networks.py:186-196)
    cfg = _small_cfg()
    table = hashgrid_init(jax.random.PRNGKey(1), cfg)
    x = jnp.array([[0.3, 0.4, 0.5], [0.6, 0.7, 0.2]])

    def sigma(t, xx):
        return jnp.sum(hashgrid_encode(cfg, t, xx))

    def normal_loss(t):
        g = jax.grad(sigma, argnums=1)(t, x)
        return jnp.sum(g ** 2)

    gg = jax.grad(normal_loss)(table)
    assert np.all(np.isfinite(np.asarray(gg)))
    assert float(jnp.abs(gg).sum()) >= 0  # shape/compile sanity


# ---------------------------------------------------------------------------
# spherical harmonics
# ---------------------------------------------------------------------------

def test_sh_orthonormality_monte_carlo():
    # the real SH basis must be orthonormal over the sphere:
    # (4*pi/N) * sum_n Y_i(d_n) Y_j(d_n) -> delta_ij
    rng = np.random.default_rng(0)
    d = rng.normal(size=(200000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    Y = np.asarray(sh_encode(jnp.asarray(d, dtype=jnp.float32), 4))
    gram = (4 * np.pi / len(d)) * (Y.T @ Y)
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_sh_degrees():
    d = jnp.array([[0.0, 0.0, 1.0]])
    for deg, n in [(1, 1), (2, 4), (3, 9), (4, 16)]:
        assert sh_encode(d, deg).shape == (1, n)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

def test_trunc_exp_forward_exact_backward_clamped():
    x = jnp.array([-20.0, 0.0, 3.0, 20.0])
    np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp(x),
                               rtol=1e-6)
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    np.testing.assert_allclose(
        np.asarray(g), np.exp(np.clip(x, -7, 7)), rtol=1e-6)


def test_trunc_tanh():
    x = jnp.array([-30.0, 0.5, 30.0])
    np.testing.assert_allclose(np.asarray(trunc_tanh(x)), np.tanh(x),
                               rtol=1e-6)
    g = jax.grad(lambda v: jnp.sum(trunc_tanh(v)))(x)
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------------------
# ref_util (reflection + integrated directional encoding)
# ---------------------------------------------------------------------------

def test_reflect():
    from ingp_tpu.ops.ref_util import reflect
    v = jnp.array([[1.0, 1.0, 0.0]]) / np.sqrt(2)
    n = jnp.array([[0.0, 1.0, 0.0]])
    u = reflect(v, n)
    # mirror about the normal: x flips, y preserved
    np.testing.assert_allclose(np.asarray(u), [[-v[0, 0], v[0, 1], 0.0]],
                               atol=1e-6)


def test_ide_kappa_limits():
    from ingp_tpu.ops.ref_util import generate_ide_fn
    fn = generate_ide_fn(2)
    d = jnp.array([[0.6, 0.0, 0.8]])
    sharp = fn(d, jnp.array([[0.0]]))    # kappa_inv=0: plain SH
    blurred = fn(d, jnp.array([[10.0]]))  # high roughness attenuates
    assert np.all(np.isfinite(np.asarray(sharp)))
    # non-constant components shrink with roughness
    assert np.abs(np.asarray(blurred))[0, 1:].sum() < \
        np.abs(np.asarray(sharp))[0, 1:].sum()


def test_guided_filter_identity_on_constant():
    from ingp_tpu.utils.filters import box_filter, guided_filter
    img = np.full((16, 16), 0.7, np.float32)
    np.testing.assert_allclose(box_filter(img, 2), 0.7, atol=1e-6)
    out = guided_filter(img, img, r=2, eps=0.1)
    np.testing.assert_allclose(out, 0.7, atol=1e-5)


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def test_packbits_lookup_roundtrip():
    rng = np.random.default_rng(0)
    grid = rng.random(256).astype(np.float32)
    bf = packbits_u32(jnp.asarray(grid), 0.5)
    got = np.asarray(bitfield_lookup(bf, jnp.arange(256)))
    np.testing.assert_array_equal(got, grid > 0.5)


def test_compact_gather_scatter_roundtrip():
    rng = np.random.default_rng(1)
    R, S, K = 7, 5, 32
    valid = rng.random((R, S)) < 0.4
    vals = rng.normal(size=(R, S, 3)).astype(np.float32)
    vals[~valid] = 0.0

    plan = compact_samples(jnp.asarray(valid), K)
    assert int(plan.n_valid) == valid.sum()
    g = gather_samples(jnp.asarray(vals), plan)
    assert g.shape == (K, 3)
    back = scatter_back(g, plan)
    np.testing.assert_allclose(np.asarray(back), vals, atol=1e-6)
    # ray ids point back at the right rows
    rid = np.asarray(ray_ids_for(plan))
    got_rows = np.asarray(g)[np.asarray(plan.slot_valid)]
    for i, r in enumerate(rid[np.asarray(plan.slot_valid)]):
        assert np.isin(got_rows[i], vals[r]).all() or got_rows[i].sum() == 0


def test_compact_overflow_drops_deepest():
    # kept set is sample-major (deepest slots dropped on overflow), but
    # slots are PACKED ray-major so the compact batch is ray-contiguous
    R, S, K = 4, 4, 6
    valid = jnp.ones((R, S), bool)
    plan = compact_samples(valid, K)
    assert int(plan.n_valid) == K
    # kept: slot 0 of rays 0-3, slot 1 of rays 0-1 -> ray-major pack
    want = [0 * S + 0, 0 * S + 1, 1 * S + 0, 1 * S + 1,
            2 * S + 0, 3 * S + 0]
    np.testing.assert_array_equal(np.asarray(plan.src), want)
    # each ray's kept samples sit contiguously, t-ordered
    rid = np.asarray(plan.src) // S
    assert (np.diff(rid) >= 0).all()


def test_compact_gather_scatter_vjps_are_scatter_free_and_correct():
    # custom VJPs: d(gather)/d(arr) via the inverse gather and
    # d(scatter_back)/d(values) via the forward gather must match AD of
    # a naive implementation
    rng = np.random.default_rng(2)
    R, S, K = 6, 4, 16
    valid = jnp.asarray(rng.random((R, S)) < 0.5)
    plan = compact_samples(valid, K)
    arr = jnp.asarray(rng.normal(size=(R, S)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))

    g = jax.grad(lambda a: jnp.sum(gather_samples(a, plan) * ct))(arr)
    # naive: gradient lands exactly on the kept valid cells with ct value
    want = np.zeros((R, S), np.float32)
    src = np.asarray(plan.src)
    for k in range(K):
        if np.asarray(plan.slot_valid)[k]:
            r, s = divmod(src[k], S)
            want[r, s] = float(ct[k])
    np.testing.assert_allclose(np.asarray(g), want, atol=1e-6)

    vals = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))
    ct2 = jnp.asarray(rng.normal(size=(R, S)).astype(np.float32))
    g2 = jax.grad(lambda v: jnp.sum(scatter_back(v, plan) * ct2))(vals)
    want2 = np.zeros(K, np.float32)
    for k in range(K):
        if np.asarray(plan.slot_valid)[k]:
            r, s = divmod(src[k], S)
            want2[k] = float(ct2[r, s])
    np.testing.assert_allclose(np.asarray(g2), want2, atol=1e-6)
