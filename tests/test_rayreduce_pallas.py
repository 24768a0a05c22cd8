"""Fused ray-expand+reduce Pallas kernel vs the XLA dedup path
(interpret mode; the real-TPU comparison lives in the bench)."""
import numpy as np
import jax
import jax.numpy as jnp

from ingp_tpu.ops.brickgrid import (BrickGridConfig, brickgrid_init,
                                    brick_coords, reduce_feats_jac)
from ingp_tpu.ops.raybrick import _unique_plan, _expand_unique
from ingp_tpu.ops.pallas.rayreduce_pallas import fused_ray_reduce

CFG = BrickGridConfig(n_levels=8, n_features=8, log2_bricks=8,
                      base_resolution=16, per_level_scale=1.45)
R, S = 8, 16
L, F = CFG.n_levels, CFG.n_features
K = L * S


def setup(key):
    table = brickgrid_init(key, CFG)
    kd, ko = jax.random.split(key)
    d = jax.random.normal(kd, (R, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    o = jax.random.uniform(ko, (R, 3)) * 0.4 + 0.2
    t = jnp.arange(S)[None, :] * (np.sqrt(3) / 256)
    x = jnp.clip(o[:, None, :] + t[..., None] * d[:, None, :], 0, 1)
    xT = jnp.transpose(x, (2, 0, 1)).reshape(3, -1)       # ray-major
    valid = jnp.ones((R, S), bool)
    caps = (S,) * L
    rows, local, frac = brick_coords(CFG, xT)
    uid, urows = _unique_plan(CFG, rows.reshape(L, R, S), valid, caps)
    U = int(np.sum(caps))
    g_u = jnp.take(table, urows.reshape(-1), axis=0).reshape(R, U, -1)

    def to_rk(a):
        return jnp.transpose(a.reshape(3, L, R, S), (0, 2, 1, 3)
                             ).reshape(3, R, K)
    sc = jnp.repeat(jnp.asarray(CFG.scales, jnp.float32), S)
    lf = jnp.concatenate([to_rk(local.astype(jnp.float32)), to_rk(frac),
                          jnp.broadcast_to(sc, (1, R, K)),
                          jnp.zeros((1, R, K), jnp.float32)], 0)
    return table, g_u, uid, lf, local, frac, U


def xla_reference(g_u, uid, local, frac, U):
    g = _expand_unique(g_u, uid, U, jnp.float32)
    W = g.shape[-1]
    g = jnp.transpose(g.reshape(R, L, S, W), (1, 0, 2, 3)
                      ).reshape(L * R * S, W)
    return reduce_feats_jac(CFG, g, local, frac, R * S)


def to_sample_major(feats_cm, jac_cm):
    feats = jnp.transpose(feats_cm.reshape(F, R, L, S), (1, 3, 2, 0)
                          ).reshape(R * S, L * F)
    jac = jnp.transpose(jac_cm.reshape(3, F, R, L, S), (0, 2, 4, 3, 1)
                        ).reshape(3, R * S, L * F)
    return feats, jac


def test_forward_matches_xla():
    table, g_u, uid, lf, local, frac, U = setup(jax.random.PRNGKey(0))
    f_ref, j_ref = xla_reference(g_u, uid, local, frac, U)
    f_cm, j_cm = fused_ray_reduce(g_u, uid, lf, F, True, 0, None, True)
    f, j = to_sample_major(f_cm, j_cm)
    np.testing.assert_allclose(f, f_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(j, j_ref, rtol=1e-5, atol=1e-5)


def test_feats_only_variant():
    table, g_u, uid, lf, local, frac, U = setup(jax.random.PRNGKey(1))
    f_ref, _ = xla_reference(g_u, uid, local, frac, U)
    f_cm, none = fused_ray_reduce(g_u, uid, lf, F, False, 0, None, True)
    assert none is None
    feats = jnp.transpose(f_cm.reshape(F, R, L, S), (1, 3, 2, 0)
                          ).reshape(R * S, L * F)
    np.testing.assert_allclose(feats, f_ref, rtol=1e-5, atol=1e-6)


def test_backward_matches_xla():
    table, g_u, uid, lf, local, frac, U = setup(jax.random.PRNGKey(2))
    wf = jax.random.normal(jax.random.PRNGKey(3), (R * S, L * F))
    wj = jax.random.normal(jax.random.PRNGKey(4), (3, R * S, L * F))

    def loss_ref(g_u):
        f, j = xla_reference(g_u, uid, local, frac, U)
        return jnp.sum(f * wf) + jnp.sum(j * wj)

    def loss_pl(g_u):
        f_cm, j_cm = fused_ray_reduce(g_u, uid, lf, F, True, 0, None, True)
        f, j = to_sample_major(f_cm, j_cm)
        return jnp.sum(f * wf) + jnp.sum(j * wj)

    g_ref = jax.grad(loss_ref)(g_u)
    g_pl = jax.grad(loss_pl)(g_u)
    np.testing.assert_allclose(g_pl, g_ref, rtol=1e-4, atol=1e-4)


def test_bf16_rows_match_f32_forward():
    """bf16 unique rows (the production table-storage dtype) must
    reproduce the f32 kernel bit-for-bit in the forward: the one-hot is
    exact in bf16 and the rows are bf16 data either way."""
    table, g_u, uid, lf, local, frac, U = setup(jax.random.PRNGKey(5))
    g_bf = g_u.astype(jnp.bfloat16)
    f32_cm, j32_cm = fused_ray_reduce(g_bf.astype(jnp.float32), uid, lf,
                                      F, True, 0, None, True)
    fbf_cm, jbf_cm = fused_ray_reduce(g_bf, uid, lf, F, True, 0, None, True)
    np.testing.assert_array_equal(np.asarray(fbf_cm), np.asarray(f32_cm))
    np.testing.assert_array_equal(np.asarray(jbf_cm), np.asarray(j32_cm))


def test_bf16_rows_backward_close():
    """Backward with bf16 rows rounds per-sample cotangents to bf16
    before the (exact) segment contraction — allclose at bf16 tolerance
    against the f32 kernel."""
    table, g_u, uid, lf, local, frac, U = setup(jax.random.PRNGKey(6))
    g_bf = g_u.astype(jnp.bfloat16)
    wf = jax.random.normal(jax.random.PRNGKey(7), (R * S, L * F))
    wj = jax.random.normal(jax.random.PRNGKey(8), (3, R * S, L * F))

    def loss(g):
        f_cm, j_cm = fused_ray_reduce(g, uid, lf, F, True, 0, None, True)
        f, j = to_sample_major(f_cm, j_cm)
        return jnp.sum(f * wf) + jnp.sum(j * wj)

    d32 = np.asarray(jax.grad(loss)(g_bf.astype(jnp.float32)))
    dbf = jax.grad(loss)(g_bf)
    assert dbf.dtype == jnp.bfloat16
    # bf16 rounding of per-sample cotangents: bound the error against
    # the gradient's overall scale (plain rtol explodes on entries that
    # cancel to near zero)
    err = np.abs(np.asarray(dbf, np.float32) - d32)
    assert np.max(err) <= 2e-2 * np.max(np.abs(d32))


def test_partial_jac_window():
    """jac_lo/jac_hi restricts the jacobian to a feature window (the
    fused density|rgb table differentiates only its density features)."""
    table, g_u, uid, lf, local, frac, U = setup(jax.random.PRNGKey(9))
    lo, hi = 2, 6
    f_ref, j_ref = reduce_feats_jac(
        CFG, _expand_full(g_u, uid, U), local, frac, R * S,
        jac_lo=lo, jac_hi=hi)
    f_cm, j_cm = fused_ray_reduce(g_u, uid, lf, F, True, lo, hi, True)
    Fj = hi - lo
    f = jnp.transpose(f_cm.reshape(F, R, L, S), (1, 3, 2, 0)
                      ).reshape(R * S, L * F)
    j = jnp.transpose(j_cm.reshape(3, Fj, R, L, S), (0, 2, 4, 3, 1)
                      ).reshape(3, R * S, L * Fj)
    np.testing.assert_allclose(f, f_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(j, j_ref, rtol=1e-5, atol=1e-5)

    wf = jax.random.normal(jax.random.PRNGKey(10), (R * S, L * F))
    wj = jax.random.normal(jax.random.PRNGKey(11), (3, R * S, L * Fj))

    def loss_ref(g):
        fr, jr = reduce_feats_jac(CFG, _expand_full(g, uid, U), local,
                                  frac, R * S, jac_lo=lo, jac_hi=hi)
        return jnp.sum(fr * wf) + jnp.sum(jr * wj)

    def loss_pl(g):
        fc, jc = fused_ray_reduce(g, uid, lf, F, True, lo, hi, True)
        fs = jnp.transpose(fc.reshape(F, R, L, S), (1, 3, 2, 0)
                           ).reshape(R * S, L * F)
        js = jnp.transpose(jc.reshape(3, Fj, R, L, S), (0, 2, 4, 3, 1)
                           ).reshape(3, R * S, L * Fj)
        return jnp.sum(fs * wf) + jnp.sum(js * wj)

    g_ref = jax.grad(loss_ref)(g_u)
    g_pl = jax.grad(loss_pl)(g_u)
    np.testing.assert_allclose(g_pl, g_ref, rtol=1e-4, atol=1e-4)


def _expand_full(g_u, uid, U):
    g = _expand_unique(g_u, uid, U, jnp.float32)
    W = g.shape[-1]
    return jnp.transpose(g.reshape(R, L, S, W), (1, 0, 2, 3)
                         ).reshape(L * R * S, W)


def test_backward_chunked_U_matches_xla():
    """Large-U config (stream-dedup shapes): the backward's dG block is
    chunked along the unique axis (grid axis u) — must still match XLA."""
    from ingp_tpu.ops.pallas.rayreduce_pallas import _pick_uc
    S2 = 96
    K2 = L * S2
    assert _pick_uc(L * S2, 32 * F) < L * S2  # chunking really engages

    key = jax.random.PRNGKey(20)
    table = brickgrid_init(key, CFG)
    kd, ko = jax.random.split(key)
    d = jax.random.normal(kd, (R, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    o = jax.random.uniform(ko, (R, 3)) * 0.4 + 0.2
    t = jnp.arange(S2)[None, :] * (np.sqrt(3) / 1024)
    x = jnp.clip(o[:, None, :] + t[..., None] * d[:, None, :], 0, 1)
    xT = jnp.transpose(x, (2, 0, 1)).reshape(3, -1)
    valid = jnp.ones((R, S2), bool)
    caps = (S2,) * L
    rows, local, frac = brick_coords(CFG, xT)
    uid, urows = _unique_plan(CFG, rows.reshape(L, R, S2), valid, caps)
    U = int(np.sum(caps))
    g_u = jnp.take(table, urows.reshape(-1), axis=0).reshape(R, U, -1)

    def to_rk(a):
        return jnp.transpose(a.reshape(3, L, R, S2), (0, 2, 1, 3)
                             ).reshape(3, R, K2)
    sc = jnp.repeat(jnp.asarray(CFG.scales, jnp.float32), S2)
    lf = jnp.concatenate([to_rk(local.astype(jnp.float32)), to_rk(frac),
                          jnp.broadcast_to(sc, (1, R, K2)),
                          jnp.zeros((1, R, K2), jnp.float32)], 0)

    def xla_ref(g):
        ge = _expand_unique(g, uid, U, jnp.float32)
        W = ge.shape[-1]
        ge = jnp.transpose(ge.reshape(R, L, S2, W), (1, 0, 2, 3)
                           ).reshape(L * R * S2, W)
        return reduce_feats_jac(CFG, ge, local, frac, R * S2)

    wf = jax.random.normal(jax.random.PRNGKey(21), (R * S2, L * F))
    wj = jax.random.normal(jax.random.PRNGKey(22), (3, R * S2, L * F))

    def loss_ref(g):
        fr, jr = xla_ref(g)
        return jnp.sum(fr * wf) + jnp.sum(jr * wj)

    def loss_pl(g):
        fc, jc = fused_ray_reduce(g, uid, lf, F, True, 0, None, True)
        fs = jnp.transpose(fc.reshape(F, R, L, S2), (1, 3, 2, 0)
                           ).reshape(R * S2, L * F)
        js = jnp.transpose(jc.reshape(3, F, R, L, S2), (0, 2, 4, 3, 1)
                           ).reshape(3, R * S2, L * F)
        return jnp.sum(fs * wf) + jnp.sum(js * wj)

    g_ref = jax.grad(loss_ref)(g_u)
    g_pl = jax.grad(loss_pl)(g_u)
    np.testing.assert_allclose(g_pl, g_ref, rtol=1e-4, atol=1e-4)
