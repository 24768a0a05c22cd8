"""Pallas composite kernel vs the validated XLA composite (interpret
mode on CPU; the same kernel compiles for TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from ingp_tpu.ops.composite import composite_rays, render_weights
from ingp_tpu.ops.pallas.composite_pallas import composite_pallas


def _samples(seed=0, R=16, S=128):
    rng = np.random.default_rng(seed)
    nv = rng.integers(0, S + 1, R)
    valid = np.arange(S)[None] < nv[:, None]
    sig = (rng.exponential(20.0, (R, S)) * valid).astype(np.float32)
    rgb = rng.random((3, R, S)).astype(np.float32)   # channel-major
    dt = np.full((R, S), 0.01, np.float32)
    ts = np.cumsum(dt, 1).astype(np.float32)
    return (jnp.asarray(sig), jnp.asarray(rgb), jnp.asarray(dt),
            jnp.asarray(ts), jnp.asarray(valid))


def test_pallas_forward_matches_xla():
    sig, rgb, dt, ts, valid = _samples()
    thr = 1e-4
    ws, opacity, depth, rgb_out = composite_pallas(sig, rgb, dt, ts,
                                                   valid, thr, True)
    ref = composite_rays(sig, rgb, dt, ts, valid, thr)
    np.testing.assert_allclose(np.asarray(ws), np.asarray(ref["ws"]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(opacity),
                               np.asarray(ref["opacity"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(depth),
                               np.asarray(ref["depth"]), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(rgb_out),
                               np.asarray(ref["rgb"]), rtol=1e-5,
                               atol=1e-7)


def test_pallas_backward_matches_xla_ad():
    sig, rgb, dt, ts, valid = _samples(seed=3)
    thr = 1e-4
    rngk = jax.random.PRNGKey(0)
    dC = jax.random.normal(rngk, (16, 3))
    dO = jax.random.normal(rngk, (16,))
    dD = jax.random.normal(rngk, (16,))
    dws = jax.random.normal(rngk, sig.shape)

    def loss_pl(s, c):
        ws, opacity, depth, rgb_out = composite_pallas(s, c, dt, ts,
                                                       valid, thr, True)
        return (jnp.sum(rgb_out * dC) + jnp.sum(opacity * dO)
                + jnp.sum(depth * dD) + jnp.sum(ws * dws))

    def loss_xla(s, c):
        ref = composite_rays(s, c, dt, ts, valid, thr)
        return (jnp.sum(ref["rgb"] * dC) + jnp.sum(ref["opacity"] * dO)
                + jnp.sum(ref["depth"] * dD) + jnp.sum(ref["ws"] * dws))

    g_pl = jax.grad(loss_pl, argnums=(0, 1))(sig, rgb)
    g_xla = jax.grad(loss_xla, argnums=(0, 1))(sig, rgb)
    np.testing.assert_allclose(np.asarray(g_pl[0]), np.asarray(g_xla[0]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_pl[1]), np.asarray(g_xla[1]),
                               rtol=1e-4, atol=1e-6)


def test_fused_brick_reduce_matches_xla():
    """brickreduce kernel (interpret) vs the XLA reduce path, fwd + bwd,
    at the flagship brick shape (B=2, F=8, W=256)."""
    from ingp_tpu.ops.pallas.brickreduce_pallas import (
        fused_brick_reduce, ROW_TILE)

    F, W, L = 8, 256, 2
    n = ROW_TILE * 2
    N = n // L
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(n, W)).astype(np.float32))
    local = jnp.asarray(rng.integers(0, 2, (3, n)).astype(np.float32))
    frac = jnp.asarray(rng.random((3, n)).astype(np.float32))
    sc = jnp.asarray(np.tile(rng.random(L).astype(np.float32),
                             (N, 1)).T.reshape(-1))
    lf = jnp.concatenate([local, frac, sc[None],
                          jnp.zeros((1, n), jnp.float32)], 0)

    # XLA reference: the ops/brickgrid lane-compare construction
    q = np.arange(W)
    p = q // F
    valid = p < 27
    li = np.where(valid, p // 9, -1)
    lj = np.where(valid, (p // 3) % 3, -1)
    lk = np.where(valid, p % 3, -1)

    def axis_parts(lane_c, loc, fr):
        lane = lane_c[None, :]
        at0 = (lane == loc[:, None]).astype(np.float32)
        at1 = (lane == loc[:, None] + 1).astype(np.float32)
        return (at0 * (1 - fr[:, None]) + at1 * fr[:, None]), (at1 - at0)

    lo, fr_ = np.asarray(local), np.asarray(frac)
    wx, dwx = axis_parts(li, lo[0], fr_[0])
    wy, dwy = axis_parts(lj, lo[1], fr_[1])
    wz, dwz = axis_parts(lk, lo[2], fr_[2])
    S = np.zeros((W, F), np.float32)
    for pp in range(27):
        for f in range(F):
            S[pp * F + f, f] = 1.0
    gn = np.asarray(g)

    def red(wp):
        return ((gn * wp) @ S).T

    want_f = red(wx * wy * wz)
    scn = np.asarray(sc)
    want_j = np.concatenate([red(dwx * wy * wz) * scn,
                             red(wx * dwy * wz) * scn,
                             red(wx * wy * dwz) * scn], 0)

    feats, jac = fused_brick_reduce(g, lf, F, True)
    np.testing.assert_allclose(np.asarray(feats), want_f, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(jac), want_j, rtol=1e-5,
                               atol=1e-5)

    # backward vs AD of the XLA formulation
    ct_f = jnp.asarray(rng.normal(size=(F, n)).astype(np.float32))
    ct_j = jnp.asarray(rng.normal(size=(3 * F, n)).astype(np.float32))

    def loss_k(gg):
        f_, j_ = fused_brick_reduce(gg, lf, F, True)
        return jnp.sum(f_ * ct_f) + jnp.sum(j_ * ct_j)

    Sj = jnp.asarray(S)
    wxj, wyj, wzj = map(jnp.asarray, (wx, wy, wz))
    dwxj, dwyj, dwzj = map(jnp.asarray, (dwx, dwy, dwz))

    def loss_x(gg):
        def red_j(wp):
            return jnp.dot(gg * wp, Sj).T
        f_ = red_j(wxj * wyj * wzj)
        j_ = jnp.concatenate([red_j(dwxj * wyj * wzj) * sc[None],
                              red_j(wxj * dwyj * wzj) * sc[None],
                              red_j(wxj * wyj * dwzj) * sc[None]], 0)
        return jnp.sum(f_ * ct_f) + jnp.sum(j_ * ct_j)

    g_k = jax.grad(loss_k)(g)
    g_x = jax.grad(loss_x)(g)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=1e-4, atol=1e-4)
