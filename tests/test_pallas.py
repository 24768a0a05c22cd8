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
