"""Oracle renderer components: sample_pdf, stratified_z."""
import numpy as np
import jax
import jax.numpy as jnp

from ingp_tpu.models.oracle import sample_pdf, stratified_z


def test_sample_pdf_concentrates_on_peaked_weights():
    R, M = 4, 16
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, M + 1), (R, M + 1))
    w = np.full((R, M), 1e-6, np.float32)
    w[:, 10] = 1.0  # all mass in bin 10: [0.625, 0.6875]
    s = sample_pdf(jax.random.PRNGKey(0), bins, jnp.asarray(w), 64,
                   det=True)
    s = np.asarray(s)
    frac_inside = ((s >= 0.625 - 1e-3) & (s <= 0.6875 + 1e-3)).mean()
    assert frac_inside > 0.9


def test_sample_pdf_uniform_weights_spread():
    R, M = 2, 8
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, M + 1), (R, M + 1))
    w = jnp.ones((R, M))
    s = np.asarray(sample_pdf(jax.random.PRNGKey(0), bins, w, 128,
                              det=True))
    assert np.all(np.diff(s, axis=-1) >= -1e-6)  # monotone
    np.testing.assert_allclose(s.mean(), 0.5, atol=0.05)


def test_stratified_z_bounds_and_perturb():
    t1 = jnp.asarray([0.5, 1.0])
    t2 = jnp.asarray([2.0, 3.0])
    z = np.asarray(stratified_z(jax.random.PRNGKey(0), t1, t2, 32,
                                perturb=False))
    assert z.shape == (2, 32)
    np.testing.assert_allclose(z[:, 0], [0.5, 1.0], rtol=1e-6)
    np.testing.assert_allclose(z[:, -1], [2.0, 3.0], rtol=1e-6)
    zp = np.asarray(stratified_z(jax.random.PRNGKey(1), t1, t2, 32,
                                 perturb=True))
    assert np.all(np.diff(zp, axis=-1) > 0)
    assert np.all((zp >= 0.49) & (zp <= 3.01))
    # exponential warp is denser near t1
    zw = np.asarray(stratified_z(jax.random.PRNGKey(0), t1, t2, 32,
                                 perturb=False, exp_warp=True))
    d_first = zw[:, 1] - zw[:, 0]
    d_last = zw[:, -1] - zw[:, -2]
    assert np.all(d_first < d_last)
