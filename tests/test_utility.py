"""Tests for preprocessing utilities and aux components."""
import numpy as np

from ingp_tpu.utility.fit_plane import Plane, plane_lse, plane_ransac
from ingp_tpu.utility.poisson_blend import poisson_blending
from ingp_tpu.data.snow import SnowSeed
from ingp_tpu.utils.frame_embedding import FrameEmbedding


def test_plane_lse_recovers_plane():
    rng = np.random.default_rng(0)
    normal = np.array([0.0, 1.0, 0.0])
    pts = rng.normal(size=(200, 3))
    pts[:, 1] = 2.0 + 0.001 * rng.normal(size=200)  # y ~= 2 plane
    n, d = plane_lse(pts)
    s = np.sign(n[1])
    n, d = n * s, d * s
    np.testing.assert_allclose(np.abs(n @ normal), 1.0, atol=1e-3)
    np.testing.assert_allclose(-d / n[1], 2.0, atol=0.01)


def test_plane_ransac_rejects_outliers():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, (300, 3))
    pts[:200, 2] = 0.5  # inlier plane z=0.5
    plane, inliers = plane_ransac(pts, threshold=0.02)
    assert inliers[:200].mean() > 0.95
    n = plane.normal * np.sign(plane.normal[2])
    np.testing.assert_allclose(np.abs(n[2]), 1.0, atol=0.02)
    assert plane.mean_absolute_error(pts[:200]) < 0.01


def test_poisson_blend_constant_region():
    # blending a flat source into a flat target must stay flat and match
    # the target boundary value (gradients are zero)
    src = np.full((20, 20, 3), 0.8)
    tar = np.full((30, 30, 3), 0.2)
    out = poisson_blending(src, (5, 15, 5, 15), tar, (10, 10))
    np.testing.assert_allclose(out[12:18, 12:18], 0.2, atol=1e-6)
    assert out.shape == tar.shape


def test_snow_seed_sampler():
    seed = SnowSeed(up=[0, 1, 0], height=1.0, R=np.eye(3),
                    interval=0.1, range_=1.0)
    rng = np.random.default_rng(0)
    b = seed.sample_batch(rng, 16)
    assert b["rays_o"].shape == (16, 3)
    np.testing.assert_allclose(b["rays_d"], [[0, -1, 0]] * 16)
    np.testing.assert_allclose(b["rays_o"][:, 1], 1.0)  # on the plane


def test_frame_embedding_modes():
    rng = np.random.default_rng(0)
    table = rng.normal(size=(10, 4)).astype(np.float32)
    poses = np.zeros((10, 3, 4), np.float32)
    poses[:, :, 3] = rng.normal(size=(10, 3))
    fe = FrameEmbedding(table, poses)
    np.testing.assert_allclose(fe(3, mode="index")[0], table[3])
    # nearest: query exactly at pose 5
    q = poses[5]
    np.testing.assert_allclose(fe(q, mode="nearest")[0], table[5])
    mean_emb = fe(q, mode="mean")[0]
    # mean of the 2 nearest includes table[5]
    d = np.sum((poses[:, :, 3] - q[:, 3]) ** 2, 1)
    two = np.argsort(d)[:2]
    np.testing.assert_allclose(mean_emb, table[two].mean(0), atol=1e-6)


def test_ocean_wave_spectrum_and_synthesis():
    """Ocean-wave playground parity (utility/test_dynamic.py): the
    spectrum peaks at finite k, phases advance by omega(k)*t, and the
    batched synthesis returns finite displacement fields whose t=0
    frame matches a single-frame evaluation."""
    import jax
    import jax.numpy as jnp
    from ingp_tpu.utility import ocean_wave as ow

    res, size = 64, 100.0
    spec = np.asarray(ow.init_spectrum(jnp.array([10.0, 10.0]),
                                       resolution=res, size=size))
    assert spec.shape == (res, res)
    assert np.all(np.isfinite(spec)) and spec.max() > 0
    # dispersion: omega grows like sqrt(g k) for small k
    k = np.array([0.01, 1.0, 10.0])
    np.testing.assert_allclose(np.asarray(ow.dispersion(k[:2])),
                               np.sqrt(9.81 * k[:2] * (1 + (k[:2]/370)**2)),
                               rtol=1e-6)

    h0, h0_star, phase0 = ow.seed_field(jax.random.key(0), spec)
    np.testing.assert_allclose(np.asarray(h0_star),
                               np.asarray(h0)[::-1, ::-1])

    times = jnp.array([0.0, 0.5, 1.0])
    disp = np.asarray(ow.synthesize(h0, h0_star, phase0, times,
                                    amplitude=1e4, resolution=res,
                                    size=size))
    assert disp.shape == (3, res, res, 3)
    assert np.all(np.isfinite(disp))
    # frames genuinely evolve in time
    assert np.abs(disp[0] - disp[1]).max() > 0
    # t=0 batch frame == the single-frame path
    single = np.asarray(ow.synthesize(h0, h0_star, phase0,
                                      jnp.array([0.0]), amplitude=1e4,
                                      resolution=res, size=size))[0]
    np.testing.assert_allclose(disp[0], single, atol=1e-5)
    # phase evolution is mod-2pi
    ph = np.asarray(ow.evolve_phase(phase0, 2.0, resolution=res,
                                    size=size))
    assert ph.min() >= 0 and ph.max() < 2 * np.pi + 1e-6


def test_debug_store_roundtrip():
    """Reference global_var parity (models/global_var.py): init keys,
    set/get, and in-jit recording via jax.debug.callback."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ingp_tpu.utils import debug_store

    debug_store.init()
    assert debug_store.get_value("log_dL_dsigmas").shape == (1,)
    debug_store.set_value("x", 3)
    assert debug_store.get_value("x") == 3

    @jax.jit
    def f(v):
        jax.debug.callback(debug_store.record("grad_probe"), v * 2)
        return v + 1

    f(jnp.ones(4)).block_until_ready()
    np.testing.assert_allclose(
        np.asarray(debug_store.get_value("grad_probe")), 2 * np.ones(4))
