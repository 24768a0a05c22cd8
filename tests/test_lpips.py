"""LPIPS metric (training/lpips.py) — compute path + weights plumbing.

The pretrained values need the exported .npz (zero-egress here), so
these tests exercise the full AlexNet-tap computation with random
weights of the production shapes, the npz round trip, and the CLI's
loud parse-time failure (reference bar: train.py:94-97)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ingp_tpu.training.lpips import (lpips, load_lpips,
                                     random_lpips_params, EXPECTED_KEYS)


@pytest.fixture(scope="module")
def params():
    return random_lpips_params(jax.random.PRNGKey(0))


def _img(seed, hw=64):
    return jnp.asarray(
        np.random.default_rng(seed).random((hw, hw, 3)), jnp.float32)


def test_identical_images_zero(params):
    a = _img(0)
    assert float(lpips(params, a, a)) == pytest.approx(0.0, abs=1e-6)


def test_different_images_positive_and_symmetric(params):
    a, b = _img(1), _img(2)
    d_ab = float(lpips(params, a, b))
    d_ba = float(lpips(params, b, a))
    assert d_ab > 0
    assert d_ab == pytest.approx(d_ba, rel=1e-5)


def test_monotone_in_perturbation(params):
    a = _img(3)
    n = jnp.asarray(np.random.default_rng(4).normal(size=a.shape),
                    jnp.float32)
    d_small = float(lpips(params, a, jnp.clip(a + 0.02 * n, 0, 1)))
    d_big = float(lpips(params, a, jnp.clip(a + 0.3 * n, 0, 1)))
    assert d_big > d_small > 0


def test_batched_matches_loop(params):
    a = jnp.stack([_img(5), _img(6)])
    b = jnp.stack([_img(7), _img(8)])
    batched = np.asarray(lpips(params, a, b))
    single = [float(lpips(params, a[i], b[i])) for i in range(2)]
    np.testing.assert_allclose(batched, single, rtol=1e-5)


def test_npz_round_trip(params, tmp_path):
    path = tmp_path / "w.npz"
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
    loaded = load_lpips(path)
    assert set(loaded) == set(EXPECTED_KEYS)
    a, b = _img(9), _img(10)
    np.testing.assert_allclose(float(lpips(loaded, a, b)),
                               float(lpips(params, a, b)), rtol=1e-6)


def test_bad_npz_rejected(tmp_path):
    path = tmp_path / "bad.npz"
    np.savez(path, foo=np.zeros(3))
    with pytest.raises(ValueError, match="export_lpips"):
        load_lpips(path)


def test_cli_parse_time_error(tmp_path):
    from ingp_tpu.training.config import get_opts
    with pytest.raises(SystemExit):
        get_opts(["--eval_lpips"])  # no weights -> loud failure
    # with a valid file it parses
    path = tmp_path / "w.npz"
    p = random_lpips_params(jax.random.PRNGKey(1))
    np.savez(path, **{k: np.asarray(v) for k, v in p.items()})
    args = get_opts(["--eval_lpips", "--lpips_weights", str(path)])
    assert args.eval_lpips and args.lpips_weights == str(path)


def test_validate_reports_lpips(tmp_path):
    from types import SimpleNamespace
    from ingp_tpu.training.trainer import NeRFSystem
    from ingp_tpu.data.synthetic import SyntheticDataset

    path = tmp_path / "w.npz"
    p = random_lpips_params(jax.random.PRNGKey(2))
    np.savez(path, **{k: np.asarray(v) for k, v in p.items()})

    h = SimpleNamespace(
        dataset_name="synthetic", root_dir="", split="train",
        downsample=1.0, scale=0.5, use_skybox=False, use_exposure=False,
        embed_a=False, embed_a_len=4, embed_msk=False, num_classes=4,
        batch_size=128, ray_sampling_strategy="all_images", num_epochs=1,
        normal_epochs=0, steps_per_epoch=10, lr=1e-2,
        density_threshold=1e-2, depth_mono=False, normal_mono=False,
        normal_ref=False, optimize_ext=False, random_bg=False,
        render_semantic=False, chunk_size=1024, seed=0, ckpt_load=None,
        compute_dtype="float32", capacity=16, march_iters=64,
        samples_per_ray=8, grid_size=32, density_L=2, density_F=2,
        density_log2T=10, rgb_L=2, rgb_F=2, rgb_log2T=10,
        eval_lpips=True, lpips_weights=str(path))
    tr = SyntheticDataset(split="train", img_size=32, n_train=2)
    te = SyntheticDataset(split="test", img_size=32, n_test=1)
    system = NeRFSystem(h, tr, te)
    m = system.validate()
    assert "lpips" in m and np.isfinite(m["lpips"]) and m["lpips"] >= 0
