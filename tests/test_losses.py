"""Loss-term unit tests vs hand-computed values (losses.py parity)."""
import numpy as np
import jax.numpy as jnp

from ingp_tpu.training.losses import (LossConfig, compute_losses,
                                      total_loss, compute_scale_and_shift,
                                      annealing_weight, mask_regularize)


def _base_results(R=8):
    rng = np.random.default_rng(0)
    return {
        "rgb": jnp.asarray(rng.random((R, 3)).astype(np.float32)),
        "opacity": jnp.asarray(rng.random(R).astype(np.float32)),
        "depth": jnp.asarray(rng.random(R).astype(np.float32) * 3),
        "distortion": jnp.asarray(rng.random(R).astype(np.float32)),
        "Rp": jnp.asarray(rng.random((R, 3)).astype(np.float32)),
        "Ro": jnp.asarray(rng.random(R).astype(np.float32)),
        "normal_pred": jnp.asarray(rng.random((R, 3)).astype(np.float32)),
        "semantic": jnp.asarray(rng.random((R, 5)).astype(np.float32)),
    }


def test_rgb_and_opacity_terms():
    cfg = LossConfig()
    res = _base_results()
    tgt = {"rgb": res["rgb"] * 0.5}
    d = compute_losses(cfg, res, tgt)
    np.testing.assert_allclose(np.asarray(d["rgb"]),
                               np.asarray((res["rgb"] * 0.5) ** 2),
                               rtol=1e-6)
    o = np.asarray(res["opacity"]) + 1e-10
    np.testing.assert_allclose(np.asarray(d["opacity"]),
                               2e-4 * (-o * np.log(o)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d["distortion"]),
                               3e-4 * np.asarray(res["distortion"]),
                               rtol=1e-6)
    assert np.isfinite(float(total_loss(d)))


def test_semantic_ce_on_probs_quirk():
    # reference feeds composited PROBABILITIES to CrossEntropyLoss
    # (losses.py:121) => log_softmax over probs, not raw CE
    cfg = LossConfig(semantic=True, sky_class=4)
    res = _base_results()
    label = np.array([0, 1, 2, 256, 4, 4, 3, 0])  # 256 = ignore
    d = compute_losses(cfg, res, {"rgb": res["rgb"],
                                  "label": jnp.asarray(label)})
    probs = np.asarray(res["semantic"])
    logp = probs - probs.max(-1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    valid = label != 256
    want = -logp[np.arange(8)[valid], label[valid]].mean() * 4e-2
    np.testing.assert_allclose(float(d["CELoss"]), want, rtol=1e-5)
    # sky-depth applies only to sky-class (4) pixels
    sky = (label == 4).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(d["sky_depth"]),
        1e-1 * sky * np.exp(-np.asarray(res["depth"])), rtol=1e-5)


def test_depth_mono_scale_shift():
    # perfectly affine-related depths -> loss ~ 0
    cfg = LossConfig(depth_mono=True)
    res = _base_results()
    pred = np.asarray(res["depth"])
    target_depth = (2.0 * pred + 1.0) * 25.0  # losses.py:126 divides by 25
    d = compute_losses(cfg, res, {"rgb": res["rgb"],
                                  "depth": jnp.asarray(target_depth)})
    assert float(jnp.mean(d["depth_mono"])) < 1e-8


def test_compute_scale_and_shift():
    pred = jnp.asarray(np.linspace(0, 1, 50, dtype=np.float32))
    target = 3.0 * pred + 0.5
    w = jnp.ones(50)
    s, t = compute_scale_and_shift(pred, target, w)
    np.testing.assert_allclose(float(s), 3.0, rtol=1e-5)
    np.testing.assert_allclose(float(t), 0.5, atol=1e-5)
    # all-masked -> det==0 -> zeros, no NaN
    s0, t0 = compute_scale_and_shift(pred, target, jnp.zeros(50))
    assert float(s0) == 0.0 and float(t0) == 0.0


def test_normal_mono_term():
    cfg = LossConfig(normal_mono=True)
    res = _base_results()
    # identical normals: l1 = 0, cos = -1 per component
    tgt = {"rgb": res["rgb"], "normal": res["normal_pred"]}
    d = compute_losses(cfg, res, tgt)
    n = np.asarray(res["normal_pred"])
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(d["normal_mono"]),
                               1e-3 * 0.1 * (-(n * n)), atol=1e-6)


def test_annealing_and_mask_regularizer():
    cfg = LossConfig()
    assert float(annealing_weight(cfg, 0)) == 1.0
    assert abs(float(annealing_weight(cfg, 1000))
               - max(6e-2, np.exp(-1.0))) < 1e-6
    assert abs(float(annealing_weight(cfg, 10 ** 7)) - 6e-2) < 1e-7
    m = jnp.full((10, 1), 0.5)
    size_l, digit_l = mask_regularize(m, 2.0, 3.0)
    np.testing.assert_allclose(float(size_l), 2.0 * 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(digit_l), 3.0 / 0.02, rtol=1e-6)


def test_embed_msk_weighted_rgb():
    cfg = LossConfig(embed_msk=True)
    res = _base_results()
    mask = jnp.full((8, 1), 0.25)
    d = compute_losses(cfg, res, {"rgb": res["rgb"] * 0.0}, step=0,
                       mask=mask)
    np.testing.assert_allclose(np.asarray(d["rgb"]),
                               0.75 * np.asarray(res["rgb"]) ** 2,
                               rtol=1e-6)
    assert "r_ms" in d
