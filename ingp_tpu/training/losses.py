"""Training losses — jnp port of losses.py (NeRFLoss) with identical
weights and term definitions.

Reference loss weights (losses.py:75-87):
  opacity entropy 2e-4, distortion 3e-4, mono-depth 1, mono-normal 1e-3,
  Ref-NeRF Rp/Ro 1e-3, sky-depth 1e-1, semantic CE 4e-2,
  transient-mask anneal Exponential(max=1, min=6e-2, k=1e-3).

Each term is returned per-element exactly like the reference dict; the
trainer reduces every entry with mean() before summing (train.py:300-307).
Masked terms (semantic ignore_index=256, depth validity) use where-masks
so everything stays static-shaped under jit.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossConfig:
    lambda_opa: float = 2e-4
    lambda_distortion: float = 3e-4
    lambda_depth_mono: float = 1.0
    lambda_normal_mono: float = 1e-3
    lambda_normal_ref_rp: float = 1e-3
    lambda_normal_ref_ro: float = 1e-3
    lambda_sky: float = 1e-1
    lambda_semantic: float = 4e-2
    # ExponentialAnnealingWeight(max=1, min=6e-2, k=1e-3), losses.py:85
    anneal_max: float = 1.0
    anneal_min: float = 6e-2
    anneal_k: float = 1e-3
    # which optional terms are active (train-system flags)
    embed_msk: bool = False
    normal_ref: bool = False
    normal_mono: bool = False
    semantic: bool = False
    depth_mono: bool = False
    sky_class: int = 4          # losses.py:122
    semantic_ignore: int = 256  # losses.py:87
    depth_scale: float = 1.0    # kwargs['scale'] in losses.py:131
    # global density sparsity prior (not in the reference; DVGO-style).
    # The fixed-capacity sample budget leaves density beyond each ray's
    # kept prefix unsupervised; a small mean-sigma penalty on uniform
    # points carves that fog so the budget reaches real surfaces.
    lambda_sparsity: float = 0.0


def annealing_weight(cfg: LossConfig, step):
    """losses.py:60-69."""
    return jnp.maximum(cfg.anneal_min,
                       cfg.anneal_max * jnp.exp(-step * cfg.anneal_k))


def mask_regularize(mask, size_delta, digit_delta):
    """losses.py:142-151."""
    loss_focus_size = jnp.mean(mask ** 2) * size_delta
    loss_focus_digit = jnp.mean(1.0 / ((mask - 0.5) ** 2 + 0.02)) \
        * digit_delta
    return loss_focus_size, loss_focus_digit


def compute_scale_and_shift(prediction, target, weight):
    """Least-squares scale/shift aligning mono-depth (losses.py:7-30),
    with an explicit weight mask instead of boolean indexing."""
    a_00 = jnp.sum(weight * prediction * prediction)
    a_01 = jnp.sum(weight * prediction)
    a_11 = jnp.sum(weight)
    b_0 = jnp.sum(weight * prediction * target)
    b_1 = jnp.sum(weight * target)
    det = a_00 * a_11 - a_01 * a_01
    ok = det != 0
    safe_det = jnp.where(ok, det, 1.0)
    x_0 = jnp.where(ok, (a_11 * b_0 - a_01 * b_1) / safe_det, 0.0)
    x_1 = jnp.where(ok, (-a_01 * b_0 + a_00 * b_1) / safe_det, 0.0)
    return x_0, x_1


def _normalize(v, eps=1e-6):
    """Smooth normalize v/sqrt(|v|^2 + eps^2) — same values as
    F.normalize away from zero but with a BOUNDED backward. The
    max(|v|, eps) form amplifies cotangents by 1/eps near |v|=0
    (rays with zero composited weight give exactly-zero normals);
    through the stream compositor's long scan transposes those
    amplified cotangents accumulate to f32 inf and Adam turns inf
    grads into NaN params. Mirrors models/ngp.py _safe_normalize."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(n2 + eps * eps)


def compute_losses(cfg: LossConfig, results, target, step=0, mask=None):
    """Build the per-term loss dict (NeRFLoss.forward, losses.py:89-140).

    Args:
      results: render_rays output (rgb/opacity/depth/ws/distortion/Ro/Rp/
        normal_pred/semantic).
      target: batch dict with 'rgb' and optional 'label'/'depth'/'normal'.
      step: global step (mask-weight annealing).
      mask: (R, 1) transient mask from the implicit mask model.

    Returns dict of per-element terms; reduce with mean() + sum.
    """
    d = {}

    if cfg.embed_msk:
        r_ms, _ = mask_regularize(mask, annealing_weight(cfg, step), 0.0)
        d["r_ms"] = r_ms
        d["rgb"] = (1.0 - mask) * (results["rgb"] - target["rgb"]) ** 2
    else:
        d["rgb"] = (results["rgb"] - target["rgb"]) ** 2

    o = results["opacity"] + 1e-10
    d["opacity"] = cfg.lambda_opa * (-o * jnp.log(o))

    if cfg.lambda_distortion > 0:
        d["distortion"] = cfg.lambda_distortion * results["distortion"]

    if cfg.normal_ref:
        d["normal_ref_rp"] = cfg.lambda_normal_ref_rp * results["Rp"]
        d["normal_ref_ro"] = cfg.lambda_normal_ref_ro * results["Ro"]

    if cfg.normal_mono:
        normal_pred = _normalize(results["normal_pred"])
        normal_gt = _normalize(target["normal"])
        l1 = jnp.abs(normal_pred - normal_gt)
        cos = -(normal_pred * normal_gt)
        d["normal_mono"] = cfg.lambda_normal_mono * (l1 + 0.1 * cos)

    if cfg.semantic:
        # the reference feeds composited softmax *probabilities* into
        # nn.CrossEntropyLoss (losses.py:121) — i.e. log_softmax over
        # probs; replicate that exactly
        label = target["label"].astype(jnp.int32)
        logp = jax.nn.log_softmax(results["semantic"], axis=-1)
        valid = label != cfg.semantic_ignore
        safe = jnp.clip(label, 0, results["semantic"].shape[-1] - 1)
        ce = -jnp.take_along_axis(logp, safe[:, None], -1)[:, 0]
        n_valid = jnp.maximum(jnp.sum(valid), 1)
        d["CELoss"] = cfg.lambda_semantic \
            * jnp.sum(jnp.where(valid, ce, 0.0)) / n_valid
        sky_mask = (label == cfg.sky_class).astype(jnp.float32)
        d["sky_depth"] = cfg.lambda_sky * sky_mask \
            * jnp.exp(-results["depth"])

    if cfg.lambda_sparsity > 0 and "sparsity" in results:
        d["sparsity"] = cfg.lambda_sparsity * results["sparsity"]

    if cfg.depth_mono:
        depth_2d = target["depth"] / 25.0                 # losses.py:126
        weight = (depth_2d > 0).astype(jnp.float32)
        pred = jax.lax.stop_gradient(results["depth"])
        scale, shift = compute_scale_and_shift(pred, depth_2d, weight)
        atten = jnp.exp(-pred / cfg.depth_scale)
        d["depth_mono"] = weight * cfg.lambda_depth_mono * atten \
            * (scale * results["depth"] + shift - depth_2d) ** 2

    return d


def total_loss(loss_dict):
    """Reduce each per-element term with mean then sum (train.py:300-307)."""
    return sum(jnp.mean(v) for v in loss_dict.values())
