"""LPIPS perceptual metric (AlexNet variant) in JAX.

TPU-native port of the reference's eval-time LPIPS
(train.py:94-97 `self.val_lpips = LearnedPerceptualImagePatchSimilarity
('alex')`; metrics.py). The torchmetrics/lpips packages pull pretrained
weights from the network at import time; this module instead loads a
self-contained `.npz` produced once, on any online machine, by

    python -m ingp_tpu.utils.export_lpips lpips_alex.npz

and evaluates the same computation in JAX:

  1. scale inputs from [0,1] to [-1,1], normalize by the LPIPS
     shift/scale buffers,
  2. AlexNet feature trunk (5 conv stages), tapping each post-ReLU map,
  3. channel-unit-normalize each tap, squared difference,
  4. 1x1 non-negative linear head per tap, spatial mean, sum over taps.

No network access is ever attempted here; a missing weights file is a
loud error at CLI parse time (training/config.py), never a silent no-op.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# AlexNet feature trunk: (out_c, kernel, stride, pad, maxpool_before)
_ALEX = (
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
)

EXPECTED_KEYS = tuple(
    [f"conv{i}_w" for i in range(5)] + [f"conv{i}_b" for i in range(5)]
    + [f"lin{i}" for i in range(5)] + ["shift", "scale"])


def load_lpips(path):
    """Load exported LPIPS weights (.npz) into a jnp pytree."""
    raw = np.load(path)
    missing = [k for k in EXPECTED_KEYS if k not in raw]
    if missing:
        raise ValueError(
            f"{path} is not an exported LPIPS weights file "
            f"(missing {missing}); create one with "
            "`python -m ingp_tpu.utils.export_lpips`")
    return {k: jnp.asarray(raw[k], jnp.float32) for k in EXPECTED_KEYS}


def _features(params, x):
    """AlexNet taps. x: (N, H, W, 3) in [-1, 1] pre-normalized."""
    taps = []
    for i, (_, _, stride, pad, pool_before) in enumerate(_ALEX):
        if pool_before:
            x = -jax.lax.reduce_window(
                -x, jnp.inf, jax.lax.min, (1, 3, 3, 1), (1, 2, 2, 1),
                "VALID")
        w = params[f"conv{i}_w"]          # (kh, kw, cin, cout) HWIO
        b = params[f"conv{i}_b"]
        x = jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + b)
        taps.append(x)
    return taps


def _unit_norm(f, eps=1e-10):
    return f / jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True) + eps)


@jax.jit
def lpips(params, img0, img1):
    """LPIPS distance between (..., H, W, 3) images in [0, 1].

    Returns a scalar for a single image pair or (N,) for batches.
    """
    if img0.ndim == 3:
        img0, img1 = img0[None], img1[None]
        squeeze = True
    else:
        squeeze = False
    shift = params["shift"].reshape(1, 1, 1, 3)
    scale = params["scale"].reshape(1, 1, 1, 3)

    def norm_in(im):
        return ((2.0 * im - 1.0) - shift) / scale

    taps0 = _features(params, norm_in(img0.astype(jnp.float32)))
    taps1 = _features(params, norm_in(img1.astype(jnp.float32)))
    total = 0.0
    for i, (f0, f1) in enumerate(zip(taps0, taps1)):
        d = (_unit_norm(f0) - _unit_norm(f1)) ** 2       # (N, h, w, C)
        lin = jnp.maximum(params[f"lin{i}"].reshape(-1), 0.0)  # (C,)
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total[0] if squeeze else total


def random_lpips_params(key, seed_scale=0.1):
    """Random weights with the production shapes — for tests and for
    exercising the compute path without the pretrained file."""
    params = {}
    cin = 3
    for i, (cout, k, _, _, _) in enumerate(_ALEX):
        key, k1, k2 = jax.random.split(key, 3)
        params[f"conv{i}_w"] = seed_scale * jax.random.normal(
            k1, (k, k, cin, cout))
        params[f"conv{i}_b"] = jnp.zeros((cout,))
        key, k3 = jax.random.split(key)
        params[f"lin{i}"] = jnp.abs(
            seed_scale * jax.random.normal(k3, (cout,)))
        cin = cout
    params["shift"] = jnp.asarray([-0.030, -0.088, -0.188])
    params["scale"] = jnp.asarray([0.458, 0.448, 0.450])
    return params
