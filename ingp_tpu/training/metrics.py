"""Image metrics: MSE / PSNR / SSIM in pure jnp.

Replaces metrics.py + the torchmetrics PSNR/SSIM usage (train.py:91-93,
377-386). SSIM follows the standard Wang et al. formulation with the
torchmetrics defaults (gaussian kernel 11, sigma 1.5, data_range=1,
k1=0.01, k2=0.03).

LPIPS (train.py:94-97) needs pretrained VGG weights; `lpips()` raises a
clear error when they are unavailable in the environment (zero-egress) —
callers gate on `--eval_lpips` exactly like the reference.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def mse(image_pred, image_gt):
    return jnp.mean((image_pred - image_gt) ** 2)


def psnr(image_pred, image_gt, data_range=1.0):
    return -10.0 * jnp.log10(mse(image_pred, image_gt) / data_range ** 2)


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), dtype=jnp.float32)


def ssim(img0, img1, data_range=1.0, kernel_size=11, sigma=1.5,
         k1=0.01, k2=0.03):
    """SSIM over (H, W, C) images, mean over pixels & channels."""
    kern = _gaussian_kernel(kernel_size, sigma)[None, None]   # (1,1,k,k)

    def filt(x):
        # x: (H, W, C) -> depthwise gaussian blur, valid padding
        x = jnp.transpose(x, (2, 0, 1))[:, None]              # (C,1,H,W)
        y = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST)
        return y[:, 0]                                         # (C,H',W')

    mu0, mu1 = filt(img0), filt(img1)
    s00 = filt(img0 * img0) - mu0 * mu0
    s11 = filt(img1 * img1) - mu1 * mu1
    s01 = filt(img0 * img1) - mu0 * mu1
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mu0 * mu1 + c1) * (2 * s01 + c2)
    den = (mu0 ** 2 + mu1 ** 2 + c1) * (s00 + s11 + c2)
    return jnp.mean(num / den)


def lpips(img0, img1, weights_path=None, params=None):
    """LPIPS perceptual metric (AlexNet variant, training/lpips.py).

    Needs exported weights (`python -m ingp_tpu.utils.export_lpips` on
    an online machine) — raises with guidance when absent; the CLI
    rejects --eval_lpips without --lpips_weights at parse time."""
    from .lpips import load_lpips, lpips as lpips_fn
    if params is None:
        if not weights_path:
            raise RuntimeError(
                "LPIPS needs pretrained weights which cannot be "
                "downloaded in a zero-egress environment. Export them "
                "once with `python -m ingp_tpu.utils.export_lpips "
                "lpips_alex.npz` on an online machine and pass "
                "--lpips_weights lpips_alex.npz.")
        params = load_lpips(weights_path)
    return lpips_fn(params, jnp.asarray(img0), jnp.asarray(img1))
