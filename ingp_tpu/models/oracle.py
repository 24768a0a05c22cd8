"""Dense-sampling oracle renderer (no occupancy grid, no compaction).

Port of the reference's pure-PyTorch "noCUDA" path — the XLA-friendly
oracle it uses to validate the CUDA kernels (models/rendering_noCUDA.py,
models/custom_functions.py:248-321). Serves the same role here: a simple,
obviously-correct renderer used by the test pyramid as the numerical
reference for the march+compact+composite fast path, and as the milestone-1
end-to-end training path.

  - z values: stratified in [t1, t2] with optional exponential warp
    (rendering_noCUDA.py:134-149)
  - sample_pdf: hierarchical CDF resampling (custom_functions.py:248-278)
  - raw2outputs-style compositing reuses ops/composite (same math as the
    cumprod compositing of custom_functions.py:280-321)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.intersect import ray_aabb_intersect
from ..ops.composite import composite_rays
from .ngp import NGPConfig, ngp_forward
from .rendering import clamp_near


def stratified_z(key, t1, t2, n_samples: int, perturb: bool,
                 exp_warp: bool = False):
    """(R,) near/far -> (R, N) sample depths (rendering_noCUDA.py:134-149)."""
    R = t1.shape[0]
    u = jnp.linspace(0.0, 1.0, n_samples)
    u = jnp.broadcast_to(u, (R, n_samples))
    if perturb:
        mids = 0.5 * (u[:, 1:] + u[:, :-1])
        upper = jnp.concatenate([mids, u[:, -1:]], -1)
        lower = jnp.concatenate([u[:, :1], mids], -1)
        rnd = jax.random.uniform(key, (R, n_samples))
        u = lower + (upper - lower) * rnd
    if exp_warp:
        # denser near the camera: z = t1 * (t2/t1)^u
        safe_t1 = jnp.maximum(t1, 1e-4)[:, None]
        return safe_t1 * (t2[:, None] / safe_t1) ** u
    return t1[:, None] + (t2 - t1)[:, None] * u


def sample_pdf(key, bins, weights, n_importance: int, det: bool = False):
    """Hierarchical inverse-CDF sampling (custom_functions.py:248-278).

    bins: (R, M+1) bin edges; weights: (R, M). Returns (R, n_importance).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], -1)  # (R, M+1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_importance)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_importance,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_importance,))

    idx = jax.vmap(jnp.searchsorted, (0, 0))(cdf, u)
    below = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(idx, 0, cdf.shape[-1] - 1)

    cdf_b = jnp.take_along_axis(cdf, below, -1)
    cdf_a = jnp.take_along_axis(cdf, above, -1)
    bin_b = jnp.take_along_axis(bins, jnp.clip(below, 0, bins.shape[-1] - 1),
                                -1)
    bin_a = jnp.take_along_axis(bins, jnp.clip(above, 0, bins.shape[-1] - 1),
                                -1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bin_b + t * (bin_a - bin_b)


@partial(jax.jit, static_argnames=("model_cfg", "n_samples", "perturb",
                                   "exp_warp"))
def render_rays_oracle(model_cfg: NGPConfig, params, rays_o, rays_d, key,
                       n_samples: int = 256, perturb: bool = False,
                       exp_warp: bool = False, embedding_a=None):
    """Dense stratified render of R rays. Returns composite dict."""
    R = rays_o.shape[0]
    hits = clamp_near(ray_aabb_intersect(
        rays_o, rays_d, jnp.zeros(3), jnp.full((3,), model_cfg.scale)))
    t1, t2 = hits[:, 0], hits[:, 1]
    hit = t1 >= 0

    z = stratified_z(key, jnp.where(hit, t1, 0.0), jnp.where(hit, t2, 1.0),
                     n_samples, perturb, exp_warp)          # (R, N)
    deltas = jnp.diff(z, axis=-1)
    deltas = jnp.concatenate([deltas, deltas[:, -1:]], -1)

    xyz = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyz.shape)
    emb = None
    if embedding_a is not None:
        emb = jnp.broadcast_to(embedding_a[:, None, :],
                               (R, n_samples, embedding_a.shape[-1])
                               ).reshape(R * n_samples, -1)

    sigmas, rgbs, nraw, npred, sems = ngp_forward(
        model_cfg, params, xyz.reshape(-1, 3), dirs.reshape(-1, 3),
        embedding_a=emb)

    valid = jnp.broadcast_to(hit[:, None], (R, n_samples))
    # composite_rays takes channel-major (C, R, S) per-sample arrays
    cm = lambda a: jnp.moveaxis(a.reshape(R, n_samples, -1), -1, 0)
    out = composite_rays(sigmas.reshape(R, n_samples), cm(rgbs),
                         deltas, z, valid, 0.0,
                         normals_pred=cm(npred), normals_raw=cm(nraw),
                         sems=cm(sems))
    out["ts"] = z
    out["deltas"] = deltas
    return out
