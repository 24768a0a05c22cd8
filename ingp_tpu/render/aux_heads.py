"""Auxiliary render passes: semantic pseudo-labels and up-normal masks.

Working TPU equivalents of the reference's render_semantic.py (dumps
semantic .pgm pseudo-labels for train+test poses) and
render_normal_mask.py (up-facing-surface masks from composited normals
vs. the dataset up vector). Both reference scripts are stale/broken
(missing modules & undefined flags — SURVEY.md quirks); these re-create
the intended behavior on the live model.
"""
from __future__ import annotations

import os

import numpy as np

from ..core.rays import get_rays
from .offline import render_chunks


def render_semantic_labels(model_cfg, render_cfg, params, bitfield,
                           dataset, out_dir, chunk_size=131072,
                           embedding_a=None):
    """Render per-pose semantic label maps into out_dir/semantic_pred/
    *.pgm (render_semantic.py behavior)."""
    import imageio.v2 as imageio
    import jax.numpy as jnp
    w, h = dataset.img_wh
    d = os.path.join(out_dir, "semantic_pred")
    os.makedirs(d, exist_ok=True)
    for i in range(len(dataset.poses)):
        rays_o, rays_d = get_rays(jnp.asarray(dataset.directions),
                                  jnp.asarray(dataset.poses[i]))
        res = render_chunks(model_cfg, render_cfg, params, bitfield,
                            np.asarray(rays_o), np.asarray(rays_d),
                            chunk_size, embedding_a=embedding_a)
        label = res["semantic"].reshape(h, w).astype(np.uint8)
        imageio.imsave(os.path.join(d, f"{i:05d}.pgm"), label)
    return d


def render_up_normal_masks(model_cfg, render_cfg, params, bitfield,
                           dataset, up, out_dir, chunk_size=131072,
                           cos_threshold=0.5, embedding_a=None):
    """Up-facing-surface masks weighted by cos(angle to up)
    (render_normal_mask.py:69-86): mask = 255*cos where
    cos(normal, up) > 0.5 and the composited normal is nonzero."""
    import imageio.v2 as imageio
    import jax.numpy as jnp
    w, h = dataset.img_wh
    up = np.asarray(up, np.float32)
    up = up / np.linalg.norm(up)
    d = os.path.join(out_dir, "normal_up")
    os.makedirs(d, exist_ok=True)
    for i in range(len(dataset.poses)):
        rays_o, rays_d = get_rays(jnp.asarray(dataset.directions),
                                  jnp.asarray(dataset.poses[i]))
        res = render_chunks(model_cfg, render_cfg, params, bitfield,
                            np.asarray(rays_o), np.asarray(rays_d),
                            chunk_size, embedding_a=embedding_a)
        normal = res["normal_pred"].reshape(-1, 3)
        nrm = np.linalg.norm(normal, axis=-1, keepdims=True)
        valid = (nrm != 0)[:, 0]
        cos = (normal @ up) / np.maximum(nrm[:, 0], 1e-6)
        near_up = (cos > cos_threshold) & valid
        mask = (near_up * cos * 255).clip(0, 255).reshape(h, w)
        imageio.imsave(os.path.join(d, f"msk_{i:05d}.pgm"),
                       mask.astype(np.uint8))
    return d
