"""Equirectangular panorama rendering — port of render_panorama.py.

Builds a longitude/latitude direction grid around a scene point, renders
one big batch, and writes rgb / opacity / inpaint-mask outputs
(render_panorama.py:63-136). `sample_panorama` is the inverse lookup
(directions -> panorama pixels, render_panorama.py:21-61), in NumPy with
bilinear sampling.

Note: the reference reads pano flags (pano_hw, v_forward/down/right,
pano_radius) that opt.py never defines (SURVEY.md quirks) — here they are
explicit function arguments with sane defaults.
"""
from __future__ import annotations

import os

import numpy as np

from .offline import render_chunks


def panorama_directions(H, W, v_forward, v_down, v_right):
    """(H*W, 3) unit directions of an equirect grid
    (render_panorama.py:99-106)."""
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    thetas = ((u - W / 2 + 0.5) * 2 * np.pi / W).reshape(-1, 1)
    phis = ((v - H / 2 + 0.5) * np.pi / H).reshape(-1, 1)
    d = (np.sin(phis) * v_down[None]
         + np.cos(phis) * np.sin(thetas) * v_right[None]
         + np.cos(phis) * np.cos(thetas) * v_forward[None])
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)
            ).astype(np.float32)


def render_panorama(model_cfg, render_cfg, params, bitfield, out_dir,
                    pano_hw=(512, 1024), origin=(0.0, 0.0, 0.0),
                    v_forward=(0, 0, 1.0), v_down=(0, 1.0, 0),
                    v_right=(1.0, 0, 0), pano_radius=0.0,
                    chunk_size=131072, embedding_a=None):
    """Render and save panorama rgb/opacity/mask. Returns result dict."""
    H, W = pano_hw
    fwd = np.asarray(v_forward, np.float32)
    down = np.asarray(v_down, np.float32)
    right = np.asarray(v_right, np.float32)
    rays_d = panorama_directions(H, W, fwd, down, right)
    rays_o = np.broadcast_to(np.asarray(origin, np.float32),
                             rays_d.shape).copy()
    rays_o += rays_d * pano_radius  # start off-center (panorama.py:115)

    res = render_chunks(model_cfg, render_cfg, params, bitfield,
                        rays_o, rays_d, chunk_size,
                        embedding_a=embedding_a)

    rgb = np.clip(res["rgb"].reshape(H, W, 3), 0, 1)
    opacity = res["opacity"].reshape(H, W)
    mask = (opacity < 0.5).astype(np.uint8) * 255  # inpaint mask

    import imageio.v2 as imageio
    for sub, img in [("rgb", (rgb * 255).astype(np.uint8)),
                     ("opacity", (opacity * 255).astype(np.uint8)),
                     ("mask", mask)]:
        d = os.path.join(out_dir, "panorama", sub)
        os.makedirs(d, exist_ok=True)
        imageio.imsave(os.path.join(d, "0.png"), img)
    return {"rgb": rgb, "opacity": opacity, "mask": mask,
            "directions": rays_d}


def sample_panorama(directions, panorama, v_forward, v_down, v_right):
    """Inverse lookup: directions (n,3) -> bilinear panorama samples
    (n,c) (render_panorama.py:21-61, grid_sample align_corners=True)."""
    d = np.asarray(directions, np.float64)
    d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    basis = np.stack([v_forward, v_right, v_down]).astype(np.float64)
    x, y, z = (d @ basis.T).T
    thetas = np.arctan(np.divide(y, x, out=np.zeros_like(y),
                                 where=x != 0))
    thetas[(x < 0) & (y > 0)] += np.pi
    thetas[(x < 0) & (y < 0)] -= np.pi
    phis = np.arcsin(np.clip(z, -1, 1))

    H, W, C = panorama.shape
    # grid_sample align_corners=True: u in [-1,1] -> [0, W-1]
    u = thetas / np.pi
    v = phis * 2 / np.pi
    fx = (u + 1) / 2 * (W - 1)
    fy = (v + 1) / 2 * (H - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, W - 1)
    y0 = np.clip(np.floor(fy).astype(int), 0, H - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    wx = fx - x0
    wy = fy - y0
    p = panorama
    out = (p[y0, x0] * ((1 - wx) * (1 - wy))[:, None]
           + p[y0, x1] * (wx * (1 - wy))[:, None]
           + p[y1, x0] * ((1 - wx) * wy)[:, None]
           + p[y1, x1] * (wx * wy)[:, None])
    return out.astype(panorama.dtype)
