"""Offline trajectory rendering — port of render.py (render_for_test).

Loads a (slim) checkpoint, rebuilds the model, renders every test pose or
a precomputed trajectory in chunks, writes per-frame rgb/depth/normal/
semantic PNGs and assembles mp4 videos (render.py:50-218). Appearance
embeddings for novel poses come from FrameEmbedding 'mean' mode
(render.py:92-93, 137-139).
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..models.rendering import render_rays_test
from ..training.trainer import NeRFSystem
from ..utils.vis import depth2img, semantic2img, save_image, convert_normal
from ..utils.frame_embedding import FrameEmbedding


def render_chunks(model_cfg, render_cfg, params, bitfield, rays_o, rays_d,
                  chunk_size=131072, embedding_a=None, block_table=None):
    """Chunked test render of arbitrary ray arrays (render.py:33-48)."""
    n = rays_o.shape[0]
    outs = []
    for i in range(0, n, chunk_size):
        sl = slice(i, min(i + chunk_size, n))
        ro = jnp.asarray(rays_o[sl])
        rd = jnp.asarray(rays_d[sl])
        pad = 0
        if ro.shape[0] < chunk_size and i > 0:
            pad = chunk_size - ro.shape[0]
            ro = jnp.concatenate([ro, ro[-1:].repeat(pad, 0)])
            rd = jnp.concatenate([rd, rd[-1:].repeat(pad, 0)])
        emb = None
        if embedding_a is not None:
            emb = jnp.broadcast_to(jnp.asarray(embedding_a),
                                   (ro.shape[0], embedding_a.shape[-1]))
        res = render_rays_test(model_cfg, render_cfg, params, bitfield,
                               ro, rd, embedding_a=emb,
                               block_table=block_table)
        if pad:
            res = {k: (v[:-pad] if hasattr(v, "ndim") and v.ndim >= 1
                       and v.shape[0] == ro.shape[0] else v)
                   for k, v in res.items()}
        outs.append(res)
    merged = {}
    for k in outs[0]:
        if k == "total_samples":
            merged[k] = sum(int(o[k]) for o in outs)
        else:
            merged[k] = np.concatenate([np.asarray(o[k]) for o in outs], 0)
    return merged


def render_for_test(hparams, split="test", system=None):
    """Full offline render pass (render.py:50-218). Returns output dir."""
    if system is None:
        system = NeRFSystem(hparams)
        ckpt_dir = os.path.join("ckpts", hparams.dataset_name,
                                hparams.exp_name)
        for name in ("last", "last_slim"):
            p = os.path.join(ckpt_dir, name)
            if os.path.exists(p):
                system.load(p)
                break
    model_cfg = system.model_cfg
    render_cfg = system.render_cfg_test
    params = system.params["model"]
    bitfield = system.grid["bitfield"]
    block_table = system._march_table()
    dataset = system.test_dataset
    w, h = dataset.img_wh

    frame_emb = None
    if hparams.embed_a:
        frame_emb = FrameEmbedding(np.asarray(system.params["embedding_a"]),
                                   np.asarray(system.train_dataset.poses))

    out_dir = os.path.join("results", hparams.dataset_name,
                           hparams.exp_name)
    os.makedirs(out_dir, exist_ok=True)

    traj = getattr(dataset, "render_traj_rays", None) \
        if getattr(hparams, "render_traj", False) else None
    n_frames = len(traj) if traj is not None else len(dataset.poses)

    # anti-aliasing: directions were upscaled by the loader
    # (ray_utils.py:8-47); render at high res, then resize down
    aa = getattr(hparams, "anti_aliasing_factor", 1.0)
    rh, rw = int(h * aa), int(w * aa)

    frames = {"rgb": [], "depth": [], "normal": [], "semantic": []}
    for i in range(n_frames):
        if traj is not None:
            rays = traj[i]
            rays_o, rays_d = rays[:, :3], rays[:, 3:6]
            pose = None
        else:
            from ..core.rays import get_rays
            pose = dataset.poses[i]
            rays_o, rays_d = get_rays(jnp.asarray(dataset.directions),
                                      jnp.asarray(pose))
        emb = None
        if frame_emb is not None:
            emb = frame_emb(pose if pose is not None
                            else system.train_dataset.poses[0],
                            mode="mean")
        res = render_chunks(model_cfg, render_cfg, params, bitfield,
                            np.asarray(rays_o), np.asarray(rays_d),
                            hparams.chunk_size, embedding_a=emb,
                            block_table=block_table)

        if aa > 1.0:
            import cv2
            for k in ("rgb", "depth", "normal_pred", "semantic"):
                if k in res:
                    img = res[k].reshape(
                        (rh, rw) + res[k].shape[1:]).astype(np.float32)
                    interp = cv2.INTER_NEAREST if k == "semantic" \
                        else cv2.INTER_AREA
                    res[k] = cv2.resize(img, (w, h),
                                        interpolation=interp
                                        ).reshape(h * w, -1).squeeze()

        rgb = np.clip(res["rgb"].reshape(h, w, 3), 0, 1)
        if getattr(hparams, "render_rgb", True):
            save_image(rgb, os.path.join(out_dir, f"{i:05d}_rgb.png"))
            frames["rgb"].append((rgb * 255).astype(np.uint8))
        if getattr(hparams, "render_depth", False):
            dimg = depth2img(res["depth"].reshape(h, w),
                             scale=2 * hparams.scale)[..., ::-1]
            save_image(dimg / 255.0,
                       os.path.join(out_dir, f"{i:05d}_depth.png"))
            frames["depth"].append(dimg)
        if getattr(hparams, "render_normal", False):
            nrm = res["normal_pred"].reshape(h, w, 3)
            if pose is not None:
                nrm = convert_normal(nrm, pose)
            nimg = np.clip((nrm + 1) / 2, 0, 1)
            save_image(nimg, os.path.join(out_dir, f"{i:05d}_normal.png"))
            frames["normal"].append((nimg * 255).astype(np.uint8))
        if getattr(hparams, "render_semantic", False):
            simg = semantic2img(res["semantic"].reshape(h, w),
                                hparams.num_classes)[..., ::-1]
            save_image(simg / 255.0,
                       os.path.join(out_dir, f"{i:05d}_semantic.png"))
            frames["semantic"].append(simg)

    if not getattr(hparams, "no_save_test", False):
        _write_videos(out_dir, frames)
    return out_dir


def _write_videos(out_dir, frames, fps=30):
    import imageio.v2 as imageio
    for name, imgs in frames.items():
        if len(imgs) > 1:
            try:
                imageio.mimwrite(os.path.join(out_dir, f"{name}.mp4"),
                                 imgs, fps=fps)
            except Exception as e:  # codec may be missing headlessly
                print(f"video write skipped ({name}): {e}")
