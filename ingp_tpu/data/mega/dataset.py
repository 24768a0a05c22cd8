"""Mega-NeRF dataset — port of datasets/mega_nerf/dataset.py.

Frame-windowed in-memory loading with the mega-nerf -> OpenCV axis remap
(dataset.py:36-52), centered poses, and an interpolated render path;
plus the FilesystemDataset factory for out-of-core training.
Metadata is stored as torch .pt files (torch cpu is available here).
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ...core.rays import (get_ray_directions, get_rays,
                          generate_interpolated_path)
from ..base import BaseDataset
from .image_metadata import ImageMetadata


def _load_pt(path):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    return {k: (v.numpy() if hasattr(v, "numpy") else v)
            for k, v in obj.items()}


def get_metadata_item(metadata_path: Path, image_index: int,
                      scale_factor: int, is_val: bool) -> ImageMetadata:
    """dataset.py:186-212."""
    image_path = None
    for ext in (".jpg", ".JPG", ".png", ".PNG"):
        cand = metadata_path.parent.parent / "rgbs" / \
            f"{metadata_path.stem}{ext}"
        if cand.exists():
            image_path = cand
            break
    assert image_path is not None and image_path.exists()
    meta = _load_pt(metadata_path)
    return ImageMetadata(image_path, meta["c2w"],
                         meta["W"] // scale_factor,
                         meta["H"] // scale_factor,
                         np.asarray(meta["intrinsics"]) / scale_factor,
                         image_index, None, is_val)


def _collect(train_paths, val_paths, scale_factor):
    image_indices = {p.name: i
                     for i, p in enumerate(train_paths + val_paths)}
    train = [get_metadata_item(p, image_indices[p.name], scale_factor,
                               True) for p in train_paths]
    val = [get_metadata_item(p, image_indices[p.name], scale_factor, True)
           for p in val_paths]
    return train, val


def get_image_metadata(dataset_path, scale_factor=1, train_every=20):
    """dataset.py:130-155."""
    dataset_path = Path(dataset_path)
    cand = sorted((dataset_path / "train" / "metadata").iterdir())
    train_paths = [cand[i] for i in range(0, len(cand), train_every)]
    val_paths = sorted((dataset_path / "val" / "metadata").iterdir())
    train_paths.sort(key=lambda x: x.name)
    return _collect(train_paths, val_paths, scale_factor)


def get_image_metadata_partial(dataset_path, start, end, scale_factor=1):
    """Frame-windowed variant (dataset.py:157-185)."""
    dataset_path = Path(dataset_path)
    cand = sorted((dataset_path / "train" / "metadata").iterdir())
    start_id, end_id = 0, len(cand)
    for i, p in enumerate(cand):
        if "{:0>6d}".format(start) in p.name:
            start_id = i
        if "{:0>6d}".format(end) in p.name:
            end_id = i + 1
    train_paths = cand[start_id:end_id]
    val_paths = sorted((dataset_path / "val" / "metadata").iterdir())
    return _collect(train_paths, val_paths, scale_factor)


# mega-nerf poses are x:right y:up z:back; remap to OpenCV
# (dataset.py:36-52)
_ROT = np.array([[0, 1, 0], [1, 0, 0], [0, 0, -1]], np.float32)


class MegaDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=0.25,
                 train_every=6, **kwargs):
        super().__init__(root_dir, split, downsample)
        scale_factor = int(1 / downsample)
        start = kwargs.get("mega_frame_start", 0)
        end = kwargs.get("mega_frame_end", 10)
        train_items, val_items = get_image_metadata_partial(
            root_dir, start=start, end=end, scale_factor=scale_factor)
        items = train_items

        item = items[0]
        h, w = item.H, item.W
        self.img_wh = (w, h)
        fx, fy, sx, sy = item.intrinsics[:4]
        self.K = np.float32([[fx, 0, sx], [0, fy, sy], [0, 0, 1]])
        self.directions = get_ray_directions(
            h, w, self.K,
            anti_aliasing_factor=kwargs.get("anti_aliasing_factor", 1.0))

        poses, rays = [], []
        for item in items:
            img = item.load_image() / 255.0
            rays.append(img.reshape(-1, 3).astype(np.float32))
            c2w = item.c2w
            c2w = np.concatenate([-c2w[:, 1:2], c2w[:, 0:1], c2w[:, 2:]],
                                 -1)
            c2w = np.concatenate(
                [_ROT @ c2w[:3, :3] @ np.linalg.inv(_ROT),
                 _ROT @ c2w[:3, 3:]], -1)
            poses.append(c2w)
        poses = np.stack(poses).astype(np.float32)
        poses[:, :, -1] -= poses[:, :, -1].mean(0, keepdims=True)

        self.poses = poses
        self.rays = np.stack(rays)
        render_poses = generate_interpolated_path(poses, n_interp=4)
        self.render_traj_rays = self.get_path_rays(render_poses)

    def get_path_rays(self, c2w_list):
        rays = {}
        for idx in range(len(c2w_list)):
            c2w = np.asarray(c2w_list[idx][:3], np.float32)
            rays_o, rays_d = get_rays(self.directions, c2w)
            rays[idx] = np.concatenate([np.asarray(rays_o),
                                        np.asarray(rays_d)], 1)
        return rays


def load_filesystem_dataset(dataset_path, near=1.0, far=1e5,
                            ray_altitude_range=None, center_pixels=True,
                            chunk_paths=None, num_chunks=200,
                            scale_factor=1, disk_flush_size=10_000_000,
                            split="train"):
    """dataset.py:97-128: the out-of-core entry point."""
    from .filesystem_dataset import FilesystemDataset
    train_items, val_items = get_image_metadata(
        dataset_path, scale_factor=scale_factor)
    items = train_items if split == "train" else val_items
    coord = _load_pt(Path(dataset_path) / "coordinates.pt")
    pose_scale_factor = coord["pose_scale_factor"]
    return FilesystemDataset(
        items, near / pose_scale_factor, far / pose_scale_factor,
        ray_altitude_range, center_pixels,
        [Path(x) for x in sorted(chunk_paths)], num_chunks, scale_factor,
        disk_flush_size)
