"""Base dataset: ray/pixel batch sampling with fixed shapes.

Port of datasets/base.py. The reference emits complete batches from
__getitem__ under a torch DataLoader with batch_size=None (train.py:255-266);
here the dataset is a plain NumPy container with an explicit
`sample_batch(rng)` for training (host-side, feeding the jitted step) and
`test_item(idx)` for whole-image eval. Loaders populate:

  rays:   (N_images, h*w, 3or4) float32 rgb (+exposure)
  poses:  (N_images, 3, 4) float32 c2w
  directions: (h*w, 3) camera-space dirs; K: (3,3); img_wh: (w, h)
  optional labels / depths_2d / normals arrays (same leading dims)
"""
from __future__ import annotations

import numpy as np


class BaseDataset:
    def __init__(self, root_dir, split="train", downsample=1.0):
        self.root_dir = root_dir
        self.split = split
        self.downsample = downsample
        self.rays = np.zeros((0, 0, 3), np.float32)
        self.poses = np.zeros((0, 3, 4), np.float32)
        self.batch_size = 8192
        self.ray_sampling_strategy = "all_images"

    def __len__(self):
        if self.split.startswith("train"):
            return 1000  # pseudo-epoch length (base.py:17-20)
        return len(self.poses)

    @property
    def n_images(self):
        return len(self.poses)

    def sample_batch(self, rng: np.random.Generator, batch_size=None,
                     strategy=None):
        """One training batch of (img_idxs, pix_idxs, rgb, ...) —
        base.py:22-50. Fixed shapes: every array has batch_size rows."""
        bs = batch_size or self.batch_size
        strategy = strategy or self.ray_sampling_strategy
        if strategy == "all_images":
            img_idxs = rng.integers(0, len(self.poses), bs)
        elif strategy == "same_image":
            img_idxs = np.full(bs, rng.integers(0, len(self.poses)),
                               np.int64)
        else:
            raise ValueError(f"unknown strategy {strategy}")
        w, h = self.img_wh
        pix_idxs = rng.integers(0, w * h, bs)
        rays = self.rays[img_idxs, pix_idxs]
        # NOTE: the reference computes u=pix//w, v=pix%w (base.py:36-38) —
        # swapped names, but the mask model only needs consistency
        u = pix_idxs // w
        v = pix_idxs % w
        sample = {
            "img_idxs": img_idxs.astype(np.int32),
            "pix_idxs": pix_idxs.astype(np.int32),
            "uv": np.stack([u, v], -1).astype(np.float32),
            "rgb": rays[:, :3],
        }
        if hasattr(self, "labels"):
            sample["label"] = self.labels[img_idxs, pix_idxs]
        if hasattr(self, "depths_2d"):
            sample["depth"] = self.depths_2d[img_idxs, pix_idxs]
        if hasattr(self, "normals"):
            sample["normal"] = self.normals[img_idxs, pix_idxs]
        if self.rays.shape[-1] == 4:  # HDR-NeRF
            sample["exposure"] = rays[:, 3:]
        return sample

    def test_item(self, idx):
        """Whole-image sample for evaluation (base.py:51-64)."""
        sample = {"pose": self.poses[idx], "img_idxs": idx}
        if len(self.rays) > 0:
            rays = self.rays[idx]
            sample["rgb"] = rays[:, :3]
            if hasattr(self, "labels"):
                sample["label"] = self.labels[idx]
            if hasattr(self, "depths_2d"):
                sample["depth"] = self.depths_2d[idx]
            if rays.shape[1] == 4:
                sample["exposure"] = rays[0, 3]
        return sample
