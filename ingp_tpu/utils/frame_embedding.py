"""Appearance-embedding sampler for novel views (utils.py:97-143).

Given the trained per-image embedding table and the training poses,
pick the embedding for an arbitrary render pose by index / nearest
training camera / mean of the 2 nearest cameras.
"""
from __future__ import annotations

import numpy as np


class FrameEmbedding:
    def __init__(self, embedding_table, poses):
        """embedding_table: (N_imgs, L); poses: (N_imgs, 3, 4)."""
        self.table = np.asarray(embedding_table)
        self.poses = np.asarray(poses)

    def __call__(self, x, mode="index"):
        if mode == "index":
            return self.sample_index(x)
        if mode == "nearest":
            return self.sample_nearest(x)
        if mode == "mean":
            return self.sample_mean(x)
        raise ValueError(f"Invalid mode: {mode}")

    def sample_index(self, index):
        return self.table[np.atleast_1d(index)]

    def _dists(self, pose):
        frames_t = self.poses[:, :3, -1]
        t = np.asarray(pose)[:3, -1]
        return np.sum((frames_t - t) ** 2, axis=1)

    def sample_nearest(self, pose):
        return self.table[np.argmin(self._dists(pose))][None]

    def sample_mean(self, pose):
        idx = np.argsort(self._dists(pose))[:2]
        return np.mean(self.table[idx], axis=0, keepdims=True)
