"""Lazy per-image metadata/IO (port of mega_nerf/image_metadata.py)."""
from __future__ import annotations

import numpy as np
from PIL import Image


class ImageMetadata:
    def __init__(self, image_path, c2w, W, H, intrinsics, image_index,
                 mask_path=None, is_val=False):
        self.image_path = image_path
        self.c2w = np.asarray(c2w, np.float32)
        self.W = int(W)
        self.H = int(H)
        self.intrinsics = np.asarray(intrinsics, np.float32)
        self.image_index = image_index
        self._mask_path = mask_path
        self.is_val = is_val

    def load_image(self):
        """(H, W, 3) float32 in [0, 255]."""
        rgbs = Image.open(self.image_path).convert("RGB")
        if rgbs.size != (self.W, self.H):
            rgbs = rgbs.resize((self.W, self.H), Image.LANCZOS)
        return np.asarray(rgbs, np.float32)

    def load_mask(self):
        if self._mask_path is None:
            return None
        import torch
        from zipfile import ZipFile
        with ZipFile(self._mask_path) as zf:
            with zf.open(self._mask_path.name) as f:
                keep = torch.load(f, map_location="cpu").numpy()
        if keep.shape[:2] != (self.H, self.W):
            import cv2
            keep = cv2.resize(keep.astype(np.uint8), (self.W, self.H),
                              interpolation=cv2.INTER_NEAREST).astype(bool)
        return keep
