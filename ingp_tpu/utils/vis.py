"""Visualization helpers (port of train.py:59-79, utils.py:84-95)."""
from __future__ import annotations

import numpy as np
import cv2
from PIL import Image


def depth2img(depth, scale=16):
    """Depth map -> TURBO colormap BGR image (train.py:59-65)."""
    depth = np.clip(np.asarray(depth) / scale, 0.0, 1.0)
    return cv2.applyColorMap((depth * 255).astype(np.uint8),
                             cv2.COLORMAP_TURBO)


def mask2img(mask):
    """train.py:67-71."""
    return cv2.applyColorMap((np.asarray(mask) * 255).astype(np.uint8),
                             cv2.COLORMAP_BONE)


def semantic2img(sem_label, classes):
    """train.py:73-79."""
    level = 1.0 / (classes - 1)
    sem_color = level * np.asarray(sem_label)
    return cv2.applyColorMap((sem_color * 255).astype(np.uint8),
                             cv2.COLORMAP_TURBO)


def save_image(image, path):
    """utils.py:84-90."""
    image = np.clip(np.asarray(image), 0.0, 1.0)
    Image.fromarray((image * 255).astype(np.uint8)).save(path)


def convert_normal(normal, pose_c2w):
    """World -> camera-frame normals (utils.py:92-95)."""
    R_w2c = np.asarray(pose_c2w)[:3, :3].T
    return np.asarray(normal) @ R_w2c.T
