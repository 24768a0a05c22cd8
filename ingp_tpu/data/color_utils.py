"""Image / normal / semantic IO (port of datasets/color_utils.py)."""
from __future__ import annotations

import numpy as np
import cv2
import imageio.v2 as imageio


def srgb_to_linear(img):
    limit = 0.04045
    return np.where(img > limit, ((img + 0.055) / 1.055) ** 2.4,
                    img / 12.92)


def linear_to_srgb(img):
    limit = 0.0031308
    img = np.where(img > limit, 1.055 * img ** (1 / 2.4) - 0.055,
                   12.92 * img)
    return np.minimum(img, 1.0)  # "clamp" tonemapper


def read_image(img_path, img_wh):
    """RGB(A) image -> (h*w, 3) float32, alpha blended to white
    (color_utils.py:19-29)."""
    img = imageio.imread(img_path).astype(np.float32) / 255.0
    if img.ndim == 3 and img.shape[2] == 4:
        img = img[..., :3] * img[..., -1:] + (1 - img[..., -1:])
    img = cv2.resize(img, tuple(img_wh))
    return img.reshape(-1, img.shape[-1]).astype(np.float32)


def read_normal(norm_path, norm_wh):
    """Normal map -> ((h*w, 3) unit normals, (h*w,) up-mask)
    (color_utils.py:43-66): [0,1] -> [-1,1], flip y/z, mask = cos(up)>0.5."""
    norm = imageio.imread(norm_path).astype(np.float32) / 255.0
    if norm.ndim == 3 and norm.shape[2] == 4:
        norm = norm[..., :3] * norm[..., -1:] + (1 - norm[..., -1:])
    norm = cv2.resize(norm, tuple(norm_wh))
    norm = norm.reshape(-1, 3) + 1e-6
    norm = norm * 2.0 - 1.0
    norm[:, 1:] = -norm[:, 1:]
    norm = norm / np.linalg.norm(norm, axis=-1, keepdims=True)
    up_cos = norm[:, 1]
    norm_up = (up_cos > 0.5).astype(np.float32)
    return norm.astype(np.float32), norm_up


def read_normal_up(img_path, img_wh):
    """Binary up-facing mask image -> (h*w,) (color_utils.py:31-41)."""
    img = imageio.imread(img_path).astype(np.float32) / 255.0
    img = cv2.resize(img, tuple(img_wh))
    return (img.reshape(-1) > 0).astype(np.float32)


def read_semantic(sem_path, sem_wh, classes=7):
    """Semantic .pgm -> (h*w,) int labels (color_utils.py:68-75)."""
    label = imageio.imread(sem_path)
    label = cv2.resize(label.astype(np.uint16), tuple(sem_wh),
                       interpolation=cv2.INTER_NEAREST)
    return label.reshape(-1).astype(np.int64)
