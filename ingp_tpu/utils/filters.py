"""Box / guided image filters (port of utils.py:44-82), NumPy+cv2."""
from __future__ import annotations

import numpy as np
import cv2


def box_filter(image, r):
    """(h, w) mean filter with window 2r+1, reflect padding."""
    k = 2 * r + 1
    return cv2.blur(np.asarray(image, np.float32), (k, k),
                    borderType=cv2.BORDER_REFLECT)


def guided_filter(image_p, image_i, r, eps=0.1):
    """He et al. guided filter: smooth image_p guided by image_i."""
    p = np.asarray(image_p, np.float32)
    i = np.asarray(image_i, np.float32)
    mean_p = box_filter(p, r)
    mean_i = box_filter(i, r)
    corr_ip = box_filter(i * p, r)
    corr_ii = box_filter(i * i, r)
    var_i = corr_ii - mean_i * mean_i
    cov_ip = corr_ip - mean_i * mean_p
    a = cov_ip / (var_i + eps ** 2)
    b = mean_p - a * mean_i
    return box_filter(a, r) * i + box_filter(b, r)
