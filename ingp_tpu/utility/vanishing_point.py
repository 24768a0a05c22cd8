"""Vertical vanishing-point / up-vector estimation (port of
utility/vanishing_point.py).

The reference depends on lu_vp_detect; this implementation detects line
segments with OpenCV's LSD, RANSACs the vertical vanishing point from
near-vertical segments, and back-projects it through the intrinsics to a
world up direction.
"""
from __future__ import annotations

import numpy as np
import cv2


def detect_line_segments(gray):
    """(N, 4) line segments (x1, y1, x2, y2)."""
    lsd = cv2.createLineSegmentDetector()
    lines = lsd.detect(gray)[0]
    if lines is None:
        return np.zeros((0, 4), np.float32)
    return lines.reshape(-1, 4)


def _homog_lines(segs):
    """Segments -> homogeneous line coefficients via cross product."""
    p1 = np.concatenate([segs[:, :2], np.ones((len(segs), 1))], 1)
    p2 = np.concatenate([segs[:, 2:], np.ones((len(segs), 1))], 1)
    lines = np.cross(p1, p2)
    return lines / np.linalg.norm(lines[:, :2], axis=1, keepdims=True)


def estimate_vertical_vp(image, angle_tol_deg=25.0, n_iters=500,
                         inlier_tol=2.0, seed=0):
    """RANSAC the vertical vanishing point from near-vertical segments.

    Returns (vp (3,) homogeneous, inlier count) or (None, 0).
    """
    gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY) \
        if image.ndim == 3 else image
    segs = detect_line_segments(gray)
    if len(segs) < 2:
        return None, 0
    d = segs[:, 2:] - segs[:, :2]
    ang = np.abs(np.degrees(np.arctan2(d[:, 0], d[:, 1])))
    vertical = np.minimum(ang, 180 - ang) < angle_tol_deg
    segs = segs[vertical]
    if len(segs) < 2:
        return None, 0
    lines = _homog_lines(segs)

    rng = np.random.default_rng(seed)
    best_vp, best_count = None, 0
    for _ in range(n_iters):
        i, j = rng.choice(len(lines), 2, replace=False)
        vp = np.cross(lines[i], lines[j])
        if abs(vp[2]) < 1e-9 and np.linalg.norm(vp[:2]) < 1e-6:
            continue
        # point-line distance in image space (normalized lines)
        denom = vp[2] if abs(vp[2]) > 1e-9 else 1e-9
        err = np.abs(lines @ vp) / abs(denom)
        count = int((err < inlier_tol).sum())
        if count > best_count:
            best_count, best_vp = count, vp
    return best_vp, best_count


def estimate_up_vector(image, K):
    """Up direction in camera frame from the vertical vanishing point:
    up = normalize(K^-1 @ vp) with sign fixed to point screen-up."""
    vp, count = estimate_vertical_vp(image)
    if vp is None:
        return None
    ray = np.linalg.inv(K) @ vp
    n = np.linalg.norm(ray)
    if n < 1e-9:
        return None
    up = ray / n
    if up[1] > 0:  # OpenCV y axis points down
        up = -up
    return up.astype(np.float32)
