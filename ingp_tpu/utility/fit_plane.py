"""3D plane fitting: least squares + RANSAC (port of
utility/fit_plane.py)."""
from __future__ import annotations

import numpy as np


class Plane:
    """ax + by + cz + d = 0, kept as (unit normal, center)."""

    def __init__(self, params=(1, 1, 1, 1)):
        a, b, c, d = params
        normal = np.array([a, b, c], np.float64)
        norm = np.linalg.norm(normal)
        self.normal = normal / norm
        self.center = (-d / norm) * self.normal

    def move_by_distance(self, d):
        self.center = self.center + self.normal * d

    def square_error(self, points):
        diff = (points - self.center) @ self.normal
        return diff ** 2

    def mean_square_error(self, points):
        return float(np.mean(self.square_error(points)))

    def absolute_error(self, points):
        return np.abs((points - self.center) @ self.normal)

    def mean_absolute_error(self, points):
        return float(np.mean(self.absolute_error(points)))


def plane_lse(points):
    """Least-squares plane through points (n, 3) -> (normal, d)."""
    centroid = points.mean(0)
    centered = points - centroid
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    normal = vt[-1]
    d = -normal @ centroid
    return normal, d


def plane_ransac(points, n_iters=200, threshold=0.01, seed=0):
    """RANSAC plane fit. Returns (Plane, inlier mask)."""
    rng = np.random.default_rng(seed)
    best_inliers = None
    best_count = -1
    n = len(points)
    for _ in range(n_iters):
        idx = rng.choice(n, 3, replace=False)
        p0, p1, p2 = points[idx]
        normal = np.cross(p1 - p0, p2 - p0)
        norm = np.linalg.norm(normal)
        if norm < 1e-12:
            continue
        normal = normal / norm
        dist = np.abs((points - p0) @ normal)
        inliers = dist < threshold
        count = int(inliers.sum())
        if count > best_count:
            best_count = count
            best_inliers = inliers
    normal, d = plane_lse(points[best_inliers])
    return Plane((normal[0], normal[1], normal[2], d)), best_inliers
