"""Poisson (gradient-domain) image blending — port of
utility/poisson_blend.py, vectorized sparse build instead of the
reference's per-pixel Python loops."""
from __future__ import annotations

import numpy as np
import scipy.sparse
import scipy.sparse.linalg


def poisson_blending(img_src, mask_tblr, img_tar, pos_xy):
    """Blend img_src[mask region] into img_tar at pos_xy by matching
    source gradients with target boundary conditions.

    mask_tblr: (x_min, x_max, y_min, y_max) region in img_src.
    pos_xy: top-left placement in img_tar. Returns blended img_tar copy.
    """
    x_min, x_max, y_min, y_max = mask_tblr
    h, w = x_max - x_min, y_max - y_min
    pos_x, pos_y = pos_xy
    n = h * w
    idx = np.arange(n).reshape(h, w)

    out = img_tar.astype(np.float64).copy()
    src = img_src.astype(np.float64)

    # 4-neighbor Laplacian with Dirichlet boundary from the target
    A = scipy.sparse.lil_matrix((n, n))
    A.setdiag(4.0)
    for c in range(img_src.shape[2]):
        s = src[x_min:x_max, y_min:y_max, c]
        lap = 4 * s
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            lap -= np.roll(np.pad(s, 1, mode="edge"), (dx, dy),
                           (0, 1))[1:-1, 1:-1]
        b = lap.reshape(-1)
        if c == 0:
            rows, cols, vals = [], [], []
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                xs, ys = np.meshgrid(np.arange(h), np.arange(w),
                                     indexing="ij")
                nx, ny = xs + dx, ys + dy
                interior = (nx >= 0) & (nx < h) & (ny >= 0) & (ny < w)
                rows.append(idx[xs[interior], ys[interior]])
                cols.append(idx[nx[interior], ny[interior]])
                vals.append(-np.ones(interior.sum()))
            A = scipy.sparse.coo_matrix(
                (np.concatenate([vals[0], vals[1], vals[2], vals[3],
                                 np.full(n, 4.0)]),
                 (np.concatenate(rows + [idx.reshape(-1)]),
                  np.concatenate(cols + [idx.reshape(-1)]))),
                shape=(n, n)).tocsr()
        # boundary contributions from the target image
        tar = out[:, :, c]
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            xs, ys = np.meshgrid(np.arange(h), np.arange(w),
                                 indexing="ij")
            nx, ny = xs + dx, ys + dy
            boundary = (nx < 0) | (nx >= h) | (ny < 0) | (ny >= w)
            bx = np.clip(pos_x + nx[boundary], 0, out.shape[0] - 1)
            by = np.clip(pos_y + ny[boundary], 0, out.shape[1] - 1)
            np.add.at(b, idx[xs[boundary], ys[boundary]], tar[bx, by])

        sol = scipy.sparse.linalg.spsolve(A, b).reshape(h, w)
        out[pos_x:pos_x + h, pos_y:pos_y + w, c] = sol
    return np.clip(out, 0, 1) if img_tar.max() <= 1.0 \
        else np.clip(out, 0, 255)
