"""Mesh extraction from the density field — port of extract_mesh.py.

The reference probes a dense density grid and runs skimage's marching
cubes (extract_mesh.py:84-112). skimage isn't in this environment, so the
isosurface is extracted with *marching tetrahedra* (each cell split into
6 tetrahedra; 16 trivially-enumerable cases, no 256-entry tables) —
fully vectorized NumPy, equivalent surface up to triangulation.
"""
from __future__ import annotations

import numpy as np

# the 6 tetrahedra of a cube (indices into the 8 cube corners, which are
# ordered (x, y, z) bit-wise: corner i = (i&1, (i>>1)&1, (i>>2)&1))
_TETS = np.array([
    [0, 5, 1, 3],
    [0, 5, 3, 7],
    [0, 5, 7, 4],
    [0, 7, 3, 2],
    [0, 7, 2, 6],
    [0, 7, 6, 4],
])

_CORNERS = np.array([[i & 1, (i >> 1) & 1, (i >> 2) & 1]
                     for i in range(8)], dtype=np.int64)


def _tet_triangles(inside):
    """For one tet-occupancy pattern (4 bools) list triangles as triples
    of cut edges (pairs of local vertex ids)."""
    idx = [i for i in range(4) if inside[i]]
    out = [i for i in range(4) if not inside[i]]
    if len(idx) == 0 or len(idx) == 4:
        return []
    if len(idx) == 1:
        a = idx[0]
        e = [(a, b) for b in out]
        return [(e[0], e[1], e[2])]
    if len(idx) == 3:
        a = out[0]
        e = [(b, a) for b in idx]
        return [(e[0], e[2], e[1])]
    # two in, two out -> quad = two triangles
    a, b = idx
    c, d = out
    return [((a, c), (b, c), (b, d)), ((a, c), (b, d), (a, d))]


_CASES = [_tet_triangles([(i >> k) & 1 for k in range(4)])
          for i in range(16)]


def marching_cubes(volume, level):
    """Isosurface of a (X, Y, Z) scalar volume via marching tetrahedra.

    Returns (vertices (V, 3) in voxel coords, faces (F, 3) int). Vertex
    positions are linearly interpolated to the isolevel crossing.
    """
    vol = np.asarray(volume, np.float64)
    X, Y, Z = vol.shape
    # cell origins
    ox, oy, oz = np.meshgrid(np.arange(X - 1), np.arange(Y - 1),
                             np.arange(Z - 1), indexing="ij")
    cells = np.stack([ox, oy, oz], -1).reshape(-1, 3)       # (C, 3)
    corner_pos = cells[:, None, :] + _CORNERS[None]          # (C, 8, 3)
    vals = vol[corner_pos[..., 0], corner_pos[..., 1],
               corner_pos[..., 2]]                           # (C, 8)

    verts, faces = [], []
    n_verts = 0
    inside = vals > level
    for tet in _TETS:
        tv = vals[:, tet]                                   # (C, 4)
        ti = inside[:, tet]
        code = (ti * (1 << np.arange(4))[None]).sum(-1)      # (C,)
        for case in range(1, 15):
            tris = _CASES[case]
            if not tris:
                continue
            sel = np.nonzero(code == case)[0]
            if len(sel) == 0:
                continue
            for tri in tris:
                pts = []
                for (a, b) in tri:
                    va = tv[sel, a]
                    vb = tv[sel, b]
                    t = (level - va) / np.where(vb - va == 0, 1e-12,
                                                vb - va)
                    t = np.clip(t, 0.0, 1.0)[:, None]
                    pa = corner_pos[sel, tet[a]].astype(np.float64)
                    pb = corner_pos[sel, tet[b]].astype(np.float64)
                    pts.append(pa + t * (pb - pa))
                tri_pts = np.stack(pts, axis=1)              # (n, 3, 3)
                verts.append(tri_pts.reshape(-1, 3))
                idx = n_verts + np.arange(len(sel) * 3).reshape(-1, 3)
                faces.append(idx)
                n_verts += len(sel) * 3
    if not verts:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    V = np.concatenate(verts)
    F = np.concatenate(faces)
    # weld duplicate vertices
    Vr = np.round(V, 6)
    uniq, inv = np.unique(Vr, axis=0, return_inverse=True)
    return uniq, inv[F.reshape(-1)].reshape(-1, 3)


def write_ply(path, verts, faces):
    with open(path, "wb") as f:
        head = (f"ply\nformat binary_little_endian 1.0\n"
                f"element vertex {len(verts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                f"element face {len(faces)}\n"
                "property list uchar int vertex_indices\nend_header\n")
        f.write(head.encode())
        verts.astype("<f4").tofile(f)
        rec = np.empty(len(faces),
                       dtype=[("n", "u1"), ("idx", "<i4", 3)])
        rec["n"] = 3
        rec["idx"] = faces
        rec.tofile(f)


def extract_mesh(density_fn, params, scale, resolution=(512, 128, 512),
                 sigma_threshold=10.0, chunk=2 ** 17, out_path=None):
    """Dense density probe -> isosurface -> optional .ply
    (extract_mesh.py:13-112: 512x128x512 grid over the scene box).

    density_fn(params, x) -> (N,) sigma. Returns (verts world coords,
    faces).
    """
    import jax.numpy as jnp
    rx, ry, rz = resolution
    xs = np.linspace(-scale, scale, rx)
    ys = np.linspace(-scale, scale, ry)
    zs = np.linspace(-scale, scale, rz)
    pts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"),
                   -1).reshape(-1, 3).astype(np.float32)
    sig = np.empty(len(pts), np.float32)
    for i in range(0, len(pts), chunk):
        end = min(i + chunk, len(pts))
        block = pts[i:end]
        pad = 0
        if end - i < chunk and i > 0:
            pad = chunk - (end - i)
            block = np.concatenate([block, block[-1:].repeat(pad, 0)])
        out = np.asarray(density_fn(params, jnp.asarray(block)))
        sig[i:end] = out[:end - i]
    vol = sig.reshape(rx, ry, rz)
    verts, faces = marching_cubes(vol, sigma_threshold)
    # voxel -> world
    scale_xyz = np.array([xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0]])
    verts = verts * scale_xyz[None] + np.array([xs[0], ys[0], zs[0]])
    if out_path:
        write_ply(out_path, verts, faces)
    return verts, faces
