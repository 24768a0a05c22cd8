"""Ray/pose geometry (TPU-native equivalent of datasets/ray_utils.py).

Host-side pose preprocessing uses NumPy; anything that runs inside a jit
train/render step (get_rays, axisangle_to_R) is written in jnp so it can
be traced and differentiated (pose refinement needs d(rays)/d(pose)).

Reference behavior being matched (cited file:line are into /root/reference):
  - get_ray_directions: datasets/ray_utils.py:8-47
  - get_rays:           datasets/ray_utils.py:50-74
  - axisangle_to_R:     datasets/ray_utils.py:78-104
  - average/center:     datasets/ray_utils.py:112-182
  - spheric poses:      datasets/ray_utils.py:184-219
  - interpolated path:  datasets/ray_utils.py:230-277
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def get_ray_directions(H, W, K, random=False, return_uv=False, flatten=True,
                       anti_aliasing_factor=1.0, rng=None):
    """Pixel -> camera-space ray directions, [right down front] convention.

    Returns float32 np.ndarray (H*W, 3) (or (H, W, 3) if not flatten).
    Matches datasets/ray_utils.py:8-47 (pixel-center offset +0.5).
    """
    K = np.asarray(K, dtype=np.float64).copy()
    if anti_aliasing_factor > 1.0:
        H = int(H * anti_aliasing_factor)
        W = int(W * anti_aliasing_factor)
        K *= anti_aliasing_factor
        K[2, 2] = 1
    v, u = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    if random:
        rng = rng or np.random.default_rng()
        du = rng.random(u.shape, dtype=np.float32)
        dv = rng.random(v.shape, dtype=np.float32)
    else:
        du = dv = 0.5
    directions = np.stack([(u - cx + du) / fx,
                           (v - cy + dv) / fy,
                           np.ones_like(u)], -1).astype(np.float32)
    grid = np.stack([u, v], -1).astype(np.float32)
    if flatten:
        directions = directions.reshape(-1, 3)
        grid = grid.reshape(-1, 2)
    if return_uv:
        return directions, grid
    return directions


def get_rays(directions, c2w):
    """Camera-space dirs + c2w pose(s) -> world-space (rays_o, rays_d).

    directions: (N, 3); c2w: (3, 4) or (N, 3, 4). jnp, differentiable.
    Matches datasets/ray_utils.py:50-74 (directions NOT normalized here;
    the marcher relies on unnormalized dirs so `t` is metric along z).
    """
    directions = jnp.asarray(directions)
    c2w = jnp.asarray(c2w)
    # geometry must not go through low-precision matmul passes
    hi = jax.lax.Precision.HIGHEST
    if c2w.ndim == 2:
        rays_d = jnp.matmul(directions, c2w[:, :3].T, precision=hi)
        rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)
    else:
        rays_d = jnp.einsum("nc,nbc->nb", directions, c2w[..., :3],
                            precision=hi)
        rays_o = jnp.broadcast_to(c2w[..., 3], rays_d.shape)
    return rays_o, rays_d


def axisangle_to_R(v):
    """Rodrigues axis-angle -> rotation matrix, (B, 3) -> (B, 3, 3).

    jnp + differentiable (pose-refinement optimizes these vectors).
    Matches datasets/ray_utils.py:78-104 including the +1e-7 norm guard.
    """
    v = jnp.asarray(v)
    squeeze = v.ndim == 1
    if squeeze:
        v = v[None]
    zero = jnp.zeros_like(v[:, :1])
    skew_v0 = jnp.concatenate([zero, -v[:, 2:3], v[:, 1:2]], 1)
    skew_v1 = jnp.concatenate([v[:, 2:3], zero, -v[:, 0:1]], 1)
    skew_v2 = jnp.concatenate([-v[:, 1:2], v[:, 0:1], zero], 1)
    skew = jnp.stack([skew_v0, skew_v1, skew_v2], axis=1)  # (B,3,3)
    # sqrt(x^2+eps) keeps the gradient finite at v=0 (pose refinement
    # starts from exact zeros; torch's norm subgradient there is 0)
    norm = jnp.sqrt(jnp.sum(v * v, axis=1) + 1e-14)[:, None, None] + 1e-7
    eye = jnp.eye(3, dtype=v.dtype)
    skew2 = jnp.matmul(skew, skew, precision=jax.lax.Precision.HIGHEST)
    R = eye + (jnp.sin(norm) / norm) * skew + \
        ((1 - jnp.cos(norm)) / norm**2) * skew2
    return R[0] if squeeze else R


# ---------------------------------------------------------------------------
# Host-side (NumPy) pose utilities
# ---------------------------------------------------------------------------

def normalize(v):
    return v / np.linalg.norm(v)


def average_poses(poses, pts3d=None):
    """Average c2w pose used to center a capture (ray_utils.py:112-151)."""
    center = pts3d.mean(0) if pts3d is not None else poses[..., 3].mean(0)
    z = normalize(poses[..., 2].mean(0))
    y_ = poses[..., 1].mean(0)
    x = normalize(np.cross(y_, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, center], 1)


def center_poses(poses, pts3d=None):
    """Recenter all poses by the inverse average pose (ray_utils.py:154-182)."""
    pose_avg = average_poses(poses, pts3d)
    pose_avg_homo = np.eye(4)
    pose_avg_homo[:3] = pose_avg
    pose_avg_inv = np.linalg.inv(pose_avg_homo)
    last_row = np.tile(np.array([0, 0, 0, 1.0]), (len(poses), 1, 1))
    poses_homo = np.concatenate([poses, last_row], 1)
    poses_centered = (pose_avg_inv @ poses_homo)[:, :3]
    if pts3d is not None:
        pts3d_centered = pts3d @ pose_avg_inv[:, :3].T + pose_avg_inv[:, 3:].T
        return poses_centered, pts3d_centered
    return poses_centered


def create_spheric_poses(radius, mean_h, n_poses=120):
    """Circular test trajectory around the y axis at fixed elevation.

    Reproduces the trajectory of the reference's create_spheric_poses
    (datasets/ray_utils.py:184-219, itself derived from the original
    NeRF LLFF tooling, MIT): cameras on a circle of `radius` at
    elevation -pi/12, axis-remapped into the dataset convention.
    Vectorized over all angles instead of a per-pose matrix chain."""
    phi = -np.pi / 12
    th = np.linspace(0, 2 * np.pi, n_poses + 1)[:-1]
    ct, st = np.cos(th), np.sin(th)
    cp, sp = np.cos(phi), np.sin(phi)

    # orientation = A @ R_y(theta) @ R_x(phi), with the convention remap
    # A = [[-1,0,0],[0,0,1],[0,1,0]] folded in analytically
    R = np.empty((n_poses, 3, 3))
    R[:, 0] = np.stack([-ct, st * sp, st * cp], -1)
    R[:, 1] = np.stack([np.broadcast_to(st, ct.shape), ct * sp,
                        ct * cp], -1)
    R[:, 2] = np.stack([np.zeros_like(ct), np.full_like(ct, cp),
                        np.full_like(ct, -sp)], -1)
    # camera center = orientation @ [0, 2*mean_h, -radius]
    t = R @ np.array([0.0, 2 * mean_h, -radius])
    return np.concatenate([R, t[:, :, None]], axis=-1)


def viewmatrix(lookdir, up, position):
    """Camera-to-world from forward/up hints (y-up, -z-forward)."""
    vec2 = normalize(lookdir)
    vec0 = normalize(np.cross(up, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, position], axis=1)


def generate_interpolated_path(poses, n_interp, spline_degree=5,
                               smoothness=0.03, rot_weight=0.1):
    """Smooth B-spline camera path through keyframe poses.

    Algorithm from google-research/multinerf (camera_utils
    .generate_interpolated_path, Apache-2.0), which the reference
    vendors at datasets/ray_utils.py:230-277: each pose becomes a
    (position, lookat-offset, up-offset) point triple, the triples are
    spline-fitted jointly, and sampled triples are turned back into
    orthonormal poses. Reimplemented vectorized (no per-pose loop)."""
    import scipy.interpolate

    pos = poses[:, :3, -1]
    triples = np.stack([pos,
                        pos - rot_weight * poses[:, :3, 2],
                        pos + rot_weight * poses[:, :3, 1]], 1)

    n = n_interp * (triples.shape[0] - 1)
    flat = triples.reshape(triples.shape[0], -1)
    k = min(spline_degree, flat.shape[0] - 1)
    tck, _ = scipy.interpolate.splprep(flat.T, k=k, s=smoothness)
    u = np.linspace(0, 1, n, endpoint=False)
    samples = np.asarray(scipy.interpolate.splev(u, tck)) \
        .T.reshape(n, 3, 3)

    p, lookat, up = samples[:, 0], samples[:, 1], samples[:, 2]
    fwd = p - lookat
    vec2 = fwd / np.linalg.norm(fwd, axis=-1, keepdims=True)
    vec0 = np.cross(up - p, vec2)
    vec0 /= np.linalg.norm(vec0, axis=-1, keepdims=True)
    vec1 = np.cross(vec2, vec0)
    vec1 /= np.linalg.norm(vec1, axis=-1, keepdims=True)
    return np.stack([vec0, vec1, vec2, p], axis=-1)
