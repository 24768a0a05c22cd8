"""Closed-form ray/volume intersection (replaces models/csrc/intersection.cu).

The reference launches one CUDA thread per (ray, volume) pair with an
atomicAdd hit counter and a host-side sort (intersection.cu:49-97). The
framework only ever calls it with a single AABB (the scene box,
models/rendering.py:28-29) or a single sphere, so the TPU version is a
fully vectorized slab/quadratic test with static shapes — no atomics,
no sort, deterministic.
"""
from __future__ import annotations

import jax.numpy as jnp


def ray_aabb_intersect(rays_o, rays_d, center, half_size):
    """Slab test of N rays against one axis-aligned box.

    Args:
      rays_o, rays_d: (N, 3). Directions need not be normalized.
      center, half_size: (3,) box center and half extents.

    Returns:
      hits_t: (N, 2) [t_near, t_far]; both -1 where the ray misses.
      Matches intersection.cu:5-22 semantics (t_near clamped to >= 0).
    """
    center = jnp.reshape(jnp.asarray(center, rays_o.dtype), (1, 3))
    half_size = jnp.reshape(jnp.asarray(half_size, rays_o.dtype), (1, 3))
    inv_d = 1.0 / rays_d

    t_min = (center - half_size - rays_o) * inv_d
    t_max = (center + half_size - rays_o) * inv_d
    t1 = jnp.minimum(t_min, t_max)
    t2 = jnp.maximum(t_min, t_max)
    t_near = jnp.max(t1, axis=-1)
    t_far = jnp.min(t2, axis=-1)
    t_near = jnp.maximum(t_near, 0.0)
    hit = t_far >= t_near
    hits_t = jnp.stack([jnp.where(hit, t_near, -1.0),
                        jnp.where(hit, t_far, -1.0)], axis=-1)
    return hits_t


def ray_sphere_intersect(rays_o, rays_d, center, radius):
    """Quadratic test of N rays against one sphere (intersection.cu:103-121).

    Returns (N, 2) [t_near, t_far], -1 where missed. t_near clamped >= 0.
    """
    center = jnp.reshape(jnp.asarray(center, rays_o.dtype), (1, 3))
    oc = rays_o - center
    a = jnp.sum(rays_d * rays_d, -1)
    b = 2.0 * jnp.sum(oc * rays_d, -1)
    c = jnp.sum(oc * oc, -1) - radius**2
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2 * a)
    t2 = (-b + sq) / (2 * a)
    t1 = jnp.maximum(t1, 0.0)
    hit = (disc >= 0) & (t2 >= 0)
    return jnp.stack([jnp.where(hit, t1, -1.0),
                      jnp.where(hit, t2, -1.0)], axis=-1)
