"""Ref-NeRF utilities: reflection + integrated directional encoding.

Port of models/ref_util.py (imported by the reference NGP but the IDE is
unused in the active path — kept for API completeness). The IDE follows
Ref-NeRF eq. 6-8: spherical harmonics of the reflection direction
attenuated by the von Mises-Fisher concentration.
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def reflect(viewdirs, normals):
    """u = 2 (n.v) n - v (ref_util.py:4-19)."""
    return 2.0 * jnp.sum(normals * viewdirs, -1, keepdims=True) \
        * normals - viewdirs


def generalized_binomial_coeff(a, k):
    return np.prod(a - np.arange(k)) / math.factorial(k)


def assoc_legendre_coeff(l, m, k):
    """Coefficient of cos^k sin^m in P_l^m (ref_util.py:25-41)."""
    return ((-1) ** m * 2 ** l * math.factorial(l) / math.factorial(k)
            / math.factorial(l - k - m)
            * generalized_binomial_coeff(0.5 * (l + k + m - 1.0), l))


def sph_harm_coeff(l, m, k):
    return (np.sqrt((2.0 * l + 1.0) * math.factorial(l - m)
                    / (4.0 * np.pi * math.factorial(l + m)))
            * assoc_legendre_coeff(l, m, k))


def get_ml_array(deg_view):
    """All (m, l) pairs used by the encoding (ref_util.py:50-61)."""
    ml_list = []
    for i in range(deg_view):
        l = 2 ** i
        for m in range(l + 1):
            ml_list.append((m, l))
    return np.array(ml_list).T


def generate_ide_fn(deg_view):
    """Integrated directional encoding fn(xyz, kappa_inv)
    (ref_util.py:63-125)."""
    if deg_view > 5:
        raise ValueError("Only deg_view of at most 5 is numerically "
                         "stable.")
    ml_array = get_ml_array(deg_view)
    l_max = 2 ** (deg_view - 1)

    mat = np.zeros((l_max + 1, ml_array.shape[1]))
    for i, (m, l) in enumerate(ml_array.T):
        for k in range(l - m + 1):
            mat[k, i] = sph_harm_coeff(l, m, k)
    mat_j = jnp.asarray(mat, jnp.float32)
    m_pow = ml_array[0]
    sigma = jnp.asarray(0.5 * ml_array[1] * (ml_array[1] + 1),
                        jnp.float32)

    def integrated_dir_enc_fn(xyz, kappa_inv):
        x, y, z = xyz[..., 0:1], xyz[..., 1:2], xyz[..., 2:3]
        vmz = jnp.concatenate([z ** i for i in range(mat.shape[0])], -1)
        vmxy = jnp.concatenate(
            [(x + 1j * y) ** int(m) for m in m_pow], -1)
        sph_harms = vmxy * jnp.matmul(vmz, mat_j).astype(vmxy.dtype)
        ide = sph_harms * jnp.exp(-sigma * kappa_inv)
        return jnp.concatenate([jnp.real(ide), jnp.imag(ide)], -1)

    return integrated_dir_enc_fn
