"""Real spherical-harmonics direction encoding.

TPU-native replacement for tcnn's SphericalHarmonics encoder, which the
reference configures at degree 4 for view directions (networks.py:78-85)
and degree 3 for the skybox (networks.py:128-135).

`sh_encode` takes *unit* direction vectors; callers that mirror the
reference's `(d+1)/2` input convention should pass the raw unit vector
here (the [0,1] remap is a tcnn interface detail, undone internally).

Closed-form hardcoded polynomials (standard real SH constants, degree<=4),
fully vectorized on the VPU and trivially differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp


def sh_encode(d, degree: int):
    """Evaluate real SH basis at unit directions.

    Args:
      d: (..., 3) unit vectors.
      degree: 1..4 -> output dims 1/4/9/16 (matches tcnn `degree`).

    Returns (..., degree**2) float array.
    """
    return jnp.stack(_sh_components(d[..., 0], d[..., 1], d[..., 2],
                                    degree), axis=-1)


def sh_encode_cm(d_cm, degree: int):
    """Channel-major variant: d_cm (3, N) -> (degree**2, N).

    Keeps the point axis on TPU lanes (dense); the sample-major
    sh_encode's (N, 16) output pads to (N, 128) in HBM."""
    return jnp.stack(_sh_components(d_cm[0], d_cm[1], d_cm[2], degree),
                     axis=0)


def _sh_components(x, y, z, degree: int):
    if degree < 1 or degree > 4:
        raise ValueError(f"sh_encode supports degree 1..4, got {degree}")
    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        xy, yz, xz = x * y, y * z, x * z
        x2, y2, z2 = x * x, y * y, z * z
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525252005,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return out
