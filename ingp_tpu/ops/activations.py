"""Custom-VJP activations (TPU equivalents of models/custom_functions.py:200-244).

The reference clamps the *backward* of exp/tanh to avoid inf/NaN gradient
spikes while leaving the forward exact. Implemented with jax.custom_vjp so
the same numerical safety applies under XLA AD.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    """exp(x) with backward computed from x clamped to [-7, 7].

    Matches TruncExp (custom_functions.py:200-211).
    """
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -7.0, 7.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


@jax.custom_vjp
def trunc_tanh(x):
    """tanh(x) with backward computed from x clamped to [-15, 15].

    Matches TruncTanh (custom_functions.py:231-244).
    """
    return jnp.tanh(x)


def _trunc_tanh_fwd(x):
    return jnp.tanh(x), x


def _trunc_tanh_bwd(x, g):
    t = jnp.tanh(jnp.clip(x, -15.0, 15.0))
    return (g * (1.0 - t * t),)


trunc_tanh.defvjp(_trunc_tanh_fwd, _trunc_tanh_bwd)
