"""Implicit transient-mask model (models/implicit_mask.py:6-38).

A hash grid over (u, v, img_idx) -> 64-unit MLP -> sigmoid mask used to
down-weight the RGB loss on transient pixels (train.py:280-288,
losses.py:92-96). Grid: L=8, F=2, T=2^16, Nmin=16, b=exp(ln(2048/16)/7).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.hashgrid import HashGridConfig, hashgrid_init, hashgrid_encode
from .mlp import mlp_init, mlp_apply

MASK_GRID_CFG = HashGridConfig(
    n_levels=8, n_features=2, log2_hashmap_size=16, base_resolution=16,
    per_level_scale=float(np.exp(np.log(2048 / 16) / 7)))


def mask_init(key):
    k1, k2 = jax.random.split(key)
    return {
        "table": hashgrid_init(k1, MASK_GRID_CFG),
        "net": mlp_init(k2, (MASK_GRID_CFG.out_dim, 64, 1)),
    }


def mask_apply(params, uvi):
    """uvi: (N, 3) in [0,1] (u, v, img_idx/N_imgs). Returns (N, 1)."""
    h = hashgrid_encode(MASK_GRID_CFG, params["table"], uvi)
    return mlp_apply(params["net"], h, "relu", "sigmoid")
