"""Multiresolution hash-grid encoding (Instant-NGP), TPU-native.

Replaces the external tinycudann Grid/Hash encoder that the reference
configures in networks.py:40-52 (density: L=16 F=8 T=2^19 Nmin=16) and
networks.py:67-76 (rgb: L=16 F=8 T=2^21), plus implicit_mask.py:14-24.

Design (vs. tcnn's CUDA kernels):
  - all level tables live in ONE (total_rows, F) array; per-level row
    offsets are static Python ints, so the whole encode is a single
    batched XLA gather (N*L*8 rows) that the TPU pipelines from HBM.
  - trilinear interpolation weights are computed on the VPU in fp32.
  - backward is plain JAX AD: d/dtable is a scatter-add (deterministic,
    unlike tcnn's atomicAdd), d/dx is the exact analytic trilerp
    derivative — which also makes grad-of-grad (the density-normal
    double backward, networks.py:186-196) exact and cheap.
  - levels whose dense grid fits in the table are indexed directly
    (no hashing), matching Instant-NGP semantics; finer levels hash
    with the standard primes.

Coordinate convention matches Instant-NGP: inputs live in [0,1]^3,
level scale_l = Nmin * b^l - 1, pos = x * scale + 0.5.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# Instant-NGP spatial hash primes (paper eq. 4). First prime is 1.
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    """Static configuration for one hash-grid encoder."""
    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.3819
    # ----- derived (filled in __post_init__) -----
    scales: tuple = dataclasses.field(default=None)
    resolutions: tuple = dataclasses.field(default=None)
    hashed: tuple = dataclasses.field(default=None)
    offsets: tuple = dataclasses.field(default=None)
    total_rows: int = dataclasses.field(default=None)

    def __post_init__(self):
        T = 1 << self.log2_hashmap_size
        scales, resolutions, hashed, offsets = [], [], [], []
        off = 0
        for l in range(self.n_levels):
            scale = self.base_resolution * (self.per_level_scale ** l) - 1.0
            res = int(np.ceil(scale)) + 1
            dense = res ** 3
            use_hash = dense > T
            size = T if use_hash else dense
            # round rows to a multiple of 8 to keep offsets tile-friendly
            size = -(-size // 8) * 8
            scales.append(float(scale))
            resolutions.append(res)
            hashed.append(use_hash)
            offsets.append(off)
            off += size
        object.__setattr__(self, "scales", tuple(scales))
        object.__setattr__(self, "resolutions", tuple(resolutions))
        object.__setattr__(self, "hashed", tuple(hashed))
        object.__setattr__(self, "offsets", tuple(offsets))
        object.__setattr__(self, "total_rows", off)

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    @property
    def hashmap_size(self) -> int:
        return 1 << self.log2_hashmap_size


def per_level_scale_for(scene_scale: float, n_levels: int = 16,
                        base_resolution: int = 16,
                        max_resolution_factor: float = 2048.0) -> float:
    """Reference growth factor b = exp(ln(2048*scale/Nmin)/(L-1)).

    networks.py:37 / networks.py:64.
    """
    return float(np.exp(np.log(max_resolution_factor * scene_scale /
                               base_resolution) / (n_levels - 1)))


def hashgrid_init(key, cfg: HashGridConfig, dtype=jnp.float32):
    """Init table uniform in [-1e-4, 1e-4] (Instant-NGP convention)."""
    return jax.random.uniform(key, (cfg.total_rows, cfg.n_features),
                              minval=-1e-4, maxval=1e-4, dtype=jnp.float32
                              ).astype(dtype)


def _level_indices(cfg: HashGridConfig, corner: jnp.ndarray) -> jnp.ndarray:
    """Row index into the flat table for integer corner coords.

    corner: (N, L, 8, 3) int32, already clamped to [0, res_l - 1].
    Returns (N, L, 8) int32 absolute row ids (level offset included).
    """
    N = corner.shape[0]
    L = cfg.n_levels
    cu = corner.astype(jnp.uint32)
    idx_out = []
    for l in range(L):
        c = cu[:, l]  # (N, 8, 3)
        if cfg.hashed[l]:
            h = (c[..., 0] * jnp.uint32(_PRIMES[0])
                 ^ c[..., 1] * jnp.uint32(_PRIMES[1])
                 ^ c[..., 2] * jnp.uint32(_PRIMES[2]))
            idx = h & jnp.uint32(cfg.hashmap_size - 1)
        else:
            res = jnp.uint32(cfg.resolutions[l])
            idx = (c[..., 2] * res + c[..., 1]) * res + c[..., 0]
        idx_out.append(idx.astype(jnp.int32) + cfg.offsets[l])
    return jnp.stack(idx_out, axis=1)  # (N, L, 8)


# binary corner offsets of a unit cube, (8, 3)
_CORNERS = np.array([[i & 1, (i >> 1) & 1, (i >> 2) & 1]
                     for i in range(8)], dtype=np.int32)


@partial(jax.jit, static_argnames=("cfg",))
def hashgrid_encode(cfg: HashGridConfig, table: jnp.ndarray, x: jnp.ndarray):
    """Encode positions through all levels.

    Args:
      cfg: static HashGridConfig.
      table: (total_rows, F) parameters.
      x: (N, 3) positions in [0, 1]^3 (out-of-range values are clamped by
         the corner clamp, mirroring tcnn's boundary behavior).

    Returns:
      (N, L*F) features, level-major, in x's dtype promoted with table's.
    """
    N = x.shape[0]
    L, F = cfg.n_levels, cfg.n_features
    scales = jnp.asarray(cfg.scales, dtype=jnp.float32)       # (L,)
    res = jnp.asarray(cfg.resolutions, dtype=jnp.int32)       # (L,)

    pos = x.astype(jnp.float32)[:, None, :] * scales[None, :, None] + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid                                      # (N, L, 3)
    pos_grid = pos_grid.astype(jnp.int32)

    corners = jnp.asarray(_CORNERS)                            # (8, 3)
    corner = pos_grid[:, :, None, :] + corners[None, None]     # (N, L, 8, 3)
    corner = jnp.clip(corner, 0, res[None, :, None, None] - 1)

    rows = _level_indices(cfg, corner)                         # (N, L, 8)
    feats = jnp.take(table, rows.reshape(-1), axis=0)          # (N*L*8, F)
    feats = feats.reshape(N, L, 8, F).astype(jnp.float32)

    c = corners.astype(jnp.float32)[None, None]                # (1,1,8,3)
    w = jnp.prod(c * frac[:, :, None, :] +
                 (1.0 - c) * (1.0 - frac[:, :, None, :]), axis=-1)  # (N,L,8)

    out = jnp.sum(w[..., None] * feats, axis=2)                # (N, L, F)
    return out.reshape(N, L * F)
