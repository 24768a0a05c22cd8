"""Multiresolution hash-grid encoding (Instant-NGP), TPU-native.

Replaces the external tinycudann Grid/Hash encoder that the reference
configures in networks.py:40-52 (density: L=16 F=8 T=2^19 Nmin=16) and
networks.py:67-76 (rgb: L=16 F=8 T=2^21), plus implicit_mask.py:14-24.

Design (vs. tcnn's CUDA kernels):
  - all level tables live in ONE **feature-major** (F, total_rows) array.
    TPU tiles pad the last dimension to 128 lanes, so any intermediate
    with a trailing F=8 or xyz=3 axis inflates 16-43x in HBM (measured:
    a (8, N, L, F) gather temp cost 12 GB for 768 MB of data). Keeping
    the *point* axis last — (3, L, N) coordinates, (F, L, N) features —
    makes every temp dense in the lane dimension.
  - the encode unrolls over the 8 cube corners; each corner is one
    batched gather of (F, L*N) rows that the TPU pipelines from HBM,
    fused with the trilinear weight multiply-accumulate on the VPU.
  - backward is plain JAX AD: d/dtable is a deterministic scatter-add
    (unlike tcnn's atomicAdd), d/dx is the exact analytic trilerp
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

from .gather import storage_cast, table_gather

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
            # round rows to a multiple of 128 (lane tile) per level
            size = -(-size // 128) * 128
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
    """Init (F, total_rows) table uniform in [-1e-4, 1e-4]."""
    return jax.random.uniform(key, (cfg.n_features, cfg.total_rows),
                              minval=-1e-4, maxval=1e-4, dtype=jnp.float32
                              ).astype(dtype)


@partial(jax.jit, static_argnames=("cfg", "storage_dtype", "x_cm"))
def hashgrid_encode(cfg: HashGridConfig, table: jnp.ndarray, x: jnp.ndarray,
                    storage_dtype=None, x_cm: bool = False):
    """Encode positions through all levels.

    Args:
      cfg: static HashGridConfig.
      table: (F, total_rows) parameters (feature-major).
      x: (N, 3) positions in [0, 1]^3 (out-of-range values are clamped by
         the corner clamp, mirroring tcnn's boundary behavior).
      storage_dtype: optional low-precision read dtype (ops/gather.py).

    Returns:
      (N, L*F) float32 features, level-major.
    """
    storage = storage_cast(table, storage_dtype)
    L, F = cfg.n_levels, cfg.n_features
    scales = jnp.asarray(cfg.scales, dtype=jnp.float32)          # (L,)
    res = jnp.asarray(cfg.resolutions, dtype=jnp.int32)          # (L,)
    offsets = jnp.asarray(cfg.offsets, dtype=jnp.uint32)         # (L,)
    hashed = jnp.asarray(cfg.hashed, dtype=jnp.bool_)            # (L,)

    # point axis LAST everywhere (TPU lane dim): (3, L, N)
    xT = x.astype(jnp.float32) if x_cm else x.astype(jnp.float32).T
    N = xT.shape[1]
    pos = xT[:, None, :] * scales[None, :, None] + 0.5            # (3,L,N)
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    pos_grid = pos_grid.astype(jnp.int32)

    res_b = res[None, :, None]                                    # (1,L,1)
    mask = jnp.uint32(cfg.hashmap_size - 1)

    acc = jnp.zeros((F, L, N), jnp.float32)
    for c in range(8):
        bits = ((c & 1), ((c >> 1) & 1), ((c >> 2) & 1))
        corner = jnp.clip(
            pos_grid + jnp.asarray(bits, jnp.int32)[:, None, None],
            0, res_b - 1)                                         # (3,L,N)
        cu = corner.astype(jnp.uint32)
        h = (cu[0] * jnp.uint32(_PRIMES[0])
             ^ cu[1] * jnp.uint32(_PRIMES[1])
             ^ cu[2] * jnp.uint32(_PRIMES[2])) & mask             # (L, N)
        ru = res.astype(jnp.uint32)[:, None]
        dense = (cu[2] * ru + cu[1]) * ru + cu[0]                 # (L, N)
        rows = (jnp.where(hashed[:, None], h, dense)
                + offsets[:, None]).astype(jnp.int32)             # (L, N)

        feats = table_gather(table, rows.reshape(-1), axis=1,
                             storage=storage).reshape(F, L, N)
        fb = jnp.asarray(bits, jnp.float32)[:, None, None]
        w = jnp.prod(fb * frac + (1.0 - fb) * (1.0 - frac),
                     axis=0)                                      # (L, N)
        acc = acc + feats * w[None]

    # (F, L, N) -> (N, L, F) level-major, one relayout at the end
    return jnp.transpose(acc, (2, 1, 0)).reshape(N, L * F)


@partial(jax.jit, static_argnames=("cfg", "storage_dtype", "x_cm"))
def hashgrid_encode_grad(cfg: HashGridConfig, table: jnp.ndarray,
                         x: jnp.ndarray, storage_dtype=None,
                         x_cm: bool = False):
    """Encode positions AND the analytic spatial jacobian in one pass.

    The derivative of trilinear interpolation w.r.t. position reuses the
    same 8 gathered corner features with different (polynomial) weights,
    so computing d(feat)/dx here costs zero extra HBM gathers — unlike
    AD's vjp, which re-runs the interpolation graph. Used for the
    density-normal path (normals_raw = -grad sigma, networks.py:186-196).

    Returns:
      feats: (N, L*F)
      jac:   (3, N, L*F) with jac[d] = d feats / d x_d (x in [0,1]^3;
             positions on the clamp boundary get zero derivative, the
             exact subgradient of the clamped interpolation).
    """
    storage = storage_cast(table, storage_dtype)
    L, F = cfg.n_levels, cfg.n_features
    scales = jnp.asarray(cfg.scales, dtype=jnp.float32)
    res = jnp.asarray(cfg.resolutions, dtype=jnp.int32)
    offsets = jnp.asarray(cfg.offsets, dtype=jnp.uint32)
    hashed = jnp.asarray(cfg.hashed, dtype=jnp.bool_)

    xT = x.astype(jnp.float32) if x_cm else x.astype(jnp.float32).T
    N = xT.shape[1]
    pos = xT[:, None, :] * scales[None, :, None] + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    pos_grid = pos_grid.astype(jnp.int32)

    res_b = res[None, :, None]
    mask = jnp.uint32(cfg.hashmap_size - 1)

    acc = jnp.zeros((F, L, N), jnp.float32)
    dacc = jnp.zeros((3, F, L, N), jnp.float32)
    for c in range(8):
        bits = ((c & 1), ((c >> 1) & 1), ((c >> 2) & 1))
        corner = jnp.clip(
            pos_grid + jnp.asarray(bits, jnp.int32)[:, None, None],
            0, res_b - 1)
        cu = corner.astype(jnp.uint32)
        h = (cu[0] * jnp.uint32(_PRIMES[0])
             ^ cu[1] * jnp.uint32(_PRIMES[1])
             ^ cu[2] * jnp.uint32(_PRIMES[2])) & mask
        ru = res.astype(jnp.uint32)[:, None]
        dense = (cu[2] * ru + cu[1]) * ru + cu[0]
        rows = (jnp.where(hashed[:, None], h, dense)
                + offsets[:, None]).astype(jnp.int32)

        feats = table_gather(table, rows.reshape(-1), axis=1,
                             storage=storage).reshape(F, L, N)
        fb = jnp.asarray(bits, jnp.float32)[:, None, None]
        per_dim = fb * frac + (1.0 - fb) * (1.0 - frac)      # (3, L, N)
        w = jnp.prod(per_dim, axis=0)
        acc = acc + feats * w[None]
        # dw/dfrac_d = (2 b_d - 1) * prod_{e != d} per_dim_e
        sgn = 2.0 * fb - 1.0                                  # (3, 1, 1)
        for d in range(3):
            others = per_dim[(d + 1) % 3] * per_dim[(d + 2) % 3]
            dw = sgn[d] * others                              # (L, N)
            dacc = dacc.at[d].add(feats * dw[None])

    feats_out = jnp.transpose(acc, (2, 1, 0)).reshape(N, L * F)
    # chain rule: dfrac/dx = scale_l (per level)
    dacc = dacc * scales[None, None, :, None]
    jac = jnp.transpose(dacc, (0, 3, 2, 1)).reshape(3, N, L * F)
    return feats_out, jac
