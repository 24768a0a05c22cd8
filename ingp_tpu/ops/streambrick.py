"""Stream-dedup brick-grid encoding: run deduplication over a
ray-contiguous COMPACTED sample stream.

Successor to the rectangle path of ops/raybrick.py. The ragged->fixed
compaction (ops/pack.py) packs the kept samples ray-major, so each
ray's t-ordered samples sit contiguously in the (N,) network batch —
consecutive stream samples usually share a brick at all but the finest
levels, exactly like consecutive rectangle samples did. Deduplicating
runs directly on the stream has three structural wins over the
(R, capacity) rectangle:

  1. cost scales with the KEPT budget N = R*samples_per_ray, not with
     R * capacity * L rectangle cells (~2x at the bench op-point, more
     at flagship capacity 192);
  2. there is no invalid work at all — the stream is dense by
     construction (padding is a zero tail that forms one run);
  3. no per-RAY run-cap calibration: tiles are fixed TS-sample windows
     of the stream, and runs merge freely across ray boundaries (two
     adjacent samples from different rays in the same brick share one
     fetch — dedup is purely consecutive-duplicate elimination in the
     gather index stream).

Level split: fine levels, where brick runs are ~1 sample long, bypass
the plan/expand entirely with a direct per-sample gather (the one-hot
"expansion" would be an identity permutation run as an MXU matmul —
pure waste, measured dominant at capacity 48). The split point is
static, derived from the calibrated tile caps.

The per-tile expand+reduce rides the same fused Pallas kernel as the
rectangle path (ops/pallas/rayreduce_pallas.py) with "ray" := "tile".

Reference analog: none — tinycudann leans on the GPU L2 to absorb
duplicate corner fetches (models/csrc include of tcnn); this is the
TPU-native expression of the same locality.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from .brickgrid import (BrickGridConfig, brick_coords, reduce_feats,
                        reduce_feats_jac)
from .gather import storage_cast, table_gather
from .raybrick import _unique_plan, _expand_unique, _SAVE_PLAN

SQRT3 = float(np.sqrt(3.0))


def stream_caps(cfg: BrickGridConfig, tile: int, max_samples: int = 1024,
                slack: float = 1.5, seg_est: int = 12) -> tuple:
    """Static per-level unique-run capacities U_l for a TS-sample tile.

    Expected runs in a tile = within-ray brick crossings
    (TS * scale_l * dt / B, dt = sqrt3/max_samples) + ray-boundary run
    breaks (~TS / seg_est, seg_est = a conservative estimate of the
    shortest typical per-ray kept segment) + a small constant. `slack`
    scales the crossing term for occupancy gaps (the calibration story
    of raybrick.run_caps applies per tile here).
    """
    dt = SQRT3 / max_samples
    B = cfg.brick_size
    caps = []
    for sc in cfg.scales:
        runs = tile * sc * dt / B * slack + tile / seg_est + 4.0
        caps.append(int(min(tile, np.ceil(runs))))
    return tuple(caps)


def split_levels(caps, tile: int, direct_frac: float = 0.7) -> int:
    """First level index treated as DIRECT (per-sample gather): levels
    whose cap is within direct_frac of the tile size gain little from
    dedup and skip the plan/expand. caps are monotone in level, so the
    split is a prefix/suffix partition."""
    for l, c in enumerate(caps):
        if c >= direct_frac * tile:
            return l
    return len(caps)


def _pad_k(k: int) -> int:
    """Pad the kernel's cell axis up to a 128 multiple (lane alignment;
    rayreduce's k-slab needs a 128-multiple divisor)."""
    return -(-k // 128) * 128


def _dedup_feats(cfg, table, storage, rows_c, local_c, frac_c, caps_c,
                 T, TS, jac_lo, jac_hi, with_jac):
    """Dedup-level half: plan -> unique gather -> expand/reduce.

    rows_c: (Lc, T, TS); local_c/frac_c: (3, Lc, T*TS).
    Returns (feats (N, Lc*F), jac (3, N, Lc*Fj) or None), N = T*TS.
    """
    Lc = rows_c.shape[0]
    F = cfg.n_features
    N = T * TS
    if Lc == 0:
        return (jnp.zeros((N, 0)),
                jnp.zeros((3, N, 0)) if with_jac else None)
    ones = jnp.ones((T, TS), bool)
    uid, urows = _unique_plan(cfg, rows_c, ones, caps_c)
    uid = checkpoint_name(uid, "raybrick_uid")
    urows = checkpoint_name(urows, "raybrick_urows")
    U_tot = int(np.sum(caps_c))
    import os
    keep = os.environ.get("INGP_GATHER_KEEP_DTYPE", "1") == "1"
    g_u = table_gather(table, urows.reshape(-1), axis=0, storage=storage,
                       keep_storage_dtype=keep).reshape(T, U_tot, -1)

    K = Lc * TS
    fused = _try_kernel(cfg, g_u, uid, local_c, frac_c, T, TS, Lc,
                        jac_lo, jac_hi, with_jac)
    if fused is not None:
        return fused

    # XLA fallback: expand to per-sample rows, shared reducers
    expand_dtype = jnp.bfloat16 if g_u.dtype == jnp.bfloat16 \
        else jnp.float32
    g = _expand_unique(g_u, uid, U_tot, expand_dtype)       # (T, K, W)
    W = g.shape[-1]
    g = jnp.transpose(g.reshape(T, Lc, TS, W), (1, 0, 2, 3)
                      ).reshape(Lc * N, W)
    if with_jac:
        return reduce_feats_jac(cfg, g, local_c, frac_c, N, jac_lo,
                                jac_hi, level_lo=0, level_hi=Lc)
    return reduce_feats(cfg, g, local_c, frac_c, N, level_hi=Lc), None


def _try_kernel(cfg, g_u, uid, local_c, frac_c, T, TS, Lc, jac_lo,
                jac_hi, with_jac):
    """Fused Pallas expand+reduce on (tile, cell) blocks; None when the
    kernel doesn't cover the shape/backend."""
    from .pallas.rayreduce_pallas import (fused_ray_reduce,
                                          rayreduce_supported)
    from .pallas.brickreduce_pallas import pallas_supported
    F = cfg.n_features
    K = Lc * TS
    Kp = _pad_k(K)
    if not (rayreduce_supported(cfg.brick_size, F, cfg.row_width,
                                jac_lo, jac_hi, Kp, T, with_jac)
            and pallas_supported()):
        return None
    N = T * TS
    # pad the unique axis to a 128 multiple: the kernel backward chunks
    # its dG block along U (scoped-vmem bound) and needs an even split;
    # padded slots are never referenced by uid, their gradient is zero,
    # and AD slices the pad back off
    U = g_u.shape[1]
    padU = (-U) % 128
    if padU:
        g_u = jnp.pad(g_u, ((0, 0), (0, padU), (0, 0)))

    def to_tk(a):                       # (3, Lc, N) -> (3, T, K)
        return jnp.transpose(a.reshape(3, Lc, T, TS), (0, 2, 1, 3)
                             ).reshape(3, T, K)
    sc = jnp.repeat(jnp.asarray(cfg.scales[:Lc], jnp.float32), TS)
    lf = jnp.concatenate([
        to_tk(local_c.astype(jnp.float32)), to_tk(frac_c),
        jnp.broadcast_to(sc, (1, T, K)),
        jnp.zeros((1, T, K), jnp.float32)], axis=0)
    if Kp != K:
        # pad cells: uid 0 with local -9 -> all trilerp weights are
        # exactly zero, so padded cells contribute nothing forward and
        # their backward cotangents vanish inside the kernel
        pad = Kp - K
        uid = jnp.pad(uid, ((0, 0), (0, pad)))
        lf = jnp.pad(lf, ((0, 0), (0, 0), (0, pad)),
                     constant_values=-9.0)

    feats_cm, jac_cm = fused_ray_reduce(g_u, uid, lf, F, with_jac,
                                        jac_lo, jac_hi)
    feats_cm = feats_cm[:, :, :K]
    feats = jnp.transpose(feats_cm.reshape(F, T, Lc, TS), (1, 3, 2, 0)
                          ).reshape(N, Lc * F)
    feats = checkpoint_name(feats, "brick_feats")
    if not with_jac:
        return feats, None
    Fj = (F if jac_hi is None else jac_hi) - jac_lo
    jac_cm = jac_cm[:, :, :K]
    jac = jnp.transpose(jac_cm.reshape(3, Fj, T, Lc, TS), (0, 2, 4, 3, 1)
                        ).reshape(3, N, Lc * Fj)
    return feats, checkpoint_name(jac, "brick_jac")


def _encode_chunk_stream(cfg, table, storage, caps, Lc, TS, xT,
                         jac_lo, jac_hi, with_jac):
    """One chunk: xT (3, Nc) ray-contiguous positions, Nc = T*TS."""
    N = xT.shape[1]
    T = N // TS
    L, F = cfg.n_levels, cfg.n_features
    rows, local, frac = brick_coords(cfg, xT)               # (L, N) ...

    feats_c, jac_c = _dedup_feats(
        cfg, table, storage, rows[:Lc].reshape(Lc, T, TS),
        local[:, :Lc], frac[:, :Lc],
        caps[:Lc], T, TS, jac_lo, jac_hi, with_jac)

    if Lc < L:
        # direct half: per-sample gather, shared reducers
        g_d = table_gather(table, rows[Lc:].reshape(-1), axis=0,
                           storage=storage)                 # (Ld*N, W)
        loc_d = local[:, Lc:]
        frc_d = frac[:, Lc:]
        if with_jac:
            feats_d, jac_d = reduce_feats_jac(
                cfg, g_d, loc_d, frc_d, N, jac_lo, jac_hi,
                level_lo=Lc, level_hi=L)
        else:
            feats_d = reduce_feats(cfg, g_d, loc_d, frc_d, N,
                                   level_lo=Lc, level_hi=L)
            jac_d = None
        feats = jnp.concatenate([feats_c, feats_d], axis=1)
        jac = jnp.concatenate([jac_c, jac_d], axis=2) if with_jac \
            else None
    else:
        feats, jac = feats_c, jac_c
    return (feats, jac) if with_jac else feats


@partial(jax.jit, static_argnames=("cfg", "tile", "chunk", "remat",
                                   "storage_dtype", "slack", "seg_est"))
def streambrick_encode(cfg: BrickGridConfig, table, x_cm,
                       tile: int = 256, chunk: int = 65536,
                       remat: bool = True, storage_dtype=None,
                       slack: float = 1.5, seg_est: int = 12):
    """Encode a ray-contiguous compact stream x_cm (3, N) in [0,1]^3
    -> (N, L*F) features. N is padded internally to the tile size."""
    L, F = cfg.n_levels, cfg.n_features
    storage = storage_cast(table, storage_dtype)
    x = x_cm.astype(jnp.float32)
    N = x.shape[1]
    caps = stream_caps(cfg, tile, slack=slack, seg_est=seg_est)
    Lc = split_levels(caps, tile)
    pad = (-N) % (chunk if N > chunk else tile)
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    if xp.shape[1] > chunk:
        body = lambda c: _encode_chunk_stream(
            cfg, table, storage, caps, Lc, tile, c, 0, None, False)
        if remat:
            body = jax.checkpoint(body, policy=_SAVE_PLAN)
        xs = jnp.moveaxis(xp.reshape(3, -1, chunk), 1, 0)
        out = jax.lax.map(body, xs)
        return out.reshape(-1, L * F)[:N]
    return _encode_chunk_stream(cfg, table, storage, caps, Lc, tile,
                                xp, 0, None, False)[:N]


@partial(jax.jit, static_argnames=("cfg", "tile", "chunk", "remat",
                                   "jac_lo", "jac_hi", "storage_dtype",
                                   "slack", "seg_est"))
def streambrick_encode_grad(cfg: BrickGridConfig, table, x_cm,
                            tile: int = 256, chunk: int = 65536,
                            remat: bool = True, jac_lo: int = 0,
                            jac_hi: int | None = None,
                            storage_dtype=None, slack: float = 1.5,
                            seg_est: int = 12):
    """Encode + analytic jacobian over a ray-contiguous stream.

    Returns (feats (N, L*F), jac (3, N, L*Fj))."""
    L, F = cfg.n_levels, cfg.n_features
    Fj = (F if jac_hi is None else jac_hi) - jac_lo
    storage = storage_cast(table, storage_dtype)
    x = x_cm.astype(jnp.float32)
    N = x.shape[1]
    caps = stream_caps(cfg, tile, slack=slack, seg_est=seg_est)
    Lc = split_levels(caps, tile)
    pad = (-N) % (chunk if N > chunk else tile)
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    if xp.shape[1] > chunk:
        body = lambda c: _encode_chunk_stream(
            cfg, table, storage, caps, Lc, tile, c, jac_lo, jac_hi, True)
        if remat:
            body = jax.checkpoint(body, policy=_SAVE_PLAN)
        xs = jnp.moveaxis(xp.reshape(3, -1, chunk), 1, 0)
        feats, jac = jax.lax.map(body, xs)
        return (feats.reshape(-1, L * F)[:N],
                jnp.moveaxis(jac, 1, 0).reshape(3, -1, L * Fj)[:, :N])
    feats, jac = _encode_chunk_stream(cfg, table, storage, caps, Lc,
                                      tile, xp, jac_lo, jac_hi, True)
    return feats[:N], jac[:, :N]
