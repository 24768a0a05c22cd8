"""Ray-run deduplicated brick-grid encoding.

TPU gathers and scatters are *index-rate* bound (~130M gather / ~60M
scatter rows/s measured on v5e, PERF_NOTES.md), so the brick encoder's
cost is set by the number of (sample, level) rows it touches: L rows
per sample, 16 x 24 = 384 per ray at the bench op-point. But marched
samples are ORDERED along their ray with spacing dt ~= sqrt3/1024,
while a level-l brick spans B/res_l of the scene — so consecutive
samples usually land in the SAME brick at all but the finest levels.
Measured on ray-coherent sample sets (benchmarking/probe_components.py):
a 24-sample ray touches ~70 distinct brick rows across all 16 levels,
5.4x fewer than the 384 the per-sample encoder gathers.

This module exploits that run structure exactly:

  1. compute every sample's final table row id (ops/brickgrid.brick_coords
     — hashing included, so hash collisions dedup too),
  2. flag run boundaries along the sample axis (rows[s] != rows[s-1]),
  3. assign each run a slot in a per-(ray, level) unique-row table of
     static per-level capacity U_l (caps calibrated from the measured
     p99 run counts; see run_caps),
  4. gather ONE table row per unique slot — R * sum(U_l) rows instead
     of R * S * L,
  5. expand unique rows back to per-sample rows with a batched one-hot
     matmul on the MXU (no gather: the expansion rides the systolic
     array, and its transpose makes the BACKWARD table gradient a
     batched matmul + an R*sum(U_l)-row scatter),
  6. feed the expanded rows to the shared trilerp reducers
     (ops/brickgrid.reduce_feats[_jac]) — values are bit-identical to
     the per-sample encoder wherever no cap overflows.

Cap overflow (a ray with more than U_l runs at level l) degrades
gracefully: overflow samples reuse the U_l-th unique brick — a
neighboring brick along the same ray, at a level whose feature field
varies on a scale the overflow distance is small against. Forward and
backward stay mutually consistent (gradients flow to the row actually
read). Caps at the measured p99 leave <1% of rays with any overflow.

The reference has no analog: its CUDA hash encoder (tinycudann) leans
on the GPU L2 cache to absorb duplicate corner fetches. This is the
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

SQRT3 = float(np.sqrt(3.0))

# Remat policy for the chunk bodies: save the outputs (so the backward
# recompute never re-runs the unique-row gather — see brickgrid._SAVE_OUTS)
# AND the dedup plan (uid/urows are small int arrays whose construction
# costs a cumsum + batched sort per chunk; saving them keeps the
# backward recompute to elementwise weight math + the expand transpose).
_SAVE_PLAN = jax.checkpoint_policies.save_only_these_names(
    "brick_feats", "brick_jac", "raybrick_uid", "raybrick_urows")


def run_caps(cfg: BrickGridConfig, spr: int, max_samples: int = 1024,
             slack: float = 1.0, gap_pad: float = 3.0) -> tuple:
    """Static per-level unique-run capacities U_l.

    z = scale_l * spr * dt / B (dt = sqrt3 / max_samples) is the brick
    crossings of a CONTIGUOUS spr-sample run; U = ceil(2.5 + 0.7 z)
    tracks its p99 (probe_components.py). Real marches have occupancy
    GAPS that both stretch the spanned distance (scaling the z term —
    `slack`) and add span-proportional extra runs even at coarse levels
    where z ~ 0 (the additive `gap_pad`). Calibrated on marched rays of
    a mid-carve synthetic scene (PERF_NOTES.md): p99 run counts track
    ceil(2.5 + gap_pad + 1.05 z) across all 16 levels at the defaults
    (gap_pad 3, slack 1.5); the original contiguous formula overflowed
    5-13% of rays per level there, each overflow sample silently
    reusing a neighboring run's brick.
    """
    import os
    if os.environ.get("INGP_DEDUP_FULLCAPS", "0") == "1":
        # diagnostic: one slot per sample at every level — dedup still
        # merges runs but can never overflow (exactness control)
        return tuple(spr for _ in cfg.scales)
    dt = SQRT3 / max_samples
    B = cfg.brick_size
    caps = []
    for sc in cfg.scales:
        z = sc * spr * dt / B
        caps.append(int(min(spr,
                            np.ceil(2.5 + gap_pad + 0.7 * slack * z))))
    return tuple(caps)


def _unique_plan(cfg: BrickGridConfig, rows, valid, caps,
                 with_overflow: bool = False):
    """Run-dedup plan for one chunk.

    Args:
      rows: (L, R, S) int32 table row ids.
      valid: (R, S) bool sample mask (valid samples form a prefix).
      caps: per-level static capacities U_l.
      with_overflow: also return the (L, R, S) bool mask of samples
        whose run overflowed its level cap (they alias slot U_l-1 — a
        neighboring run's row; callers that cannot tolerate the alias
        zero those samples' trilerp weights instead, matching
        streambrick._unique_plan_uniform's overflow marking).

    Returns:
      uid:   (R, L*S) int32 global unique slot per sample, in
             [0, U_tot); level-major k = l*S + s sample axis.
      urows: (R, U_tot) int32 table row id per unique slot (slots past
             a ray's actual run count hold arbitrary never-referenced
             row ids: their expanded values multiply a zero one-hot and
             their backward cotangents are exact zeros).
    """
    L, R, S = rows.shape
    caps_a = jnp.asarray(caps, jnp.int32)[:, None, None]
    offs = np.concatenate([[0], np.cumsum(caps)]).astype(np.int32)

    prev = jnp.concatenate([jnp.full((L, R, 1), -1, rows.dtype),
                            rows[:, :, :-1]], axis=2)
    new = (rows != prev) & valid[None]                     # (L, R, S)
    run = jnp.cumsum(new.astype(jnp.int32), axis=2)        # 1-based
    u = jnp.clip(run - 1, 0, caps_a - 1)                   # (L, R, S)
    # only the first `new` sample of each non-overflowing run opens a
    # slot (overflow runs reuse slot U_l-1's row)
    new_eff = new & (run <= caps_a)

    uid = (u + jnp.asarray(offs[:-1], jnp.int32)[:, None, None])
    uid = jnp.transpose(uid, (1, 0, 2)).reshape(R, L * S)

    # pack run-opening samples' rows to the front of each (level, ray)
    # lane: a batched sort on a stable s-ordered key (scatter-free; an
    # element scatter here measured 10.5 ms/chunk on v5e)
    s_iota = jnp.arange(S, dtype=jnp.int32)[None, None, :]
    keys = jnp.where(new_eff, s_iota, S + s_iota)
    _, packed = jax.lax.sort(
        (jnp.broadcast_to(keys, rows.shape), rows),
        dimension=2, num_keys=1)                           # (L, R, S)
    urows = jnp.concatenate(
        [packed[l, :, :caps[l]] for l in range(L)], axis=1)
    if with_overflow:
        return uid, urows, run > caps_a
    return uid, urows


def _expand_unique(g_u, uid, U_tot, expand_dtype):
    """(R, U_tot, W) unique rows -> (R, K, W) per-sample rows via a
    batched one-hot matmul (K = L*S). The one-hot is exact in bf16, and
    bf16 unique rows reproduce a bf16 storage gather bit-for-bit."""
    R, K = uid.shape
    oh = jax.nn.one_hot(uid, U_tot, dtype=expand_dtype)     # (R, K, U)
    return jax.lax.dot_general(
        oh, g_u.astype(expand_dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                 # (R, K, W)


def _dedup_gather(cfg: BrickGridConfig, table, storage, xT, valid, caps):
    """Shared front half: coords -> run dedup -> unique gather ->
    expand. Returns (g (L*N, W) f32, local, frac, N) matching the
    per-sample encoder's layout (N = R*S ray-major)."""
    R, S = valid.shape
    N = R * S
    L = cfg.n_levels
    rows, local, frac = brick_coords(cfg, xT)               # (L, N) ...
    rows3 = rows.reshape(L, R, S)
    caps = tuple(caps)
    offs = np.concatenate([[0], np.cumsum(caps)]).astype(np.int32)
    U_tot = int(offs[-1])

    uid, urows = _unique_plan(cfg, rows3, valid, caps)
    uid = checkpoint_name(uid, "raybrick_uid")
    urows = checkpoint_name(urows, "raybrick_urows")
    # keep the gathered block at storage precision: _expand_unique's
    # one-hot matmul consumes it at expand_dtype anyway, so the f32
    # materialization would be a pure convert pass over ~0.5 GB/chunk
    g_u = table_gather(table, urows.reshape(-1), axis=0, storage=storage,
                       keep_storage_dtype=True).reshape(R, U_tot, -1)
    expand_dtype = jnp.bfloat16 if g_u.dtype == jnp.bfloat16 \
        else jnp.float32
    g = _expand_unique(g_u, uid, U_tot, expand_dtype)       # (R, L*S, W)
    # (R, L, S, W) -> (L, R, S, W) -> (L*N, W) with N ray-major (r, s)
    W = g.shape[-1]
    g = jnp.transpose(g.reshape(R, L, S, W), (1, 0, 2, 3)
                      ).reshape(L * N, W)
    return g, local, frac, N


def _try_fused(cfg, table, storage, xT, valid, caps, jac_lo, jac_hi,
               with_jac):
    """Fused Pallas expand+reduce path (ops/pallas/rayreduce_pallas.py);
    returns None when the kernel doesn't cover the shape/backend."""
    from .pallas.rayreduce_pallas import (fused_ray_reduce,
                                          rayreduce_supported)
    from .pallas.brickreduce_pallas import pallas_supported
    R, S = valid.shape
    L, F = cfg.n_levels, cfg.n_features
    K = L * S
    if not (rayreduce_supported(cfg.brick_size, F, cfg.row_width,
                                jac_lo, jac_hi, K, R, with_jac)
            and pallas_supported()):
        return None
    N = R * S
    rows, local, frac = brick_coords(cfg, xT)
    uid, urows = _unique_plan(cfg, rows.reshape(L, R, S), valid, caps)
    uid = checkpoint_name(uid, "raybrick_uid")
    urows = checkpoint_name(urows, "raybrick_urows")
    U_tot = int(np.sum(caps))
    # storage-dtype rows feed the kernel directly: bf16 halves the
    # block's HBM round trip and the in-kernel expansion matmul runs
    # at full MXU rate (exact — the rows are bf16 data). The env gate
    # forces f32 rows (f32 matmuls + f32 table cotangents) for
    # precision A/B runs.
    import os
    keep = os.environ.get("INGP_GATHER_KEEP_DTYPE", "1") == "1"
    g_u = table_gather(table, urows.reshape(-1), axis=0, storage=storage,
                       keep_storage_dtype=keep).reshape(R, U_tot, -1)

    # lf planes (8, R, K), k = l*S + s
    def to_rk(a):                               # (3, L, N) -> (3, R, K)
        return jnp.transpose(a.reshape(3, L, R, S), (0, 2, 1, 3)
                             ).reshape(3, R, K)
    sc = jnp.repeat(jnp.asarray(cfg.scales, jnp.float32), S)  # (K,)
    lf = jnp.concatenate([
        to_rk(local.astype(jnp.float32)), to_rk(frac),
        jnp.broadcast_to(sc, (1, R, K)),
        jnp.zeros((1, R, K), jnp.float32)], axis=0)

    feats_cm, jac_cm = fused_ray_reduce(g_u, uid, lf, F, with_jac,
                                        jac_lo, jac_hi)
    feats = jnp.transpose(feats_cm.reshape(F, R, L, S), (1, 3, 2, 0)
                          ).reshape(N, L * F)
    feats = checkpoint_name(feats, "brick_feats")
    if not with_jac:
        return feats, None
    Fj = (F if jac_hi is None else jac_hi) - jac_lo
    jac = jnp.transpose(jac_cm.reshape(3, Fj, R, L, S), (0, 2, 4, 3, 1)
                        ).reshape(3, N, L * Fj)
    return feats, checkpoint_name(jac, "brick_jac")


def _encode_chunk_dedup(cfg, table, storage, caps, xT, valid):
    fused = _try_fused(cfg, table, storage, xT, valid, caps, 0, None,
                       with_jac=False)
    if fused is not None:
        feats = fused[0]
    else:
        g, local, frac, N = _dedup_gather(cfg, table, storage, xT,
                                          valid, caps)
        feats = reduce_feats(cfg, g, local, frac, N)
    return jnp.where(valid.reshape(-1, 1), feats, 0.0)


def _encode_grad_chunk_dedup(cfg, table, storage, caps, xT, valid,
                             jac_lo, jac_hi):
    fused = _try_fused(cfg, table, storage, xT, valid, caps, jac_lo,
                       jac_hi, with_jac=True)
    if fused is not None:
        feats, jac = fused
    else:
        g, local, frac, N = _dedup_gather(cfg, table, storage, xT,
                                          valid, caps)
        feats, jac = reduce_feats_jac(cfg, g, local, frac, N, jac_lo,
                                      jac_hi)
    vmask = valid.reshape(-1)
    return (jnp.where(vmask[:, None], feats, 0.0),
            jnp.where(vmask[None, :, None], jac, 0.0))


def _chunk_rays(x, valid, chunk_rays):
    R = valid.shape[0]
    pad = (-R) % chunk_rays
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(valid, ((0, pad), (0, 0)))
    nc = (R + pad) // chunk_rays
    xs = jnp.moveaxis(xp.reshape(3, nc, chunk_rays, -1), 1, 0)
    vs = vp.reshape(nc, chunk_rays, -1)
    return xs, vs, nc


@partial(jax.jit, static_argnames=("cfg", "caps", "chunk_rays", "remat",
                                   "storage_dtype"))
def raybrick_encode(cfg: BrickGridConfig, table, x, valid, caps,
                    chunk_rays: int = 4096, remat: bool = True,
                    storage_dtype=None):
    """Run-dedup encode of ray-structured positions.

    Args:
      x: (3, R, S) channel-major positions in [0,1]^3, S ordered
         samples per ray (monotone t, valid prefix).
      valid: (R, S) bool; invalid samples produce zero features.
      caps: static per-level unique capacities (run_caps).

    Returns (R*S, L*F) features, ray-major sample order.
    """
    L, F = cfg.n_levels, cfg.n_features
    R, S = valid.shape
    storage = storage_cast(table, storage_dtype)
    x = x.astype(jnp.float32)
    if R > chunk_rays:
        xs, vs, _ = _chunk_rays(x, valid, chunk_rays)
        body = lambda cv: _encode_chunk_dedup(
            cfg, table, storage, caps, cv[0].reshape(3, -1), cv[1])
        if remat:
            body = jax.checkpoint(body, policy=_SAVE_PLAN)
        out = jax.lax.map(body, (xs, vs))
        return out.reshape(-1, L * F)[:R * S]
    return _encode_chunk_dedup(cfg, table, storage, caps,
                               x.reshape(3, -1), valid)


@partial(jax.jit, static_argnames=("cfg", "caps", "chunk_rays", "remat",
                                   "jac_lo", "jac_hi", "storage_dtype"))
def raybrick_encode_grad(cfg: BrickGridConfig, table, x, valid, caps,
                         chunk_rays: int = 4096, remat: bool = True,
                         jac_lo: int = 0, jac_hi: int | None = None,
                         storage_dtype=None):
    """Run-dedup encode + analytic jacobian (see raybrick_encode).

    Returns (feats (R*S, L*F), jac (3, R*S, L*Fj))."""
    L, F = cfg.n_levels, cfg.n_features
    Fj = (F if jac_hi is None else jac_hi) - jac_lo
    R, S = valid.shape
    storage = storage_cast(table, storage_dtype)
    x = x.astype(jnp.float32)
    if R > chunk_rays:
        xs, vs, _ = _chunk_rays(x, valid, chunk_rays)
        body = lambda cv: _encode_grad_chunk_dedup(
            cfg, table, storage, caps, cv[0].reshape(3, -1), cv[1],
            jac_lo, jac_hi)
        if remat:
            body = jax.checkpoint(body, policy=_SAVE_PLAN)
        feats, jac = jax.lax.map(body, (xs, vs))
        return (feats.reshape(-1, L * F)[:R * S],
                jnp.moveaxis(jac, 1, 0).reshape(3, -1, L * Fj)[:, :R * S])
    return _encode_grad_chunk_dedup(cfg, table, storage, caps,
                                    x.reshape(3, -1), valid,
                                    jac_lo, jac_hi)
