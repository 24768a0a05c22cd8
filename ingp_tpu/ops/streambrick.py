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
from .gather import storage_cast, table_gather, table_gather_multi
from .raybrick import _unique_plan, _expand_unique, _SAVE_PLAN

SQRT3 = float(np.sqrt(3.0))


def stream_caps(cfg: BrickGridConfig, tile: int, max_samples: int = 1024,
                slack: float = 1.5, seg_est: int = 4) -> tuple:
    """Static per-level unique-run capacities U_l for a TS-sample tile.

    Expected runs in a tile = within-ray brick crossings
    (TS * scale_l * dt / B, dt = sqrt3/max_samples) + ray-boundary run
    breaks (~TS / seg_est, seg_est = a conservative estimate of the
    shortest typical per-ray kept segment) + a small constant. `slack`
    scales the crossing term for occupancy gaps (the run-cap
    calibration story of PERF_NOTES.md applies per tile here).
    """
    dt = SQRT3 / max_samples
    B = cfg.brick_size
    caps = []
    for sc in cfg.scales:
        runs = tile * sc * dt / B * slack + tile / seg_est + 4.0
        caps.append(int(min(tile, np.ceil(runs))))
    return tuple(caps)


def group_levels(caps, penalty: int = 32, align: int = 16):
    """Partition the dedup levels into contiguous groups sharing one
    (aligned) uniform cap, minimizing total unique slots per tile.

    The fused kernel's expand matmul contracts over the WHOLE unique
    axis for every cell, so a single call over all levels pays
    K * sum(U_l) MXU work while each level only references its own U_l
    slots (~10x waste at the default op-point). Grouping levels of
    similar cap and invoking the kernel once per group with a uniform
    cap makes the batch axis (tile, level) and the contraction axis
    U_group — the block-diagonal structure becomes real work reduction.
    `penalty` is the per-group overhead expressed in slot units
    (~kernel launch + grid setup); caps are monotone, so groups are
    contiguous level ranges and max(caps[i:j]) = caps[j-1].

    Returns [(lo, hi, Ug)] with lo/hi level bounds and Ug the group cap.
    """
    Lc = len(caps)
    if Lc == 0:
        return []
    up = lambda c: -(-int(c) // align) * align
    INF = 1 << 60
    best = [0] + [INF] * Lc
    choice = [(0, 0)] * (Lc + 1)
    for j in range(1, Lc + 1):
        for i in range(j):
            ug = up(caps[j - 1])        # caps monotone: max(caps[i:j])
            c = best[i] + (j - i) * ug + penalty
            if c < best[j]:
                best[j], choice[j] = c, (i, ug)
    groups = []
    j = Lc
    while j > 0:
        i, ug = choice[j]
        groups.append((i, j, ug))
        j = i
    return groups[::-1]


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


def _single_pad(tile: int, chunk: int) -> int:
    """Single-chunk pad target: 8 tiles when the chunk size is a
    multiple of it (so the padded stream can never spill past one
    chunk), making T % 8 == 0 and the grouped fused-kernel path apply
    to small/tail batches too (the zero-pad tail dedups to one run)."""
    return 8 * tile if chunk % (8 * tile) == 0 else tile


def _unique_plan_uniform(rows, valid, Ug):
    """Run-dedup plan with ONE uniform cap, batch axis (tile, level).

    rows: (Lg, T, TS) int32 table row ids; valid: (T, TS).
    Returns (uid (T*Lg, TS) local slot ids in [0, Ug), urows
    (T*Lg, Ug) table rows per slot, overflow (Lg, T, TS) bool) — the
    fused kernel's batch layout with "ray" := (tile, level).

    Overflow (more runs in a tile than Ug slots) marks the overflowing
    cells instead of aliasing them onto slot Ug-1: the caller zeroes
    their trilerp weights, so an overflowed sample degrades to a
    zero-feature contribution at that level rather than corrupting a
    different run's table row (and poisoning its gradients — a 600-step
    TPU run diverged to NaN exactly when the sharpened scene pushed
    per-ray segments below the stream_seg estimate)."""
    Lg, T, TS = rows.shape
    prev = jnp.concatenate([jnp.full((Lg, T, 1), -1, rows.dtype),
                            rows[:, :, :-1]], axis=2)
    new = (rows != prev) & valid[None]
    run = jnp.cumsum(new.astype(jnp.int32), axis=2)         # 1-based
    uid = jnp.clip(run - 1, 0, Ug - 1)
    overflow = run > Ug
    new_eff = new & ~overflow
    s_iota = jnp.arange(TS, dtype=jnp.int32)[None, None, :]
    keys = jnp.where(new_eff, s_iota, TS + s_iota)
    _, packed = jax.lax.sort(
        (jnp.broadcast_to(keys, rows.shape), rows),
        dimension=2, num_keys=1)
    urows = packed[:, :, :Ug]                               # (Lg, T, Ug)
    uid = jnp.transpose(uid, (1, 0, 2)).reshape(T * Lg, TS)
    urows = jnp.transpose(urows, (1, 0, 2)).reshape(T * Lg, Ug)
    return uid, urows, overflow


def _grouped_mode(cfg, TS, T, jac_lo, jac_hi, with_jac):
    """(use_grouped, interpret) for the per-group fused kernel path."""
    import os
    if os.environ.get("INGP_STREAM_GROUPED", "1") != "1":
        return False, False
    from .pallas.rayreduce_pallas import rayreduce_supported
    from .pallas.brickreduce_pallas import pallas_supported
    # T % 8 guarantees (T * Lg) % RAY_TILE == 0 for any group size
    if not (rayreduce_supported(cfg.brick_size, cfg.n_features,
                                cfg.row_width, jac_lo, jac_hi, TS, 8,
                                with_jac)
            and TS % 128 == 0 and T % 8 == 0):
        return False, False
    if pallas_supported():
        return True, False
    if os.environ.get("INGP_STREAM_GROUPED_INTERPRET", "0") == "1":
        return True, True
    return False, False


def _plan_groups(caps_c, rows_c, T, TS):
    """Dedup plans for every level group:
    [(lo, hi, Ug, uid, urows, overflow)]."""
    ones = jnp.ones((T, TS), bool)
    plans = []
    for lo, hi, Ug in group_levels(caps_c):
        uid, urows, ovf = _unique_plan_uniform(rows_c[lo:hi], ones, Ug)
        plans.append((lo, hi, Ug,
                      checkpoint_name(uid, "raybrick_uid"),
                      checkpoint_name(urows, "raybrick_urows"),
                      checkpoint_name(ovf, "raybrick_ovf")))
    return plans


def _grouped_reduce(cfg, plans, g_list, loc4, frc4, T, TS, jac_lo,
                    jac_hi, with_jac, interpret):
    """Per-group fused expand+reduce: one kernel call per level group,
    batch axis (tile, level), contraction axis the GROUP cap — the
    block-diagonal expand becomes real FLOP reduction (see
    group_levels). K = TS per call means the backward runs single-slab:
    dG is written once at storage dtype with no cross-slab f32
    accumulation.

    plans from _plan_groups; g_list the matching gathered blocks
    (flat (T*Lg*Ug, W)); loc4/frc4: (3, Lc, T, TS).
    Returns (feats (N, Lc*F), jac or None).
    """
    from .pallas.rayreduce_pallas import fused_ray_reduce
    F = cfg.n_features
    Fj = (F if jac_hi is None else jac_hi) - jac_lo
    N = T * TS
    feats_parts, jac_parts = [], []
    for (lo, hi, Ug, uid, _, ovf), g_u in zip(plans, g_list):
        Lg = hi - lo
        g_u = g_u.reshape(T * Lg, Ug, -1)

        def to_b(a):                    # (3, Lg, T, TS) -> (3, T*Lg, TS)
            return jnp.transpose(a, (0, 2, 1, 3)).reshape(3, T * Lg, TS)
        sc = jnp.asarray(cfg.scales[lo:hi], jnp.float32)
        sc_plane = jnp.broadcast_to(sc[None, :, None], (T, Lg, TS)
                                    ).reshape(1, T * Lg, TS)
        # overflowed cells: local -9 makes every trilerp weight exactly
        # zero (forward AND cotangents) — see _unique_plan_uniform
        loc_g = jnp.where(ovf[None], -9.0,
                          loc4[:, lo:hi].astype(jnp.float32))
        lf = jnp.concatenate([
            to_b(loc_g),
            to_b(frc4[:, lo:hi]), sc_plane,
            jnp.zeros((1, T * Lg, TS), jnp.float32)], axis=0)

        feats_cm, jac_cm = fused_ray_reduce(g_u, uid, lf, F, with_jac,
                                            jac_lo, jac_hi, interpret)
        feats_parts.append(jnp.transpose(
            feats_cm.reshape(F, T, Lg, TS), (1, 3, 2, 0)
            ).reshape(N, Lg * F))
        if with_jac:
            jac_parts.append(jnp.transpose(
                jac_cm.reshape(3, Fj, T, Lg, TS), (0, 2, 4, 3, 1)
                ).reshape(3, N, Lg * Fj))
    feats = checkpoint_name(jnp.concatenate(feats_parts, axis=1),
                            "brick_feats")
    if not with_jac:
        return feats, None
    return feats, checkpoint_name(jnp.concatenate(jac_parts, axis=2),
                                  "brick_jac")


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
    uid, urows, ovf = _unique_plan(cfg, rows_c, ones, caps_c,
                                   with_overflow=True)
    uid = checkpoint_name(uid, "raybrick_uid")
    urows = checkpoint_name(urows, "raybrick_urows")
    # overflow marking, same contract as the grouped path
    # (_unique_plan_uniform): local -9 zeroes every trilerp weight of an
    # overflowed cell (forward AND cotangents), so it degrades to a
    # zero-feature contribution instead of aliasing slot U_l-1 — a
    # different run's row, whose gradient it would otherwise poison
    local_c = jnp.where(ovf.reshape(Lc, -1)[None], -9.0,
                        local_c.astype(jnp.float32))
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


def _direct_reduce(cfg, g_d, local, frac, Lc, N, jac_lo, jac_hi,
                   with_jac):
    """Direct (fine-level) half: per-sample rows through the shared
    trilerp reducers, level window [Lc, L)."""
    L = cfg.n_levels
    if with_jac:
        return reduce_feats_jac(cfg, g_d, local[:, Lc:], frac[:, Lc:],
                                N, jac_lo, jac_hi, level_lo=Lc,
                                level_hi=L)
    return (reduce_feats(cfg, g_d, local[:, Lc:], frac[:, Lc:], N,
                         level_lo=Lc, level_hi=L), None)


def run_count_quantiles(cfg: BrickGridConfig, u_cm, tile: int,
                        q: float = 0.995):
    """Per-level q-quantile (over tiles) of the unique-run count a
    TS-sample tile of the stream produces — the measured quantity the
    static caps must cover (auto-calibration, VERDICT r4 item 7).

    u_cm: (3, N) the SAME normalized ray-contiguous stream the encoder
    sees (pre-padding; the pad tail would form one extra run). Returns
    (L,) int32 — cheap (one coords pipeline + compares), jit-safe.
    """
    rows, _, _ = brick_coords(cfg, u_cm.astype(jnp.float32))  # (L, N)
    L, N = rows.shape
    T = N // tile
    if T == 0:
        # stream shorter than one tile (tiny dryrun/test batches):
        # nothing to measure — zeros adopt as the formula floor
        return jnp.zeros((L,), jnp.int32)
    r3 = rows[:, :T * tile].reshape(L, T, tile)
    prev = jnp.concatenate([jnp.full((L, T, 1), -1, r3.dtype),
                            r3[:, :, :-1]], axis=2)
    runs = jnp.sum(r3 != prev, axis=2)                        # (L, T)
    k = min(T - 1, int(np.ceil(q * (T - 1))))
    return jnp.sort(runs, axis=1)[:, k].astype(jnp.int32)


def _tile_classes(cfg, tile, T, slack, seg_est, seg_head, head_frac,
                  direct_frac, caps_override=None):
    if caps_override is not None:
        # enforce the monotone-in-level invariant group_levels and
        # split_levels rely on (measured quantiles are nearly monotone
        # already — finer levels break runs more often)
        caps, m = [], 1
        for c in caps_override:
            m = max(m, int(c))
            caps.append(min(tile, m))
        caps = tuple(caps)
        return [(caps, split_levels(caps, tile, direct_frac), T)]
    return _tile_classes_formula(cfg, tile, T, slack, seg_est, seg_head,
                                 head_frac, direct_frac)


def _tile_classes_formula(cfg, tile, T, slack, seg_est, seg_head,
                          head_frac, direct_frac):
    """Static per-chunk tile classes [(caps, Lc, Tc)].

    With seg_head/head_frac set (and the stream SORTED by per-ray kept
    count, rendering.RenderConfig.stream_sort), the chunk's first
    head_frac tiles hold the longest segments — their ray-boundary
    BREAKS budget can be tile/seg_head (tight) instead of the
    worst-case tile/seg_est the round-3 calibration needed for
    short-segment-rich tiles. Tail tiles keep the generous caps.
    Tighter caps also push more mid levels under the dedup threshold
    (split_levels), compounding the row savings. Overflow marking
    stays active in both classes (zero-feature degradation, never
    corruption)."""
    caps_tail = stream_caps(cfg, tile, slack=slack, seg_est=seg_est)
    Lc_tail = split_levels(caps_tail, tile, direct_frac)
    if not seg_head or head_frac <= 0.0 or T < 16:
        return [(caps_tail, Lc_tail, T)]
    Th = int(T * head_frac) // 8 * 8
    if Th <= 0 or Th >= T:
        return [(caps_tail, Lc_tail, T)]
    caps_head = stream_caps(cfg, tile, slack=slack, seg_est=seg_head)
    # SAME level split as the tail: tighter caps would pull 1-2 more
    # mid levels under the dedup threshold, but the extra per-level
    # plan + fused-kernel + backward-dG machinery measured MORE
    # expensive than the direct rows it saves
    # (benchmarking/probe_headclass.py) — the head class only tightens
    # caps on the level set that already dedups.
    Lc_head = min(split_levels(caps_head, tile, direct_frac), Lc_tail)
    return [(caps_head, Lc_head, Th), (caps_tail, Lc_tail, T - Th)]


def _encode_chunk_stream(cfg, table, storage, classes, TS, xT,
                         jac_lo, jac_hi, with_jac):
    """One chunk: xT (3, Nc) ray-contiguous positions, Nc = T*TS.
    classes: [(caps, Lc, Tc)] consecutive tile ranges (_tile_classes).

    Production (grouped) path: every gather of the chunk — one per
    level group per class plus the direct fine-level blocks — rides
    ONE table_gather_multi call, so the backward runs a single chain
    of in-place scatter-adds into one accumulator instead of
    per-gather zero tables combined by full-table add passes
    (ops/gather.py).
    """
    import os
    N = xT.shape[1]
    L, F = cfg.n_levels, cfg.n_features
    rows, local, frac = brick_coords(cfg, xT)               # (L, N) ...

    modes = [(_grouped_mode(cfg, TS, Tc, jac_lo, jac_hi, with_jac)
              if Lc > 0 else (True, False))
             for _, Lc, Tc in classes]
    if all(m[0] for m in modes):
        keep = os.environ.get("INGP_GATHER_KEEP_DTYPE", "1") == "1"
        idx_list, keeps, metas = [], [], []
        n0 = 0
        for (caps, Lc, Tc), (_, interp) in zip(classes, modes):
            Nc = Tc * TS
            sl = slice(n0, n0 + Nc)
            plans = []
            if Lc > 0:
                rows_c = rows[:Lc, sl].reshape(Lc, Tc, TS)
                plans = _plan_groups(caps[:Lc], rows_c, Tc, TS)
                idx_list += [p[4].reshape(-1) for p in plans]
                keeps += [keep] * len(plans)
            di = None
            if Lc < L:
                di = len(idx_list)
                idx_list.append(rows[Lc:, sl].reshape(-1))
                # direct block stays at storage dtype too: the reduce
                # dot fusions upconvert on the fly, so the (Ld*N, W)
                # block is written and re-read at half the bytes
                keeps.append(keep)
            metas.append((Lc, Tc, sl, plans, di, interp))
            n0 += Nc
        g_list = table_gather_multi(table, idx_list, storage=storage,
                                    keep_storage_dtype=keeps)
        feats_parts, jac_parts = [], []
        gi = 0
        for Lc, Tc, sl, plans, di, interp in metas:
            Nc = Tc * TS
            if Lc > 0:
                feats_c, jac_c = _grouped_reduce(
                    cfg, plans, g_list[gi:gi + len(plans)],
                    local[:, :Lc, sl].reshape(3, Lc, Tc, TS),
                    frac[:, :Lc, sl].reshape(3, Lc, Tc, TS),
                    Tc, TS, jac_lo, jac_hi, with_jac, interp)
                gi += len(plans)
            if Lc == 0:
                feats_k, jac_k = _direct_reduce(
                    cfg, g_list[di], local[:, :, sl], frac[:, :, sl],
                    0, Nc, jac_lo, jac_hi, with_jac)
            elif Lc < L:
                feats_d, jac_d = _direct_reduce(
                    cfg, g_list[di], local[:, :, sl], frac[:, :, sl],
                    Lc, Nc, jac_lo, jac_hi, with_jac)
                feats_k = jnp.concatenate([feats_c, feats_d], axis=1)
                jac_k = jnp.concatenate([jac_c, jac_d], axis=2) \
                    if with_jac else None
            else:
                feats_k, jac_k = feats_c, jac_c
            if di is not None:
                gi += 1
            feats_parts.append(feats_k)
            jac_parts.append(jac_k)
        feats = feats_parts[0] if len(feats_parts) == 1 \
            else jnp.concatenate(feats_parts, axis=0)
        if not with_jac:
            return feats
        jac = jac_parts[0] if len(jac_parts) == 1 \
            else jnp.concatenate(jac_parts, axis=1)
        return feats, jac

    # XLA fallback: per class, dedup via _dedup_feats + direct gathers
    feats_parts, jac_parts = [], []
    n0 = 0
    for caps, Lc, Tc in classes:
        Nc = Tc * TS
        sl = slice(n0, n0 + Nc)
        n0 += Nc
        if Lc > 0:
            feats_c, jac_c = _dedup_feats(
                cfg, table, storage, rows[:Lc, sl].reshape(Lc, Tc, TS),
                local[:, :Lc, sl], frac[:, :Lc, sl],
                caps[:Lc], Tc, TS, jac_lo, jac_hi, with_jac)
        if Lc < L:
            # direct half: per-sample gather, shared reducers
            g_d = table_gather(table, rows[Lc:, sl].reshape(-1), axis=0,
                               storage=storage)             # (Ld*Nc, W)
            feats_d, jac_d = _direct_reduce(
                cfg, g_d, local[:, :, sl], frac[:, :, sl], Lc, Nc,
                jac_lo, jac_hi, with_jac)
            if Lc > 0:
                feats_k = jnp.concatenate([feats_c, feats_d], axis=1)
                jac_k = jnp.concatenate([jac_c, jac_d], axis=2) \
                    if with_jac else None
            else:
                feats_k, jac_k = feats_d, jac_d
        else:
            feats_k, jac_k = feats_c, jac_c
        feats_parts.append(feats_k)
        jac_parts.append(jac_k)
    feats = feats_parts[0] if len(feats_parts) == 1 \
        else jnp.concatenate(feats_parts, axis=0)
    if not with_jac:
        return feats
    jac = jac_parts[0] if len(jac_parts) == 1 \
        else jnp.concatenate(jac_parts, axis=1)
    return feats, jac


@partial(jax.jit, static_argnames=("cfg", "tile", "chunk", "remat",
                                   "storage_dtype", "slack", "seg_est",
                                   "direct_frac", "seg_head",
                                   "head_frac", "caps_override"))
def streambrick_encode(cfg: BrickGridConfig, table, x_cm,
                       tile: int = 256, chunk: int = 65536,
                       remat: bool = True, storage_dtype=None,
                       slack: float = 1.5, seg_est: int = 4,
                       direct_frac: float = 0.7, seg_head: int = 0,
                       head_frac: float = 0.0, caps_override=None):
    """Encode a ray-contiguous compact stream x_cm (3, N) in [0,1]^3
    -> (N, L*F) features. N is padded internally to the tile size.

    seg_head/head_frac enable per-tile-CLASS run caps (_tile_classes);
    only valid when the stream is sorted by per-ray kept count.
    caps_override: static per-level cap tuple (auto-calibration,
    run_count_quantiles) replacing the formula caps entirely."""
    L, F = cfg.n_levels, cfg.n_features
    storage = storage_cast(table, storage_dtype)
    x = x_cm.astype(jnp.float32)
    N = x.shape[1]
    pad = (-N) % (chunk if N > chunk else _single_pad(tile, chunk))
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    if xp.shape[1] > chunk:
        classes = _tile_classes(cfg, tile, chunk // tile, slack,
                                seg_est, seg_head, head_frac,
                                direct_frac, caps_override)
        body = lambda c: _encode_chunk_stream(
            cfg, table, storage, classes, tile, c, 0, None, False)
        if remat:
            body = jax.checkpoint(body, policy=_SAVE_PLAN)
        xs = jnp.moveaxis(xp.reshape(3, -1, chunk), 1, 0)
        out = jax.lax.map(body, xs)
        return out.reshape(-1, L * F)[:N]
    classes = _tile_classes(cfg, tile, xp.shape[1] // tile, slack,
                            seg_est, seg_head, head_frac, direct_frac,
                            caps_override)
    return _encode_chunk_stream(cfg, table, storage, classes, tile,
                                xp, 0, None, False)[:N]


@partial(jax.jit, static_argnames=("cfg", "tile", "chunk", "remat",
                                   "jac_lo", "jac_hi", "storage_dtype",
                                   "slack", "seg_est", "direct_frac",
                                   "seg_head", "head_frac",
                                   "caps_override"))
def streambrick_encode_grad(cfg: BrickGridConfig, table, x_cm,
                            tile: int = 256, chunk: int = 65536,
                            remat: bool = True, jac_lo: int = 0,
                            jac_hi: int | None = None,
                            storage_dtype=None, slack: float = 1.5,
                            seg_est: int = 4, direct_frac: float = 0.7,
                            seg_head: int = 0, head_frac: float = 0.0,
                            caps_override=None):
    """Encode + analytic jacobian over a ray-contiguous stream.

    Returns (feats (N, L*F), jac (3, N, L*Fj))."""
    L, F = cfg.n_levels, cfg.n_features
    Fj = (F if jac_hi is None else jac_hi) - jac_lo
    storage = storage_cast(table, storage_dtype)
    x = x_cm.astype(jnp.float32)
    N = x.shape[1]
    pad = (-N) % (chunk if N > chunk else _single_pad(tile, chunk))
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    if xp.shape[1] > chunk:
        classes = _tile_classes(cfg, tile, chunk // tile, slack,
                                seg_est, seg_head, head_frac,
                                direct_frac, caps_override)
        body = lambda c: _encode_chunk_stream(
            cfg, table, storage, classes, tile, c, jac_lo, jac_hi, True)
        if remat:
            body = jax.checkpoint(body, policy=_SAVE_PLAN)
        xs = jnp.moveaxis(xp.reshape(3, -1, chunk), 1, 0)
        feats, jac = jax.lax.map(body, xs)
        return (feats.reshape(-1, L * F)[:N],
                jnp.moveaxis(jac, 1, 0).reshape(3, -1, L * Fj)[:, :N])
    classes = _tile_classes(cfg, tile, xp.shape[1] // tile, slack,
                            seg_est, seg_head, head_frac, direct_frac,
                            caps_override)
    feats, jac = _encode_chunk_stream(cfg, table, storage, classes,
                                      tile, xp, jac_lo, jac_hi, True)
    return feats[:N], jac[:, :N]
