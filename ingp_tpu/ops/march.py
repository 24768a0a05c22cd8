"""Occupancy-grid ray marching with fixed-capacity sample segments.

TPU-native replacement for the `vren.raymarching_train/test` CUDA kernels
(models/csrc/raymarching.cu:166-454). The reference marches each ray in its
own thread with a data-dependent while loop, compacting samples through
atomicAdd slot assignment into ragged packed buffers — nondeterministic
ordering, dynamic shapes. Here the march is a `lax.scan` over a *static*
number of iterations, vectorized over all rays on the VPU; every iteration
emits (t, dt, occupied) lanes, and a deterministic cumsum-scatter packs the
occupied samples of each ray into a dense (R, S) buffer with a validity
mask. Static shapes end to end, bit-identical run to run.

Semantics matched to raymarching.cu:
  - dt = clamp(t * exp_step_factor, sqrt3/max_samples, sqrt3*2*scale/gs)
  - mip = max(mip_from_pos, mip_from_dt); cell looked up in the cascade
  - occupied -> emit sample at t, advance t += dt
  - empty -> advance t by whole dt steps until past the cell exit face
    (the reference re-evaluates calc_dt every sub-step of that do/while,
    raymarching.cu:230-233; we reuse the current dt for the skip, which
    for exp_step_factor=0 is exact and otherwise is a slightly
    conservative underestimate — never skips past where the reference
    would land)
  - per-ray sample cap, start-t perturbed by per-ray noise in [0,1)
    (raymarching.cu:195-198)
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..core.cascade import (
    SQRT3, calc_dt, mip_from_pos, mip_from_dt, cell_coord, cell_index,
    cell_exit_t,
)
from .pack import bitfield_lookup


@dataclasses.dataclass(frozen=True)
class MarchConfig:
    """Static march parameters (all shape-determining)."""
    grid_size: int = 128
    cascades: int = 1
    scale: float = 0.5
    exp_step_factor: float = 0.0
    max_samples: int = 1024   # reference MAX_SAMPLES; sets dt_min
    capacity: int = 128       # S: per-ray sample slots in the output
    iters: int = 512          # march loop iterations (samples + skips)

    @property
    def block_q(self) -> int:
        """Lattice steps per block-march run. Constant-dt lattices move
        ~0.11/scale cells per step, so 16 steps stay well inside a 16^3
        window; exp-stepped marches move up to ~sqrt3 cells per step and
        get short runs."""
        return 16 if self.exp_step_factor == 0.0 else 4


@partial(jax.jit, static_argnames=("cfg",))
def march_rays(cfg: MarchConfig, bitfield, rays_o, rays_d, hits_t, noise):
    """March R rays through the occupancy bitfield.

    Args:
      cfg: static MarchConfig.
      bitfield: (cascades*grid_size^3/32,) uint32 occupancy words
                (row-major cell order, ops/pack.packbits_u32 layout).
      rays_o, rays_d: (R, 3) float32. Directions need not be unit norm.
      hits_t: (R, 2) [t1, t2] from ray_aabb_intersect (-1 = miss).
      noise: (R,) in [0, 1): start-t jitter (zeros for test rendering).

    Returns dict:
      ts:      (R, S) sample start distances (0 where invalid)
      deltas:  (R, S) sample intervals (0 where invalid)
      valid:   (R, S) bool sample mask
      n_samples: (R,) int32 valid samples per ray
      total_samples: () int32 sum of n_samples
    """
    R = rays_o.shape[0]
    S, M = cfg.capacity, cfg.iters
    t1, t2 = hits_t[:, 0], hits_t[:, 1]
    inv_d = 1.0 / rays_d

    dt0 = calc_dt(t1, cfg.exp_step_factor, cfg.max_samples, cfg.grid_size,
                  cfg.scale)
    t_init = jnp.where(t1 >= 0, t1 + dt0 * noise, t1)

    def step(carry, _):
        t, cnt = carry
        active = (t >= 0) & (t < t2) & (cnt < S)
        x = rays_o + t[:, None] * rays_d
        dt = calc_dt(t, cfg.exp_step_factor, cfg.max_samples, cfg.grid_size,
                     cfg.scale)
        mip = jnp.maximum(mip_from_pos(x, cfg.cascades),
                          mip_from_dt(dt, cfg.grid_size, cfg.cascades))
        coord, bound = cell_coord(x, mip, cfg.grid_size, cfg.scale)
        idx = cell_index(coord, mip, cfg.grid_size)
        occ = bitfield_lookup(bitfield, idx) & active

        # advance: one dt step if occupied, whole-dt jump past the cell
        # exit face if empty (>= 1 step so progress is guaranteed)
        t_exit = cell_exit_t(x, t, coord, bound, rays_d, inv_d,
                             cfg.grid_size)
        n_steps = jnp.maximum(jnp.ceil((t_exit - t) / dt), 1.0)
        t_next = jnp.where(occ, t + dt, t + n_steps * dt)
        return ((jnp.where(active, t_next, t), cnt + occ),
                (t.astype(jnp.float32), dt.astype(jnp.float32), occ))

    (_, n_samples), (ts_m, dt_m, occ_m) = jax.lax.scan(
        step, (t_init, jnp.zeros((R,), jnp.int32)), None, length=M)

    # deterministic pack: iteration-ordered cumsum gives each occupied
    # sample its slot in the ray's row (replaces the atomicAdd compaction
    # of raymarching.cu:237-241)
    slot = jnp.cumsum(occ_m.astype(jnp.int32), axis=0) - 1        # (M, R)
    ray_ids = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32), (M, R))
    ok = occ_m & (slot < S)
    flat = jnp.where(ok, ray_ids * S + slot, R * S)               # dump OOB

    ts = jnp.zeros((R * S,), jnp.float32).at[flat.reshape(-1)].set(
        ts_m.reshape(-1), mode="drop").reshape(R, S)
    deltas = jnp.zeros((R * S,), jnp.float32).at[flat.reshape(-1)].set(
        dt_m.reshape(-1), mode="drop").reshape(R, S)

    n_samples = jnp.minimum(n_samples, S)
    valid = jnp.arange(S, dtype=jnp.int32)[None, :] < n_samples[:, None]
    return {
        "ts": ts,
        "deltas": deltas,
        "valid": valid,
        "n_samples": n_samples,
        "total_samples": jnp.sum(n_samples),
    }


def sample_positions(rays_o, rays_d, ts, valid):
    """(R, S) sample t -> (R, S, 3) world positions (zeros where invalid)."""
    x = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    return jnp.where(valid[..., None], x, 0.0)


# ---------------------------------------------------------------------------
# Lattice marcher: the scan-free fast path
# ---------------------------------------------------------------------------
#
# Key observation about raymarching.cu:200-279: the visited t values are a
# *deterministic per-ray lattice* independent of occupancy. Every advance
# is `t += calc_dt(t)` — including the empty-space skip, whose do/while
# (raymarching.cu:230-233) just fast-forwards through lattice points
# inside the empty cell. Occupancy only selects WHICH lattice points
# become samples. So the entire sequential DDA march is equivalent to:
#
#   1. evaluate the lattice t_k(t1, k) in closed form (vectorized over
#      rays AND steps — no scan, no sequential dependency),
#   2. one batched occupancy gather over all (R, M) lattice points,
#   3. keep the first S occupied points per ray (cumsum + scatter).
#
# The recurrence t_{k+1} = t_k + clamp(t_k*f, lo, hi) has three regimes
# with closed forms: linear-lo (dt=lo while t < lo/f), geometric
# (t *= 1+f while t < hi/f), linear-hi (dt=hi). Regime-boundary floats
# differ from sequential accumulation at ~1e-6 — metric-level parity.

def _lattice_t(t1, k, exp_step_factor: float, max_samples: int,
               grid_size: int, scale: float):
    """t value of lattice step k (k: (M,) int or per-ray (R, S) int;
    t1: (R,) start)."""
    lo = SQRT3 / max_samples
    hi = SQRT3 * 2 * scale / grid_size
    kf = k.astype(jnp.float32)
    if kf.ndim == 1:
        kf = kf[None, :]                          # (1, M)
    t1 = t1[:, None]                              # (R, 1)
    f = exp_step_factor
    if f == 0.0 or lo >= hi:
        return t1 + kf * lo
    n1 = jnp.maximum(jnp.ceil((lo / f - t1) / lo), 0.0)     # (R, 1)
    t_n1 = t1 + n1 * lo
    log1pf = np.log1p(f)
    n2 = jnp.maximum(jnp.ceil(jnp.log(hi / f / t_n1) / log1pf), 0.0)
    t_geo = t_n1 * jnp.exp2(jnp.log2(1.0 + f) * (kf - n1))
    t_geo_end = t_n1 * jnp.exp(n2 * log1pf)
    return jnp.where(
        kf < n1, t1 + kf * lo,
        jnp.where(kf < n1 + n2, t_geo, t_geo_end + (kf - n1 - n2) * hi))


def _lattice_geometry(cfg: MarchConfig, rays_o, rays_d, hits_t, noise):
    """Shared lattice setup: (t_start, ts_m, dt_m, in_range, mip,
    [nx, ny, nz]) with every plane shaped (R, M)."""
    M = cfg.iters
    t1, t2 = hits_t[:, 0], hits_t[:, 1]

    dt0 = calc_dt(t1, cfg.exp_step_factor, cfg.max_samples, cfg.grid_size,
                  cfg.scale)
    t_start = t1 + dt0 * noise

    k = jnp.arange(M, dtype=jnp.int32)
    ts_m = _lattice_t(t_start, k, cfg.exp_step_factor, cfg.max_samples,
                      cfg.grid_size, cfg.scale)                  # (R, M)
    dt_m = calc_dt(ts_m, cfg.exp_step_factor, cfg.max_samples,
                   cfg.grid_size, cfg.scale)

    in_range = (t1[:, None] >= 0) & (ts_m >= 0) & (ts_m < t2[:, None])
    # dim-major: three (R, M) coordinate planes instead of an (R, M, 3)
    # array — a trailing dim of 3 pads 43x on TPU tiles (4+ GB of temps
    # at R=8192, M=1024)
    xs = [rays_o[:, d:d + 1] + ts_m * rays_d[:, d:d + 1]
          for d in range(3)]
    # mip_from_pos (cascade.py): frexp exponent of max |coord|, +1
    mx = jnp.maximum(jnp.abs(xs[0]),
                     jnp.maximum(jnp.abs(xs[1]), jnp.abs(xs[2])))
    _, e_pos = jnp.frexp(mx)
    mip_p = jnp.clip(e_pos + 1, 0, cfg.cascades - 1)
    mip = jnp.maximum(mip_p,
                      mip_from_dt(dt_m, cfg.grid_size, cfg.cascades))
    # cell_coord + row-major cell_index, per dim (cascade.py semantics)
    bound = jnp.minimum(jnp.exp2(mip.astype(jnp.float32) - 1.0),
                        jnp.float32(cfg.scale))
    gs = cfg.grid_size
    ns = [jnp.clip(0.5 * (x_d / bound + 1.0) * gs, 0.0, gs - 1.0
                   ).astype(jnp.int32) for x_d in xs]
    return t_start, ts_m, dt_m, in_range, mip, ns


def _pack_march(cfg: MarchConfig, occ, t_start):
    """(R, M) occupancy -> fixed (R, S) sample segments (shared tail of
    both marchers). Sorts ONLY the occupancy-tagged lattice index (one
    i32 operand instead of dragging the (R, M) f32 ts/dt planes through
    the sort): the packed index recomputes ts/deltas in closed form on
    the (R, S) output shape — bit-identical, _lattice_t is how ts_m was
    built in the first place."""
    R, M = occ.shape
    S = cfg.capacity
    k = jnp.arange(M, dtype=jnp.int32)[None, :]
    keys = jnp.where(occ, k, M + k)
    keys_sorted = jax.lax.sort(jnp.broadcast_to(keys, occ.shape),
                               dimension=1)
    ks = keys_sorted[:, :S]
    n_samples = jnp.minimum(jnp.sum(occ, axis=1), S)
    valid = jnp.arange(S, dtype=jnp.int32)[None, :] < n_samples[:, None]
    kk = jnp.where(valid, ks, 0)
    ts_s = _lattice_t(t_start, kk, cfg.exp_step_factor, cfg.max_samples,
                      cfg.grid_size, cfg.scale)
    dt_s = calc_dt(ts_s, cfg.exp_step_factor, cfg.max_samples,
                   cfg.grid_size, cfg.scale)
    ts = jnp.where(valid, ts_s, 0.0)
    deltas = jnp.where(valid, dt_s, 0.0)
    return {
        "ts": ts,
        "deltas": deltas,
        "valid": valid,
        "n_samples": n_samples,
        "total_samples": jnp.sum(n_samples),
    }


@partial(jax.jit, static_argnames=("cfg",))
def march_rays_lattice(cfg: MarchConfig, bitfield, rays_o, rays_d, hits_t,
                       noise):
    """Scan-free occupancy march (same contract as march_rays).

    cfg.iters is M, the lattice length: it must cover the longest
    possible march (max_samples covers any AABB at dt_min; exp-stepped
    real scenes need far fewer).
    """
    t_start, ts_m, dt_m, in_range, mip, ns = _lattice_geometry(
        cfg, rays_o, rays_d, hits_t, noise)
    gs = cfg.grid_size
    idx = ((mip * gs + ns[2]) * gs + ns[1]) * gs + ns[0]
    occ = bitfield_lookup(bitfield, idx) & in_range              # (R, M)
    return _pack_march(cfg, occ, t_start)


# ---------------------------------------------------------------------------
# Block marcher: neighborhood-row occupancy (one fetch per run of steps)
# ---------------------------------------------------------------------------
#
# The lattice marcher's cost is one bitfield word gather per (ray, step):
# 8.4M gathers at the flagship op-point, each paying the gather engine's
# ~12ns fixed per-index cost for 4 useful bytes (measured; PERF_NOTES).
# But consecutive lattice points move ~0.2 cells/step: a run of 16 steps
# spans < 4 cells per axis. So fetch ONE precomputed 16^3-cell
# neighborhood row (4096 bits = 128 uint32 lanes) per run and extract
# each sample's bit with elementwise VPU math — 16x fewer gather
# indices, measured 4.3x faster end to end.
#
# Row layout for the window cell (lx, ly, lz) in [0,16)^3:
#   word w = lz*8 + (ly>>1)   in [0,128)
#   bit    = ((ly&1)<<4) | lx in [0,32)
# The word select runs in two stages (pick the 8-word lz group, then the
# word) keeping materialized intermediates 16x smaller than a flat
# 128-lane compare-reduce (25ms -> 15ms measured).
#
# Samples whose window coordinates fall outside [0,16) (pathologically
# fast rays, or a mip transition inside a run) are conservatively marked
# OCCUPIED: they keep flowing to the network, which evaluates the true
# density there — never *drops* a sample the exact march would keep.

_BLOCK_WIN = 16      # window cells per axis
_BLOCK_STRIDE = 4    # anchor granularity


def build_block_table(bitfield, grid_size: int, cascades: int):
    """Occupancy bitfield -> (cascades, (gs/4)^3, 128) uint32
    neighborhood-row table (rebuilt at every grid refresh)."""
    gs = grid_size
    anch = gs // _BLOCK_STRIDE
    shifts32 = jnp.arange(32, dtype=jnp.uint32)
    bits = ((bitfield[:, None] >> shifts32[None, :]) & jnp.uint32(1))
    occ = bits.reshape(cascades, gs, gs, gs)      # [c, z, y, x]

    shifts16 = (jnp.uint32(1) << jnp.arange(16, dtype=jnp.uint32))
    tables = []
    for c in range(cascades):
        o = jnp.pad(occ[c], ((0, _BLOCK_WIN),) * 3)
        # bits16[z, y, ax]: 16 x-cells from 4*ax packed in the low bits
        cols = [jnp.sum(o[:, :, 4 * ax:4 * ax + 16] * shifts16[None, None],
                        axis=-1, dtype=jnp.uint32) for ax in range(anch)]
        bits16 = jnp.stack(cols, axis=-1)         # (gs+16, gs+16, anch)
        words = []
        for lz in range(_BLOCK_WIN):
            for yp in range(_BLOCK_WIN // 2):
                lo = bits16[lz::4, 2 * yp::4, :][:anch, :anch]
                hi = bits16[lz::4, 2 * yp + 1::4, :][:anch, :anch]
                words.append(lo | (hi << 16))
        tables.append(jnp.stack(words, axis=-1).reshape(anch ** 3, 128))
    return jnp.stack(tables)


@partial(jax.jit, static_argnames=("cfg",))
def march_rays_block(cfg: MarchConfig, block_table, rays_o, rays_d,
                     hits_t, noise):
    """Block-march variant of march_rays_lattice (same contract; takes
    the neighborhood table from build_block_table instead of the raw
    bitfield)."""
    R = rays_o.shape[0]
    M, Q = cfg.iters, cfg.block_q
    gs = cfg.grid_size
    anch = gs // _BLOCK_STRIDE
    amax = gs - _BLOCK_WIN
    nrun = M // Q
    assert M % Q == 0, "march_iters must be a multiple of the run length"

    t_start, ts_m, dt_m, in_range, mip, ns = _lattice_geometry(
        cfg, rays_o, rays_d, hits_t, noise)

    runs = [n.reshape(R, nrun, Q) for n in ns]
    mip_r = mip.reshape(R, nrun, Q)
    run_mip = mip_r[:, :, 0]

    def anchor(cq):
        mn = jnp.minimum(cq[:, :, 0], cq[:, :, -1])
        return jnp.minimum((mn // _BLOCK_STRIDE) * _BLOCK_STRIDE, amax)
    ax, ay, az = anchor(runs[0]), anchor(runs[1]), anchor(runs[2])

    row = (((run_mip * anch + az // _BLOCK_STRIDE) * anch
            + ay // _BLOCK_STRIDE) * anch + ax // _BLOCK_STRIDE)
    flat_tb = block_table.reshape(-1, 128)
    rows = jnp.take(flat_tb, row.reshape(-1), axis=0).reshape(R, nrun, 128)

    lx = runs[0] - ax[:, :, None]
    ly = runs[1] - ay[:, :, None]
    lz = runs[2] - az[:, :, None]
    in_win = (((lx | ly | lz) >= 0)
              & (lx < _BLOCK_WIN) & (ly < _BLOCK_WIN) & (lz < _BLOCK_WIN)
              & (mip_r == run_mip[:, :, None]))
    lxc = jnp.clip(lx, 0, _BLOCK_WIN - 1)
    lyc = jnp.clip(ly, 0, _BLOCK_WIN - 1)
    lzc = jnp.clip(lz, 0, _BLOCK_WIN - 1)
    bit = ((lyc & 1) << 4) | lxc

    # stage A: pick the 8-word lz group; stage B: the word in the group
    grp = jnp.arange(_BLOCK_WIN, dtype=jnp.int32)
    rows_g = rows.reshape(R, nrun, _BLOCK_WIN, 8)
    selA = jnp.sum(
        jnp.where(grp[None, None, :, None, None]
                  == lzc[:, :, None, :, None],
                  rows_g[:, :, :, None, :], jnp.uint32(0)),
        axis=2, dtype=jnp.uint32)                     # (R, nrun, Q, 8)
    sub = jnp.arange(8, dtype=jnp.int32)
    wordval = jnp.sum(
        jnp.where(sub[None, None, None, :] == (lyc >> 1)[..., None],
                  selA, jnp.uint32(0)),
        axis=-1, dtype=jnp.uint32)                    # (R, nrun, Q)
    bit_occ = ((wordval >> bit.astype(jnp.uint32)) & 1) > 0
    occ = (jnp.where(in_win, bit_occ, True).reshape(R, M)) & in_range
    return _pack_march(cfg, occ, t_start)
