"""Brick-packed multiresolution grid encoder — the TPU-native redesign
of the hash-grid encoding.

Motivation (measured on v5e, see PERF_NOTES.md): XLA's gather engine is
*index-rate* limited (~130M rows/s) and nearly indifferent to row width,
so tcnn's layout — 8 independent 32-byte corner fetches per (sample,
level) — is the worst possible shape for TPU. This encoder stores the
corner-feature lattice in *bricks*: one stored row holds the
(B+1)^3-point corner lattice of a B^3-cell block, so every cell lies
fully inside exactly one brick and an entire trilinear interpolation
needs ONE row fetch. With B=2 a row is 27 points x F8 = 216 floats
(padded to 256 lanes = one 1KB HBM tile): 8x fewer gather indices and
tile-aligned fetches.

Interpolation without per-sample dynamic indexing: the 8 trilerp corner
weights are scattered into a 256-lane weight vector built purely from
static lane-index constants (iota>>3 decomposed into lattice coords) and
elementwise comparisons against the sample's local cell offset; the
weighted row then reduces to F features with one small MXU matmul
against a static selection matrix. No (…, 3) or (…, 8)-trailing
temporaries anywhere (TPU tile padding, see ops/hashgrid.py notes).

Semantics vs. the reference hash grid: within a brick, corners are
shared exactly as in Instant-NGP; lattice points on brick faces are
duplicated between neighboring bricks and may diverge during training —
an additional collision-like discontinuity every B cells, analogous to
(and empirically as benign as) tcnn's hash collisions. Coarse levels
whose brick grid fits the table are dense (no hashing), fine levels
hash the brick coordinate with the Instant-NGP primes.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .gather import storage_cast, table_gather

_PRIMES = (1, 2654435761, 805459861)

# Remat policy for the chunk bodies: SAVE the per-chunk outputs
# (features / jacobian — ~1 ms of HBM) so the backward recompute never
# re-runs the table gather (~56 ms/pass at the flagship op-point).
# The table-gradient scatter itself needs only weights and cotangents,
# never the gathered values, so with outputs saved the recompute pass
# contains no gather at all.
_SAVE_OUTS = jax.checkpoint_policies.save_only_these_names(
    "brick_feats", "brick_jac")


@dataclasses.dataclass(frozen=True)
class BrickGridConfig:
    """Static configuration. log2_bricks bounds the hashed-level brick
    count (the analog of log2_hashmap_size at brick granularity)."""
    n_levels: int = 16
    n_features: int = 8
    log2_bricks: int = 16
    base_resolution: int = 16
    per_level_scale: float = 1.3819
    brick_size: int = 2               # cells per brick per dim (B)
    # ----- derived -----
    scales: tuple = dataclasses.field(default=None)
    resolutions: tuple = dataclasses.field(default=None)
    brick_res: tuple = dataclasses.field(default=None)
    hashed: tuple = dataclasses.field(default=None)
    offsets: tuple = dataclasses.field(default=None)
    total_bricks: int = dataclasses.field(default=None)

    def __post_init__(self):
        T = 1 << self.log2_bricks
        B = self.brick_size
        scales, res, bres, hashed, offsets = [], [], [], [], []
        off = 0
        for l in range(self.n_levels):
            scale = self.base_resolution * (self.per_level_scale ** l) - 1
            r = int(np.ceil(scale)) + 1          # corner-lattice res
            br = -(-r // B)                       # bricks per dim
            dense = br ** 3
            use_hash = dense > T
            size = T if use_hash else dense
            scales.append(float(scale))
            res.append(r)
            bres.append(br)
            hashed.append(use_hash)
            offsets.append(off)
            off += size
        object.__setattr__(self, "scales", tuple(scales))
        object.__setattr__(self, "resolutions", tuple(res))
        object.__setattr__(self, "brick_res", tuple(bres))
        object.__setattr__(self, "hashed", tuple(hashed))
        object.__setattr__(self, "offsets", tuple(offsets))
        object.__setattr__(self, "total_bricks", off)

    @property
    def lattice_pts(self) -> int:
        return (self.brick_size + 1) ** 3

    @property
    def row_width(self) -> int:
        """Lane-padded stored row width."""
        w = self.lattice_pts * self.n_features
        return -(-w // 128) * 128

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def brickgrid_init(key, cfg: BrickGridConfig, dtype=jnp.float32):
    return jax.random.uniform(
        key, (cfg.total_bricks, cfg.row_width), minval=-1e-4,
        maxval=1e-4, dtype=jnp.float32).astype(dtype)


def _select_matrix(cfg: BrickGridConfig, f_lo: int = 0,
                   f_hi: int | None = None) -> np.ndarray:
    """(row_width, f_hi-f_lo) static matrix: lane q = F*p + f -> output
    feature f-f_lo. The optional feature window lets callers reduce only
    a slice of the per-point features (fused-table jacobians)."""
    W, F = cfg.row_width, cfg.n_features
    f_hi = F if f_hi is None else f_hi
    S = np.zeros((W, f_hi - f_lo), np.float32)
    for p in range(cfg.lattice_pts):
        for f in range(f_lo, f_hi):
            S[p * F + f, f - f_lo] = 1.0
    return S


def _lane_coords(cfg: BrickGridConfig):
    """Static per-lane lattice coordinates (i, j, k) of each lane's
    point; padding lanes get coordinate -1 (never matched)."""
    W, F = cfg.row_width, cfg.n_features
    P = cfg.brick_size + 1
    q = np.arange(W)
    p = q // F
    valid = p < cfg.lattice_pts
    i = np.where(valid, p // (P * P), -1)
    j = np.where(valid, (p // P) % P, -1)
    k = np.where(valid, p % P, -1)
    return (jnp.asarray(i, jnp.int32), jnp.asarray(j, jnp.int32),
            jnp.asarray(k, jnp.int32))


@partial(jax.jit, static_argnames=("cfg", "chunk", "remat",
                                   "storage_dtype", "x_cm"))
def brickgrid_encode(cfg: BrickGridConfig, table: jnp.ndarray,
                     x: jnp.ndarray, chunk: int = 16384,
                     remat: bool = True, storage_dtype=None,
                     x_cm: bool = False):
    """Encode (N, 3) positions in [0,1]^3 -> (N, L*F) features.

    One wide-row gather per (sample, level). Per-chunk processing with
    rematerialization bounds both the forward temporaries (the gathered
    (chunk*L, row_width) block and the three axis-weight planes) and the
    AD residuals — without jax.checkpoint, differentiating through the
    chunk loop stacks every chunk's gathered rows in HBM (measured:
    38GB at the flagship op-point).

    storage_dtype: optional low-precision *read* dtype for the gather
    (master-weight scheme, ops/gather.py). The cast is built once here,
    outside the chunk loop.
    x_cm: x is channel-major (3, N) — the TPU-dense layout; avoids
    reading a lane-padded (N, 3) input.
    """
    L, F = cfg.n_levels, cfg.n_features
    xc = x.astype(jnp.float32) if x_cm else x.astype(jnp.float32).T
    N = xc.shape[1]
    storage = storage_cast(table, storage_dtype)
    if N > chunk:
        pad = (-N) % chunk
        xp = jnp.pad(xc, ((0, 0), (0, pad)))
        body = lambda c: _encode_chunk(cfg, table, storage, c)
        if remat:
            body = jax.checkpoint(body, policy=_SAVE_OUTS)
        xs = jnp.moveaxis(xp.reshape(3, -1, chunk), 1, 0)  # (nc, 3, chunk)
        out = jax.lax.map(body, xs)
        return out.reshape(-1, L * F)[:N]
    return _encode_chunk(cfg, table, storage, xc)


def brick_coords(cfg: BrickGridConfig, xT):
    """Shared coordinate pipeline: channel-major (3, N) positions in
    [0,1]^3 -> (rows (L, N) int32 final table row ids incl. hashing and
    level offsets, local (3, L, N) cell-in-brick, frac (3, L, N))."""
    B = cfg.brick_size
    scales = jnp.asarray(cfg.scales, jnp.float32)
    res = jnp.asarray(cfg.resolutions, jnp.int32)
    bres = jnp.asarray(cfg.brick_res, jnp.int32)
    offsets = jnp.asarray(cfg.offsets, jnp.uint32)
    hashed = jnp.asarray(cfg.hashed, jnp.bool_)
    mask = jnp.uint32((1 << cfg.log2_bricks) - 1)

    # (3, L, N) coordinate planes (dim-major; no trailing-3 arrays)
    pos = xT[:, None, :] * scales[None, :, None] + 0.5
    # clamp the cell so corner+1 stays inside the lattice (tcnn-style
    # boundary behavior)
    pos_grid = jnp.clip(jnp.floor(pos), 0,
                        (res[None, :, None] - 2).astype(jnp.float32))
    frac = pos - pos_grid                                     # (3, L, N)
    cell = pos_grid.astype(jnp.int32)
    bc = cell // B                                            # brick coord
    local = cell - bc * B                                     # 0..B-1

    bcu = bc.astype(jnp.uint32)
    h = (bcu[0] * jnp.uint32(_PRIMES[0])
         ^ bcu[1] * jnp.uint32(_PRIMES[1])
         ^ bcu[2] * jnp.uint32(_PRIMES[2])) & mask
    bru = bres.astype(jnp.uint32)[:, None]
    dense = (bcu[2] * bru + bcu[1]) * bru + bcu[0]
    rows = (jnp.where(hashed[:, None], h, dense)
            + offsets[:, None]).astype(jnp.int32)             # (L, N)
    return rows, local, frac


def reduce_feats(cfg: BrickGridConfig, g, local, frac, N,
                 level_lo: int = 0, level_hi: int | None = None):
    """Trilerp-weight the gathered rows g (Lw*N, W) and reduce to
    (N, Lw*F) level-major features. level_lo/level_hi select a level
    window Lw = level_hi - level_lo (g/local/frac cover only that
    window; used by the stream-dedup encoder's level split).

    Formulation note (round-5 measured): the separable axis-by-axis
    contraction (27F -> 9F -> 3F -> F block slices) is 13% SLOWER
    here in XLA — its (M, 72)/(M, 24) intermediates lane-pad to 128
    and materialize in HBM, while this plane-dot form fuses the whole
    weight build into the dot's operand read with zero intermediates.
    The separable form wins only inside a Pallas kernel where the
    intermediates stay in VMEM (ops/pallas/rayreduce_pallas.py)."""
    L = (cfg.n_levels if level_hi is None else level_hi) - level_lo
    F = cfg.n_features
    li, lj, lk = _lane_coords(cfg)

    def axis_w(lane_c, loc, fr):
        """weight along one axis: (1-f) at lattice==local, f at +1."""
        loc_f = loc.reshape(-1, 1).astype(jnp.int32)          # (L*N, 1)
        fr_f = fr.reshape(-1, 1)
        lane = lane_c[None, :]
        return (jnp.where(lane == loc_f, 1.0 - fr_f, 0.0)
                + jnp.where(lane == loc_f + 1, fr_f, 0.0))

    w = (axis_w(li, local[0], frac[0])
         * axis_w(lj, local[1], frac[1])
         * axis_w(lk, local[2], frac[2]))                     # (L*N, W)

    S = jnp.asarray(_select_matrix(cfg))
    out = jnp.dot(g * w, S, preferred_element_type=jnp.float32)
    # (L*N, F) -> (N, L*F) level-major
    feats = jnp.transpose(out.reshape(L, N, F), (1, 0, 2)
                          ).reshape(N, L * F)
    return checkpoint_name(feats, "brick_feats")


def _encode_chunk(cfg: BrickGridConfig, table, storage, xT):
    """xT: channel-major (3, N) chunk."""
    N = xT.shape[1]
    rows, local, frac = brick_coords(cfg, xT)
    g = table_gather(table, rows.reshape(-1), axis=0,
                     storage=storage)                  # (L*N, W) f32
    return reduce_feats(cfg, g, local, frac, N)


@partial(jax.jit, static_argnames=("cfg", "chunk", "remat", "jac_lo",
                                   "jac_hi", "storage_dtype", "x_cm"))
def brickgrid_encode_grad(cfg: BrickGridConfig, table: jnp.ndarray,
                          x: jnp.ndarray, chunk: int = 16384,
                          remat: bool = True, jac_lo: int = 0,
                          jac_hi: int | None = None, storage_dtype=None,
                          x_cm: bool = False):
    """Encode + analytic d(feat)/dx in the same single-gather pass
    (brick analog of ops/hashgrid.hashgrid_encode_grad).

    jac_lo/jac_hi restrict the jacobian to a per-point feature window
    (fused density+rgb tables only need d/dx of the density features).

    Returns (feats (N, L*F), jac (3, N, L*Fj)) with Fj = jac_hi-jac_lo.
    """
    L, F = cfg.n_levels, cfg.n_features
    Fj = (F if jac_hi is None else jac_hi) - jac_lo
    xc = x.astype(jnp.float32) if x_cm else x.astype(jnp.float32).T
    N = xc.shape[1]
    storage = storage_cast(table, storage_dtype)
    if N > chunk:
        pad = (-N) % chunk
        xp = jnp.pad(xc, ((0, 0), (0, pad)))
        body = lambda c: _encode_grad_chunk(cfg, table, storage, c,
                                            jac_lo, jac_hi)
        if remat:
            body = jax.checkpoint(body, policy=_SAVE_OUTS)
        xs = jnp.moveaxis(xp.reshape(3, -1, chunk), 1, 0)
        feats, jac = jax.lax.map(body, xs)
        return (feats.reshape(-1, L * F)[:N],
                jnp.moveaxis(jac, 1, 0).reshape(3, -1, L * Fj)[:, :N])
    return _encode_grad_chunk(cfg, table, storage, xc, jac_lo, jac_hi)


def reduce_feats_jac(cfg: BrickGridConfig, g, local, frac, N,
                     jac_lo=0, jac_hi=None, level_lo: int = 0,
                     level_hi: int | None = None):
    """Trilerp-weight g (Lw*N, W) and reduce to (feats (N, Lw*F),
    jac (3, N, Lw*Fj)) with the analytic d/dx of the interpolation.
    level_lo/level_hi select a level window (see reduce_feats)."""
    level_hi = cfg.n_levels if level_hi is None else level_hi
    L = level_hi - level_lo
    F = cfg.n_features
    B = cfg.brick_size
    Fj = (F if jac_hi is None else jac_hi) - jac_lo
    scales = jnp.asarray(cfg.scales[level_lo:level_hi], jnp.float32)

    # fused Pallas reduce: one pass over g for feats + jacobian instead
    # of four XLA fusions each re-reading the gathered block from HBM
    # (PERF_NOTES trace table); falls back to XLA off-TPU / off-shape
    from .pallas.brickreduce_pallas import (fused_brick_reduce,
                                            reduce_supported,
                                            pallas_supported, ROW_TILE)
    if (reduce_supported(B, F, cfg.row_width, jac_lo, jac_hi)
            and (L * N) % ROW_TILE == 0 and pallas_supported()):
        sc_rows = jnp.repeat(scales, N)
        lf = jnp.concatenate([
            local.reshape(3, L * N).astype(jnp.float32),
            frac.reshape(3, L * N),
            sc_rows[None], jnp.zeros((1, L * N), jnp.float32)], 0)
        feats_cm, jac_cm = fused_brick_reduce(g, lf, F)
        feats = jnp.transpose(feats_cm.reshape(F, L, N),
                              (2, 1, 0)).reshape(N, L * F)
        jac = jnp.transpose(jac_cm.reshape(3, F, L, N),
                            (0, 3, 2, 1)).reshape(3, N, L * F)
        return (checkpoint_name(feats, "brick_feats"),
                checkpoint_name(jac, "brick_jac"))

    # plane-dot formulation — see reduce_feats' formulation note (the
    # separable contraction measured 13% slower in XLA)
    li, lj, lk = _lane_coords(cfg)

    def axis_parts(lane_c, loc, fr):
        loc_f = loc.reshape(-1, 1).astype(jnp.int32)
        fr_f = fr.reshape(-1, 1)
        lane = lane_c[None, :]
        at0 = (lane == loc_f).astype(jnp.float32)
        at1 = (lane == loc_f + 1).astype(jnp.float32)
        w = at0 * (1.0 - fr_f) + at1 * fr_f
        dw = at1 - at0                     # d w / d frac
        return w, dw

    wx, dwx = axis_parts(li, local[0], frac[0])
    wy, dwy = axis_parts(lj, local[1], frac[1])
    wz, dwz = axis_parts(lk, local[2], frac[2])

    S = jnp.asarray(_select_matrix(cfg))
    Sj = S if (jac_lo, jac_hi) == (0, None) else \
        jnp.asarray(_select_matrix(cfg, jac_lo, jac_hi))
    sc = jnp.repeat(scales, N)[:, None]    # d frac / d x per row

    def reduce(wprod, Smat, Fo):
        out = jnp.dot(g * wprod, Smat, preferred_element_type=jnp.float32)
        return jnp.transpose(out.reshape(L, N, Fo), (1, 0, 2)
                             ).reshape(N, L * Fo)

    feats = reduce(wx * wy * wz, S, F)
    jac = jnp.stack([reduce(dwx * wy * wz * sc, Sj, Fj),
                     reduce(wx * dwy * wz * sc, Sj, Fj),
                     reduce(wx * wy * dwz * sc, Sj, Fj)])
    return (checkpoint_name(feats, "brick_feats"),
            checkpoint_name(jac, "brick_jac"))


def _encode_grad_chunk(cfg: BrickGridConfig, table, storage, xT,
                       jac_lo, jac_hi):
    """xT: channel-major (3, N) chunk."""
    N = xT.shape[1]
    rows, local, frac = brick_coords(cfg, xT)
    g = table_gather(table, rows.reshape(-1), axis=0, storage=storage)
    return reduce_feats_jac(cfg, g, local, frac, N, jac_lo, jac_hi)
