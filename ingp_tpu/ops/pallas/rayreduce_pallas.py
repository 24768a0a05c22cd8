"""Pallas TPU kernel: fused unique-row expand + trilerp reduce.

Second stage of the ray-run dedup encoder (ops/raybrick.py). The XLA
path materializes the expanded per-sample row block g (L*S*R, 256) in
HBM (1.6 GB/chunk), then re-reads it for each of the four weighted
reductions, and the backward materializes its cotangent again. This
kernel keeps the whole per-sample row space in VMEM:

  forward:  per ray tile, slab of samples
      g_exp = one_hot(uid) @ G_ray          (MXU, VMEM-resident)
      feats = (g_exp * wx*wy*wz)      @ S   (MXU)
      jac_d = (g_exp * dW_d * scale)  @ S   (MXU, optional)
    HBM traffic: G in (~0.9 KB/ray/slot), lf/uid in, feats/jac out —
    the (n, 256) expanded block never exists.

  backward: the reduce transpose is a lane-broadcast (S^T maps feature
    f to lanes q % F == f), and the expand transpose contracts the
    sample axis back to unique slots:
      d_G_ray = one_hot(uid)^T @ (w * ct_bcast)   (MXU, accumulated
                across sample slabs in the revisited output block)
    so the only HBM-side backward work left is the R*U_tot-row
    scatter-add done by the caller (ops/gather.table_gather's vjp).

Specialized to brick_size=2 rows (27 points, W = 32*F lanes).
Positions are not differentiated through this op (the dedup train path
stops ray gradients at the marcher, matching RayMarcher semantics);
pose refinement uses the unfused path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .brickreduce_pallas import (_lane_coords, _axis_w, _select_matrix,
                                 _point_coords, _plane_weights,
                                 pallas_supported, _PTS)

RAY_TILE = 8        # rays per grid step


def _pick_uc(U: int, W: int, budget: int = 4 * 1024 * 1024) -> int:
    """Unique-slot chunk for the backward's (RAY_TILE, Uc, W) f32 dG
    block: the stream-dedup path can have U in the hundreds, and the
    full-U block overflows the 16 MB scoped vmem. U must be a multiple
    of the returned chunk (callers pad U to a 128 multiple)."""
    full = RAY_TILE * U * W * 4
    if full <= budget or U % 128:
        return U
    for uc in (512, 384, 256, 128):
        if U % uc == 0 and RAY_TILE * uc * W * 4 <= budget:
            return uc
    return U


def _pick_kslab(K: int) -> int:
    """Samples (l*S + s cells) per grid step: the largest lane-aligned
    divisor of K up to 512 — bigger slabs amortize per-grid-step
    overhead (measured ~2.5 us/step of the fwd kernel's ~9 ms/chunk at
    slab 128) and MXU ramp across the kernel's small matmuls."""
    for ks in (512, 384, 256, 128):
        if K % ks == 0:
            return ks
    return 0


def rayreduce_supported(brick_size: int, n_features: int, row_width: int,
                        jac_lo: int, jac_hi, K: int, R: int,
                        with_jac: bool) -> bool:
    import os
    if os.environ.get("INGP_PALLAS_RAYREDUCE", "1") != "1":
        return False
    return (brick_size == 2 and row_width == n_features * 32
            and _pick_kslab(K) > 0 and R % RAY_TILE == 0)


# _point_coords/_plane_weights shared with brickreduce_pallas: the
# factored point-domain weight build is the round-4 kernel lever
# (PERF_NOTES: the weight-plane construction, not the MXU dots, set
# the 43.8 ms/step fused-kernel time).


# Both kernels process the tile one RAY at a time: the (KS, W) weight
# planes and row slabs then bound live VMEM at ~1.5 MB regardless of
# RAY_TILE (an all-rays formulation allocated (TR*KS, W) f32 planes and
# blew the 16 MB scoped-vmem limit at spr=48).

def _fwd_kernel(F, Fj, U, with_jac, G_ref, uid_ref, lf_ref, sel_ref,
                feats_ref, *jac_ref):
    W = G_ref.shape[-1]
    TR, KS = uid_ref.shape
    # sel is (W, F) for the no-jac path; for with_jac it is the
    # block-diagonal (F + 3Fj, 4W) transpose-select so ONE K=4W MXU dot
    # produces feats and all three jacobian groups (small-K dots ran at
    # a fraction of MXU depth)
    # run the expansion matmul at the table's storage precision: the
    # one-hot is exact in bf16 and the rows ARE bf16 data, so a bf16
    # MXU pass (full rate, vs the multi-pass f32 emulation) reproduces
    # the f32 expansion bit-for-bit; accumulation stays f32.
    mm_dt = G_ref.dtype
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (KS, U), 1)
    pcoords = _point_coords()
    for r in range(TR):
        oh = (uid_ref[r][:, None] == u_iota).astype(mm_dt)
        g = jax.lax.dot_general(
            oh, G_ref[r], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (KS, W)
        lf = lf_ref[:, r, :]                               # (8, KS)
        w, d1, d2, d3 = _plane_weights(lf, pcoords, W, F)

        if with_jac:
            big = jnp.concatenate(
                [g * w, g * d1, g * d2, g * d3], axis=1)   # (KS, 4W)
            out = jax.lax.dot_general(
                sel_ref[...], big, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (F+3Fj, KS)
            feats_ref[:, r, :] = out[0:F]
            scT = lf[6][None, :]
            jac_ref[0][:, r, :] = out[F:] * scT
        else:
            feats_ref[:, r, :] = jax.lax.dot_general(
                sel_ref[...], g * w,
                (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (F, KS)


def _bwd_kernel(F, Fj, Uc, with_jac, mm_dt, selT_ref, uid_ref, lf_ref,
                df_ref, *rest):
    """Grid (rays, U chunks, k slabs): the slab axis is innermost so
    each (ray tile, U chunk) dG block accumulates across consecutive
    grid steps; the U axis bounds the block at (TR, Uc, W) — the
    full-U block overflows scoped vmem when the stream-dedup path
    pushes U into the hundreds."""
    dj_ref = rest[0] if with_jac else None
    dG_ref = rest[-1]
    W = dG_ref.shape[-1]
    TR, KS = uid_ref.shape
    first = pl.program_id(2) == 0
    u_base = pl.program_id(1) * Uc
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (KS, Uc), 1) + u_base
    li = _lane_coords(W, F)[0]
    pcoords = _point_coords()
    for r in range(TR):
        lf = lf_ref[:, r, :]
        w, d1, d2, d3 = _plane_weights(lf, pcoords, W, F)
        sc = lf[6][:, None]

        if with_jac:
            # ONE S^T contraction for all four cotangent groups: selT
            # is block-diagonal ((F + 3Fj), 4W), so group g's lane
            # broadcast lands in lanes [gW, (g+1)W) — a single MXU dot
            # replaces four small-K dots.
            ct_all = jnp.concatenate(
                [df_ref[:, r, :], dj_ref[:, r, :]], axis=0)
            big = jax.lax.dot_general(
                ct_all, selT_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (KS, 4W)
            dg = (big[:, 0:W] * w
                  + (big[:, W:2 * W] * d1
                     + big[:, 2 * W:3 * W] * d2
                     + big[:, 3 * W:] * d3) * sc)
        else:
            dg = jax.lax.dot_general(
                df_ref[:, r, :], selT_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * w
        dg = jnp.where(li >= 0, dg, 0.0)                   # padding lanes

        # the expansion transpose runs at the table storage precision
        # (mm_dt): bf16 tables round each per-sample cotangent to bf16
        # before the (exact bf16 one-hot) segment contraction, with f32
        # accumulation — the same rounding the XLA dedup path applies
        # in its bf16 expand transpose.
        oh = (uid_ref[r][:, None] == u_iota).astype(mm_dt)
        dG = jax.lax.dot_general(
            oh, dg.astype(mm_dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (U, W)

        if dG_ref.dtype != jnp.float32:
            # single-slab grid: no accumulation, write at storage dtype
            # (saves the XLA-side f32 -> bf16 convert pass over (R,U,W))
            dG_ref[r] = dG.astype(dG_ref.dtype)
        else:
            @pl.when(first)
            def _():
                dG_ref[r] = dG

            @pl.when(jnp.logical_not(first))
            def _():
                dG_ref[r] += dG


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_ray_reduce(g_u, uid, lf, F, with_jac=True, jac_lo=0,
                     jac_hi=None, interpret=False):
    """Fused expand + trilerp reduce over ray-structured samples.

    Args:
      g_u: (R, U, W) unique brick rows, f32 or the table's storage
           dtype (bf16 recommended: halves the block's HBM traffic and
           runs the expansion matmuls at full MXU rate, bit-identically
           for rows that are bf16 data).
      uid: (R, K) int32 unique-slot id per sample cell, K = L*S.
      lf:  (8, R, K) f32 [lx, ly, lz, fx, fy, fz, scale, 0].
      F: features per point; W must be 32*F (brick_size 2).
      with_jac: also return the 3-axis spatial jacobian.
      jac_lo/jac_hi: jacobian feature window (the fused density|rgb
        table only differentiates its density features).

    Returns (feats (F, R, K), jac (3*Fj, R, K) or None, Fj =
    jac_hi - jac_lo), feature-major.
    """
    R, U, W = g_u.shape
    K = uid.shape[1]
    Fj = (F if jac_hi is None else jac_hi) - jac_lo
    ks = _pick_kslab(K)
    rt = RAY_TILE
    grid = (R // rt, K // ks)
    # with_jac: block-diagonal transpose-select (F+3Fj, 4W) for the
    # fused single-dot forward; else the plain (W, F) select
    sel = _selT_blockdiag(W, F, jac_lo, Fj, True) if with_jac \
        else jnp.asarray(_sel_np(W, F, 0, F))
    out_shape = [jax.ShapeDtypeStruct((F, R, K), jnp.float32)]
    out_specs = [pl.BlockSpec((F, rt, ks),
                              lambda i, j: (0, i, j))]
    if with_jac:
        out_shape.append(jax.ShapeDtypeStruct((3 * Fj, R, K),
                                              jnp.float32))
        out_specs.append(pl.BlockSpec((3 * Fj, rt, ks),
                                      lambda i, j: (0, i, j)))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, F, Fj, U, with_jac),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rt, U, W), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((rt, ks), lambda i, j: (i, j)),
            pl.BlockSpec((8, rt, ks), lambda i, j: (0, i, j)),
            pl.BlockSpec(sel.shape, lambda i, j: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(g_u, uid, lf, sel)
    return (outs[0], outs[1]) if with_jac else (outs[0], None)


def _frr_fwd(g_u, uid, lf, F, with_jac, jac_lo, jac_hi, interpret):
    out = fused_ray_reduce(g_u, uid, lf, F, with_jac, jac_lo, jac_hi,
                           interpret)
    # zero-size token carries U and g_u's dtype into the backward
    token = jnp.zeros((0,) + g_u.shape[1:], g_u.dtype)
    return out, (uid, lf, token)


def _sel_np(W, F, f_lo, Fo):
    # pure-numpy construction (NOT via _select_matrix, whose jnp
    # constant is a tracer when built inside a traced backward)
    import numpy as np
    S = np.zeros((W, Fo), np.float32)
    for p in range(_PTS):
        for f in range(Fo):
            S[p * F + f_lo + f, f] = 1.0
    return S


def _selT_blockdiag(W, F, jac_lo, Fj, with_jac):
    import numpy as np
    if not with_jac:
        return jnp.asarray(_sel_np(W, F, 0, F).T)
    rows = F + 3 * Fj
    big = np.zeros((rows, 4 * W), np.float32)
    big[0:F, 0:W] = _sel_np(W, F, 0, F).T
    sjT = _sel_np(W, F, jac_lo, Fj).T
    for g in range(3):
        big[F + g * Fj:F + (g + 1) * Fj,
            (g + 1) * W:(g + 2) * W] = sjT
    return jnp.asarray(big)


def _frr_bwd(F, with_jac, jac_lo, jac_hi, interpret, res, cts):
    import numpy as np
    uid, lf, token = res
    U, W = token.shape[1], token.shape[2]
    Fj = (F if jac_hi is None else jac_hi) - jac_lo
    df, dj = cts
    R, K = uid.shape
    ks = _pick_kslab(K)
    single_slab = (K // ks) == 1
    out_dt = token.dtype if single_slab else jnp.float32
    rt = RAY_TILE
    uc = _pick_uc(U, W) if out_dt == jnp.float32 else U
    selT = _selT_blockdiag(W, F, jac_lo, Fj, with_jac)
    in_specs = [
        pl.BlockSpec(selT.shape, lambda i, u, j: (0, 0)),
        pl.BlockSpec((rt, ks), lambda i, u, j: (i, j)),
        pl.BlockSpec((8, rt, ks), lambda i, u, j: (0, i, j)),
        pl.BlockSpec((F, rt, ks), lambda i, u, j: (0, i, j)),
    ]
    args = [selT, uid, lf, df.astype(jnp.float32)]
    if with_jac:
        in_specs.append(pl.BlockSpec((3 * Fj, rt, ks),
                                     lambda i, u, j: (0, i, j)))
        args.append(dj.astype(jnp.float32))
    dG = pl.pallas_call(
        functools.partial(_bwd_kernel, F, Fj, uc, with_jac, token.dtype),
        grid=(R // rt, U // uc, K // ks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rt, uc, W), lambda i, u, j: (i, u, 0)),
        out_shape=jax.ShapeDtypeStruct((R, U, W), out_dt),
        interpret=interpret,
    )(*args)
    return (dG.astype(token.dtype),
            np.zeros(uid.shape, jax.dtypes.float0),
            jnp.zeros(lf.shape, lf.dtype))


fused_ray_reduce.defvjp(_frr_fwd, _frr_bwd)
