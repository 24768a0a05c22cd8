"""Pallas TPU kernel: fused brick-lattice trilerp reduce (+ jacobian).

The brick encoder's grad pass (ops/brickgrid._encode_grad_chunk) computes
four reductions of the gathered row block g (n, 256):

    feats = (g * wx*wy*wz)        @ S
    jac_d = (g * dW_d * scale)    @ S     for d in {x, y, z}

XLA emits them as four separate fusions, each re-reading the 268 MB
block from HBM (measured 58 ms/step, PERF_NOTES.md trace table). This
kernel streams each g tile through VMEM ONCE, builds the four weight
planes on the VPU from per-row (local, frac, scale), and runs the four
tiny select matmuls on the MXU.

The backward is the transpose computed in a single VPU pass: the select
matrix S maps lane q = p*F + f to feature f, so (ct @ S^T)[*, q] is just
ct[*, q % F] — a broadcast, no matmul:

    d_g = wx*wy*wz * df[q%F] + sum_d dW_d * scale * dj_d[q%F]

replacing another ~35 ms of XLA fusions. Positions are not
differentiated through this op (training stops gradients at the rays;
pose refinement uses the unfused path).

Kernel is specialized to brick_size=2 (27 lattice points, the flagship
op-point); other shapes fall back to the XLA path in ops/brickgrid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ROW_TILE = 512          # g rows per grid step
_P = 3                  # lattice points per axis (brick_size 2)
_PTS = 27


def pallas_supported() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def reduce_supported(brick_size: int, n_features: int, row_width: int,
                     jac_lo: int, jac_hi) -> bool:
    """Kernel covers the flagship brick shape: B=2, full-F jacobian.

    OFF unless INGP_PALLAS_REDUCE=1: measured 22.0k vs 22.9k rays/s
    against the XLA reduce path at the flagship op-point — XLA's
    per-reduce fusions currently beat this kernel (its output relayouts
    eat the saved g re-reads). Kept as validated groundwork for a
    variant that also fuses the gather."""
    import os
    if os.environ.get("INGP_PALLAS_REDUCE", "0") != "1":
        return False
    return (brick_size == 2 and row_width == n_features * 32
            and jac_lo == 0 and jac_hi is None)


def _lane_coords(W, F):
    q = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    p = q // F
    valid = p < _PTS
    li = jnp.where(valid, p // (_P * _P), -1)
    lj = jnp.where(valid, (p // _P) % _P, -1)
    lk = jnp.where(valid, p % _P, -1)
    return li, lj, lk, q % F


def _axis_w(lane, loc, fr):
    # where-chains instead of mask-arithmetic: the two compares are
    # CSE'd between w and d, and the selects skip the f32 converts and
    # multiply-adds of the at0*(1-fr)+at1*fr form — these planes are
    # the fused kernels' dominant VPU cost
    at0 = lane == loc
    at1 = lane == loc + 1
    w = jnp.where(at0, 1.0 - fr, jnp.where(at1, fr, 0.0))
    d = jnp.where(at0, -1.0, jnp.where(at1, 1.0, 0.0))
    return w, d


def _point_coords():
    """Point-DOMAIN lane coords: lane p (one 128-lane register row)
    holds lattice point p; points 27..127 are padding (-1 -> zero
    weight in _axis_w)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    valid = p < _PTS
    pi = jnp.where(valid, p // (_P * _P), -1)
    pj = jnp.where(valid, (p // _P) % _P, -1)
    pk = jnp.where(valid, p % _P, -1)
    return pi, pj, pk


def _plane_weights(lf, pcoords, W, F):
    """The 4 trilerp weight planes (w, dwx*wyz, dwy*wxz, dwz*wxy) on
    (T, W).

    INGP_FACTORED_W=1 builds them in the 27-POINT domain (one 128-lane
    register row per op instead of W = 32F lanes) and expands
    lane-wise by an F-fold element repeat (lane q of the row layout
    holds point q // F) — the per-lane construction is the fused
    kernels' dominant VPU cost (PERF_NOTES round-3 trace). DEFAULT
    OFF: Mosaic currently rejects every element-repeat lowering along
    the lane axis (`jnp.repeat` -> "infer-vector-layout: unsupported
    shape cast"; `pltpu.repeat` is tile-repeat, wrong semantics), so
    the compiled path uses the per-lane build; the factored path runs
    under interpret mode / future Mosaic versions."""
    import os
    if os.environ.get("INGP_FACTORED_W", "0") == "1":
        pi, pj, pk = pcoords
        ax, dax = _axis_w(pi, lf[0][:, None], lf[3][:, None])
        ay, day = _axis_w(pj, lf[1][:, None], lf[4][:, None])
        az, daz = _axis_w(pk, lf[2][:, None], lf[5][:, None])
        ayz = ay * az
        planes = (ax * ayz, dax * ayz, day * (ax * az),
                  daz * (ax * ay))
        return tuple(jnp.repeat(p, F, axis=1)[:, :W] for p in planes)
    li, lj, lk, _ = _lane_coords(W, F)
    wx, dwx = _axis_w(li, lf[0][:, None], lf[3][:, None])
    wy, dwy = _axis_w(lj, lf[1][:, None], lf[4][:, None])
    wz, dwz = _axis_w(lk, lf[2][:, None], lf[5][:, None])
    p_yz = wy * wz
    return (wx * p_yz, dwx * p_yz, dwy * (wx * wz), dwz * (wx * wy))


def _fwd_kernel(F, g_ref, lf_ref, sel_ref, feats_ref, jac_ref):
    W = g_ref.shape[1]
    g = g_ref[...].astype(jnp.float32)                     # (T, W)
    lf = lf_ref[...]
    w, d1, d2, d3 = _plane_weights(lf, _point_coords(), W, F)
    sel = sel_ref[...]                                     # (W, F)

    def red(wprod):
        # (F, T): contract the lane axis, feature-major output (dense)
        return jax.lax.dot_general(
            sel, g * wprod, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    feats_ref[...] = red(w)
    scT = lf_ref[6][None, :]
    jac_ref[0:F] = red(d1) * scT
    jac_ref[F:2 * F] = red(d2) * scT
    jac_ref[2 * F:] = red(d3) * scT


def _bwd_kernel(F, lf_ref, df_ref, dj_ref, dg_ref):
    W = dg_ref.shape[1]
    li, lj, lk, lane_f = _lane_coords(W, F)
    lf = lf_ref[...]
    w, d1, d2, d3 = _plane_weights(lf, _point_coords(), W, F)
    sc = lf_ref[6][:, None]

    def bcast(ct):
        # ct (F, T) -> (T, W) via lane % F (the S^T contraction)
        out = jnp.zeros(dg_ref.shape, jnp.float32)
        for f in range(F):
            out += jnp.where(lane_f == f, ct[f][:, None], 0.0)
        return out

    dg = bcast(df_ref[...]) * w
    dg += (bcast(dj_ref[0:F]) * d1 + bcast(dj_ref[F:2 * F]) * d2
           + bcast(dj_ref[2 * F:]) * d3) * sc
    # zero the padding lanes so the table-gradient scatter stays clean
    dg_ref[...] = jnp.where(li >= 0, dg, 0.0)


def _select_matrix(W, F):
    import numpy as np
    S = np.zeros((W, F), np.float32)
    for p in range(_PTS):
        for f in range(F):
            S[p * F + f, f] = 1.0
    return jnp.asarray(S)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_brick_reduce(g, lf, F, interpret=False):
    """g (n, W) gathered rows, lf (8, n) f32 [lx,ly,lz,fx,fy,fz,scale,0].

    Returns (feats (F, n), jac (3F, n)) feature-major. n must be a
    multiple of ROW_TILE (the brick chunk sizes are).
    """
    n, W = g.shape
    grid = (n // ROW_TILE,)
    sel = _select_matrix(W, F)
    feats, jac = pl.pallas_call(
        functools.partial(_fwd_kernel, F),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, W), lambda i: (i, 0)),
            pl.BlockSpec((8, ROW_TILE), lambda i: (0, i)),
            pl.BlockSpec((W, F), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((F, ROW_TILE), lambda i: (0, i)),
            pl.BlockSpec((3 * F, ROW_TILE), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F, n), jnp.float32),
            jax.ShapeDtypeStruct((3 * F, n), jnp.float32),
        ],
        interpret=interpret,
    )(g, lf, sel)
    return feats, jac


def _fbr_fwd(g, lf, F, interpret):
    # dtype token: zero-size array (residuals must be JAX types); the
    # shape is static — W = 32*F by the reduce_supported gate, n from lf
    return (fused_brick_reduce(g, lf, F, interpret),
            (lf, jnp.zeros((0,), g.dtype)))


def _fbr_bwd(F, interpret, res, cts):
    lf, g_token = res
    g_dtype = g_token.dtype
    df, dj = cts
    n, W = lf.shape[1], 32 * F
    grid = (n // ROW_TILE,)
    dg = pl.pallas_call(
        functools.partial(_bwd_kernel, F),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, ROW_TILE), lambda i: (0, i)),
            pl.BlockSpec((F, ROW_TILE), lambda i: (0, i)),
            pl.BlockSpec((3 * F, ROW_TILE), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, W), jnp.float32),
        interpret=interpret,
    )(lf, df.astype(jnp.float32), dj.astype(jnp.float32))
    return dg.astype(g_dtype), jnp.zeros(lf.shape, lf.dtype)


fused_brick_reduce.defvjp(_fbr_fwd, _fbr_bwd)
