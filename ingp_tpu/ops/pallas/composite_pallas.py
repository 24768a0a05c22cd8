"""Pallas TPU kernel: fused volume-rendering composite with analytic VJP.

Hand-written replacement for the XLA composite path (ops/composite.py),
which materializes several (R, S) temporaries (sigma*delta, cumsum, Ts,
alphas, ws) in HBM between fusions. This kernel streams (ray_tile, S)
blocks through VMEM once, producing weights and all composited outputs
in a single pass; the backward pass implements the closed-form gradients
of models/csrc/volumerendering.cu:167-311 (dL/dsigma via suffix sums)
as a second single-pass kernel — the same math the reference hand-derived
for CUDA, validated against AD of the XLA path in tests.

Layout: rays on the sublane axis (tile of 8/16 rays), samples on the
lane axis (S multiple of 128). All reductions/scans run along lanes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

RAY_TILE = 8


def pallas_supported() -> bool:
    """True when running on a TPU backend (kernels also run in
    interpret mode on CPU for testing)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _fwd_kernel(sig_ref, rgb_ref, dt_ref, ts_ref, valid_ref,
                thr_ref, ws_ref, opacity_ref, depth_ref, rgb_out_ref):
    sig = sig_ref[...]
    dt = dt_ref[...]
    valid = valid_ref[...]
    sd = jnp.where(valid, sig * dt, 0.0)
    csum = jnp.cumsum(sd, axis=-1)
    Ts = jnp.exp(-(csum - sd))                     # T before each sample
    include = valid & (Ts > thr_ref[0])
    alpha = 1.0 - jnp.exp(-sd)
    ws = jnp.where(include, alpha * Ts, 0.0)
    ws_ref[...] = ws
    opacity_ref[...] = jnp.sum(ws, -1)
    depth_ref[...] = jnp.sum(ws * ts_ref[...], -1)
    for c in range(3):
        rgb_out_ref[:, c] = jnp.sum(ws * rgb_ref[c], -1)


def _bwd_kernel(sig_ref, rgb_ref, dt_ref, ts_ref, valid_ref, thr_ref,
                dws_ref, dopacity_ref, ddepth_ref, drgb_out_ref,
                dsig_ref, drgb_ref):
    """Closed-form gradients (volumerendering.cu:222-241 + dL/dws term).

    dL/drgb_s  = dL/dC * w_s
    dL/dsig_s  = dt_s * ( sum_c dL_c (rgb_sc T'_s - (C_c - pref_c(s)))
                 + dL/dO (1 - O) + dL/dD (t_s T'_s - (D - prefD(s)))
                 + T'_s dL/dws_s - suffix(dws*ws)(s) )
    with T'_s the transmittance AFTER sample s and pref including s.
    """
    sig = sig_ref[...]
    dt = dt_ref[...]
    ts = ts_ref[...]
    valid = valid_ref[...]
    sd = jnp.where(valid, sig * dt, 0.0)
    csum = jnp.cumsum(sd, axis=-1)
    Ts = jnp.exp(-(csum - sd))
    include = valid & (Ts > thr_ref[0])
    alpha = 1.0 - jnp.exp(-sd)
    ws = jnp.where(include, alpha * Ts, 0.0)
    T_after = Ts * (1.0 - alpha)

    dws = dws_ref[...]
    dO = dopacity_ref[...][:, None]
    dD = ddepth_ref[...][:, None]

    O = jnp.sum(ws, -1, keepdims=True)
    D = jnp.sum(ws * ts, -1, keepdims=True)
    prefD = jnp.cumsum(ws * ts, -1)

    acc = dO * (1.0 - O) + dD * (ts * T_after - (D - prefD))
    # dL/dws contribution: T'_s*dws_s - sum_{j>s} dws_j*ws_j
    dww = dws * ws
    suffix = jnp.sum(dww, -1, keepdims=True) - jnp.cumsum(dww, -1)
    acc = acc + T_after * dws - suffix

    for c in range(3):
        rgb_c = rgb_ref[c]
        dC = drgb_out_ref[:, c][:, None]
        C = jnp.sum(ws * rgb_c, -1, keepdims=True)
        pref = jnp.cumsum(ws * rgb_c, -1)
        acc = acc + dC * (rgb_c * T_after - (C - pref))
        drgb_ref[c] = dC[:, 0][:, None] * ws
    dsig_ref[...] = jnp.where(include, dt * acc, 0.0)


def _run_fwd(sigmas, rgbs, deltas, ts, valid, thr, interpret):
    R, S = sigmas.shape
    grid = (R // RAY_TILE,)
    row = lambda i: (i, 0)
    row3 = lambda i: (0, i, 0)
    spec_rs = pl.BlockSpec((RAY_TILE, S), row)
    spec_r3 = pl.BlockSpec((3, RAY_TILE, S), row3)
    spec_r = pl.BlockSpec((RAY_TILE,), lambda i: (i,))
    spec_rc = pl.BlockSpec((RAY_TILE, 3), row)
    thr_arr = jnp.full((1,), thr, jnp.float32)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[spec_rs, spec_r3, spec_rs, spec_rs, spec_rs,
                  pl.BlockSpec((1,), lambda i: (0,))],
        out_specs=[spec_rs, spec_r, spec_r, spec_rc],
        out_shape=[
            jax.ShapeDtypeStruct((R, S), jnp.float32),
            jax.ShapeDtypeStruct((R,), jnp.float32),
            jax.ShapeDtypeStruct((R,), jnp.float32),
            jax.ShapeDtypeStruct((R, 3), jnp.float32),
        ],
        interpret=interpret,
    )(sigmas, rgbs, deltas, ts, valid, thr_arr)


def _run_bwd(sigmas, rgbs, deltas, ts, valid, thr, dws, dO, dD, dC,
             interpret):
    R, S = sigmas.shape
    grid = (R // RAY_TILE,)
    row = lambda i: (i, 0)
    row3 = lambda i: (0, i, 0)
    spec_rs = pl.BlockSpec((RAY_TILE, S), row)
    spec_r3 = pl.BlockSpec((3, RAY_TILE, S), row3)
    spec_r = pl.BlockSpec((RAY_TILE,), lambda i: (i,))
    spec_rc = pl.BlockSpec((RAY_TILE, 3), row)
    thr_arr = jnp.full((1,), thr, jnp.float32)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[spec_rs, spec_r3, spec_rs, spec_rs, spec_rs,
                  pl.BlockSpec((1,), lambda i: (0,)),
                  spec_rs, spec_r, spec_r, spec_rc],
        out_specs=[spec_rs, spec_r3],
        out_shape=[
            jax.ShapeDtypeStruct((R, S), jnp.float32),
            jax.ShapeDtypeStruct((3, R, S), jnp.float32),
        ],
        interpret=interpret,
    )(sigmas, rgbs, deltas, ts, valid, thr_arr, dws, dO, dD, dC)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def composite_pallas(sigmas, rgbs, deltas, ts, valid, T_threshold,
                     interpret=False):
    """Fused composite: returns (ws, opacity, depth, rgb).

    sigmas/deltas/ts: (R, S) f32; rgbs: (3, R, S) channel-major
    (a trailing 3 pads to 128 lanes in HBM); valid: (R, S) bool.
    R must be a multiple of 8 and S a multiple of 128 (pad otherwise).
    Gradients flow to sigmas and rgbs (deltas/ts treated as constants,
    like the reference's VolumeRenderer custom Function).
    """
    valid = valid.astype(jnp.float32) > 0
    ws, opacity, depth, rgb = _run_fwd(
        sigmas.astype(jnp.float32), rgbs.astype(jnp.float32),
        deltas.astype(jnp.float32), ts.astype(jnp.float32),
        valid, T_threshold, interpret)
    return ws, opacity, depth, rgb


def _fwd_rule(sigmas, rgbs, deltas, ts, valid, T_threshold, interpret):
    out = composite_pallas(sigmas, rgbs, deltas, ts, valid, T_threshold,
                           interpret)
    return out, (sigmas, rgbs, deltas, ts, valid)


def _bwd_rule(T_threshold, interpret, res, grads):
    sigmas, rgbs, deltas, ts, valid = res
    dws, dO, dD, dC = grads
    valid_b = valid.astype(jnp.float32) > 0
    dsig, drgb = _run_bwd(
        sigmas.astype(jnp.float32), rgbs.astype(jnp.float32),
        deltas.astype(jnp.float32), ts.astype(jnp.float32), valid_b,
        T_threshold, dws.astype(jnp.float32), dO.astype(jnp.float32),
        dD.astype(jnp.float32), dC.astype(jnp.float32), interpret)
    return (dsig, drgb, jnp.zeros_like(deltas), jnp.zeros_like(ts),
            jnp.zeros_like(valid))


composite_pallas.defvjp(_fwd_rule, _bwd_rule)
