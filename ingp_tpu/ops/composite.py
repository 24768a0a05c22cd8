"""Volume-rendering compositing on dense (R, S) sample segments.

TPU-native replacement for the sequential per-ray CUDA loops of
models/csrc/volumerendering.cu (composite_train_fw/bw), losses.cu
(distortion_loss_fw/bw) and ref_loss.cu (composite_refloss_fw/bw).

The per-ray front-to-back recurrence
    a_i = 1 - exp(-sigma_i * delta_i),  T_i = prod_{j<i} (1 - a_j)
is an exp of an exclusive cumulative sum of sigma*delta along the sample
axis — a single vectorized pass on the VPU. The early-break of the CUDA
loop (stop accumulating once T <= T_threshold, volumerendering.cu:111)
becomes a mask: sample i contributes iff T_i > T_threshold, which is
exactly the set of samples the reference loop reaches.

Backward passes come from JAX AD through the cumsum (the hand-derived
closed forms of volumerendering.cu:222-241 / losses.cu:131-138 are what
AD computes here, and serve as our test oracle), so fwd+bwd stay fused
inside the surrounding jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _exclusive_cumsum(x, axis=-1):
    c = jnp.cumsum(x, axis=axis)
    return c - x


def render_weights(sigmas, deltas, valid, T_threshold):
    """Per-sample compositing weights w_i = a_i * T_i with early stop.

    Args:
      sigmas, deltas: (R, S); valid: (R, S) bool; T_threshold: float.

    Returns:
      ws: (R, S) weights (0 where invalid or past the T cutoff).
      Ts: (R, S) transmittance *before* each sample.
    """
    sd = jnp.where(valid, sigmas * deltas, 0.0)
    Ts = jnp.exp(-_exclusive_cumsum(sd, axis=-1))
    include = valid & (Ts > T_threshold)
    alphas = 1.0 - jnp.exp(-sd)
    ws = jnp.where(include, alphas * Ts, 0.0)
    return ws, Ts


def composite_rays(sigmas, rgbs, deltas, ts, valid, T_threshold,
                   normals_pred=None, normals_raw=None, sems=None):
    """Front-to-back composite of all per-sample quantities.

    Matches composite_train_fw (volumerendering.cu:66-115): accumulates
    rgb / normal_pred / semantics / depth (sum w*t, start-of-interval t)
    / opacity, and returns the per-sample weights `ws` for the distortion
    loss. `vr_samples` counts samples actually composited per ray
    (total_samples in the CUDA kernel).

    Per-sample channel quantities are CHANNEL-MAJOR: rgbs / normals
    (3, R, S), sems (classes, R, S) — a trailing channel axis of 3/7
    pads to 128 TPU lanes (42x HBM traffic). Composited outputs are
    returned ray-major (R, C) for the losses/metrics (tiny arrays).

    Returns a dict; normal_pred/normal_raw/semantic keys present only when
    the corresponding inputs are given.
    """
    ws, Ts = render_weights(sigmas, deltas, valid, T_threshold)
    included = ws > 0

    out = {
        "ws": ws,
        "opacity": jnp.sum(ws, -1),
        "depth": jnp.sum(ws * ts, -1),
        "rgb": jnp.sum(ws[None] * rgbs, -1).T,
        "vr_samples": jnp.sum(included, -1),
    }
    if normals_pred is not None:
        out["normal_pred"] = jnp.sum(ws[None] * normals_pred, -1).T
    if normals_raw is not None:
        out["normal_raw"] = jnp.sum(ws[None] * normals_raw, -1).T
    if sems is not None:
        out["semantic"] = jnp.sum(ws[None] * sems, -1).T
    return out


def distortion_loss(ws, deltas, ts, valid):
    """Mip-NeRF-360 distortion loss per ray (losses.cu:92-93 math).

    loss_i = 2*(wts_in_i * ws_ex_i - ws_in_i * wts_ex_i) + w_i^2 d_i / 3,
    summed over samples; scans run along the sample axis. Backward via AD
    (replaces distortion_loss_bw_kernel, losses.cu:104-172).

    Returns (R,) per-ray loss.
    """
    w = jnp.where(valid, ws, 0.0)
    wt = w * ts
    ws_in = jnp.cumsum(w, -1)
    wts_in = jnp.cumsum(wt, -1)
    ws_ex = ws_in - w
    wts_ex = wts_in - wt
    per_sample = 2.0 * (wts_in * ws_ex - ws_in * wts_ex) \
        + (1.0 / 3.0) * w * w * jnp.where(valid, deltas, 0.0)
    return jnp.sum(per_sample, -1)


def ref_loss(sigmas, normals_diff, normals_ori, deltas, valid, T_threshold):
    """Ref-NeRF normal-consistency composites (ref_loss.cu:4-73).

    Composites the per-sample squared pred-vs-raw normal difference
    (channel-major (3, R, S)) and the back-facing penalty ((R, S)) with
    the volume weights. `sigmas` should already be stop_gradient'ed by
    the caller — the reference feeds detached sigmas (rendering.py:248)
    so these losses shape normals only, not density.

    Returns (Ro (R,), Rp (R, 3)).
    """
    ws, _ = render_weights(sigmas, deltas, valid, T_threshold)
    Rp = jnp.sum(ws[None] * normals_diff, -1).T
    Ro = jnp.sum(ws * normals_ori, -1)
    return Ro, Rp


def composite_alpha(sigmas, deltas, valid):
    """Per-sample alphas and weights without early stop
    (composite_alpha_fw, volumerendering.cu:5-63; unused by the main
    path but part of the vren API surface).

    Returns (alphas (R, S), ws (R, S)).
    """
    sd = jnp.where(valid, sigmas * deltas, 0.0)
    Ts = jnp.exp(-_exclusive_cumsum(sd, axis=-1))
    alphas = 1.0 - jnp.exp(-sd)
    return alphas, jnp.where(valid, alphas * Ts, 0.0)
