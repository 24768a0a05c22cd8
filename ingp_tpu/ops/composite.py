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


def _seg_bounds(counts):
    """Per-ray segment boundaries in a ray-major compact stream:
    (starts (R,), ends (R,)) with ends[r] = starts[r] + counts[r]."""
    ends = jnp.cumsum(counts.astype(jnp.int32))
    return ends - counts, ends


def _start_mask(starts, K):
    """(K,) bool mask of segment-start slots. starts may contain K
    (empty trailing rays): one pad slot absorbs the OOB set, keeping
    both the forward scatter and its backward gather in bounds."""
    return jnp.zeros((K + 1,), bool).at[starts].set(True)[:K]


def _seg_scan(smask, vals):
    """EXACT segmented inclusive cumsum along the last axis.

    The retired formulation ran a GLOBAL cumsum and injected negative
    per-segment bases at each start: at production stream sizes
    (K ~ 2e5) the global running total reaches the accumulated
    sigma*dt of the whole batch (1e4+), and recovering a per-sample
    value by cancellation loses the low bits — 600-step TPU training
    diverged at step ~200-300 (PERF_NOTES round-3). This associative
    segmented scan never ADDS across a segment boundary (the combine
    restarts at flagged elements), so accumulated magnitudes are
    bounded by a single ray's total and there is no cancellation at
    any K. Same log-depth tree XLA lowers cumsum to.

    vals: (C, K); smask: (K,) bool. Returns (C, K).
    """
    f = jnp.broadcast_to(smask[None], vals.shape)

    def comb(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, av + bv)

    _, out = jax.lax.associative_scan(comb, (f, vals), axis=-1)
    return out


def _seg_totals(seg_cum, ends, counts):
    """Per-segment totals from a segmented inclusive cumsum: the value
    at each segment's last slot (exact — no global-prefix difference).
    seg_cum: (C, K); ends, counts: (R,). Returns (C, R)."""
    idx = jnp.clip(ends - 1, 0, seg_cum.shape[-1] - 1)
    v = jnp.take(seg_cum, idx, axis=-1)
    return jnp.where(counts[None] > 0, v, 0.0)


def composite_stream(sig_k, rgb_cm, t_k, dt_k, counts, slot_valid,
                     T_threshold, normals_pred=None, normals_raw=None,
                     sems=None, normals_diff=None, normals_ori=None):
    """composite_rays + ref_loss + distortion_loss directly on the
    ray-major COMPACT stream — the (R, S) round trip (scatter_back of
    every per-sample channel, then (R, S)-domain scans) disappears.

    The per-ray front-to-back recurrence runs as EXACT segmented scans
    over the (K,) stream (_seg_scan: additions never cross a ray
    boundary, so there is no global-magnitude cancellation at any K);
    per-ray reductions read each segment's last scanned slot
    (_seg_totals). Same math as composite_rays on the scattered grid
    (volumerendering.cu:66-164 semantics), tested equal — including at
    production-scale K with adversarial sigma magnitudes
    (tests/test_ops.py stream-compositor suite).

    Args:
      sig_k: (K,) sigma per compact slot (zero at padding).
      rgb_cm: (3, K); t_k, dt_k: (K,) interval start / length.
      counts: (R,) kept samples per ray (plan.cell_valid.sum(-1)).
      slot_valid: (K,) bool.
      normals_diff (3, K) / normals_ori (K,): Ref-NeRF inputs; their
        composites use stop-gradient weights (rendering.py:248).

    Returns the composite_rays dict (+"Ro"/"Rp"/"distortion" when the
    ref inputs are given); per-sample "ws" stays in stream form.
    """
    R = counts.shape[0]
    K = sig_k.shape[0]
    starts, ends = _seg_bounds(counts)
    smask = _start_mask(starts, K)

    sd = jnp.where(slot_valid, sig_k * dt_k, 0.0)
    sd_seg_inc = _seg_scan(smask, sd[None])[0]
    Ts = jnp.exp(-(sd_seg_inc - sd))                   # exclusive
    include = slot_valid & (Ts > T_threshold)
    alphas = 1.0 - jnp.exp(-sd)
    ws = jnp.where(include, alphas * Ts, 0.0)

    # one channel-stacked cumsum + two boundary gathers for every
    # composite output
    # vr_samples counts ws > 0 (not `include`): samples with
    # sigma*dt == 0 pass the T gate but carry zero weight, and
    # composite_rays' count excludes them — keep the two compositors'
    # s/ray metric identical
    chans = [ws[None], (ws * t_k)[None],
             (ws > 0)[None].astype(jnp.float32),
             ws[None] * rgb_cm]
    names = ["opacity", "depth", "vr", "rgb"]
    if normals_pred is not None:
        chans.append(ws[None] * normals_pred)
        names.append("normal_pred")
    if normals_raw is not None:
        chans.append(ws[None] * normals_raw)
        names.append("normal_raw")
    if sems is not None:
        chans.append(ws[None] * sems)
        names.append("semantic")
    w_sg = jax.lax.stop_gradient(ws)
    if normals_diff is not None:
        chans.append(w_sg[None] * normals_diff)
        names.append("Rp")
    if normals_ori is not None:
        chans.append((w_sg * normals_ori)[None])
        names.append("Ro")
    # distortion loss (losses.cu:92-93) from segmented scans of w, w*t
    wt = ws * t_k
    wscan = _seg_scan(smask, jnp.stack([ws, wt]))
    ws_in, wts_in = wscan[0], wscan[1]
    per_sample = 2.0 * (wts_in * (ws_in - ws) - ws_in * (wts_in - wt)) \
        + (1.0 / 3.0) * ws * ws * jnp.where(slot_valid, dt_k, 0.0)
    chans.append(per_sample[None])
    names.append("distortion")

    stacked = jnp.concatenate(chans, axis=0)           # (C_tot, K)
    sums = _seg_totals(_seg_scan(smask, stacked), ends, counts)

    out = {"ws": ws}
    ofs = 0
    for name, ch in zip(names, chans):
        c = ch.shape[0]
        v = sums[ofs:ofs + c]
        ofs += c
        if name in ("opacity", "depth", "Ro", "distortion"):
            out[name] = v[0]
        elif name == "vr":
            out["vr_samples"] = v[0].astype(jnp.int32)
        else:
            out[name] = v.T                            # (R, C)
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
