"""Rendering orchestration: intersect -> march -> model -> composite -> bg.

TPU-native equivalent of models/rendering.py (render /
__render_rays_train / __render_rays_test / volume_render). One fully
jit-compiled pipeline per mode instead of the reference's Python loop over
CUDA launches:

  train (rendering.py:193-251): AABB clamp -> fixed-capacity march ->
    deterministic compaction of valid samples into a static (K,) batch
    (replaces the rays_a ragged packing) -> batched model forward (MXU)
    -> scatter back to (R, S) -> scan compositing -> background blend ->
    Ref-NeRF loss composites.

  test (rendering.py:46-133): same march with a larger sample budget and
    headers under stop_gradient; the reference's alive-ray early-exit
    loop is replaced by the compositor's T-threshold mask (dead samples
    cost zero MLP work thanks to compaction: only valid samples enter
    the network batch).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.intersect import ray_aabb_intersect
from ..ops.march import MarchConfig, march_rays_lattice, march_rays_block
from ..ops.composite import (composite_rays,
                             distortion_loss, ref_loss)
from ..ops.pack import (
    compact_samples, gather_samples, scatter_back, scatter_back_cm,
    ray_ids_for,
)
from .ngp import NGPConfig, ngp_forward_cm, ngp_forward_skybox

MAX_SAMPLES = 1024    # models/rendering.py:9
NEAR_DISTANCE = 0.01  # models/rendering.py:10


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering parameters."""
    exp_step_factor: float = 0.0
    T_threshold: float = 1e-4
    max_samples: int = MAX_SAMPLES
    capacity: int = 192          # S: per-ray sample slots
    march_iters: int = 1024      # M: dt-lattice length (see ops/march)
    samples_per_ray: int = 48    # K/R: network batch budget per ray
    use_skybox: bool = False
    random_bg: bool = False
    stop_header_grads: bool = False
    # fused Pallas composite kernel (ops/pallas/); requires R % 8 == 0
    # and capacity % 128 == 0
    pallas_composite: bool = False
    # report per-level unique-run-count quantiles of the compact stream
    # in the results ("stream_runs", (L,) int32) — the measured input
    # of the trainer's cap auto-calibration (streambrick.
    # run_count_quantiles). ~1 ms/step of extra coords work.
    run_stats: bool = False
    # order rays by kept-sample count before packing the compact
    # stream: tiles of the stream then hold segments of similar length,
    # so the dedup encoder sees fewer run-cap overflows (quality) and
    # its per-tile-class caps can be tight for long-segment tiles
    # without overflowing on sky/grazing rays (PERF_NOTES round-3 root
    # cause). Per-ray outputs are inverse-permuted — compositing
    # semantics and the kept sample SET are unchanged (the global
    # budget is applied before the sort, in the same sample-major
    # order). Independent of the compositor choice.
    stream_sort: bool = True

    def march_cfg(self, model: NGPConfig) -> MarchConfig:
        return MarchConfig(
            grid_size=model.grid_size, cascades=model.cascades,
            scale=model.scale, exp_step_factor=self.exp_step_factor,
            max_samples=self.max_samples, capacity=self.capacity,
            iters=self.march_iters)


def _finish_render(model_cfg, render_cfg, params, results, rays_d,
                   bg_color, skybox_gate, R):
    """Background compositing (rendering.py:229-240), shared tail."""
    base_bg = jnp.broadcast_to(bg_color, (R, 3)) if bg_color is not None \
        else jnp.zeros((R, 3))
    if render_cfg.use_skybox:
        sky = ngp_forward_skybox(model_cfg, params, rays_d)
        rgb_bg = skybox_gate * sky + (1.0 - skybox_gate) * base_bg
    else:
        rgb_bg = base_bg
    results["rgb"] = results["rgb"] \
        + rgb_bg * (1.0 - results["opacity"][:, None])
    return results


# Per-ray result keys produced in sorted-ray space by the train
# renderer — the explicit inverse-permutation whitelist. A shape
# heuristic (v.shape[0] == R) would silently mis-handle any future
# channel-major (C, R, S) entry whose leading dim happens to equal R.
_PER_RAY_KEYS = frozenset({
    "ws", "opacity", "depth", "rgb", "vr_samples", "normal_pred",
    "normal_raw", "semantic", "sigmas", "valid", "ts", "deltas",
    "Ro", "Rp", "distortion",
})


def _inv_permute_results(results, inv):
    """Inverse-permute the per-ray entries of a sorted-ray-space result
    dict back to the caller's ray order. Unknown keys are an error:
    a new results entry must be classified here before it can ride the
    sorted path (total_samples is deliberately added after)."""
    unknown = set(results) - _PER_RAY_KEYS
    if unknown:
        raise KeyError(
            f"unclassified per-ray result keys {sorted(unknown)}: add "
            "them to rendering._PER_RAY_KEYS (or exclude them from the "
            "sorted-space dict)")
    return {k: v[inv] for k, v in results.items()}


def clamp_near(hits_t):
    """Push entry points below NEAR_DISTANCE out to it
    (models/rendering.py:30)."""
    t1 = hits_t[:, 0]
    t1 = jnp.where((t1 >= 0) & (t1 < NEAR_DISTANCE), NEAR_DISTANCE, t1)
    return jnp.stack([t1, hits_t[:, 1]], axis=-1)


@partial(jax.jit, static_argnames=("model_cfg", "render_cfg"))
def render_rays(model_cfg: NGPConfig, render_cfg: RenderConfig, params,
                bitfield, rays_o, rays_d, noise, embedding_a=None,
                exposure=None, bg_color=None, skybox_gate=1.0,
                block_table=None, stats_gate=None):
    """Render a batch of rays end to end (one jitted graph).

    Args:
      params: NGP parameter pytree.
      bitfield: occupancy words from grid/occupancy.
      rays_o, rays_d: (R, 3). noise: (R,) start jitter in [0,1)
        (zeros at test time).
      embedding_a: (R, embed_a_len) per-ray appearance codes or None.
      bg_color: (3,) random/fixed background (rendering.py:229-240);
        None = zeros (synthetic / skybox handles it).
      skybox_gate: traced 0/1 scalar; the trainer disables the skybox
        during grid warmup (train.py:160) without recompiling.

    Returns results dict (rgb, depth, opacity, normal_pred/raw, semantic,
    ws/deltas/ts/valid for losses, Ro/Rp, total_samples, vr_samples).
    """
    R = rays_o.shape[0]
    S = render_cfg.capacity
    K = R * render_cfg.samples_per_ray

    hits_t = clamp_near(ray_aabb_intersect(
        rays_o, rays_d, jnp.zeros(3), jnp.full((3,), model_cfg.scale)))

    if block_table is not None:
        march = march_rays_block(render_cfg.march_cfg(model_cfg),
                                 block_table,
                                 jax.lax.stop_gradient(rays_o),
                                 jax.lax.stop_gradient(rays_d), hits_t,
                                 noise)
    else:
        march = march_rays_lattice(render_cfg.march_cfg(model_cfg),
                                   bitfield,
                                   jax.lax.stop_gradient(rays_o),
                                   jax.lax.stop_gradient(rays_d), hits_t,
                                   noise)
    ts, deltas, valid = march["ts"], march["deltas"], march["valid"]

    o_cm, d_cm = rays_o.T, rays_d.T                        # (3, R)
    # ragged -> fixed: pack valid samples into a (K,) network batch.
    # All per-sample channel quantities are channel-major (C, K) /
    # (C, R, S): a trailing 3 pads to 128 TPU lanes (42x HBM
    # traffic).
    import os
    # kept-count ray ordering: it feeds the dedup encoder homogeneous
    # tiles (less run-cap overflow -> fewer zero-feature degradations)
    # and lets the breaks budget of the run caps assume long segments;
    # per-ray outputs are inverse-permuted at the end
    sort_rays = (render_cfg.stream_sort
                 and os.environ.get("INGP_STREAM_SORT", "1") == "1")
    if sort_rays:
        # apply the global sample budget BEFORE sorting, in the
        # same sample-major order as compact_samples — the kept
        # sample SET is identical to the unsorted path; only the
        # pack order changes (see RenderConfig.stream_sort)
        cum = jnp.cumsum(valid.T.reshape(-1).astype(jnp.int32))
        valid_b = valid & (cum.reshape(S, R).T <= K)
        counts_r = jnp.sum(valid_b, -1)
        perm = jnp.argsort(-counts_r)                  # descending
        # multi-chunk encoders see one chunk at a time with the
        # SAME static tile classes: stripe the sorted rays so
        # every chunk receives the full length spectrum, each
        # stripe still sorted descending internally
        nc = max(1, -(-K // model_cfg.encode_chunk))
        if nc > 1:
            perm = jnp.concatenate([perm[c::nc] for c in range(nc)])
        inv = jnp.argsort(perm)
        valid_c, ts_c, deltas_c = valid_b[perm], ts[perm], deltas[perm]
        o_c, d_c = o_cm[:, perm], d_cm[:, perm]
        emb_c = embedding_a[perm] if embedding_a is not None else None
    else:
        valid_c, ts_c, deltas_c = valid, ts, deltas
        o_c, d_c, emb_c, inv = o_cm, d_cm, embedding_a, None
    plan = compact_samples(valid_c, K)
    rids = ray_ids_for(plan)
    t_k = gather_samples(ts_c, plan)                   # (K,)
    # positions differentiate through rays (pose refinement) but
    # not t (RayMarcher backward, custom_functions.py:104-113)
    dir_cm = d_c[:, rids]                              # (3, K)
    xyz_cm = o_c[:, rids] + t_k[None] * dir_cm
    emb_k = emb_c[rids] if emb_c is not None else None

    # the compact batch is ray-contiguous (ops/pack.py ray-major
    # order): stream-dedup encoding applies when configured
    sigmas_k, rgbs_cm, nraw_cm, npred_cm, sems_cm = ngp_forward_cm(
        model_cfg, params, xyz_cm, dir_cm, embedding_a=emb_k,
        exposure=exposure,
        stop_header_grads=render_cfg.stop_header_grads,
        stream="sorted" if sort_rays else True)
    pad = ~plan.slot_valid
    sigmas_k = jnp.where(pad, 0.0, sigmas_k)

    sigmas = scatter_back(sigmas_k, plan)
    rgbs = scatter_back_cm(rgbs_cm, plan)              # (3, R, S)
    npred = scatter_back_cm(npred_cm, plan)
    nraw = scatter_back_cm(nraw_cm, plan)
    sems = scatter_back_cm(sems_cm, plan)
    nraw_k, dir_k = nraw_cm, dir_cm

    # capacity overflow: samples that didn't fit in K must not
    # composite
    valid_k = plan.cell_valid
    # grid-space per-sample axes follow the (possibly sorted) pack
    # order; everything below runs in that space and the results
    # are inverse-permuted at the end
    ts_g, deltas_g = ts_c, deltas_c

    if render_cfg.pallas_composite:
        from ..ops.pallas.composite_pallas import (composite_pallas,
                                                   pallas_supported)
        ws_p, opacity_p, depth_p, rgb_p = composite_pallas(
            sigmas, rgbs, deltas_g, ts_g, valid_k, render_cfg.T_threshold,
            not pallas_supported())  # interpret on CPU backends
        results = {
            "ws": ws_p, "opacity": opacity_p, "depth": depth_p,
            "rgb": rgb_p,
            "vr_samples": jnp.sum(ws_p > 0, -1),
            # aux composites reuse the kernel's weights; their cotangents
            # flow through the kernel's dL/dws backward
            "normal_pred": jnp.sum(ws_p[None] * npred, -1).T,
            "normal_raw": jnp.sum(ws_p[None] * nraw, -1).T,
            "semantic": jnp.sum(ws_p[None] * sems, -1).T,
        }
    else:
        results = composite_rays(sigmas, rgbs, deltas_g, ts_g, valid_k,
                                 render_cfg.T_threshold,
                                 normals_pred=npred, normals_raw=nraw,
                                 sems=sems)
    results["ts"] = ts_g
    results["deltas"] = deltas_g
    results["valid"] = valid_k
    results["sigmas"] = sigmas

    # Ref-NeRF normal consistency composites (rendering.py:242-249) —
    # still in grid space (nraw/npred/dir follow the pack order)
    normals_diff = (nraw - npred) ** 2                    # (3, R, S)
    dir_n = dir_k / jnp.maximum(
        jnp.linalg.norm(dir_k, axis=0, keepdims=True), 1e-6)
    ori_k = jnp.maximum(jnp.sum(nraw_k * dir_n, 0), 0.0) ** 2
    normals_ori = scatter_back(ori_k, plan)
    Ro, Rp = ref_loss(jax.lax.stop_gradient(sigmas), normals_diff,
                      normals_ori, deltas_g, valid_k,
                      render_cfg.T_threshold)
    results["Ro"], results["Rp"] = Ro, Rp

    results["distortion"] = distortion_loss(results["ws"], deltas_g,
                                            ts_g, valid_k)

    if inv is not None:
        # back to the caller's ray order: every per-ray / per-sample
        # array above was produced in sorted-ray space
        results = _inv_permute_results(results, inv)
    results["total_samples"] = march["total_samples"]
    if render_cfg.run_stats:
        # measured per-level run counts of the ACTUAL encoder stream
        # (xyz_cm is the ray-contiguous compact batch the stream
        # encoder tiles) — feeds the trainer's cap auto-calibration.
        # Measured on the rgb brick table (the larger one: fewer hash
        # collisions merge runs, so its counts upper-bound both tables)
        from ..ops.streambrick import run_count_quantiles
        from .ngp import _normalize_coords
        u_cm = jax.lax.stop_gradient(_normalize_coords(model_cfg,
                                                       xyz_cm))

        def _measure(u):
            return run_count_quantiles(model_cfg.rgb_brick_cfg, u,
                                       model_cfg.stream_tile)

        if stats_gate is None:
            results["stream_runs"] = _measure(u_cm)
        else:
            # measuring every step costs ~18% wall (PERF_NOTES r5
            # autocal pricing); the trainer only reads the value on
            # its adoption cadence, so gate the whole measurement on
            # that cadence — cond executes one branch on TPU
            L = model_cfg.rgb_brick_cfg.n_levels
            results["stream_runs"] = jax.lax.cond(
                stats_gate, _measure,
                lambda u: jnp.full((L,), -1, jnp.int32), u_cm)

    # background compositing (rendering.py:229-240) — caller ray order
    # (rays_d / skybox run in the caller's space)
    return _finish_render(model_cfg, render_cfg, params, results,
                          rays_d, bg_color, skybox_gate, R)


@partial(jax.jit, static_argnames=("model_cfg", "render_cfg"))
def render_rays_test(model_cfg: NGPConfig, render_cfg: RenderConfig,
                     params, bitfield, rays_o, rays_d, embedding_a=None,
                     exposure=None, block_table=None):
    """Inference rendering (no noise, no loss terms, normalized outputs).

    TPU form of the reference's early ray termination (the alive-ray
    loop of rendering.py:75-124): a cheap sigma-only prepass computes
    per-sample transmittance, and only samples with T > T_threshold are
    compacted into the full network batch — dead samples cost zero
    rgb/header work, like rays the reference stops marching.

    Matches __render_rays_test post-processing (rendering.py:173-185):
    normal outputs re-normalized, semantics argmaxed, hit points returned.
    """
    res = _render_rays_test_inner(model_cfg, render_cfg, params, bitfield,
                                  rays_o, rays_d, embedding_a, exposure,
                                  block_table)

    def norm(v):
        return v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)

    out = {
        "rgb": res["rgb"],
        "depth": res["depth"],
        "opacity": res["opacity"],
        "normal_pred": norm(res["normal_pred"]),
        "normal_raw": norm(res["normal_raw"]),
        "semantic": jnp.argmax(res["semantic"], -1),
        "semantic_probs": res["semantic"],
        "total_samples": res["total_samples"],
        "points": rays_o + rays_d * res["depth"][:, None],
    }
    return out


def _render_rays_test_inner(model_cfg, render_cfg, params, bitfield,
                            rays_o, rays_d, embedding_a, exposure,
                            block_table=None):
    from ..ops.composite import render_weights
    from ..ops.pack import scatter_back_cm
    from .ngp import ngp_sigma_cm

    R = rays_o.shape[0]
    S = render_cfg.capacity
    K = R * render_cfg.samples_per_ray

    hits_t = clamp_near(ray_aabb_intersect(
        rays_o, rays_d, jnp.zeros(3), jnp.full((3,), model_cfg.scale)))
    if block_table is not None:
        march = march_rays_block(render_cfg.march_cfg(model_cfg),
                                 block_table, rays_o, rays_d, hits_t,
                                 jnp.zeros(R))
    else:
        march = march_rays_lattice(render_cfg.march_cfg(model_cfg),
                                   bitfield, rays_o, rays_d, hits_t,
                                   jnp.zeros(R))
    ts, deltas, valid = march["ts"], march["deltas"], march["valid"]

    # ---- phase 1: sigma-only prepass on every occupied sample --------
    plan = compact_samples(valid, K)
    rids = ray_ids_for(plan)
    t_k = gather_samples(ts, plan)
    o_cm, d_cm = rays_o.T, rays_d.T
    xyz_cm = o_cm[:, rids] + t_k[None] * d_cm[:, rids]
    sig_k = jnp.where(~plan.slot_valid, 0.0,
                      ngp_sigma_cm(model_cfg, params, xyz_cm,
                                   stream=True))
    sigmas = scatter_back(sig_k, plan)
    valid_k = plan.cell_valid

    # ---- early termination: keep only samples the reference's alive
    # loop would still be marching (T above threshold) -----------------
    ws, Ts = render_weights(sigmas, deltas, valid_k,
                            render_cfg.T_threshold)
    visible = valid_k & (Ts > render_cfg.T_threshold)

    # ---- phase 2: full forward on visible samples only ---------------
    plan2 = compact_samples(visible, K)
    rids2 = ray_ids_for(plan2)
    t_k2 = gather_samples(ts, plan2)
    dir2_cm = d_cm[:, rids2]
    xyz2_cm = o_cm[:, rids2] + t_k2[None] * dir2_cm
    emb2 = embedding_a[rids2] if embedding_a is not None else None
    _, rgbs_cm, nraw_cm, npred_cm, sems_cm = ngp_forward_cm(
        model_cfg, params, xyz2_cm, dir2_cm, embedding_a=emb2,
        exposure=exposure, stop_header_grads=True, stream=True)
    pad2 = ~plan2.slot_valid
    rgbs = scatter_back_cm(jnp.where(pad2[None], 0.0, rgbs_cm), plan2)
    npred = scatter_back_cm(jnp.where(pad2[None], 0.0, npred_cm), plan2)
    nraw = scatter_back_cm(jnp.where(pad2[None], 0.0, nraw_cm), plan2)
    sems = scatter_back_cm(jnp.where(pad2[None], 0.0, sems_cm), plan2)

    results = composite_rays(sigmas, rgbs, deltas, ts, visible,
                             render_cfg.T_threshold,
                             normals_pred=npred, normals_raw=nraw,
                             sems=sems)
    results["total_samples"] = march["total_samples"]

    if render_cfg.use_skybox:
        rgb_bg = ngp_forward_skybox(model_cfg, params, rays_d)
    else:
        rgb_bg = jnp.zeros((R, 3))
    results["rgb"] = results["rgb"] \
        + rgb_bg * (1.0 - results["opacity"][:, None])
    return results


