"""Training system — TPU-native replacement for the pytorch-lightning
NeRFSystem (train.py:82-455).

Architecture: the entire optimization step (ray assembly from cached
poses/directions, pose-refinement deltas, appearance-embedding lookup,
render, all losses, backward, Adam update) is ONE jit-compiled XLA
program with donated buffers; the occupancy-grid refresh every 16 steps
is a second jitted program (train.py:271-275). The host loop only
samples pixel indices (NumPy) and feeds fixed-shape batches.

Data parallelism: with n_devices > 1 the per-ray pipeline runs inside
jax.shard_map over a 1-D ('data',) jax.sharding.Mesh — ray batch
sharded, parameters replicated, an explicit gradient pmean as the DP
all-reduce (fwd_bwd_shard; replaces PL's DDPPlugin/NCCL, train.py:39,
430-432). GSPMD propagation alone cannot shard this model: the
sort-based ray compaction is global over the sharded axis, so the
partitioner would all-gather the batch and silently replicate the
whole step (benchmarking/collective_accounting.py). See parallel/.
"""
from __future__ import annotations

import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..core.rays import get_rays, axisangle_to_R
from ..models.ngp import NGPConfig, ngp_init, ngp_sigma
from ..models.rendering import (RenderConfig, render_rays, render_rays_test,
                                MAX_SAMPLES)
from ..models.implicit_mask import mask_init, mask_apply
from ..grid.occupancy import (grid_init, mark_invisible_cells,
                              update_density_grid)
from .losses import LossConfig, compute_losses, total_loss
from .metrics import mse as mse_metric, psnr, ssim
from ..utils.ckpt import (save_ckpt, load_ckpt, slim_state,
                          AsyncCkptManager)

REAL_DATASETS = ("colmap", "nerfpp", "tnt", "kitti", "mega", "highbay")


def model_config_from_hparams(h) -> NGPConfig:
    """train.py:99-106. Optional attrs (density_L, ...) override the
    flagship encoder op-point — used by tests/dryruns with small grids."""
    return NGPConfig(
        scale=h.scale,
        rgb_act="none" if h.use_exposure else "sigmoid",
        use_skybox=h.use_skybox,
        embed_a=h.embed_a,
        embed_a_len=h.embed_a_len,
        classes=h.num_classes,
        compute_dtype=getattr(h, "compute_dtype", "float32"),
        grid_size=getattr(h, "grid_size", 128),
        density_L=getattr(h, "density_L", 16),
        density_F=getattr(h, "density_F", 8),
        density_log2T=getattr(h, "density_log2T", 19),
        rgb_L=getattr(h, "rgb_L", 16),
        rgb_F=getattr(h, "rgb_F", 8),
        rgb_log2T=getattr(h, "rgb_log2T", 21),
        encoder=getattr(h, "encoder", "hash"),
        table_dtype=getattr(h, "table_dtype", "float32"),
        encode_chunk=getattr(h, "encode_chunk", 16384),
        encode_remat=getattr(h, "encode_remat", True),
        stream_dedup=getattr(h, "stream_dedup", False),
        stream_tile=getattr(h, "stream_tile", 256),
        stream_slack=getattr(h, "stream_slack", 1.5),
        stream_seg=getattr(h, "stream_seg", 4),
        stream_direct_frac=getattr(h, "stream_direct_frac", 0.7),
        stream_seg_head=getattr(h, "stream_seg_head", 20),
        stream_head_frac=getattr(h, "stream_head_frac", 0.0),
    )


def render_config_from_hparams(h, test=False) -> RenderConfig:
    exp_step = 1.0 / 256 if h.dataset_name in REAL_DATASETS else 0.0
    # The stream_dedup encoder (ops/streambrick.py, an NGPConfig knob)
    # at the validated caps is FULL quality parity with the per-sample
    # control (26.13/0.872 vs 26.15/0.873 novel at 600 steps,
    # PERF_NOTES round-3 quality gate); stream_direct_frac=0.0 remains
    # the per-sample-exact fallback.
    spr = getattr(h, "samples_per_ray", 48)
    return RenderConfig(
        exp_step_factor=exp_step,
        T_threshold=1e-2 if test else 1e-4,   # render.py:125 / rendering.py:227
        max_samples=MAX_SAMPLES,
        capacity=getattr(h, "capacity", 192),
        march_iters=getattr(h, "march_iters", 1024),
        samples_per_ray=spr,
        use_skybox=h.use_skybox,
        random_bg=h.random_bg,
        stop_header_grads=test,
        pallas_composite=getattr(h, "pallas_composite", False),
        run_stats=(not test and getattr(h, "stream_autocal", False)
                   and getattr(h, "stream_dedup", False)),
        stream_sort=getattr(h, "stream_sort", True),
    )


def loss_config_from_hparams(h) -> LossConfig:
    return LossConfig(
        lambda_sparsity=getattr(h, "sparsity_loss", 0.0),
        embed_msk=h.embed_msk,
        normal_ref=h.normal_ref,
        normal_mono=h.normal_mono,
        semantic=h.render_semantic,
        depth_mono=h.depth_mono,
        depth_scale=h.scale,
        lambda_distortion=1e-4 if h.dataset_name == "mega" else 3e-4,
    )


class NeRFSystem:
    """Owns params/optimizer/grid state and the jitted step functions."""

    WARMUP_STEPS = 256     # train.py:87
    UPDATE_INTERVAL = 16   # train.py:88

    def __init__(self, hparams, train_dataset=None, test_dataset=None,
                 mesh=None):
        from ..utils.compile_cache import enable_compile_cache
        enable_compile_cache()
        self.hparams = hparams
        self.model_cfg = model_config_from_hparams(hparams)
        self.render_cfg = render_config_from_hparams(hparams)
        self.render_cfg_test = render_config_from_hparams(hparams, test=True)
        self.loss_cfg = loss_config_from_hparams(hparams)
        self.mesh = mesh

        if train_dataset is None:
            from ..data import dataset_dict
            kwargs = dict(root_dir=hparams.root_dir,
                          downsample=hparams.downsample)
            if hparams.dataset_name == "kitti":
                kwargs.update(seq_id=hparams.kitti_seq,
                              frame_start=hparams.kitti_start,
                              frame_end=hparams.kitti_end,
                              test_id=hparams.kitti_test_id,
                              nvs=hparams.nvs)
            ctor = dataset_dict[hparams.dataset_name]
            train_dataset = ctor(split=hparams.split, **kwargs)
            test_dataset = ctor(split="test", **kwargs)
        self.train_dataset = train_dataset
        self.test_dataset = test_dataset
        self.train_dataset.batch_size = hparams.batch_size
        self.train_dataset.ray_sampling_strategy = \
            hparams.ray_sampling_strategy
        self.img_wh = self.train_dataset.img_wh

        # --- parameters -------------------------------------------------
        key = jax.random.PRNGKey(hparams.seed)
        k_model, k_emb, k_msk = jax.random.split(key, 3)
        N_imgs = self.train_dataset.n_images
        self.N_imgs = N_imgs
        params = {"model": ngp_init(k_model, self.model_cfg)}
        # embedding table always allocated like the reference
        # (train.py:214); only used when embed_a
        params["embedding_a"] = 0.01 * jax.random.normal(
            k_emb, (N_imgs, hparams.embed_a_len))
        if hparams.embed_msk:
            params["msk"] = mask_init(k_msk)
        if hparams.optimize_ext:
            params["ext"] = {"dR": jnp.zeros((N_imgs, 3)),
                             "dT": jnp.zeros((N_imgs, 3))}
        self.params = params

        # --- optimizer (train.py:238-253) -------------------------------
        total_steps = (hparams.num_epochs + hparams.normal_epochs) \
            * hparams.steps_per_epoch
        self.lr_schedule = optax.cosine_decay_schedule(
            hparams.lr, total_steps, alpha=1.0 / 30)
        net_opt = optax.adam(self.lr_schedule, eps=1e-8)
        if hparams.optimize_ext:
            label_tree = jax.tree.map(lambda _: "net", params)
            label_tree["ext"] = jax.tree.map(lambda _: "ext",
                                             params["ext"])
            tx = optax.multi_transform(
                {"net": net_opt, "ext": optax.adam(1e-6)}, label_tree)
        else:
            tx = net_opt
        # PL Trainer(gradient_clip_val=50) clips the global norm
        # (train.py:434)
        self.tx = optax.chain(optax.clip_by_global_norm(50.0), tx)
        self.opt_state = self.tx.init(params)

        # --- occupancy grid ---------------------------------------------
        self.grid = grid_init(self.model_cfg.cascades,
                              self.model_cfg.grid_size)
        w, h = self.img_wh
        self.grid = mark_invisible_cells(
            self.grid, jnp.asarray(self.train_dataset.K),
            jnp.asarray(self.train_dataset.poses), w, h,
            self.model_cfg.grid_size, self.model_cfg.cascades,
            self.model_cfg.scale)

        # cached device buffers (train.py:221-222)
        self.directions = jnp.asarray(self.train_dataset.directions)
        self.poses = jnp.asarray(self.train_dataset.poses)

        self.global_step = 0
        self._step_dev = None     # device step counter, lazily synced
        self._test_render_cache = {}  # sharded test-render fns by shape
        self._base_key = jax.random.PRNGKey(
            getattr(hparams, "seed", 0) + 1)
        self._build_step()

        if hparams.ckpt_load:
            self.load(hparams.ckpt_load)

    # ------------------------------------------------------------------
    def _build_step(self):
        h = self.hparams
        model_cfg, render_cfg = self.model_cfg, self.render_cfg
        loss_cfg = self.loss_cfg
        tx = self.tx
        use_embed_a = h.embed_a
        use_msk = h.embed_msk
        use_ext = h.optimize_ext
        use_exposure = h.use_exposure
        random_bg = h.random_bg
        N_imgs = self.N_imgs
        img_w, img_h = self.img_wh
        warmup = self.WARMUP_STEPS
        # HDR-NeRF unit-exposure anchor (train.py:301-306)
        unit_exposure_rgb = getattr(self.train_dataset,
                                    "unit_exposure_rgb", None)

        n_shards = self.mesh.size if self.mesh is not None else 1

        def fwd_bwd(params, bitfield, block_table, directions, poses,
                    batch, noise, step, key):
            """Loss/aux/grads on (a shard of) the ray batch.

            Under the mesh this body runs INSIDE shard_map on the local
            ray shard: every per-ray stage — march, compaction, stream
            encode, composite — sees R/n rays and an R/n-scaled sample
            budget, so each device genuinely does 1/n of the work.
            (Relying on GSPMD propagation instead silently REPLICATED
            the whole step: the sort-based compaction is a global op
            over the sharded axis, so the partitioner all-gathered the
            batch and every device computed all R rays — measured as a
            ~1% gradient all-reduce footprint in the optimized HLO,
            benchmarking/collective_accounting.py.)"""

            def loss_fn(p):
                dirs = directions[batch["pix_idxs"]]
                pose = poses[batch["img_idxs"]]
                if use_ext:  # pose refinement (train.py:144-149)
                    dR = axisangle_to_R(p["ext"]["dR"][batch["img_idxs"]])
                    R = jnp.matmul(dR, pose[..., :3],
                                   precision=jax.lax.Precision.HIGHEST)
                    t = pose[..., 3] + p["ext"]["dT"][batch["img_idxs"]]
                    pose_ = jnp.concatenate([R, t[..., None]], -1)
                else:
                    pose_ = pose
                rays_o, rays_d = get_rays(dirs, pose_)

                emb = p["embedding_a"][batch["img_idxs"]] \
                    if use_embed_a else None
                _, k_bg = jax.random.split(key)
                bg = jax.random.uniform(k_bg, (3,)) if random_bg else None
                gate = (step >= warmup).astype(jnp.float32)

                # run-stat measurement only on the adoption cadence
                # (training_step reads aux["stream_runs"] after the
                # global_step increment, hence step + 1)
                stats_gate = ((step + 1) % NeRFSystem.AUTOCAL_EVERY
                              == 0) if render_cfg.run_stats else None
                results = render_rays(
                    model_cfg, render_cfg, p["model"], bitfield,
                    rays_o, rays_d, noise, embedding_a=emb,
                    exposure=batch.get("exposure"), bg_color=bg,
                    skybox_gate=gate, block_table=block_table,
                    stats_gate=stats_gate)

                if loss_cfg.lambda_sparsity > 0:
                    k_sp = jax.random.fold_in(key, 7)
                    pts = jax.random.uniform(
                        k_sp, (16384, 3), minval=-model_cfg.scale,
                        maxval=model_cfg.scale)
                    if n_shards > 1 and 16384 % n_shards == 0:
                        # each shard evaluates ITS slice of the SAME
                        # point set (k_sp is replicated): the pmean of
                        # per-shard means equals the single-device
                        # mean over all 16384 points exactly, at 1/n
                        # the density-MLP work per device
                        per = 16384 // n_shards
                        idx = jax.lax.axis_index("data")
                        pts = jax.lax.dynamic_slice_in_dim(
                            pts, idx * per, per, 0)
                    from ..models.ngp import ngp_sigma as _sig
                    results["sparsity"] = _sig(model_cfg, p["model"], pts)

                mask = None
                if use_msk:  # train.py:280-288 (uvi shifted into [0,1])
                    uv = batch["uv"]
                    uvi = jnp.stack([
                        uv[:, 0] / img_h,
                        uv[:, 1] / img_w,
                        batch["img_idxs"].astype(jnp.float32) / N_imgs,
                    ], -1)
                    mask = mask_apply(p["msk"], uvi)

                loss_d = compute_losses(loss_cfg, results, batch,
                                        step=step, mask=mask)
                if use_exposure and unit_exposure_rgb is not None:
                    from ..models.ngp import log_radiance_to_rgb
                    unit_rgb = log_radiance_to_rgb(
                        model_cfg, p["model"], jnp.zeros((1, 3)),
                        exposure=jnp.ones((1, 1)))
                    loss_d["unit_exposure"] = \
                        0.5 * (unit_rgb - unit_exposure_rgb) ** 2
                loss = total_loss(loss_d)
                aux = {
                    "loss": loss,
                    # raw MSE, not PSNR: the mesh path pmeans aux
                    # across shards, and mean-of-logs != log-of-mean
                    # (Jensen) — step_fn derives PSNR from the
                    # (p)meaned MSE so dp-N logs the same train/psnr
                    # a single chip would
                    "mse": mse_metric(results["rgb"], batch["rgb"]),
                    "s_per_ray": results["total_samples"]
                    / batch["rgb"].shape[0],
                    "loss_terms": {k: jnp.mean(v)
                                   for k, v in loss_d.items()},
                }
                if "stream_runs" in results:
                    aux["stream_runs"] = results["stream_runs"]
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return loss, aux, grads

        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            # explicit-collective data parallelism: pmean of the
            # per-shard gradients IS the DP all-reduce (replaces the
            # reference's NCCL DDP hook, train.py:39,430-432); loss/aux
            # pmean to replicated values so every process logs the
            # global metrics. stream_runs takes pmax — the static cap
            # calibration must cover the WORST shard's run counts.
            def fwd_bwd_shard(params, bitfield, block_table, directions,
                              poses, batch, noise, step, key):
                loss, aux, grads = fwd_bwd(params, bitfield, block_table,
                                           directions, poses, batch,
                                           noise, step, key)
                sr = aux.pop("stream_runs", None)
                loss, aux, grads = jax.tree.map(
                    lambda x: jax.lax.pmean(x, "data"),
                    (loss, aux, grads))
                if sr is not None:
                    aux["stream_runs"] = jax.lax.pmax(sr, "data")
                return loss, aux, grads

            fwd_bwd_run = jax.shard_map(
                fwd_bwd_shard, mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(), P("data"), P("data"),
                          P(), P()),
                out_specs=P(), check_vma=False)
        else:
            fwd_bwd_run = fwd_bwd

        def step_fn(params, opt_state, bitfield, block_table, directions,
                    poses, batch, step, key):
            # per-step randomness derives ON DEVICE from a constant base
            # key + the device-carried step counter: through the axon
            # tunnel, a host-built PRNGKey and an int32 upload cost a
            # dispatch round trip per step
            key = jax.random.fold_in(key, step)
            # INGP_HOST_NOISE=1 A/B: host-sampled start jitter (the
            # pre-round-3 scheme) vs the device fold_in derivation —
            # measured 2.7 dB BETTER than host noise (PERF_NOTES r5).
            # Derived on the GLOBAL batch before the shard_map so the
            # sharded step jitters rays identically to the single-chip
            # step (k_noise mirrors the historical split(key)[0]).
            noise = batch.get("noise")
            if noise is None:
                k_noise, _ = jax.random.split(key)
                noise = jax.random.uniform(k_noise,
                                           batch["pix_idxs"].shape)
            loss, aux, grads = fwd_bwd_run(params, bitfield, block_table,
                                           directions, poses, batch,
                                           noise, step, key)
            # PSNR from the (pmean'd) MSE — the global-batch value on
            # any mesh size (see the aux["mse"] note in loss_fn)
            aux["psnr"] = -10.0 * jnp.log10(aux.pop("mse"))
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, step + 1, aux

        if self.mesh is not None:
            from ..parallel.mesh import shard_step
            self.train_step = shard_step(step_fn, self.mesh)
        else:
            self.train_step = jax.jit(step_fn, donate_argnums=(0, 1))

        density_fn = partial(ngp_sigma, self.model_cfg)
        grid_size, cascades, scale = (self.model_cfg.grid_size,
                                      self.model_cfg.cascades,
                                      self.model_cfg.scale)
        erode = h.dataset_name == "colmap"  # train.py:275

        def grid_update(params, grid, key, warmup_flag):
            return update_density_grid(
                density_fn, params, grid, key,
                h.density_threshold * MAX_SAMPLES / np.sqrt(3),
                grid_size, cascades, scale, warmup_flag, erode=erode)

        self._grid_update = grid_update

    # ------------------------------------------------------------------
    def _march_table(self):
        """Neighborhood rows for the block marcher, or None to use the
        per-point lattice marcher. The block marcher is exact for the
        constant-dt lattice (exp_step_factor == 0) and conservative
        otherwise (short 4-step runs; samples never dropped, validated
        against the exact-skip oracle at exp_step 1/256 in
        tests/test_block_march.py). INGP_BLOCK_MARCH=0 forces the
        per-point lattice path for A/B runs."""
        if os.environ.get("INGP_BLOCK_MARCH", "1") != "1":
            return None
        return self.grid.get("block_table")

    def maybe_update_grid(self):
        if self.global_step % self.UPDATE_INTERVAL == 0:
            self.grid = self._grid_update(
                self.params["model"], self.grid,
                jax.random.PRNGKey(self.global_step),
                self.global_step < self.WARMUP_STEPS)

    BATCH_KEYS = ("img_idxs", "pix_idxs", "uv", "rgb", "label",
                  "depth", "normal", "exposure", "noise")

    def stage_batch(self, batch):
        """Upload a host batch to device WITHOUT blocking: device_put
        dispatches the copy asynchronously, so a batch staged right
        after a training_step's dispatch uploads while that step's
        device compute runs (fit()'s double buffer). Multi-process
        builds the globally-sharded array from this host's local slice
        instead (DDP semantics: each rank contributes its own rays)."""
        host_batch = {k: v for k, v in batch.items()
                      if k in self.BATCH_KEYS}
        if self.mesh is not None:
            if jax.process_count() > 1:
                from ..parallel.distributed import host_local_batch
                return host_local_batch(self.mesh, host_batch)
            from ..parallel.mesh import shard_batch
            return shard_batch(self.mesh, host_batch)
        return {k: jax.device_put(np.asarray(v))
                for k, v in host_batch.items()}

    def training_step(self, batch, rng_key=None):
        """One optimization step on a batch dict (train.py:268-345) —
        host numpy arrays or a batch already staged by stage_batch()."""
        self.maybe_update_grid()
        if os.environ.get("INGP_HOST_NOISE", "0") == "1" \
                and "noise" not in batch:
            if not hasattr(self, "_noise_rng"):
                self._noise_rng = np.random.default_rng(
                    self.hparams.seed + 17)
            batch = dict(batch)
            batch["noise"] = self._noise_rng.random(
                len(batch["pix_idxs"]), dtype=np.float32)
        host_batch = {k: v for k, v in batch.items()
                      if k in self.BATCH_KEYS}
        if all(isinstance(v, jax.Array) for v in host_batch.values()):
            dev_batch = host_batch          # pre-staged (fit double buffer)
        elif self.mesh is not None and jax.process_count() > 1:
            from ..parallel.distributed import host_local_batch
            dev_batch = host_local_batch(self.mesh, host_batch)
        else:
            dev_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
        # the base key is a CONSTANT device array and the step counter
        # lives on device (step_fn returns step+1): steady-state steps
        # upload nothing but the ray batch
        key = rng_key if rng_key is not None else self._base_key
        if self._step_dev is None:
            self._step_dev = jnp.int32(self.global_step)
        self.params, self.opt_state, self._step_dev, aux = \
            self.train_step(
                self.params, self.opt_state, self.grid["bitfield"],
                self._march_table(), self.directions, self.poses,
                dev_batch, self._step_dev, key)
        self.global_step += 1
        if "stream_runs" in aux:
            self._maybe_grow_stream_caps(aux["stream_runs"])
        return aux

    # cap auto-calibration (VERDICT r4 item 7): caps derive from the
    # MEASURED per-tile run counts of real batches instead of the
    # seg_est guess. Caps grow monotonically (adopt-then-grow), so the
    # step recompiles at most a handful of times as the carving grid
    # reshapes the kept-segment distribution (overflow marking keeps
    # the brief pre-growth lag non-corrupting — zero-feature
    # degradation at worst, never row aliasing).
    AUTOCAL_MARGIN = 8        # slots above the measured p99.5
    AUTOCAL_EVERY = 16        # host-read cadence (the grid cadence)

    def _maybe_grow_stream_caps(self, runs_dev):
        if self.global_step % self.AUTOCAL_EVERY != 0:
            return
        runs = np.asarray(runs_dev)
        if np.any(runs < 0):
            return  # gated-off sentinel (off-cadence read)
        aligned = ((runs + self.AUTOCAL_MARGIN + 7) // 8 * 8)
        target = np.minimum(aligned, self.model_cfg.stream_tile)
        # NEVER adopt below the formula caps: an early measurement
        # (warmup stream, pre-carving) can come in far under the
        # formula floor, and running even ~16 steps with undersized
        # caps mass-overflows cells into zero features. All those
        # cells share ONE network input (zeros), so their fog
        # supervision pumps the MLP bias — a global density shift that
        # the occupancy-grid feedback then locks in (measured: -5.6 dB
        # novel at 600 steps from exactly this seed-below-formula
        # adoption; the same final caps applied statically from step 0
        # gate at 26.18 — PERF_NOTES round-5 autocal bisection).
        from ..ops.streambrick import stream_caps as _formula
        floor = np.asarray(_formula(
            self.model_cfg.rgb_brick_cfg, self.model_cfg.stream_tile,
            slack=self.model_cfg.stream_slack,
            seg_est=self.model_cfg.stream_seg))
        target = np.minimum(np.maximum(target, floor),
                            self.model_cfg.stream_tile)
        cur = self.model_cfg.stream_caps
        if cur is None:
            new = tuple(int(c) for c in target)
        elif np.any(target > np.asarray(cur)):
            new = tuple(int(max(c, t)) for c, t in zip(cur, target))
        else:
            return
        import dataclasses as _dc
        self.model_cfg = _dc.replace(self.model_cfg, stream_caps=new)
        self._build_step()          # recompiles on next call
        # the sharded test renderers close over the OLD model_cfg —
        # drop them so the next eval re-traces with the adopted caps
        self._test_render_cache.clear()
        if jax.process_index() == 0:
            print(f"[autocal] step {self.global_step}: stream caps -> "
                  f"{new}", flush=True)

    # ------------------------------------------------------------------
    def _sharded_test_render(self, ro, rd, emb):
        """Test render of one ray chunk with the rays sharded over the
        ('data',) mesh via shard_map — each device runs march/prepass/
        compaction/forward on its chunk/n rays (per-shard sample
        budget). Per-ray outputs come back sharded; total_samples is
        psum'd. The compiled fn is cached per (chunk, emb?) shape."""
        key = (ro.shape[0], emb is not None)
        fn = self._test_render_cache.get(key)
        if fn is None:
            from jax.sharding import PartitionSpec as P
            mcfg, rcfg = self.model_cfg, self.render_cfg_test
            has_emb = emb is not None
            has_bt = self._march_table() is not None

            def body(p, bitfield, block_table, ro, rd, emb):
                out = render_rays_test(
                    mcfg, rcfg, p, bitfield, ro, rd,
                    embedding_a=emb if has_emb else None,
                    block_table=block_table if has_bt else None)
                ts_ = jax.lax.psum(out.pop("total_samples"), "data")
                return out, ts_

            fn = jax.jit(jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(P(), P(), P(), P("data"), P("data"),
                          P("data")),
                out_specs=(P("data"), P()), check_vma=False))
            self._test_render_cache[key] = fn
        emb_arr = emb if emb is not None \
            else jnp.zeros((ro.shape[0], 0), jnp.float32)
        bt = self._march_table()
        bt_arr = bt if bt is not None else jnp.zeros((0,), jnp.int32)
        out, ts_ = fn(self.params["model"], self.grid["bitfield"],
                      bt_arr, ro, rd, emb_arr)
        out["total_samples"] = ts_
        return out

    def render_image(self, pose, chunk_size=None, embedding=None):
        """Chunked whole-image test render (train.py:177-190).

        The chunk is capped so the per-chunk network batch
        (chunk * samples_per_ray) stays within a safe HBM envelope
        (a 65536-ray chunk at samples_per_ray=48 OOMs a v5e). With a
        device mesh, rays are sharded over ('data',) — evaluation scales
        with the chips like training does, and the HBM envelope (and so
        the chunk cap) scales with the mesh size."""
        chunk = chunk_size or self.hparams.chunk_size
        spr = max(self.render_cfg_test.samples_per_ray, 1)
        # single-process: shard each image's rays over the mesh.
        # multi-host: hosts render DIFFERENT images (validate's
        # round-robin), so each renders locally — sharding one image
        # over a global mesh would need every host in lockstep on the
        # same rays.
        n_dev = self.mesh.size if (self.mesh is not None
                                   and jax.process_count() == 1) else 1
        chunk = min(chunk, max(n_dev * 1_500_000 // spr, 4096))
        if n_dev > 1:  # keep ray chunks evenly shardable
            chunk = max(chunk // n_dev, 1) * n_dev
        pose = jnp.asarray(pose)
        rays_o, rays_d = get_rays(self.directions, pose)
        n = rays_o.shape[0]
        if self.hparams.embed_a:
            if embedding is None:
                embedding = self.params["embedding_a"][0:1]  # train.py:154
            emb_full = jnp.broadcast_to(embedding, (n, embedding.shape[-1]))
        outs = []
        for i in range(0, n, chunk):
            sl = slice(i, min(i + chunk, n))
            ro, rd = rays_o[sl], rays_d[sl]
            # pad to a static block size: tail chunks pad up to the
            # full chunk (one compiled shape for the whole loop); a
            # single sub-chunk image pads to the next mesh multiple —
            # shard_map, unlike the GSPMD path it replaced, hard
            # requires the ray count divisible by the mesh size
            if i > 0 or n > chunk:
                blk = chunk
            else:
                blk = -(-ro.shape[0] // n_dev) * n_dev
            pad = blk - ro.shape[0]
            if pad:
                ro = jnp.concatenate([ro, ro[-1:].repeat(pad, 0)])
                rd = jnp.concatenate([rd, rd[-1:].repeat(pad, 0)])
            emb = emb_full[sl] if self.hparams.embed_a else None
            if emb is not None and pad:
                emb = jnp.concatenate([emb, emb[-1:].repeat(pad, 0)])
            if n_dev > 1:
                # per-shard test render (shard_map): each device runs
                # the full two-phase pipeline on its R/n rays with an
                # R/n-scaled sample budget — GSPMD propagation cannot
                # shard this (the compaction is global over rays, so
                # the partitioner would all-gather and replicate; see
                # fwd_bwd and collective_accounting.py)
                res = self._sharded_test_render(ro, rd, emb)
            else:
                res = render_rays_test(self.model_cfg,
                                       self.render_cfg_test,
                                       self.params["model"],
                                       self.grid["bitfield"], ro, rd,
                                       embedding_a=emb,
                                       block_table=self._march_table())
            if pad:
                res = {k: v[:-pad] if hasattr(v, "shape") and v.ndim >= 1
                       and v.shape[0] == blk else v
                       for k, v in res.items()}
            outs.append(res)
        merged = {}
        for k in outs[0]:
            if k == "total_samples":
                merged[k] = sum(int(o[k]) for o in outs)
            else:
                merged[k] = jnp.concatenate([o[k] for o in outs], 0)
        return merged

    def validate(self, max_images=None):
        """PSNR/SSIM over the test split (validation_step,
        train.py:353-392).

        Multi-process: test images are round-robined over hosts and the
        per-image metrics all-gathered (all_gather_ddp_if_available,
        train.py:379-391)."""
        w, h = self.test_dataset.img_wh
        psnrs, ssims, lpipss = [], [], []
        lpips_params = None
        if getattr(self.hparams, "eval_lpips", False):
            from .lpips import load_lpips
            lpips_params = load_lpips(self.hparams.lpips_weights)
        n = len(self.test_dataset.poses)
        if max_images:
            n = min(n, max_images)
        pc, pid = jax.process_count(), jax.process_index()
        for i in range(n):
            if i % pc != pid:
                continue
            item = self.test_dataset.test_item(i)
            res = self.render_image(item["pose"])
            pred = jnp.clip(res["rgb"], 0, 1).reshape(h, w, 3)
            gt = jnp.asarray(item["rgb"]).reshape(h, w, 3)
            psnrs.append(float(psnr(pred, gt)))
            ssims.append(float(ssim(pred, gt)))
            if lpips_params is not None:
                from .lpips import lpips as lpips_fn
                lpipss.append(float(lpips_fn(lpips_params, pred, gt)))
        if pc > 1:
            from ..parallel.distributed import all_gather_metrics
            # hosts may own uneven image counts: NaN-pad to a common
            # length, gather, then drop the padding
            cap = -(-n // pc)
            pad = [float("nan")] * (cap - len(psnrs))
            psnrs = [v for v in all_gather_metrics(psnrs + pad)
                     if np.isfinite(v)]
            ssims = [v for v in all_gather_metrics(ssims + pad)
                     if np.isfinite(v)]
            if lpipss:
                lpipss = [v for v in all_gather_metrics(lpipss + pad)
                          if np.isfinite(v)]
        out = {"psnr": float(np.mean(psnrs)),
               "ssim": float(np.mean(ssims))}
        if lpipss:
            out["lpips"] = float(np.mean(lpipss))
        return out

    # ------------------------------------------------------------------
    def fit(self, log_every=100, ckpt_dir=None, rng=None,
            on_step=None, use_native_loader=None):
        """Full training loop (Trainer.fit equivalent).

        use_native_loader: None = auto — use the C++ background-prefetch
        sampler (native/loader.py) when the toolchain is available,
        falling back to the NumPy sampler.
        """
        h = self.hparams
        # each host samples an independent ray stream (DDP semantics:
        # per-rank batches); rank 0 keeps the bare seed
        rng = rng or np.random.default_rng([h.seed, jax.process_index()]
                                           if jax.process_count() > 1
                                           else h.seed)
        main = jax.process_index() == 0
        total_steps = (h.num_epochs + h.normal_epochs) * h.steps_per_epoch

        native = None
        if use_native_loader is not False:
            try:
                from ..native import NativeBatchSampler, native_available
                if native_available():
                    native = NativeBatchSampler(
                        self.train_dataset, h.batch_size, seed=h.seed,
                        strategy=h.ray_sampling_strategy)
            except Exception as e:
                if use_native_loader:
                    raise
                print(f"native loader unavailable ({e}); numpy sampler")

        logger = None
        ckpt_mgr = None
        if ckpt_dir:
            # EVERY process participates in checkpointing: orbax's
            # multi-host save/restore runs collective barriers, and a
            # restore applied only on host 0 would leave the other
            # hosts at fresh init with global_step=0 — divergent loop
            # trip counts and replicated state (advisor r3 finding).
            # The checkpoint root is assumed host-shared (the standard
            # orbax multi-host contract).
            os.makedirs(ckpt_dir, exist_ok=True)
            if main:
                from ..utils.loggers import make_logger
                logger = make_logger(getattr(h, "logger", "jsonl"),
                                     ckpt_dir,
                                     getattr(h, "exp_name", "exp"))
            # async epoch checkpoints + preemption recovery: resume from
            # the latest committed step when fit() starts cold on an
            # existing run directory (SURVEY.md §5)
            ckpt_mgr = AsyncCkptManager(os.path.join(ckpt_dir, "steps"))
            latest = ckpt_mgr.latest_step()
            if jax.process_count() > 1:
                from ..parallel.distributed import broadcast_int
                latest = broadcast_int(latest)  # hosts must agree
            if (latest is not None and self.global_step == 0
                    and not getattr(h, "no_resume", False)):
                # restore against the live state template so leaves
                # land with THIS process's shardings — resumes work
                # across backend/topology changes (e.g. a TPU-run
                # checkpoint resumed on a CPU host)
                self.load_state(ckpt_mgr.restore(
                    latest, target=self._ckpt_state()))
                if main:
                    print(f"resumed from {ckpt_dir}/steps @ step "
                          f"{self.global_step}")
        profile_dir = getattr(h, "profile_dir", None)

        def sample():
            return native.next_batch() if native is not None \
                else self.train_dataset.sample_batch(rng)

        t0 = time.time()
        rays_done = 0
        first_step = self.global_step
        # double-buffered input: batch N+1 is sampled AND device_put
        # right after step N's async dispatch, so its host->device
        # upload overlaps step N's device compute (the reference's
        # pinned-memory DataLoader workers, train.py:255-260, expressed
        # as JAX async dispatch + async device_put)
        staged = self.stage_batch(sample())
        for step in range(first_step, total_steps):
            if profile_dir and step == first_step + 20:
                jax.profiler.start_trace(profile_dir)
            if profile_dir and step == first_step + 30:
                jax.profiler.stop_trace()
            batch = staged
            aux = self.training_step(batch)
            if step + 1 < total_steps:
                staged = self.stage_batch(sample())
            rays_done += h.batch_size
            if on_step is not None:
                on_step(step, aux)
            if log_every and (step % log_every == 0) and main:
                dt = time.time() - t0
                rays_s = rays_done / max(dt, 1e-9)
                print(f"step {step:6d} loss {float(aux['loss']):.5f} "
                      f"psnr {float(aux['psnr']):.2f} "
                      f"s/ray {float(aux['s_per_ray']):.1f} "
                      f"rays/s {rays_s:,.0f}")
                if logger:
                    logger.log_metrics(step, {
                        "loss": float(aux["loss"]),
                        "train/psnr": float(aux["psnr"]),
                        "train/s_per_ray": float(aux["s_per_ray"]),
                        "train/rays_per_s": rays_s,
                        "lr": float(self.lr_schedule(step)),
                    })
            if ckpt_dir and main and step > 0 and step % 10000 == 0:
                self._dump_val_images(ckpt_dir, step)
            if ckpt_mgr and (step + 1) % h.steps_per_epoch == 0:
                # non-blocking: serialization overlaps the next steps
                ckpt_mgr.save(step + 1, self._ckpt_state())
        if native is not None:
            native.close()
        if logger:
            logger.close()
        if ckpt_mgr:
            ckpt_mgr.close()
        if ckpt_dir:
            # all processes: orbax coordinates multi-host writes (a
            # main-only save of replicated-on-the-mesh arrays would
            # wait forever on the other hosts' shards)
            self.save(os.path.join(ckpt_dir, "last"))
            save_ckpt(os.path.join(ckpt_dir, "last_slim"),
                      slim_state(self._ckpt_state()))
        return self

    def _dump_val_images(self, ckpt_dir, step):
        """Every-10k-step qualitative dump (train.py:316-343)."""
        from ..utils.vis import (depth2img, semantic2img, save_image,
                                 convert_normal)
        w, h = self.test_dataset.img_wh
        item = self.test_dataset.test_item(0)
        res = self.render_image(item["pose"])
        img_dir = os.path.join(ckpt_dir, "val")
        os.makedirs(img_dir, exist_ok=True)
        rgb = np.clip(np.asarray(res["rgb"]).reshape(h, w, 3), 0, 1)
        save_image(rgb, os.path.join(img_dir, f"{step:05d}_rgb.png"))
        depth = depth2img(np.asarray(res["depth"]).reshape(h, w),
                          scale=2 * self.hparams.scale)[..., ::-1]
        save_image(depth / 255.0,
                   os.path.join(img_dir, f"{step:05d}_depth.png"))
        for key in ("normal_pred", "normal_raw"):
            nrm = convert_normal(
                np.asarray(res[key]).reshape(h, w, 3), item["pose"])
            save_image(np.clip((nrm + 1) / 2, 0, 1), os.path.join(
                img_dir,
                f"{step:05d}_{key.replace('_pred', '')}.png"))
        if self.hparams.render_semantic:
            sem = semantic2img(np.asarray(res["semantic"]).reshape(h, w),
                               self.hparams.num_classes)[..., ::-1]
            save_image(sem / 255.0, os.path.join(
                img_dir, f"{step:05d}_semantic.png"))

    # ------------------------------------------------------------------
    def state(self):
        s = {"params": self.params, "opt_state": self.opt_state,
             "grid": self.grid, "step": self.global_step}
        if self.model_cfg.stream_caps is not None:
            # adopted autocal caps ride the checkpoint: a preemption
            # resume must not silently reset to formula caps and
            # replay the adoption/recompile ratchet from one
            # post-restore batch
            s["stream_caps"] = np.asarray(self.model_cfg.stream_caps,
                                          np.int32)
        return s

    def _ckpt_state(self):
        """state() with every leaf serializable in THIS process
        topology. Multi-host: params/opt_state live replicated on the
        global mesh (orbax handles them), but the occupancy grid is
        updated by a per-process jit — host-local single-device
        arrays, which orbax refuses to serialize multi-host. They are
        bitwise identical on every host (same deterministic update on
        replicated inputs), so re-wrap them as mesh-replicated global
        arrays."""
        state = self.state()
        if jax.process_count() <= 1 or self.mesh is None:
            return state
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec as P
        n_glob = len(jax.devices())

        def glob(x):
            if (isinstance(x, jax.Array)
                    and len(x.sharding.device_set) < n_glob):
                return multihost_utils.host_local_array_to_global_array(
                    np.asarray(x), self.mesh, P())
            return x
        return jax.tree.map(glob, state)

    def save(self, path):
        save_ckpt(path, self._ckpt_state())

    def load(self, path):
        self.load_state(load_ckpt(path))

    def load_state(self, state):
        # prefix-filtered warm start (utils.py:7-29): tolerate slim ckpts
        params = state["params"]
        for k in list(self.params.keys()):
            if k in params:
                self.params[k] = jax.tree.map(jnp.asarray, params[k])
        if "opt_state" in state:
            try:
                self.opt_state = jax.tree.map(
                    jnp.asarray, state["opt_state"],
                    is_leaf=lambda x: not isinstance(x, (dict, list, tuple)))
            except Exception:
                pass  # slim ckpt: keep fresh optimizer
        if "grid" in state:
            self.grid = jax.tree.map(jnp.asarray, state["grid"])
            if "block_table" not in self.grid:
                from ..ops.march import build_block_table
                self.grid["block_table"] = build_block_table(
                    self.grid["bitfield"], self.model_cfg.grid_size,
                    self.model_cfg.cascades)
        if state.get("stream_caps") is not None:
            caps = tuple(int(c) for c in np.asarray(state["stream_caps"]))
            if caps != self.model_cfg.stream_caps:
                import dataclasses as _dc
                self.model_cfg = _dc.replace(self.model_cfg,
                                             stream_caps=caps)
                self._build_step()
                self._test_render_cache.clear()
        self.global_step = int(state.get("step", 0))
        self._step_dev = None     # re-sync from global_step on next step
