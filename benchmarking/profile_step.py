"""Piecewise timing of the training step on real hardware.

Times each pipeline stage with an honest device->host sync (float() of a
scalar reduction — block_until_ready is unreliable through the axon
tunnel), to locate where step time goes. Run serially, one TPU process
at a time.

Usage: python benchmarking/profile_step.py [--encoder fused|brick]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=8, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
        _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _sync(out)
    return (time.perf_counter() - t0) / n


def _sync(out):
    leaves = [x for x in jax.tree.leaves(out)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                        jnp.floating)]
    if leaves:
        float(jnp.sum(leaves[-1]))
    else:
        jax.block_until_ready(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="fused")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--spr", type=int, default=24)
    ap.add_argument("--table_dtype", default="bfloat16")
    args = ap.parse_args()

    from ingp_tpu.training.trainer import NeRFSystem
    from ingp_tpu.data.synthetic import SyntheticDataset
    from ingp_tpu.models.ngp import (NGPConfig, ngp_forward, ngp_grad,
                                     ngp_sigma)
    from ingp_tpu.models.rendering import render_rays
    from ingp_tpu.ops.march import march_rays_lattice
    from ingp_tpu.ops.brickgrid import (brickgrid_encode,
                                        brickgrid_encode_grad)

    h = SimpleNamespace(
        dataset_name="synthetic", root_dir="", split="train",
        downsample=1.0, scale=0.5, use_skybox=False, use_exposure=False,
        embed_a=False, embed_a_len=4, embed_msk=False, num_classes=7,
        batch_size=args.batch, ray_sampling_strategy="all_images",
        num_epochs=20, normal_epochs=0, steps_per_epoch=1000, lr=1e-2,
        density_threshold=1e-2, depth_mono=False, normal_mono=False,
        normal_ref=True, optimize_ext=False, random_bg=False,
        render_semantic=False, chunk_size=131072, seed=0, ckpt_load=None,
        compute_dtype="bfloat16", capacity=128, march_iters=1024,
        samples_per_ray=args.spr, encoder=args.encoder,
        table_dtype=args.table_dtype, encode_remat=True)
    tr = SyntheticDataset(split="train", img_size=256, n_train=16)
    te = SyntheticDataset(split="test", img_size=1)
    sys_ = NeRFSystem(h, tr, te)
    rng = np.random.default_rng(0)

    print("== settle grid / compile step ==", flush=True)
    for _ in range(20):
        aux = sys_.training_step(tr.sample_batch(rng, args.batch))
    float(aux["loss"])

    batch = tr.sample_batch(rng, args.batch)
    t_step = timeit(lambda: sys_.training_step(batch), n=10)
    print(f"full train step           : {t_step*1e3:9.2f} ms "
          f"({args.batch/t_step:,.0f} rays/s)", flush=True)

    cfg = sys_.model_cfg
    rcfg = sys_.render_cfg
    params = sys_.params
    bitfield = sys_.grid["bitfield"]

    dirs = sys_.directions[batch["pix_idxs"]]
    pose = sys_.poses[batch["img_idxs"]]
    from ingp_tpu.core.rays import get_rays
    rays_o, rays_d = get_rays(dirs, pose)
    noise = jnp.zeros(args.batch)

    # --- render fwd only ---
    fwd = jax.jit(lambda p: render_rays(cfg, rcfg, p, bitfield, rays_o,
                                        rays_d, noise)["rgb"])
    t = timeit(fwd, params["model"])
    print(f"render_rays fwd           : {t*1e3:9.2f} ms", flush=True)

    # --- render fwd+bwd ---
    def loss(p):
        r = render_rays(cfg, rcfg, p, bitfield, rays_o, rays_d, noise)
        return (jnp.mean((r["rgb"] - batch["rgb"]) ** 2)
                + 1e-3 * jnp.mean(r["Ro"]) + 1e-3 * jnp.mean(r["Rp"])
                + 3e-4 * jnp.mean(r["distortion"]))
    g = jax.jit(jax.grad(loss))
    t = timeit(g, params["model"])
    print(f"render_rays fwd+bwd       : {t*1e3:9.2f} ms", flush=True)

    # --- march only ---
    from ingp_tpu.core.intersect import ray_aabb_intersect
    from ingp_tpu.models.rendering import clamp_near
    hits_t = clamp_near(ray_aabb_intersect(
        rays_o, rays_d, jnp.zeros(3), jnp.full((3,), cfg.scale)))
    mcfg = rcfg.march_cfg(cfg)
    mfn = jax.jit(lambda: march_rays_lattice(mcfg, bitfield, rays_o,
                                             rays_d, hits_t, noise))
    t = timeit(mfn)
    print(f"march_rays_lattice        : {t*1e3:9.2f} ms", flush=True)

    # --- compaction plan ---
    from ingp_tpu.ops.pack import compact_samples, ray_ids_for, \
        gather_samples
    march = mfn()
    K = args.batch * args.spr
    pfn = jax.jit(lambda v: compact_samples(v, K))
    t = timeit(pfn, march["valid"])
    print(f"compact_samples plan      : {t*1e3:9.2f} ms", flush=True)

    plan = pfn(march["valid"])
    rids = ray_ids_for(plan)
    t_k = gather_samples(march["ts"], plan)
    xyz = rays_o[rids] + t_k[:, None] * rays_d[rids]
    u = (xyz + cfg.scale) / (2 * cfg.scale)
    dirv = rays_d[rids]
    print(f"  network batch K={K} ({100*float(jnp.mean(plan.slot_valid)):.0f}% occupied)",
          flush=True)

    # --- encoder pieces ---
    if args.encoder == "fused":
        bcfg = cfg.fused_brick_cfg
        table = params["model"]["grid_table"]
    else:
        bcfg = cfg.density_brick_cfg
        table = params["model"]["density_table"]

    efn = jax.jit(lambda tb: brickgrid_encode(bcfg, tb, u))
    t = timeit(efn, table)
    print(f"brick encode fwd          : {t*1e3:9.2f} ms", flush=True)

    egfn = jax.jit(lambda tb: brickgrid_encode_grad(
        bcfg, tb, u, jac_lo=0, jac_hi=cfg.density_F)[0])
    t = timeit(egfn, table)
    print(f"brick encode+jac fwd      : {t*1e3:9.2f} ms", flush=True)

    ebwd = jax.jit(jax.grad(lambda tb: jnp.sum(
        brickgrid_encode(bcfg, tb, u).astype(jnp.float32))))
    t = timeit(ebwd, table)
    print(f"brick encode fwd+bwd      : {t*1e3:9.2f} ms", flush=True)

    egbwd = jax.jit(jax.grad(lambda tb: sum(
        jnp.sum(o.astype(jnp.float32)) for o in brickgrid_encode_grad(
            bcfg, tb, u, jac_lo=0, jac_hi=cfg.density_F))))
    t = timeit(egbwd, table)
    print(f"brick encode+jac fwd+bwd  : {t*1e3:9.2f} ms", flush=True)

    # --- model fwd on the sample batch ---
    mfwd = jax.jit(lambda p: ngp_forward(cfg, p, xyz, dirv)[0])
    t = timeit(mfwd, params["model"])
    print(f"ngp_forward (K batch)     : {t*1e3:9.2f} ms", flush=True)

    mbwd = jax.jit(jax.grad(lambda p: sum(
        jnp.sum(o.astype(jnp.float32))
        for o in ngp_forward(cfg, p, xyz, dirv))))
    t = timeit(mbwd, params["model"])
    print(f"ngp_forward fwd+bwd       : {t*1e3:9.2f} ms", flush=True)

    # --- grid update ---
    gfn = jax.jit(lambda p: sys_._grid_update(
        p, sys_.grid, jax.random.PRNGKey(0), False)["density_grid"])
    t = timeit(gfn, params["model"], n=4)
    print(f"grid update (steady)      : {t*1e3:9.2f} ms "
          f"(amortized /16: {t*1e3/16:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
