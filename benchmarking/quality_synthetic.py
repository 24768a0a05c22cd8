"""End-to-end quality run on the hermetic synthetic scene (TPU).

Trains the flagship brick op-point for --steps and reports train PSNR
plus held-out novel-view PSNR/SSIM — the framework's standing quality
regression (the reference's de-facto test is exactly such a metric run,
SURVEY.md section 4). Results log: PERF_NOTES.md convergence table.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--capacity", type=int, default=48)
    ap.add_argument("--spr", type=int, default=24)
    ap.add_argument("--chunk", type=int, default=98304)
    ap.add_argument("--img_size", type=int, default=256)
    ap.add_argument("--n_train", type=int, default=100)
    ap.add_argument("--stream_dedup", action="store_true", default=False)
    ap.add_argument("--stream_tile", type=int, default=256)
    ap.add_argument("--stream_slack", type=float, default=1.5)
    ap.add_argument("--stream_seg", type=int, default=4)
    ap.add_argument("--stream_direct_frac", type=float, default=0.7)
    ap.add_argument("--no_stream_sort", dest="stream_sort",
                    action="store_false", default=True)
    ap.add_argument("--stream_seg_head", type=int, default=20)
    ap.add_argument("--stream_head_frac", type=float, default=0.0)
    ap.add_argument("--stream_autocal", action="store_true",
                    default=False)
    ap.add_argument("--sparsity", type=float, default=1e-3)
    args = ap.parse_args()

    from ingp_tpu.training.trainer import NeRFSystem
    from ingp_tpu.data.synthetic import SyntheticDataset

    h = SimpleNamespace(
        dataset_name="synthetic", root_dir="", split="train",
        downsample=1.0, scale=0.5, use_skybox=False, use_exposure=False,
        embed_a=False, embed_a_len=4, embed_msk=False, num_classes=7,
        batch_size=args.batch, ray_sampling_strategy="all_images",
        num_epochs=1, normal_epochs=0, steps_per_epoch=args.steps,
        lr=1e-2, density_threshold=1e-2, depth_mono=False,
        normal_mono=False, normal_ref=True, optimize_ext=False,
        random_bg=False, render_semantic=False, chunk_size=131072,
        seed=0, ckpt_load=None, compute_dtype="bfloat16",
        capacity=args.capacity, march_iters=1024,
        samples_per_ray=args.spr, encoder="brick",
        table_dtype="bfloat16", encode_chunk=args.chunk,
        sparsity_loss=args.sparsity, stream_dedup=args.stream_dedup,
        stream_tile=args.stream_tile, stream_slack=args.stream_slack,
        stream_seg=args.stream_seg,
        stream_direct_frac=args.stream_direct_frac,
        stream_sort=args.stream_sort,
        stream_seg_head=args.stream_seg_head,
        stream_head_frac=args.stream_head_frac,
        stream_autocal=args.stream_autocal)
    tr = SyntheticDataset(split="train", img_size=args.img_size,
                          n_train=args.n_train)
    te = SyntheticDataset(split="test", img_size=args.img_size, n_test=4)
    system = NeRFSystem(h, tr, te)

    rng = np.random.default_rng(0)
    t0 = time.time()
    for step in range(args.steps):
        aux = system.training_step(tr.sample_batch(rng, args.batch))
        if step % 100 == 0 or step == args.steps - 1:
            print(f"step {step:5d} loss {float(aux['loss']):.5f} "
                  f"psnr {float(aux['psnr']):.2f} "
                  f"s/ray {float(aux['s_per_ray']):.1f}", flush=True)
    dt = time.time() - t0
    print(f"train: {args.steps} steps in {dt:.0f}s "
          f"({args.steps * args.batch / dt:,.0f} rays/s incl. host)",
          flush=True)
    m = system.validate()
    print(f"RESULT novel-view psnr {m['psnr']:.2f} ssim {m['ssim']:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
