"""Capture a jax.profiler trace of the bench-op-point train step and
print the top device ops by total duration.

Writes the raw trace under benchmarking/traces/ and aggregates the
perfetto trace-event JSON (plugins/profile/*/..trace.json.gz) without
needing tensorboard.

Usage: python benchmarking/trace_step.py [n_top]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ingp_tpu.training.trainer import NeRFSystem
    from ingp_tpu.data.synthetic import SyntheticDataset

    h = SimpleNamespace(
        dataset_name="synthetic", root_dir="", split="train",
        downsample=1.0, scale=0.5, use_skybox=False, use_exposure=False,
        embed_a=False, embed_a_len=4, embed_msk=False, num_classes=7,
        batch_size=int(os.environ.get("BENCH_BS", "8192")),
        ray_sampling_strategy="all_images",
        num_epochs=20, normal_epochs=0, steps_per_epoch=1000, lr=1e-2,
        density_threshold=1e-2, depth_mono=False, normal_mono=False,
        normal_ref=True, optimize_ext=False, random_bg=False,
        render_semantic=False, chunk_size=131072, seed=0, ckpt_load=None,
        compute_dtype="bfloat16",
        capacity=int(os.environ.get("BENCH_CAPACITY", "48")),
        march_iters=int(os.environ.get("BENCH_MARCH_ITERS", "1024")),
        samples_per_ray=int(os.environ.get("BENCH_SPR", "24")),
        encoder=os.environ.get("BENCH_ENCODER", "brick"),
        table_dtype=os.environ.get("BENCH_TABLE_DTYPE", "bfloat16"),
        encode_remat=os.environ.get("BENCH_REMAT", "1") == "1",
        encode_chunk=int(os.environ.get("BENCH_CHUNK", "196608")),
        stream_dedup=os.environ.get("BENCH_STREAM", "1") == "1",
        stream_tile=int(os.environ.get("BENCH_STREAM_TILE", "256")),
        stream_seg=int(os.environ.get("BENCH_STREAM_SEG", "4")),
        stream_slack=float(os.environ.get("BENCH_STREAM_SLACK", "1.5")),
        stream_direct_frac=float(os.environ.get("BENCH_DIRECT_FRAC",
                                                "0.7")),
    )
    tr = SyntheticDataset(split="train", img_size=256, n_train=16)
    te = SyntheticDataset(split="test", img_size=256, n_test=1)
    system = NeRFSystem(h, tr, te)
    rng = np.random.default_rng(0)

    for _ in range(20):
        aux = system.training_step(tr.sample_batch(rng, h.batch_size))
    float(aux["loss"])
    print("compiled; tracing 4 steps", flush=True)

    tdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "traces", time.strftime("%H%M%S"))
    with jax.profiler.trace(tdir):
        for _ in range(4):
            aux = system.training_step(tr.sample_batch(rng, h.batch_size))
        float(aux["loss"])

    files = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                      recursive=True)
    print("trace files:", files, flush=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        pid_ok = set()
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                nm = ev.get("args", {}).get("name", "")
                if "TPU" in nm or "/device:" in nm or "XLA" in nm:
                    pid_ok.add(ev["pid"])
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X" or ev.get("pid") not in pid_ok:
                continue
            name = ev.get("name", "?")
            dur = ev.get("dur", 0) / 1e3  # ms
            agg[name] += dur
            cnt[name] += 1
            total += dur
    n_top = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    print(f"\ntotal device op time: {total:.1f} ms over 4 steps "
          f"({total/4:.1f} ms/step)")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:n_top]:
        print(f"{ms/4:9.2f} ms/step  x{cnt[name]//4:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
