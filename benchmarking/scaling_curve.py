"""Virtual-device scaling curve: train-step throughput with a FIXED
GLOBAL ray batch sharded over 1/2/4/8 virtual CPU devices
(xla_force_host_platform_device_count) — the only multi-chip perf
signal measurable in a single-chip environment.

This host has ~2 cores, so compute cannot scale with virtual devices;
what the curve isolates is SHARDING-INDUCED OVERHEAD (GSPMD
collectives, replicated grid work, partition bookkeeping): with the
same global work, N-device throughput / 1-device throughput would be
1.0 for a perfectly-partitionable program. Real ICI scaling needs real
chips (BASELINE.md >=80% target stays unverifiable here).

Usage: python benchmarking/scaling_curve.py [--rays-global 8192]
Prints one JSON line per mesh size and a final overhead summary.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = """
import os, sys, time, json
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
n_dev = int(sys.argv[1]); rays_global = int(sys.argv[2])
from types import SimpleNamespace
from ingp_tpu.parallel.mesh import make_mesh
from ingp_tpu.training.trainer import NeRFSystem
from ingp_tpu.data.synthetic import SyntheticDataset

mesh = make_mesh(n_dev) if n_dev > 1 else None
h = SimpleNamespace(
    dataset_name="synthetic", root_dir="", split="train",
    downsample=1.0, scale=0.5, use_skybox=False, use_exposure=False,
    embed_a=False, embed_a_len=4, embed_msk=False, num_classes=4,
    batch_size=rays_global, ray_sampling_strategy="all_images",
    num_epochs=1, normal_epochs=0, steps_per_epoch=100, lr=1e-2,
    density_threshold=1e-2, depth_mono=False, normal_mono=False,
    normal_ref=True, optimize_ext=False, random_bg=False,
    render_semantic=False, chunk_size=65536, seed=0, ckpt_load=None,
    compute_dtype="float32",
    capacity=48, march_iters=256, samples_per_ray=24,
    grid_size=64, density_L=8, density_F=4, density_log2T=15,
    rgb_L=8, rgb_F=4, rgb_log2T=15,
    encoder="brick", stream_dedup=True, stream_tile=128,
)
tr = SyntheticDataset(split="train", img_size=64, n_train=8)
te = SyntheticDataset(split="test", img_size=64, n_test=1)
system = NeRFSystem(h, tr, te, mesh=mesh)
rng = np.random.default_rng(0)
for _ in range(20):   # compile + grid settle
    aux = system.training_step(tr.sample_batch(rng, h.batch_size))
float(aux["loss"])
batches = [tr.sample_batch(rng, h.batch_size) for _ in range(30)]
t0 = time.perf_counter()
for b in batches:
    aux = system.training_step(b)
float(aux["loss"])
dt = time.perf_counter() - t0
print(json.dumps({"n_dev": n_dev, "rays_global": rays_global,
                  "rays_per_s": round(30 * h.batch_size / dt, 1)}))
"""


def run_one(n_dev: int, rays_global: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n_dev}"
                        ).strip()
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(n_dev), str(rays_global)],
        capture_output=True, text=True, env=env, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"n_dev={n_dev} failed:\n{out.stderr[-2000:]}")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rays-global", type=int, default=8192)
    p.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    args = p.parse_args()
    rows = []
    for n in args.devices:
        r = run_one(n, args.rays_global)
        rows.append(r)
        print(json.dumps(r), flush=True)
    base = rows[0]["rays_per_s"]
    summary = {
        "unsharded_rays_per_s": base,
        "sharded_vs_unsharded": {r["n_dev"]: round(
            r["rays_per_s"] / base, 3) for r in rows},
    }
    print(json.dumps(summary))
    # NOTE: on a small host the ratio confounds sharding overhead with
    # CPU thread oversubscription (each virtual device gets its own
    # XLA thread pool; this box has 2 cores). The ratio is a RELATIVE
    # tracker across code versions, not an absolute overhead measure —
    # real ICI scaling needs real chips (BASELINE.md >=80% target).
    worst = min(r["rays_per_s"] / base for r in rows)
    ncpu = os.cpu_count() or 1
    if ncpu >= 16:
        assert worst > 0.6, \
            f"sharding overhead too high: ratio {worst:.2f}"


if __name__ == "__main__":
    main()
