"""Dump the compiled train step's optimized HLO and summarize the
named fusions the profiler blames, so trace op names (fusion.NN) map
back to source-level operations.

Usage: python benchmarking/dump_step_hlo.py [fusion.55 fusion.49 ...]
Writes the full text to benchmarking/traces/step_hlo.txt.
"""
from __future__ import annotations

import os
import re
import sys
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

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
        batch_size=8192, ray_sampling_strategy="all_images",
        num_epochs=20, normal_epochs=0, steps_per_epoch=1000, lr=1e-2,
        density_threshold=1e-2, depth_mono=False, normal_mono=False,
        normal_ref=True, optimize_ext=False, random_bg=False,
        render_semantic=False, chunk_size=131072, seed=0, ckpt_load=None,
        compute_dtype="bfloat16", capacity=48, march_iters=1024,
        samples_per_ray=24, encoder="brick", table_dtype="bfloat16",
        encode_remat=True, encode_chunk=196608, stream_dedup=True,
        stream_tile=256, stream_seg=4, stream_slack=1.5,
        stream_direct_frac=0.7, stream_sort=True, stream_seg_head=20,
        stream_head_frac=0.0,
    )
    tr = SyntheticDataset(split="train", img_size=256, n_train=16)
    te = SyntheticDataset(split="test", img_size=256, n_test=1)
    system = NeRFSystem(h, tr, te)
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in
             tr.sample_batch(rng, 8192).items() if k in system.BATCH_KEYS}
    lowered = system.train_step.lower(
        system.params, system.opt_state, system.grid["bitfield"],
        system._march_table(), system.directions, system.poses,
        batch, jnp.int32(0), system._base_key)
    print("lowered; compiling...", flush=True)
    hlo = lowered.compile().as_text()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "traces", "step_hlo.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(hlo)
    print(f"wrote {len(hlo)} chars to {out}", flush=True)

    names = sys.argv[1:] or ["fusion.55", "fusion.49", "fusion.23",
                             "fusion.140", "fusion.53", "fusion.51",
                             "fusion.52", "fusion.50", "fusion.54",
                             "fusion.47", "reshape.985"]
    # index fused computations: %name (...) -> computation body name
    for nm in names:
        m = re.search(rf"%{re.escape(nm)} = ([^\n]*)", hlo)
        if not m:
            print(f"{nm}: NOT FOUND")
            continue
        line = m.group(1)
        cm = re.search(r"calls=([%\w.\-]+)", line)
        print(f"\n== {nm}: {line[:200]}")
        if cm:
            body = cm.group(1).lstrip("%")
            bm = re.search(
                rf"%{re.escape(body)} [^\n]*\n(.*?)\n\}}", hlo, re.S)
            if bm:
                ops = re.findall(r"= [a-z0-9\[\],{}: ]*? ([a-z\-]+)\(",
                                 bm.group(1))
                from collections import Counter
                print("   body ops:", dict(Counter(ops)))
                big = [ln.strip()[:160] for ln in
                       bm.group(1).splitlines()
                       if re.search(r"(dot|scatter|gather|sort|"
                                    r"dynamic-update|convert|transpose|"
                                    r"reduce)\(", ln)][:8]
                for b in big:
                    print("   |", b)


if __name__ == "__main__":
    main()
