"""Compile-time canary: fail FAST and LOUD when the shipping train
step stops compiling within budget (VERDICT r4 item 4).

Two prior incidents had this failure shape: the round-2 bench timeout
and the round-4 session-1 stall were both an XLA compile explosion (a
global associative-scan tree at production K) that ate every
bench/gate launch silently. This script compiles the bench-default
train step under a hard wall-clock budget; on overrun it prints WHICH
env flags differ from the shipping defaults and exits non-zero while a
watchdog is still able to speak.

Usage (serialize with other TPU jobs):
    python benchmarking/compile_canary.py [budget_seconds]
Env: CANARY_BUDGET_S (default 600 on TPU, 900 elsewhere) — the cold
remote-tunnel compile of the full step is ~4 min; 10 min means broken.
"""
from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

# the flags that select render/encoder paths — printed on overrun so
# the bisect starts from the diff, not from scratch
_PATH_FLAGS = (
    "BENCH_STREAM", "BENCH_DIRECT_FRAC",
    "BENCH_STREAM_SEG", "BENCH_STREAM_SLACK", "BENCH_STREAM_SORT",
    "BENCH_SEG_HEAD", "BENCH_HEAD_FRAC", "BENCH_ENCODER",
    "BENCH_CHUNK", "BENCH_CAPACITY", "BENCH_SPR",
    "INGP_STREAM_GROUPED",
    "INGP_PALLAS_REDUCE", "INGP_PALLAS_COMPOSITE",
)


def flag_diff():
    return {k: os.environ[k] for k in _PATH_FLAGS if k in os.environ}


def arm_watchdog(budget_s, label):
    """A daemon thread that can still speak when the main thread is
    stuck inside a blocking XLA compile, then hard-exits."""
    def bark():
        time.sleep(budget_s)
        msg = (f"COMPILE CANARY FAILED: {label} did not compile within "
               f"{budget_s:.0f}s. Non-default path flags: "
               f"{flag_diff() or '(none — shipping defaults)'}")
        print(msg, file=sys.stderr, flush=True)
        print(msg, flush=True)
        os._exit(3)
    t = threading.Thread(target=bark, daemon=True)
    t.start()
    return t


def main():
    import jax
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else float(
        os.environ.get("CANARY_BUDGET_S",
                       "600" if jax.default_backend() == "tpu"
                       else "900"))

    from types import SimpleNamespace
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
        # honor the SAME env overrides bench.py reads: the canary's
        # job is to reproduce the bench's compile, and the printed
        # flag diff must actually select the compiled path
        compute_dtype="bfloat16",
        capacity=int(os.environ.get("BENCH_CAPACITY", "48")),
        march_iters=1024,
        samples_per_ray=int(os.environ.get("BENCH_SPR", "24")),
        encoder=os.environ.get("BENCH_ENCODER", "brick"),
        table_dtype="bfloat16",
        encode_remat=True,
        encode_chunk=int(os.environ.get("BENCH_CHUNK", "196608")),
        stream_dedup=os.environ.get("BENCH_STREAM", "1") == "1",
        stream_tile=256,
        stream_seg=int(os.environ.get("BENCH_STREAM_SEG", "4")),
        stream_slack=float(os.environ.get("BENCH_STREAM_SLACK", "1.5")),
        stream_direct_frac=float(os.environ.get("BENCH_DIRECT_FRAC",
                                                "0.7")),
        stream_sort=os.environ.get("BENCH_STREAM_SORT", "1") == "1",
        stream_seg_head=int(os.environ.get("BENCH_SEG_HEAD", "20")),
        stream_head_frac=float(os.environ.get("BENCH_HEAD_FRAC", "0.0")),
    )
    tr = SyntheticDataset(split="train", img_size=256, n_train=16)
    te = SyntheticDataset(split="test", img_size=256, n_test=1)
    system = NeRFSystem(h, tr, te)
    rng = np.random.default_rng(0)
    batch = tr.sample_batch(rng, 8192)

    print(f"[canary] backend={jax.default_backend()} budget={budget:.0f}s"
          f" flags={flag_diff() or '(defaults)'}", flush=True)
    arm_watchdog(budget, "train step")
    t0 = time.perf_counter()
    float(system.training_step(batch)["loss"])
    dt = time.perf_counter() - t0
    print(f"[canary] OK: train step compiled+ran in {dt:.1f}s "
          f"(budget {budget:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
