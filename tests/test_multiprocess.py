"""Multi-HOST data parallelism: 2 real processes (jax.distributed over
localhost, CPU backend) must train identically to one process on the
same global batch. Complements tests/test_parallel.py (multi-DEVICE on
one process). Reference bar: train.py:430-432 (DDPPlugin multi-GPU)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from types import SimpleNamespace

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    """3 steps on the identical global batches, one process/one device."""
    from ingp_tpu.training.trainer import NeRFSystem
    from ingp_tpu.data.synthetic import SyntheticDataset

    h = SimpleNamespace(
        dataset_name="synthetic", root_dir="", split="train",
        downsample=1.0, scale=0.5, use_skybox=False, use_exposure=False,
        embed_a=False, embed_a_len=4, embed_msk=False, num_classes=4,
        batch_size=256, ray_sampling_strategy="all_images", num_epochs=1,
        normal_epochs=0, steps_per_epoch=500, lr=1e-2,
        density_threshold=1e-2, depth_mono=False, normal_mono=False,
        normal_ref=False, optimize_ext=False, random_bg=False,
        # non-binding sample budget (capacity == spr): the shard_map
        # per-rank budgets keep exactly the global kept set, so the
        # 2-process run must match this reference to float tolerance
        # (see tests/test_parallel.py for the binding-budget contract)
        render_semantic=False, chunk_size=2048, seed=0, ckpt_load=None,
        compute_dtype="float32", capacity=16, march_iters=128,
        samples_per_ray=16, grid_size=32, density_L=4, density_F=2,
        density_log2T=12, rgb_L=4, rgb_F=2, rgb_log2T=12)
    tr = SyntheticDataset(split="train", img_size=32, n_train=4)
    te = SyntheticDataset(split="test", img_size=32, n_test=2)
    system = NeRFSystem(h, tr, te)
    rng = np.random.default_rng(0)
    for _ in range(3):
        aux = system.training_step(tr.sample_batch(rng, 256))
    m = system.validate()
    return (np.asarray(system.params["model"]["density_table"]),
            float(aux["loss"]), m["psnr"])


def test_two_process_training_matches_single(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_mp_worker.py"),
             str(rank), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for rank in (0, 1)
    ]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    table_ref, loss_ref, psnr_ref = _single_process_reference()
    table_mp = np.load(tmp_path / "table.npy")
    loss_mp = float(np.load(tmp_path / "loss.npy"))
    psnr_mp = float(np.load(tmp_path / "psnr.npy"))

    assert abs(loss_mp - loss_ref) < 1e-4 * max(1.0, abs(loss_ref))
    np.testing.assert_allclose(table_mp, table_ref, rtol=1e-3, atol=1e-6)
    # distributed validate (round-robin + allgather) == local validate
    assert abs(psnr_mp - psnr_ref) < 1e-3
    # multi-host ckpt resume: BOTH ranks restored to the saved step
    for rank in (0, 1):
        assert int(np.load(tmp_path / f"resume_step_{rank}.npy")) == 2
