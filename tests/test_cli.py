"""CLI entry-point smoke tests (hermetic synthetic dataset)."""
import os

import numpy as np
import pytest


TINY = ["--dataset_name", "synthetic", "--num_epochs", "1",
        "--normal_epochs", "0", "--steps_per_epoch", "8",
        "--batch_size", "256", "--no_save_test",
        "--capacity", "32", "--march_iters", "128",
        "--samples_per_ray", "8", "--grid_size", "32",
        "--density_L", "4", "--density_F", "2", "--density_log2T", "12",
        "--rgb_L", "4", "--rgb_F", "2", "--rgb_log2T", "12",
        "--chunk_size", "1024"]


def test_train_cli_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ingp_tpu.train import main
    m = main(TINY + ["--exp_name", "cli_smoke"])
    assert np.isfinite(m["psnr"]) and np.isfinite(m["ssim"])
    # checkpoints written
    assert os.path.exists("ckpts/synthetic/cli_smoke/last")
    assert os.path.exists("ckpts/synthetic/cli_smoke/last_slim")
    assert os.path.exists("ckpts/synthetic/cli_smoke/metrics.jsonl")


def test_extract_mesh_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ingp_tpu.extract_mesh_cli import main
    # fresh random field: extraction must still produce a valid (possibly
    # small) mesh file without crashing
    main(TINY + ["--exp_name", "mesh_smoke",
                 "--mesh_resolution", "32", "32", "32",
                 "--sigma_threshold", "0.5"])
    assert os.path.exists("results/synthetic/mesh_smoke/mesh.ply")
