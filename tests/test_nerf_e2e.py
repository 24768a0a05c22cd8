"""End-to-end CLI training on a DISK-BACKED blender-format scene through
the real `nerf` loader (datasets/nerf.py + benchmark_synthetic_nerf.sh
path) — closes the 'no real-capture path ever executed' gap at the
loader level: transforms_*.json parsing, PNG reads, pose convention
remap, and the full fit/validate loop all run against files on disk."""
import numpy as np
import pytest


def test_train_cli_on_disk_blender_scene(tmp_path, monkeypatch):
    from ingp_tpu.utils.blender_fixture import write_blender_scene
    from ingp_tpu.train import main

    root = tmp_path / "lego_mini"
    ds = write_blender_scene(str(root), img_size=64, n_train=12,
                             n_test=2)
    monkeypatch.chdir(tmp_path)

    m = main([
        "--dataset_name", "nerf", "--root_dir", str(root),
        "--downsample", str(ds), "--exp_name", "nerf_e2e",
        "--num_epochs", "1", "--normal_epochs", "0",
        "--steps_per_epoch", "120", "--batch_size", "2048",
        "--no_save_test", "--grid_size", "64",
        "--density_L", "8", "--density_F", "4", "--density_log2T", "15",
        "--rgb_L", "8", "--rgb_F", "4", "--rgb_log2T", "15",
        "--capacity", "64", "--march_iters", "320",
        "--samples_per_ray", "24", "--chunk_size", "4096",
        "--encoder", "brick", "--sparsity_loss", "1e-3",
    ])
    # a fit through the real loader must actually converge on the scene
    assert np.isfinite(m["psnr"]) and np.isfinite(m["ssim"])
    assert m["psnr"] > 15.0, m


def test_blender_fixture_loader_geometry(tmp_path):
    """The loader's reconstructed rays must hit the analytic scene where
    the fixture's pixels are lit (pose/convention round trip)."""
    from ingp_tpu.utils.blender_fixture import write_blender_scene
    from ingp_tpu.data.nerf import NeRFDataset
    from ingp_tpu.data.synthetic import trace_scene
    from ingp_tpu.core.rays import get_rays
    import jax.numpy as jnp

    root = tmp_path / "scene"
    ds = write_blender_scene(str(root), img_size=64, n_train=3, n_test=1)
    data = NeRFDataset(str(root), split="train", downsample=ds)
    assert data.rays.shape[0] == 3
    w, h = data.img_wh
    assert (w, h) == (64, 64)

    ro, rd = get_rays(jnp.asarray(data.directions),
                      jnp.asarray(data.poses[0]))
    rgb_gt, _, hit, _, _ = trace_scene(np.asarray(ro), np.asarray(rd))
    stored = data.rays[0, :, :3]
    # hit pixels are colored in the stored image, misses are black
    assert stored[hit].mean() > 0.05
    assert abs(stored[~hit]).max() < 0.02
    # and the analytic re-render matches the stored pixels (8-bit PNG)
    np.testing.assert_allclose(stored, rgb_gt, atol=0.05)
