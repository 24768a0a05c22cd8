"""Config/flag system tests (txt parsing + CLI override precedence)."""
import os

from ingp_tpu.training.config import get_opts, parse_config_file


def test_defaults_match_reference():
    h = get_opts([])
    # opt.py defaults
    assert h.batch_size == 8192
    assert h.num_epochs == 30 and h.normal_epochs == 20
    assert h.lr == 1e-2
    assert h.scale == 0.5
    assert h.density_threshold == 1e-2
    assert h.chunk_size == 131072
    assert h.ray_sampling_strategy == "all_images"
    assert not h.use_skybox and not h.embed_a


def test_config_file_parsing(tmp_path):
    cfg = tmp_path / "exp.txt"
    cfg.write_text(
        "# comment\n"
        "dataset_name = tnt\n"
        "batch_size = 2048\n"
        "scale = 8.0\n"
        "use_skybox = True\n"
        "embed_msk = False\n"
        "kitti_test_id = [1550, 1560, 1570]\n")
    h = get_opts(["--config", str(cfg)])
    assert h.dataset_name == "tnt"
    assert h.batch_size == 2048
    assert h.scale == 8.0
    assert h.use_skybox is True
    assert h.embed_msk is False
    assert h.kitti_test_id == [1550, 1560, 1570]


def test_cli_overrides_config(tmp_path):
    cfg = tmp_path / "exp.txt"
    cfg.write_text("batch_size = 2048\nexp_name = from_file\n")
    h = get_opts(["--config", str(cfg), "--batch_size", "4096"])
    assert h.batch_size == 4096            # CLI wins
    assert h.exp_name == "from_file"       # file value kept


def test_playground_config_parses():
    h = get_opts(["--config", "configs/Playground.txt"])
    assert h.dataset_name == "tnt"
    assert h.scale == 8.0
    assert h.embed_a and h.embed_a_len == 8
    assert h.embed_msk and h.random_bg and h.render_traj
