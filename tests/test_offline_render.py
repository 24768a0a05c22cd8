"""Offline render pipeline test: render_for_test writes frames/videos."""
import os

import numpy as np
import pytest

from tests.test_training import make_system, tiny_hparams


def test_render_for_test_writes_outputs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ingp_tpu.render.offline import render_for_test

    system = make_system()
    rng = np.random.default_rng(0)
    for _ in range(3):
        system.training_step(system.train_dataset.sample_batch(rng, 512))

    h = system.hparams
    h.exp_name = "offline_test"
    h.render_rgb = True
    h.render_depth = True
    h.render_normal = True
    h.render_semantic = False
    h.render_traj = False
    h.no_save_test = True  # skip mp4 (codec-dependent)
    out = render_for_test(h, system=system)
    files = sorted(os.listdir(out))
    assert "00000_rgb.png" in files
    assert "00000_depth.png" in files
    assert "00000_normal.png" in files
    import imageio.v2 as imageio
    img = imageio.imread(os.path.join(out, "00000_rgb.png"))
    w, hh = system.test_dataset.img_wh
    assert img.shape[:2] == (hh, w)
