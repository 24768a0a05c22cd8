"""Experiment logger backends (utils/loggers.py) — replacement for the
reference's WandbLogger wiring (train.py:419-422)."""
import json
import os

import numpy as np
import pytest

from ingp_tpu.utils.loggers import (JsonlLogger, TensorBoardLogger,
                                    MultiLogger, WandbLogger, make_logger)


def test_jsonl_logger_round_trip(tmp_path):
    path = tmp_path / "metrics.jsonl"
    lg = JsonlLogger(str(path))
    lg.log_metrics(0, {"loss": 1.0})
    lg.log_metrics(5, {"loss": 0.5, "train/psnr": 20.0})
    lg.log_image(5, "rgb", np.zeros((8, 8, 3), np.float32))
    lg.close()
    rows = [json.loads(l) for l in open(path)]
    assert rows[0] == {"step": 0, "loss": 1.0}
    assert rows[1]["train/psnr"] == 20.0
    assert os.path.exists(tmp_path / "val" / "00005_rgb.png")


def test_tensorboard_logger_writes_events(tmp_path):
    lg = TensorBoardLogger(str(tmp_path / "tb"))
    lg.log_metrics(1, {"loss": 0.3})
    lg.log_image(1, "rgb", np.zeros((8, 8, 3), np.float32))
    lg.close()
    files = os.listdir(tmp_path / "tb")
    assert any("tfevents" in f for f in files)


def test_multi_logger_fans_out(tmp_path):
    a = JsonlLogger(str(tmp_path / "a.jsonl"))
    b = JsonlLogger(str(tmp_path / "b.jsonl"))
    m = MultiLogger([a, b])
    m.log_metrics(2, {"x": 1.0})
    m.close()
    assert json.loads(open(tmp_path / "a.jsonl").read())["x"] == 1.0
    assert json.loads(open(tmp_path / "b.jsonl").read())["x"] == 1.0


def test_wandb_logger_loud_failure():
    with pytest.raises(RuntimeError, match="wandb"):
        WandbLogger(project="x")     # wandb not installed here


def test_make_logger(tmp_path):
    assert make_logger("none", str(tmp_path)) is None
    lg = make_logger("jsonl", str(tmp_path))
    lg.log_metrics(0, {"a": 1.0})
    lg.close()
    assert os.path.exists(tmp_path / "metrics.jsonl")
    with pytest.raises(ValueError):
        make_logger("bogus", str(tmp_path))
