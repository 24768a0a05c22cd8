"""End-to-end training-system tests on the hermetic synthetic dataset."""
import os
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ingp_tpu.data.synthetic import SyntheticDataset
from ingp_tpu.training.trainer import NeRFSystem


def tiny_hparams(**overrides):
    h = SimpleNamespace(
        dataset_name="synthetic", root_dir="", split="train",
        downsample=1.0, scale=0.5, use_skybox=False, use_exposure=False,
        embed_a=False, embed_a_len=4, embed_msk=False, num_classes=4,
        batch_size=512, ray_sampling_strategy="all_images",
        num_epochs=1, normal_epochs=0, steps_per_epoch=500, lr=1e-2,
        density_threshold=1e-2, depth_mono=False, normal_mono=False,
        normal_ref=False, optimize_ext=False, random_bg=False,
        render_semantic=False, chunk_size=2048, seed=0, ckpt_load=None,
        compute_dtype="float32",
        capacity=48, march_iters=160, samples_per_ray=16,
        grid_size=32, density_L=4, density_F=2, density_log2T=13,
        rgb_L=4, rgb_F=2, rgb_log2T=13,
    )
    for k, v in overrides.items():
        setattr(h, k, v)
    return h


def make_system(**overrides):
    tr = SyntheticDataset(split="train", img_size=48, n_train=8)
    te = SyntheticDataset(split="test", img_size=48, n_test=1)
    return NeRFSystem(tiny_hparams(**overrides), tr, te)


def test_training_reduces_loss():
    system = make_system()
    rng = np.random.default_rng(0)
    losses, psnrs = [], []
    for _ in range(40):
        batch = system.train_dataset.sample_batch(rng, 512)
        aux = system.training_step(batch)
        losses.append(float(aux["loss"]))
        psnrs.append(float(aux["psnr"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-8:]) < 0.8 * np.mean(losses[:4])
    assert np.mean(psnrs[-8:]) > np.mean(psnrs[:4]) + 1.5
    # occupancy skipping engaged: the marcher reports sample counts
    assert float(aux["s_per_ray"]) > 0


def test_validate_and_render_image():
    system = make_system()
    rng = np.random.default_rng(0)
    for _ in range(80):
        system.training_step(system.train_dataset.sample_batch(rng, 1024))
    m = system.validate(max_images=1)
    assert np.isfinite(m["psnr"]) and np.isfinite(m["ssim"])
    assert m["psnr"] > 10.0  # a barely-trained field still beats noise
    res = system.render_image(system.test_dataset.poses[0],
                              chunk_size=1024)
    w, h = system.test_dataset.img_wh
    assert res["rgb"].shape == (w * h, 3)
    assert res["depth"].shape == (w * h,)


def test_full_featureset_step():
    # skybox + appearance + mask + semantic + normals + pose refinement
    # in a single jitted step (the Playground/kitti feature set)
    system = make_system(use_skybox=True, embed_a=True, embed_msk=True,
                         render_semantic=True, normal_ref=True,
                         normal_mono=True, optimize_ext=True)
    rng = np.random.default_rng(0)
    ext_before = np.asarray(system.params["ext"]["dR"]).copy()
    for _ in range(3):
        aux = system.training_step(
            system.train_dataset.sample_batch(rng, 256))
    assert np.isfinite(float(aux["loss"]))
    for k in ("rgb", "opacity", "distortion", "normal_ref_rp",
              "normal_mono", "CELoss", "r_ms"):
        assert k in aux["loss_terms"], k
    # pose-refinement parameters actually move (lr 1e-6, tiny but nonzero)
    assert not np.allclose(np.asarray(system.params["ext"]["dR"]),
                           ext_before)


def test_training_with_brick_encoder():
    # the TPU-native brick encoder must converge like the hash encoder
    # (log2T-5 brick mapping needs a non-starved table at test scale)
    system = make_system(encoder="brick", density_log2T=15,
                         rgb_log2T=15)
    rng = np.random.default_rng(0)
    losses, psnrs = [], []
    for _ in range(40):
        batch = system.train_dataset.sample_batch(rng, 512)
        aux = system.training_step(batch)
        losses.append(float(aux["loss"]))
        psnrs.append(float(aux["psnr"]))
    assert np.isfinite(losses).all()
    assert np.mean(psnrs[-8:]) > np.mean(psnrs[:4]) + 1.5


def test_stream_autocal_floored_adoption():
    """Cap auto-calibration: the gated run-stat measurement fires on
    the adoption cadence, adopted caps floor at the FORMULA caps
    (adopting the raw warmup measurement below the floor mass-overflows
    cells into zero features and fog-locks training — the round-5
    gate bisection, PERF_NOTES), stay monotone per level, and training
    stays finite through the mid-run recompiles."""
    from ingp_tpu.ops.streambrick import stream_caps as formula
    system = make_system(encoder="brick", density_log2T=15,
                         rgb_log2T=15, stream_dedup=True,
                         stream_tile=128, stream_autocal=True)
    assert system.render_cfg.run_stats
    rng = np.random.default_rng(0)
    seen = []
    for i in range(2 * system.AUTOCAL_EVERY + 1):
        aux = system.training_step(
            system.train_dataset.sample_batch(rng, 512))
        assert np.isfinite(float(aux["loss"]))
        runs = np.asarray(aux["stream_runs"])
        # off-cadence steps return the gated-off sentinel (-1);
        # cadence steps return real measurements
        if system.global_step % system.AUTOCAL_EVERY == 0:
            assert np.all(runs >= 0), (i, runs)
        else:
            assert np.all(runs == -1), (i, runs)
        if system.model_cfg.stream_caps is not None:
            seen.append(system.model_cfg.stream_caps)
    assert seen, "caps never adopted on the cadence"
    floor = formula(system.model_cfg.rgb_brick_cfg,
                    system.model_cfg.stream_tile,
                    slack=system.model_cfg.stream_slack,
                    seg_est=system.model_cfg.stream_seg)
    tile = system.model_cfg.stream_tile
    for caps in seen:
        assert all(c >= min(f, tile) for c, f in zip(caps, floor)), \
            (caps, floor)
        assert all(c <= tile for c in caps)
    # monotone growth across adoptions
    for a, b in zip(seen, seen[1:]):
        assert all(y >= x for x, y in zip(a, b))

    # adopted caps ride the checkpoint: a resume must not reset to
    # formula caps and replay the adoption/recompile ratchet
    st = system.state()
    assert "stream_caps" in st
    fresh = make_system(encoder="brick", density_log2T=15,
                        rgb_log2T=15, stream_dedup=True,
                        stream_tile=128, stream_autocal=True)
    assert fresh.model_cfg.stream_caps is None
    fresh.load_state(st)
    assert fresh.model_cfg.stream_caps == system.model_cfg.stream_caps


def test_checkpoint_roundtrip(tmp_path):
    system = make_system()
    rng = np.random.default_rng(0)
    for _ in range(3):
        system.training_step(system.train_dataset.sample_batch(rng, 512))
    path = os.path.join(tmp_path, "ckpt")
    system.save(path)

    system2 = make_system()
    system2.load(path)
    assert system2.global_step == system.global_step
    a = np.asarray(system.params["model"]["density_table"])
    b = np.asarray(system2.params["model"]["density_table"])
    np.testing.assert_allclose(a, b)
    # resumed training still works
    aux = system2.training_step(system2.train_dataset.sample_batch(rng,
                                                                   512))
    assert np.isfinite(float(aux["loss"]))


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip
    assert len(jax.devices()) >= 8
    dryrun_multichip(8)


def test_sharded_step_contains_gradient_allreduce():
    """Structural guard against silent replication: the compiled
    sharded train step must carry a cross-device all-reduce at least
    as large as the parameter tree (the DP gradient pmean). Round-5
    found GSPMD quietly all-gathering the batch and replicating the
    whole step — only ~0.1 MB of collectives where ~15 MB of gradient
    all-reduce belonged (benchmarking/collective_accounting.py); the
    shard_map rewrite makes the pmean explicit, and this test keeps it
    that way."""
    import re
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge

    hlo = ge.lower_multichip(8).compile().as_text()
    system, _ = ge._multichip_system(8)
    param_bytes = sum(int(np.prod(x.shape)) * 4
                      for x in jax.tree.leaves(system.params))

    shape_re = re.compile(r"(f32|bf16|f16|s32|u32)\[([0-9,]*)\]")
    dt_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4}
    ar_bytes = 0
    for line in hlo.splitlines():
        if " = " not in line:
            continue
        rest = line.strip().split(" = ", 1)[1]
        m = re.search(r"\ball-reduce(-start)?\(", rest)
        if m is None or "all-reduce-done" in rest:
            continue
        for dt, dims in shape_re.findall(rest[:m.start()]):
            k = 1
            for d in dims.split(","):
                if d:
                    k *= int(d)
            ar_bytes += k * dt_bytes[dt]
    assert ar_bytes >= param_bytes, (
        f"all-reduce {ar_bytes}B < params {param_bytes}B — the sharded "
        f"step is replicating instead of data-parallel")


def test_entry_traces():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.eval_shape(fn, *args)
    rgb, depth, opacity = out
    assert rgb.shape == (1024, 3)
    assert depth.shape == (1024,)
