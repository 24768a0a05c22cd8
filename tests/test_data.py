"""Data-layer tests: loaders against synthesized on-disk fixtures."""
import json
import os
import struct

import numpy as np
import pytest

from ingp_tpu.data.synthetic import SyntheticDataset, trace_scene
from ingp_tpu.data.depth_utils import read_pfm


def test_synthetic_dataset_interface():
    ds = SyntheticDataset(split="train", img_size=32, n_train=5)
    assert ds.rays.shape == (5, 32 * 32, 3)
    assert ds.poses.shape == (5, 3, 4)
    assert ds.labels.shape == (5, 32 * 32)
    rng = np.random.default_rng(0)
    b = ds.sample_batch(rng, 64)
    assert b["rgb"].shape == (64, 3)
    assert b["img_idxs"].shape == (64,)
    assert b["label"].shape == (64,)
    assert b["normal"].shape == (64, 3)
    item = SyntheticDataset(split="test", img_size=32, n_test=2).test_item(0)
    assert item["rgb"].shape == (32 * 32, 3)


def test_trace_scene_hits():
    ro = np.array([[0, 0.05, -2.0], [0, 0, -2.0], [5, 5, -2.0]],
                  np.float32)
    rd = np.array([[0, 0, 1.0]] * 3, np.float32)
    rgb, depth, hit, normal, seg = trace_scene(ro, rd)
    assert hit[0] and seg[0] == 1          # big sphere
    assert not hit[2] and seg[2] == 0      # miss -> black bg
    np.testing.assert_allclose(rgb[2], [0, 0, 0])
    assert abs(depth[0] - (2.0 - 0.22)) < 1e-3


def test_pfm_roundtrip(tmp_path):
    data = np.random.default_rng(0).random((7, 5)).astype(np.float32)
    path = tmp_path / "d.pfm"
    with open(path, "wb") as f:
        f.write(b"Pf\n5 7\n-1.0\n")
        np.flipud(data).astype("<f4").tofile(f)
    back, scale = read_pfm(str(path))
    np.testing.assert_allclose(back, data, rtol=1e-6)


def _write_colmap_model(d):
    os.makedirs(os.path.join(d, "sparse/0"), exist_ok=True)
    # cameras.bin: one PINHOLE camera
    with open(os.path.join(d, "sparse/0/cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 16, 12))  # PINHOLE 16x12
        f.write(struct.pack("<dddd", 10.0, 10.0, 8.0, 6.0))
    # images.bin: two images
    with open(os.path.join(d, "sparse/0/images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i, name in [(1, b"a.png"), (2, b"b.png")]:
            f.write(struct.pack("<i", i))
            f.write(struct.pack("<dddd", 1, 0, 0, 0))   # identity quat
            f.write(struct.pack("<ddd", 0, 0, float(i)))
            f.write(struct.pack("<i", 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ddq", 1.0, 2.0, 7))
    # points3D.bin: three points
    with open(os.path.join(d, "sparse/0/points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 3))
        for i in range(3):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", i, 0.5, 2.0))
            f.write(struct.pack("<BBB", 10, 20, 30))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))


def test_colmap_binary_parsers(tmp_path):
    from ingp_tpu.data.colmap_utils import (
        read_cameras_binary, read_images_binary, read_points3d_binary,
        qvec2rotmat)
    _write_colmap_model(str(tmp_path))
    cams = read_cameras_binary(str(tmp_path / "sparse/0/cameras.bin"))
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == 16 and cams[1].height == 12
    np.testing.assert_allclose(cams[1].params, [10, 10, 8, 6])
    ims = read_images_binary(str(tmp_path / "sparse/0/images.bin"))
    assert ims[1].name == "a.png" and ims[2].name == "b.png"
    np.testing.assert_allclose(ims[2].tvec, [0, 0, 2])
    np.testing.assert_allclose(qvec2rotmat(ims[1].qvec), np.eye(3))
    pts = read_points3d_binary(str(tmp_path / "sparse/0/points3D.bin"))
    assert len(pts) == 3
    np.testing.assert_allclose(pts[1].xyz, [1, 0.5, 2.0])


def _write_png(path, hw=(8, 8), color=(255, 0, 0)):
    from PIL import Image
    img = np.zeros((hw[0], hw[1], 3), np.uint8)
    img[:] = color
    Image.fromarray(img).save(path)


def test_nsvf_loader(tmp_path):
    from ingp_tpu.data.nsvf import NSVFDataset
    root = tmp_path / "Synthetic_NeRF" / "Lego"
    for sub in ("rgb", "pose"):
        os.makedirs(root / sub)
    np.savetxt(root / "bbox.txt", np.array([-1, -1, -1, 1, 1, 1, 0.1]))
    with open(root / "intrinsics.txt", "w") as f:
        f.write("1111.0 400 400 0\n0 0 0\n")
    for i in range(3):
        _write_png(root / "rgb" / f"0_{i:04d}.png")
        pose = np.eye(4)
        pose[2, 3] = 3 + i
        np.savetxt(root / "pose" / f"0_{i:04d}.txt", pose)
    ds = NSVFDataset(str(root), split="train", downsample=0.02)
    assert ds.img_wh == (16, 16)
    assert ds.rays.shape == (3, 256, 3)
    np.testing.assert_allclose(ds.rays[0, 0], [1, 0, 0], atol=2e-2)
    # Lego fudge factor 1.1 applied to the bbox scale of 1.05
    assert abs(ds.scale - 1.0 * 1.05 * 1.1) < 1e-6
    # poses shifted/scaled into [-0.5, 0.5]
    assert np.abs(ds.poses[..., 3]).max() <= 3 + 2


def test_nerf_loader(tmp_path):
    from ingp_tpu.data.nerf import NeRFDataset
    root = tmp_path / "lego"
    os.makedirs(root / "train")
    frames = []
    for i in range(2):
        name = f"train/r_{i}"
        _write_png(root / f"{name}.png", hw=(8, 8))
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 3 + i]
        frames.append({"file_path": name,
                       "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": 0.69, "frames": frames}
    with open(root / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    ds = NeRFDataset(str(root), split="train", downsample=0.01)
    assert ds.img_wh == (8, 8)
    assert ds.rays.shape == (2, 64, 3)
    # pose radius normalized to 1.5
    np.testing.assert_allclose(
        np.linalg.norm(ds.poses[:, :, 3], axis=-1), 1.5, rtol=1e-5)
