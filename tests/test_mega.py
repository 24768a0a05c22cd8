"""Out-of-core FilesystemDataset tests (chunk write/load/prefetch/resume)."""
import numpy as np
import pytest

from ingp_tpu.data.mega.filesystem_dataset import FilesystemDataset
from ingp_tpu.data.mega.image_metadata import ImageMetadata
from ingp_tpu.data.mega.ray_utils import get_ray_directions, get_rays


def _make_items(tmp_path, n=4, W=16, H=12):
    from PIL import Image
    rng = np.random.default_rng(0)
    items = []
    for i in range(n):
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(img).save(p)
        c2w = np.eye(4)[:3].astype(np.float32)
        c2w[:, 3] = [0, 0, float(i)]
        items.append(ImageMetadata(p, c2w, W, H,
                                   np.array([10.0, 10.0, W / 2, H / 2]),
                                   i, None, False))
    return items


def test_filesystem_dataset_roundtrip(tmp_path):
    items = _make_items(tmp_path)
    chunk_dir = tmp_path / "chunks"
    ds = FilesystemDataset(items, near=0.1, far=10.0,
                           ray_altitude_range=None, center_pixels=True,
                           chunk_paths=[chunk_dir], num_chunks=3,
                           scale_factor=1, disk_flush_size=100)
    ds.load_chunk()
    total = 0
    seen_imgs = set()
    state0 = ds.get_state()
    for _ in range(3):
        total += len(ds)
        seen_imgs.update(np.unique(ds._loaded_img_indices).tolist())
        b = ds.sample_batch(np.random.default_rng(0), 32)
        assert b["rgbs"].shape == (32, 3)
        assert b["rays"].shape == (32, 8)
        assert np.all(b["rays"][:, 6] == 0.1)   # near
        assert np.all(b["rays"][:, 7] == 10.0)  # far
        # directions are unit-norm
        np.testing.assert_allclose(
            np.linalg.norm(b["rays"][:, 3:6], axis=-1), 1.0, rtol=1e-5)
        ds.load_chunk()
    assert total == 4 * 16 * 12  # every ray stored exactly once
    assert seen_imgs == {0, 1, 2, 3}

    # reuse: a second construction reads existing chunks, no rewrite
    ds2 = FilesystemDataset(items, near=0.1, far=10.0,
                            ray_altitude_range=None, center_pixels=True,
                            chunk_paths=[chunk_dir], num_chunks=3,
                            scale_factor=1)
    ds2.load_chunk()
    assert ds2.get_state() is not None
    # resumability: advance to a specific chunk by name
    ds2.set_state(state0)
    assert ds2.get_state() == state0


def test_ray_altitude_clamp():
    dirs = get_ray_directions(4, 4, 2.0, 2.0, 2.0, 2.0, True)
    c2w = np.eye(4)[:3].astype(np.float32)
    rays = get_rays(dirs, c2w, 0.1, 100.0,
                    ray_altitude_range=[-50.0, -1.0])
    assert rays.shape == (4, 4, 8)
    assert np.all(rays[..., 7] >= rays[..., 6])


def test_memory_dataset_matches_filesystem(tmp_path):
    """MemoryDataset (in-RAM variant, memory_dataset.py:1-63) stores the
    exact ray/rgb set the chunked store shuffles to disk."""
    from ingp_tpu.data.mega.memory_dataset import MemoryDataset

    items = _make_items(tmp_path)
    mem = MemoryDataset(items, near=0.1, far=10.0,
                        ray_altitude_range=None, center_pixels=True)
    assert len(mem) == 4 * 16 * 12

    chunk_dir = tmp_path / "chunks_mem"
    fs = FilesystemDataset(items, near=0.1, far=10.0,
                           ray_altitude_range=None, center_pixels=True,
                           chunk_paths=[chunk_dir], num_chunks=2,
                           scale_factor=1, disk_flush_size=100)
    fs_rows = set()
    for _ in range(2):
        fs.load_chunk()
        for i in range(len(fs)):
            b = fs[i]
            fs_rows.add((int(b["img_indices"]),)
                        + tuple(np.round(b["rays"], 5).tolist())
                        + tuple(np.round(b["rgbs"], 5).tolist()))
    mem_rows = set()
    for i in range(len(mem)):
        b = mem[i]
        mem_rows.add((int(b["img_indices"]),)
                     + tuple(np.round(b["rays"], 5).tolist())
                     + tuple(np.round(b["rgbs"], 5).tolist()))
    assert mem_rows == fs_rows

    batch = mem.sample_batch(np.random.default_rng(0), 16)
    assert batch["rgbs"].shape == (16, 3)
    assert batch["rays"].shape == (16, 8)
    np.testing.assert_allclose(
        np.linalg.norm(batch["rays"][:, 3:6], axis=-1), 1.0, rtol=1e-5)
    # API compatibility with the chunked store
    mem.load_chunk(); mem.set_state(mem.get_state())
