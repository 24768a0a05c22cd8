"""Native (C++) batch sampler tests: build, correctness, determinism."""
import numpy as np
import pytest

from ingp_tpu.data.synthetic import SyntheticDataset
from ingp_tpu.native import NativeBatchSampler, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


def test_native_sampler_gathers_correct_rows():
    ds = SyntheticDataset(split="train", img_size=16, n_train=4)
    s = NativeBatchSampler(ds, batch_size=64, seed=7)
    try:
        b = s.next_batch()
        assert b["rgb"].shape == (64, 3)
        assert b["label"].shape == (64,)
        assert b["normal"].shape == (64, 3)
        # gathered values match direct indexing
        np.testing.assert_allclose(
            b["rgb"], ds.rays[b["img_idxs"], b["pix_idxs"]])
        np.testing.assert_array_equal(
            b["label"], ds.labels[b["img_idxs"], b["pix_idxs"]])
        np.testing.assert_allclose(
            b["normal"], ds.normals[b["img_idxs"], b["pix_idxs"]])
        assert b["img_idxs"].min() >= 0 and b["img_idxs"].max() < 4
    finally:
        s.close()


def test_native_sampler_deterministic_stream():
    ds = SyntheticDataset(split="train", img_size=16, n_train=4)
    def collect(n):
        s = NativeBatchSampler(ds, batch_size=32, seed=123)
        try:
            return [s.next_batch() for _ in range(n)]
        finally:
            s.close()
    a = collect(5)
    b = collect(5)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["img_idxs"], y["img_idxs"])
        np.testing.assert_array_equal(x["pix_idxs"], y["pix_idxs"])
        np.testing.assert_allclose(x["rgb"], y["rgb"])
    # different seed -> different stream
    s2 = NativeBatchSampler(ds, batch_size=32, seed=124)
    try:
        c = s2.next_batch()
    finally:
        s2.close()
    assert not np.array_equal(a[0]["pix_idxs"], c["pix_idxs"])


def test_native_sampler_same_image_strategy():
    ds = SyntheticDataset(split="train", img_size=16, n_train=6)
    s = NativeBatchSampler(ds, batch_size=48, seed=1,
                           strategy="same_image")
    try:
        b = s.next_batch()
        assert len(np.unique(b["img_idxs"])) == 1
    finally:
        s.close()
