"""ctypes front-end of the native ray-batch sampler.

`NativeBatchSampler` mirrors BaseDataset.sample_batch (datasets/base.py:
22-50) but gathers batches in a C++ background thread with a slot ring,
overlapping host-side sampling with device steps — the TPU equivalent of
the reference's 16 persistent DataLoader workers (train.py:255-260).
Batches are deterministic functions of (seed, batch_id), independent of
thread timing.
"""
from __future__ import annotations

import ctypes

import numpy as np


def _load():
    from .build import build_library
    lib = ctypes.CDLL(build_library())
    lib.sampler_create.restype = ctypes.c_void_p
    lib.sampler_create.argtypes = [ctypes.c_uint64, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int]
    lib.sampler_add_field.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int64]
    lib.sampler_set_labels.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.sampler_start.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.sampler_next.restype = ctypes.c_int64
    lib.sampler_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_void_p),
                                 ctypes.c_void_p]
    lib.sampler_destroy.argtypes = [ctypes.c_void_p]
    return lib


_LIB = None


def native_available() -> bool:
    global _LIB
    if _LIB is None:
        try:
            _LIB = _load()
        except Exception:
            _LIB = False
    return bool(_LIB)


class NativeBatchSampler:
    """Background-prefetched batches from a BaseDataset-style container.

    Usage:
        sampler = NativeBatchSampler(dataset, batch_size, seed)
        batch = sampler.next_batch()   # dict like sample_batch()
    """

    def __init__(self, dataset, batch_size, seed=0, strategy=None,
                 n_slots=4):
        if not native_available():
            raise RuntimeError("native dataloader unavailable")
        self._lib = _LIB
        strategy = strategy or getattr(dataset, "ray_sampling_strategy",
                                       "all_images")
        strat_id = 1 if strategy == "same_image" else 0
        n_images = len(dataset.poses)
        w, h = dataset.img_wh
        self.batch_size = batch_size
        self.img_wh = dataset.img_wh

        # keep references so the C++ side sees live memory
        self._arrays = []
        self._fields = []

        self._h = self._lib.sampler_create(seed, n_images, w * h,
                                           batch_size, strat_id)

        def add(name, arr):
            arr = np.ascontiguousarray(arr, np.float32)
            self._arrays.append(arr)
            self._lib.sampler_add_field(
                self._h, arr.ctypes.data_as(ctypes.c_void_p),
                arr.shape[-1])
            self._fields.append((name, arr.shape[-1]))

        add("rgb", dataset.rays)
        if hasattr(dataset, "normals"):
            add("normal", dataset.normals)
        if hasattr(dataset, "depths_2d"):
            add("depth", dataset.depths_2d[..., None])

        self._labels = None
        if hasattr(dataset, "labels"):
            self._labels = np.ascontiguousarray(dataset.labels, np.int64)
            self._lib.sampler_set_labels(
                self._h, self._labels.ctypes.data_as(ctypes.c_void_p))

        self._lib.sampler_start(self._h, n_slots)

    def next_batch(self):
        B = self.batch_size
        img_idx = np.empty(B, np.int32)
        pix_idx = np.empty(B, np.int32)
        outs = [np.empty((B, wdt), np.float32)
                for _, wdt in self._fields]
        out_ptrs = (ctypes.c_void_p * len(outs))(
            *[o.ctypes.data_as(ctypes.c_void_p) for o in outs])
        label_out = np.empty(B, np.int64) if self._labels is not None \
            else None
        self._lib.sampler_next(
            self._h, img_idx.ctypes.data_as(ctypes.c_void_p),
            pix_idx.ctypes.data_as(ctypes.c_void_p), out_ptrs,
            label_out.ctypes.data_as(ctypes.c_void_p)
            if label_out is not None else None)

        w, h = self.img_wh
        batch = {"img_idxs": img_idx, "pix_idxs": pix_idx}
        for (name, wdt), arr in zip(self._fields, outs):
            if name == "rgb":
                batch["rgb"] = arr[:, :3]
                if wdt == 4:
                    batch["exposure"] = arr[:, 3:]
            elif name == "depth":
                batch["depth"] = arr[:, 0]
            else:
                batch[name] = arr
        if label_out is not None:
            batch["label"] = label_out
        u = pix_idx // w
        v = pix_idx % w
        batch["uv"] = np.stack([u, v], -1).astype(np.float32)
        return batch

    def close(self):
        if getattr(self, "_h", None):
            self._lib.sampler_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
