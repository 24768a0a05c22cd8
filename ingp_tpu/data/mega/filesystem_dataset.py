"""Out-of-core shuffled ray store — port of
mega_nerf/filesystem_dataset.py.

Rays of a scene too large for RAM are pre-shuffled into parquet chunks
of (rgb, ray-or-pixel-index, img_index); training cycles through chunks
with a background prefetch thread loading the next one while the current
chunk feeds batches. Resumable via get_state/set_state (chunk name).
"""
from __future__ import annotations

import math
import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from itertools import cycle
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .ray_utils import get_ray_directions, get_rays

RAY_CHUNK_SIZE = 64 * 1024


class FilesystemDataset:
    def __init__(self, metadata_items, near, far, ray_altitude_range,
                 center_pixels, chunk_paths, num_chunks, scale_factor,
                 disk_flush_size=10_000_000):
        self._c2ws = np.stack([x.c2w for x in metadata_items])
        self._near = near
        self._far = far
        self._ray_altitude_range = ray_altitude_range

        intr = np.stack([np.concatenate([[x.W, x.H], x.intrinsics])
                         for x in metadata_items])
        if np.abs(intr - intr[0]).max() == 0:
            # identical intrinsics: store compact pixel indices and
            # re-derive rays at load time (filesystem_dataset.py:37-49)
            it = metadata_items[0]
            self._directions = get_ray_directions(
                it.W, it.H, *it.intrinsics[:4], center_pixels
            ).reshape(-1, 3)
        else:
            self._directions = None

        chunk_paths = [Path(p) for p in chunk_paths]
        existing = self._check_existing_paths(chunk_paths, center_pixels,
                                              scale_factor,
                                              len(metadata_items))
        if existing is not None:
            self._parquet_paths = existing
        else:
            self._parquet_paths = []
            self._write_chunks(metadata_items, center_pixels, chunk_paths,
                               num_chunks, scale_factor, disk_flush_size)
        self._parquet_paths.sort(key=lambda x: x.name)

        self._chunk_index = cycle(range(len(self._parquet_paths)))
        self._loaded_rgbs = None
        self._loaded_rays = None
        self._loaded_img_indices = None
        self._executor = ThreadPoolExecutor(max_workers=1)
        self._chunk_future = self._executor.submit(self._load_chunk_inner)
        self._chosen = None

    # ------------------------------------------------------------------
    def load_chunk(self):
        (self._chosen, self._loaded_rgbs, self._loaded_rays,
         self._loaded_img_indices) = self._chunk_future.result()
        self._chunk_future = self._executor.submit(self._load_chunk_inner)

    def get_state(self):
        return self._chosen

    def set_state(self, chosen):
        while self._chosen != chosen:
            self.load_chunk()

    def __len__(self):
        return self._loaded_rgbs.shape[0]

    def __getitem__(self, idx):
        return {"rgbs": self._loaded_rgbs[idx],
                "rays": self._loaded_rays[idx],
                "img_indices": self._loaded_img_indices[idx]}

    def sample_batch(self, rng, batch_size):
        idx = rng.integers(0, len(self), batch_size)
        return self[idx]

    # ------------------------------------------------------------------
    def _load_chunk_inner(self):
        chosen = self._parquet_paths[next(self._chunk_index)]
        t = pq.read_table(chosen)
        img_indices = t["img_indices"].to_numpy().astype(np.int32)

        if self._directions is not None:
            pix = t["pixel_indices"].to_numpy()
            rays = np.empty((len(pix), 8), np.float32)
            for i in range(0, len(pix), RAY_CHUNK_SIZE):
                sl = slice(i, i + RAY_CHUNK_SIZE)
                dirs = self._directions[pix[sl]]
                c2w = self._c2ws[img_indices[sl]]
                # batched cam->world (rays kept per-sample; mega poses
                # vary per ray so no per-image batching needed here)
                rd = np.einsum("nc,nrc->nr", dirs, c2w[:, :, :3])
                rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
                ro = c2w[:, :, 3]
                rays[sl, 0:3] = ro
                rays[sl, 3:6] = rd
                rays[sl, 6] = self._near
                rays[sl, 7] = self._far
            if self._ray_altitude_range is not None:
                from .ray_utils import _truncate_with_plane_intersection
                near_b = rays[:, 6:7]
                far_b = rays[:, 7:8]
                _truncate_with_plane_intersection(
                    rays[:, 0:3], rays[:, 3:6],
                    self._ray_altitude_range[0], near_b)
                _truncate_with_plane_intersection(
                    rays[:, 0:3], rays[:, 3:6],
                    self._ray_altitude_range[1], far_b)
                rays[:, 6] = np.maximum(near_b[:, 0], self._near)
                rays[:, 7] = np.maximum(rays[:, 6],
                                        np.minimum(far_b[:, 0],
                                                   self._far))
        else:
            rays = np.stack([t[f"rays_{i}"].to_numpy()
                             for i in range(8)], -1).astype(np.float32)

        rgbs = np.stack([t[f"rgbs_{i}"].to_numpy()
                         for i in range(3)], -1).astype(np.float32) / 255.0
        return str(chosen), rgbs, rays, img_indices

    # ------------------------------------------------------------------
    def _write_chunks(self, metadata_items, center_pixels, chunk_paths,
                      num_chunks, scale_factor, disk_flush_size):
        path_frees, total_free = [], 0
        for p in chunk_paths:
            p.mkdir(parents=True)
            _, _, free = shutil.disk_usage(p)
            total_free += free
            path_frees.append(free)

        max_index = max(x.image_index for x in metadata_items)
        idx_dtype = np.uint16 if max_index <= np.iinfo(np.uint16).max \
            else np.int32

        writers = []
        index = 0
        for p, free in zip(chunk_paths, path_frees):
            allocated = int(free / total_free * num_chunks)
            for _ in range(allocated):
                pqp = p / "{0:06d}.parquet".format(index)
                self._parquet_paths.append(pqp)
                fields = [("img_indices", pa.from_numpy_dtype(idx_dtype))]
                fields += [(f"rgbs_{i}", pa.uint8()) for i in range(3)]
                if self._directions is not None:
                    fields.append(("pixel_indices", pa.int32()))
                else:
                    fields += [(f"rays_{i}", pa.float32())
                               for i in range(8)]
                writers.append(pq.ParquetWriter(
                    pqp, pa.schema(fields), compression="BROTLI"))
                index += 1

        rng = np.random.default_rng(0)
        buf_rgbs, buf_rays, buf_idx, count = [], [], [], 0
        for item in metadata_items:
            rgbs = item.load_image().reshape(-1, 3).astype(np.uint8)
            keep = item.load_mask()
            img_idx = np.full(len(rgbs), item.image_index, idx_dtype)
            if self._directions is not None:
                rays = np.arange(len(rgbs), dtype=np.int32)
            else:
                dirs = get_ray_directions(item.W, item.H,
                                          *item.intrinsics[:4],
                                          center_pixels)
                rays = get_rays(dirs, item.c2w, self._near, self._far,
                                self._ray_altitude_range).reshape(-1, 8)
            if keep is not None:
                m = keep.reshape(-1)
                rgbs, rays, img_idx = rgbs[m], rays[m], img_idx[m]
            buf_rgbs.append(rgbs)
            buf_rays.append(rays)
            buf_idx.append(img_idx)
            count += len(rgbs)
            if count >= disk_flush_size:
                self._flush(rng, writers, buf_rgbs, buf_rays, buf_idx,
                            idx_dtype)
                buf_rgbs, buf_rays, buf_idx, count = [], [], [], 0
        if count:
            self._flush(rng, writers, buf_rgbs, buf_rays, buf_idx,
                        idx_dtype)

        for p in chunk_paths:
            meta = {"images": len(metadata_items),
                    "scale_factor": scale_factor}
            if self._directions is None:
                meta.update(near=self._near, far=self._far,
                            center_pixels=center_pixels,
                            ray_altitude_range=self._ray_altitude_range)
            np.save(p / "metadata.npy", meta, allow_pickle=True)
        for w in writers:
            w.close()

    def _flush(self, rng, writers, buf_rgbs, buf_rays, buf_idx,
               idx_dtype):
        rgbs = np.concatenate(buf_rgbs)
        rays = np.concatenate(buf_rays)
        img_idx = np.concatenate(buf_idx)
        perm = rng.permutation(len(rgbs))
        rgbs, rays, img_idx = rgbs[perm], rays[perm], img_idx[perm]
        n = len(writers)
        csize = math.ceil(len(rgbs) / n)
        for w_i, writer in enumerate(writers):
            sl = slice(w_i * csize, (w_i + 1) * csize)
            cols = {"img_indices": img_idx[sl].astype(idx_dtype)}
            for i in range(3):
                cols[f"rgbs_{i}"] = rgbs[sl, i]
            if self._directions is not None:
                cols["pixel_indices"] = rays[sl].astype(np.int32)
            else:
                for i in range(8):
                    cols[f"rays_{i}"] = rays[sl, i].astype(np.float32)
            writer.write_table(pa.table(cols))

    def _check_existing_paths(self, chunk_paths, center_pixels,
                              scale_factor, images):
        files, num_exist = [], 0
        for p in chunk_paths:
            if p.exists():
                meta_p = p / "metadata.npy"
                assert meta_p.exists(), \
                    "incomplete chunk dir from a previous run"
                meta = np.load(meta_p, allow_pickle=True).item()
                assert meta["images"] == images
                assert meta["scale_factor"] == scale_factor
                files += [c for c in p.iterdir()
                          if c.name != "metadata.npy"]
                num_exist += 1
        if num_exist:
            assert num_exist == len(chunk_paths)
            return files
        return None
