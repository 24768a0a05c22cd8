"""COLMAP-reconstruction loader — port of datasets/colmap.py, including
the HDR-NeRF exposure branch, every-8th test split, spheric / B-spline
test trajectories, and optional semantic labels."""
from __future__ import annotations

import glob
import os

import numpy as np

from ..core.rays import (get_ray_directions, get_rays, average_poses,
                         create_spheric_poses, generate_interpolated_path,
                         normalize)
from .base import BaseDataset
from .color_utils import read_image, read_semantic
from .colmap_utils import (read_cameras_binary, read_images_binary,
                           read_points3d_binary, qvec2rotmat)


class ColmapDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0, **kwargs):
        super().__init__(root_dir, split, downsample)
        self.read_intrinsics(**kwargs)
        if kwargs.get("read_meta", True):
            self.read_meta(split, **kwargs)

    def read_intrinsics(self, **kwargs):
        camdata = read_cameras_binary(
            os.path.join(self.root_dir, "sparse/0/cameras.bin"))
        cam = camdata[1]
        h = int(cam.height * self.downsample)
        w = int(cam.width * self.downsample)
        self.img_wh = (w, h)
        if cam.model == "SIMPLE_RADIAL":
            fx = fy = cam.params[0] * self.downsample
            cx = cam.params[1] * self.downsample
            cy = cam.params[2] * self.downsample
        elif cam.model in ("PINHOLE", "OPENCV"):
            fx = cam.params[0] * self.downsample
            fy = cam.params[1] * self.downsample
            cx = cam.params[2] * self.downsample
            cy = cam.params[3] * self.downsample
        else:
            raise ValueError(f"unsupported camera model {cam.model}")
        self.K = np.float32([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
        self.directions = get_ray_directions(
            h, w, self.K,
            anti_aliasing_factor=kwargs.get("anti_aliasing_factor", 1.0))

    def read_meta(self, split, **kwargs):
        imdata = read_images_binary(
            os.path.join(self.root_dir, "sparse/0/images.bin"))
        img_names = [imdata[k].name for k in imdata]
        perm = np.argsort(img_names)
        if "360" in self.root_dir and self.downsample < 1:
            folder = f"images_{int(1 / self.downsample)}"
            sem_folder = f"semantic_{int(1 / self.downsample)}"
        else:
            folder = "images"
            sem_folder = "semantic"
        img_paths = [os.path.join(self.root_dir, folder, name)
                     for name in sorted(img_names)]
        sem_paths = [os.path.join(
            self.root_dir, sem_folder,
            os.path.splitext(name)[0] + ".pgm")
            for name in sorted(img_names)]

        bottom = np.array([[0, 0, 0, 1.0]])
        w2c = []
        for k in imdata:
            im = imdata[k]
            R = qvec2rotmat(im.qvec)
            t = im.tvec.reshape(3, 1)
            w2c.append(np.concatenate(
                [np.concatenate([R, t], 1), bottom], 0))
        poses = np.linalg.inv(np.stack(w2c))[perm, :3]  # c2w

        pts3d_rec = read_points3d_binary(
            os.path.join(self.root_dir, "sparse/0/points3D.bin"))
        pts3d = np.array([pts3d_rec[k].xyz for k in pts3d_rec])

        self.poses, self.pts3d = poses, pts3d
        self.up = -normalize(self.poses[:, :3, 1].mean(0))
        scale = np.linalg.norm(self.poses[..., 3], axis=-1).max()
        self.poses[..., 3] /= scale
        self.pts3d /= scale

        rays, labels = [], []
        use_sem = kwargs.get("use_sem", False)
        if split == "test_traj":  # colmap.py:126-129
            self.poses = create_spheric_poses(
                1.2, self.poses[:, 1, 3].mean()).astype(np.float32)[:, :3]
            return

        exposures = None
        if "HDR-NeRF" in self.root_dir:  # colmap.py:131-163
            img_paths, exposures = self._hdr_split(split)
        else:
            if split == "train":  # every 8th image is test
                keep = [i for i in range(len(img_paths)) if i % 8 != 0]
            else:
                keep = [i for i in range(len(img_paths)) if i % 8 == 0]
            render_c2w = self.poses.copy()
            img_paths = [img_paths[i] for i in keep]
            sem_paths = [sem_paths[i] for i in keep]
            self.poses = self.poses[keep]
            if split == "test" and kwargs.get("render_traj", False):
                render_c2w = generate_interpolated_path(
                    self.poses, 120)[400:800]

        for i, img_path in enumerate(img_paths):
            buf = [read_image(img_path, self.img_wh)]
            if exposures is not None:
                buf.append(np.full_like(buf[0][:, :1], exposures[i]))
            rays.append(np.concatenate(buf, 1))
        self.rays = np.stack(rays).astype(np.float32)
        self.poses = self.poses.astype(np.float32)

        if use_sem:
            for sem_path in sem_paths:
                labels.append(read_semantic(
                    sem_path, self.img_wh,
                    kwargs.get("num_classes", 7)))
            self.labels = np.stack(labels)

        if split == "test" and "HDR-NeRF" not in self.root_dir:
            self.render_traj_rays = self.get_path_rays(render_c2w)

    def _hdr_split(self, split):
        """HDR-NeRF exposure tables + train/test splits
        (colmap.py:131-163, 201-221)."""
        scene = os.path.basename(os.path.normpath(self.root_dir))
        e_tables = {
            **{s: {e: 1 / 8 * 4 ** e for e in range(5)}
               for s in ("bathroom", "bear", "chair", "desk")},
            **{s: {e: 1 / 16 * 4 ** e for e in range(5)}
               for s in ("diningroom", "dog")},
            "sofa": {0: 0.25, 1: 1, 2: 2, 3: 4, 4: 16},
            "sponza": {0: 0.5, 1: 2, 2: 4, 3: 8, 4: 32},
            "box": {0: 2 / 3, 1: 1 / 3, 2: 1 / 6, 3: 0.1, 4: 0.05},
            "computer": {0: 1 / 3, 1: 1 / 8, 2: 1 / 15, 3: 1 / 30,
                         4: 1 / 60},
            "flower": {0: 1 / 3, 1: 1 / 6, 2: 0.1, 3: 0.05, 4: 1 / 45},
            "luckycat": {0: 2, 1: 1, 2: 0.5, 3: 0.25, 4: 0.125},
        }
        if "syndata" in self.root_dir:
            self.unit_exposure_rgb = 0.73
            if split == "train":
                img_paths = sorted(glob.glob(os.path.join(
                    self.root_dir, "train/*[024].png")))
                self.poses = np.repeat(self.poses[-18:], 3, 0)
            else:
                img_paths = sorted(glob.glob(os.path.join(
                    self.root_dir, "test/*[13].png")))
                self.poses = np.repeat(self.poses[:17], 2, 0)
        else:
            self.unit_exposure_rgb = 0.5
            if split == "train":
                img_paths = sorted(glob.glob(os.path.join(
                    self.root_dir, "input_images/*0.jpg")))[::2]
                img_paths += sorted(glob.glob(os.path.join(
                    self.root_dir, "input_images/*2.jpg")))[::2]
                img_paths += sorted(glob.glob(os.path.join(
                    self.root_dir, "input_images/*4.jpg")))[::2]
                self.poses = np.tile(self.poses[::2], (3, 1, 1))
            else:
                img_paths = sorted(glob.glob(os.path.join(
                    self.root_dir, "input_images/*1.jpg")))[1::2]
                img_paths += sorted(glob.glob(os.path.join(
                    self.root_dir, "input_images/*3.jpg")))[1::2]
                self.poses = np.tile(self.poses[1::2], (2, 1, 1))
        table = e_tables.get(scene, {e: 1.0 for e in range(5)})
        exposures = [table[int(os.path.splitext(p)[0][-1])]
                     for p in img_paths]
        return img_paths, exposures

    def get_path_rays(self, c2w_list):
        """Precomputed rays along a render trajectory (colmap.py:239-248)."""
        rays = {}
        for idx in range(len(c2w_list)):
            c2w = np.asarray(c2w_list[idx][:3], np.float32)
            rays_o, rays_d = get_rays(self.directions, c2w)
            rays[idx] = np.concatenate([np.asarray(rays_o),
                                        np.asarray(rays_d)], 1)
        return rays
