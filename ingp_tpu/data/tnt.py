"""TanksAndTemples(+background) loader — port of datasets/tnt.py.

Prefix-split (0_ train / 1_ test), intrinsics.txt, scene scale from max
camera norm, optional semantic .pgm + mono-depth .npy channels, and the
camera_path / render_train trajectories.
"""
from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from ..core.rays import get_ray_directions, get_rays, normalize
from .base import BaseDataset
from .color_utils import read_image, read_semantic


def _sort_key(x):
    if len(x) > 2 and x[-10] == "_":
        return x[-9:]
    return x


class TNTDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0,
                 cam_scale_factor=0.95, render_train=False, **kwargs):
        super().__init__(root_dir, split, downsample)

        img_dir_name = "images" if os.path.exists(
            os.path.join(root_dir, "images")) else "rgb"
        img_files = sorted(os.listdir(os.path.join(root_dir, img_dir_name)),
                           key=_sort_key)

        if split == "train":
            prefix = "0_"
        elif split == "val":
            prefix = "1_"
        elif "Synthetic" in self.root_dir:
            prefix = "2_"
        else:
            prefix = "1_"  # test for real scenes

        imgs = sorted(glob.glob(os.path.join(
            self.root_dir, img_dir_name, prefix + "*.png")), key=_sort_key)
        semantics = []
        if kwargs.get("use_sem", False):
            semantics = sorted(glob.glob(os.path.join(
                self.root_dir, "semantic", prefix + "*.pgm")),
                key=_sort_key)
        depths = []
        if kwargs.get("depth_mono", False):
            depths = sorted(glob.glob(os.path.join(
                self.root_dir, "depth", prefix + "*.npy")), key=_sort_key)
        pose_files = sorted(glob.glob(os.path.join(
            self.root_dir, "pose", prefix + "*.txt")), key=_sort_key)

        with Image.open(os.path.join(root_dir, img_dir_name,
                                     img_files[0])) as img0:
            w, h = img0.width, img0.height
        w, h = int(w * downsample), int(h * downsample)
        K = np.loadtxt(os.path.join(root_dir, "intrinsics.txt"),
                       dtype=np.float32)
        if K.shape[0] > 4:
            K = K.reshape(4, 4)
        K = K[:3, :3] * downsample
        K[2, 2] = 1.0
        self.K = K
        self.img_wh = (w, h)
        self.directions = get_ray_directions(
            h, w, self.K,
            anti_aliasing_factor=kwargs.get("anti_aliasing_factor", 1.0))

        # ---- poses (tnt.py:73-107) ----------------------------------
        self.has_render_traj = False
        if split == "test" and not render_train:
            self.has_render_traj = os.path.exists(
                os.path.join(root_dir, "camera_path"))

        def load_c2w(path):
            m = np.loadtxt(path).reshape(-1, 4)
            if len(m) == 3:
                m = np.concatenate([m, [[0, 0, 0, 1.0]]], 0)
            return m

        c2w = np.stack([load_c2w(p) for p in pose_files])
        self.up = -normalize(c2w[:, :3, 1].mean(0))

        norm_pose_files = sorted(
            os.listdir(os.path.join(root_dir, "pose")), key=_sort_key)
        norm_poses = np.stack([load_c2w(os.path.join(root_dir, "pose", x))
                               for x in norm_pose_files])
        scale = np.linalg.norm(norm_poses[..., 3], axis=-1).max()

        render_c2w = None
        if self.has_render_traj or render_train:
            pose_dir = "camera_path/pose" if not render_train else "pose"
            names = sorted(
                [x for x in os.listdir(os.path.join(root_dir, pose_dir))
                 if x.endswith(".txt")], key=lambda x: int(x[-9:-4]))
            all_render = [load_c2w(os.path.join(root_dir, pose_dir, x))
                          for x in names]
            if render_train:  # interpolate between train views
                interp = []
                for i, pose in enumerate(all_render):
                    if len(interp) >= 600:
                        break
                    interp.append(pose)
                    if 0 < i < len(all_render) - 1:
                        nxt = all_render[i + 1]
                        interp += [(pose * 3 + nxt) / 4, (pose + nxt) / 2,
                                   (pose + nxt * 3) / 4]
                all_render = interp
            render_c2w = np.stack(all_render)
            self.c2w = render_c2w

        c2w[..., 3] /= scale
        if render_c2w is not None:
            render_c2w[..., 3] /= scale

        # ---- rays (tnt.py:179-256) ----------------------------------
        rays, labels = [], []
        poses = []
        classes = kwargs.get("num_classes", 7)
        for idx, img_path in enumerate(imgs):
            poses.append(c2w[idx][:3].astype(np.float32))
            img = read_image(img_path, self.img_wh)
            if "Jade" in self.root_dir or "Fountain" in self.root_dir:
                img[np.all(img <= 0.1, -1)] = 1.0
            rays.append(img)
            if semantics:
                labels.append(read_semantic(semantics[idx], self.img_wh,
                                            classes))
        self.poses = np.stack(poses)
        self.rays = np.stack(rays).astype(np.float32)
        if semantics:
            self.labels = np.stack(labels)
        if depths:
            self.depths_2d = np.stack(
                [np.load(d).reshape(-1) for d in depths]).astype(np.float32)
        if (self.has_render_traj or render_train) and \
                not split.startswith("train"):
            self.render_traj_rays = self.get_path_rays(render_c2w)

    def get_path_rays(self, c2w_list):
        rays = {}
        for idx in range(len(c2w_list)):
            c2w = np.asarray(c2w_list[idx][:3], np.float32)
            rays_o, rays_d = get_rays(self.directions, c2w)
            rays[idx] = np.concatenate([np.asarray(rays_o),
                                        np.asarray(rays_d)], 1)
        return rays
