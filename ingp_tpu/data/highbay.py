"""Highbay stereo-rig loader — port of datasets/highbay.py.

GPS/IMU csv -> Slerp'd rotations + UTM-interpolated positions, valid time
windows, 0.12 m right-camera baseline, semantic/normal channels. The
reference imports the `utm` package; this port computes the UTM
transverse-Mercator projection directly (standard Krueger series).
"""
from __future__ import annotations

import json
import math
import os

import numpy as np
import cv2

from ..core.rays import (get_ray_directions, get_rays,
                         generate_interpolated_path)
from .base import BaseDataset


def latlon_to_utm(latitude, longitude):
    """(east, north) of WGS84 lat/lon in their UTM zone (meters).

    Standard UTM forward projection (same math as utm.from_latlon for
    northern-hemisphere points; accuracy ~mm at highbay scales).
    """
    lat = np.radians(np.asarray(latitude, np.float64))
    lon = np.radians(np.asarray(longitude, np.float64))
    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996

    zone = np.floor((np.degrees(lon) + 180) / 6) + 1
    lon0 = np.radians((zone - 1) * 6 - 180 + 3)

    N = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    T = np.tan(lat) ** 2
    C = ep2 * np.cos(lat) ** 2
    A = np.cos(lat) * (lon - lon0)

    M = a * ((1 - e2 / 4 - 3 * e2 ** 2 / 64 - 5 * e2 ** 3 / 256) * lat
             - (3 * e2 / 8 + 3 * e2 ** 2 / 32 + 45 * e2 ** 3 / 1024)
             * np.sin(2 * lat)
             + (15 * e2 ** 2 / 256 + 45 * e2 ** 3 / 1024)
             * np.sin(4 * lat)
             - (35 * e2 ** 3 / 3072) * np.sin(6 * lat))

    east = k0 * N * (A + (1 - T + C) * A ** 3 / 6
                     + (5 - 18 * T + T ** 2 + 72 * C - 58 * ep2)
                     * A ** 5 / 120) + 500000.0
    north = k0 * (M + N * np.tan(lat)
                  * (A ** 2 / 2 + (5 - T + 9 * C + 4 * C ** 2)
                     * A ** 4 / 24
                     + (61 - 58 * T + T ** 2 + 600 * C - 330 * ep2)
                     * A ** 6 / 720))
    north = np.where(lat < 0, north + 10000000.0, north)
    return east, north


class HighbayDataset(BaseDataset):
    def __init__(self, root_dir, split, nvs=False, downsample=1.0,
                 **kwargs):
        super().__init__(root_dir, split, downsample)
        import pandas as pd
        self.nvs = nvs

        dir_rgb = [os.path.join(root_dir, s, "rgb")
                   for s in ("left", "right")]
        dir_sem = [os.path.join(root_dir, s, "semantic")
                   for s in ("left", "right")]
        dir_normal = [os.path.join(root_dir, s, "normal")
                      for s in ("left", "right")]
        sensor_data = pd.read_csv(os.path.join(root_dir, "gps.csv"))

        with open(os.path.join(root_dir, "transforms.json")) as f:
            intrinsic = json.load(f)
        K = np.array([[intrinsic["fl_x"], 0, intrinsic["cx"]],
                      [0, intrinsic["fl_y"], intrinsic["cy"]],
                      [0, 0, 1.0]])
        K[:2] *= downsample
        self.K = K.astype(np.float32)
        w, h = int(intrinsic["w"] * downsample), \
            int(intrinsic["h"] * downsample)
        self.img_wh = (w, h)
        self.directions = get_ray_directions(
            h, w, self.K,
            anti_aliasing_factor=kwargs.get("anti_aliasing_factor", 1.0))

        valid_name = kwargs.get("valid_id", "valid.txt")
        img_time = np.load(os.path.join(root_dir, "img_time.npy"))
        valid_ids, valid_time = self.get_valid_time(
            img_time, os.path.join(root_dir, valid_name))
        self.setup_poses(sensor_data, valid_time)

        rgb = [self.read_rgb(d, valid_ids) for d in dir_rgb]
        self.rays = np.concatenate(rgb, 0).astype(np.float32)
        if self.split == "train":
            if os.path.isdir(dir_sem[0]):
                sem = [self.read_semantics(d, valid_ids) for d in dir_sem]
                self.labels = np.concatenate(sem, 0)
            if os.path.isdir(dir_normal[0]):
                nrm = [self.read_normal(d, valid_ids, half)
                       for d, half in zip(dir_normal, (0, 1))]
                self.normals = np.concatenate(nrm, 0).astype(np.float32)

    def get_valid_time(self, img_time, valid_path):
        """Time-window filter (highbay.py:72-90)."""
        valids = []
        with open(valid_path) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                v = [int(i) for i in line.strip().split(",")]
                valids.append(v)
        valid = img_time < 0
        for start, end in valids:
            valid |= (img_time >= start) & (img_time <= end)
        ids = np.arange(len(img_time))[valid]
        return ids, img_time[valid]

    def setup_poses(self, sensor_data, valid_time):
        """GPS/IMU -> interpolated c2w stereo poses (highbay.py:92-139)."""
        from scipy.spatial.transform import Rotation as R, Slerp
        from scipy.interpolate import interp1d

        t = np.array(sensor_data["field.header.stamp"])
        lat = np.array(sensor_data["field.latitude"])
        lon = np.array(sensor_data["field.longitude"])
        height = np.array(sensor_data["field.height"])
        roll = np.array(sensor_data["field.roll"])
        pitch = np.array(sensor_data["field.pitch"])
        azimuth = np.array(sensor_data["field.azimuth"])

        euler = np.stack([pitch, roll, -azimuth]).T
        rot = R.from_euler("xyz", euler, degrees=True).as_matrix()
        to_cv = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0.0]])
        rot = rot @ to_cv
        f_rot = Slerp(t, R.from_matrix(rot))
        rot_sample = f_rot(valid_time).as_matrix()

        east, north = latlon_to_utm(lat, lon)
        pos = np.stack([east, north, height])
        pos_sample = interp1d(t, pos)(valid_time).T
        pt_min, pt_max = pos_sample.min(0), pos_sample.max(0)
        center = (pt_min + pt_max) / 2
        scale = np.max(pt_max - pt_min) / 2
        pos_sample = (pos_sample - center[None]) / scale

        n = len(pos_sample)
        c2w_l = np.zeros((n, 3, 4))
        c2w_l[:, :3, :3] = rot_sample
        c2w_l[:, :3, -1] = pos_sample
        c2w_r = c2w_l.copy()
        # 120 mm stereo baseline along camera x (highbay.py:132)
        c2w_r[:, :3, -1] = pos_sample + rot_sample[:, :, 0] * 0.12 / scale
        c2w = np.concatenate([c2w_l, c2w_r], 0).astype(np.float32)
        self.poses = c2w

        if self.split != "train":
            render_c2w = generate_interpolated_path(c2w, 5)[:400]
            self.render_c2w = render_c2w.astype(np.float32)
            self.render_traj_rays = self.get_path_rays(render_c2w)

    def get_path_rays(self, render_c2w):
        rays = {}
        for idx in range(len(render_c2w)):
            c2w = np.asarray(render_c2w[idx][:3], np.float32)
            rays_o, rays_d = get_rays(self.directions, c2w)
            rays[idx] = np.concatenate([np.asarray(rays_o),
                                        np.asarray(rays_d)], 1)
        return rays

    def read_rgb(self, dir_rgb, valid_ids):
        out = []
        for i in valid_ids:
            img = cv2.cvtColor(
                cv2.imread(os.path.join(dir_rgb, f"{i:0>5d}.png")),
                cv2.COLOR_BGR2RGB)
            if (img.shape[1], img.shape[0]) != self.img_wh:
                img = cv2.resize(img, self.img_wh)
            out.append((img / 255.0).astype(np.float32).reshape(-1, 3))
        return np.stack(out)

    def read_semantics(self, dir_sem, valid_ids):
        out = []
        for i in valid_ids:
            label = cv2.imread(os.path.join(dir_sem, f"{i:0>5d}.pgm"),
                               cv2.IMREAD_GRAYSCALE)
            if (label.shape[1], label.shape[0]) != self.img_wh:
                label = cv2.resize(label, self.img_wh,
                                   interpolation=cv2.INTER_NEAREST)
            out.append(label.flatten().astype(np.int64))
        return np.stack(out)

    def read_normal(self, dir_normal, valid_ids, half):
        n = len(valid_ids)
        poses = self.poses[half * n:(half + 1) * n]
        out = []
        for c2w, i in zip(poses, valid_ids):
            img = np.load(os.path.join(
                dir_normal, f"{i:0>5d}_normal.npy")).transpose(1, 2, 0)
            normal = ((img - 0.5) * 2).reshape(-1, 3)
            out.append(normal @ c2w[:, :3].T)
        return np.stack(out)
