"""KITTI-360 novel-view-synthesis loader — port of datasets/kitti360.py.

Stereo rectified cameras, pose windowing with NVS test-frame exclusion,
scene normalization to half the max pairwise camera distance with a
forward shift, 10-class semantic remap, mono-normals rotated to world,
and sun/up direction estimation from OXTS GPS. The reference uses pvlib
for solar position (kitti360.py:222-224); this port computes it with the
standard NOAA approximation (no external dependency).
"""
from __future__ import annotations

import math
import os

import numpy as np
import cv2

from ..core.rays import (get_ray_directions, get_rays,
                         generate_interpolated_path)
from .base import BaseDataset


def parse_calib_file(path, key):
    """kitti360.py:261-270."""
    with open(path) as f:
        for line in f:
            if key in line:
                return np.array([float(t)
                                 for t in line.strip().split(" ")[1:]])
    return None


def solar_position(lat_deg, lon_deg, when_utc):
    """NOAA-approximation solar zenith/azimuth in degrees.

    when_utc: datetime (UTC). Accuracy ~0.1 deg — plenty for a scene
    light-direction prior (replaces pvlib get_solarposition).
    """
    import datetime as _dt
    d = when_utc - _dt.datetime(2000, 1, 1, 12, tzinfo=when_utc.tzinfo)
    jd = 2451545.0 + d.days + d.seconds / 86400.0
    n = jd - 2451545.0
    L = (280.460 + 0.9856474 * n) % 360          # mean longitude
    g = math.radians((357.528 + 0.9856003 * n) % 360)  # mean anomaly
    lam = math.radians(L + 1.915 * math.sin(g)
                       + 0.020 * math.sin(2 * g))  # ecliptic longitude
    eps = math.radians(23.439 - 0.0000004 * n)
    ra = math.atan2(math.cos(eps) * math.sin(lam), math.cos(lam))
    dec = math.asin(math.sin(eps) * math.sin(lam))
    # greenwich mean sidereal time (deg)
    ut_h = (when_utc.hour + when_utc.minute / 60 + when_utc.second / 3600)
    gmst = (6.697375 + 0.0657098242 * n + ut_h * 1.0027379) % 24
    lst = (gmst * 15 + lon_deg) % 360
    ha = math.radians(lst) - ra                   # hour angle
    lat = math.radians(lat_deg)
    elev = math.asin(math.sin(lat) * math.sin(dec)
                     + math.cos(lat) * math.cos(dec) * math.cos(ha))
    az = math.atan2(-math.sin(ha),
                    math.tan(dec) * math.cos(lat)
                    - math.sin(lat) * math.cos(ha))
    zenith = 90.0 - math.degrees(elev)
    azimuth = math.degrees(az) % 360
    return zenith, azimuth


def _euler_xyz(rx, ry, rz):
    """R.from_euler('xyz', [rx, ry, rz]) equivalent (extrinsic xyz)."""
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


class KittiDataset(BaseDataset):
    def __init__(self, root_dir, split, nvs=False, downsample=1.0,
                 **kwargs):
        super().__init__(root_dir, split, downsample)
        self.nvs = nvs
        seq_id = kwargs.get("seq_id", 0)
        dir_seq = "2013_05_28_drive_{:0>4d}_sync".format(seq_id)
        dir_rgb = [os.path.join(root_dir, "data_2d_raw", dir_seq,
                                f"image_{c:02d}", "data_rect")
                   for c in (0, 1)]
        dir_sem = [os.path.join(root_dir, "data_2d_semantics/train",
                                dir_seq, f"image_{c:02d}/semantic")
                   for c in (0, 1)]
        dir_normal = [os.path.join(root_dir, "data_2d_raw", dir_seq,
                                   f"image_{c:02d}", "normal")
                      for c in (0, 1)]
        dir_calib = os.path.join(root_dir, "calibration")
        dir_poses = os.path.join(root_dir, "data_poses", dir_seq)
        dir_oxts = os.path.join(dir_poses, "oxts")

        # intrinsics (kitti360.py:31-39)
        intrinsic_path = os.path.join(dir_calib, "perspective.txt")
        K_00 = parse_calib_file(intrinsic_path, "P_rect_00").reshape(3, 4)
        K_00[:2] *= downsample
        self.K = K_00[:, :-1].astype(np.float32)
        img_size = parse_calib_file(intrinsic_path, "S_rect_00")
        w, h = int(img_size[0] * downsample), int(img_size[1] * downsample)
        self.img_wh = (w, h)
        self.directions = get_ray_directions(
            h, w, self.K,
            anti_aliasing_factor=kwargs.get("anti_aliasing_factor", 1.0))

        # extrinsics + frame window (kitti360.py:41-64)
        frame_start = kwargs.get("frame_start", 0)
        frame_end = kwargs.get("frame_end", 100)
        pose_cam_0 = np.genfromtxt(
            os.path.join(dir_poses, "cam0_to_world.txt"))
        frame_id = pose_cam_0[:, 0]
        sample = (frame_id >= frame_start) & (frame_id <= frame_end)
        frame_id = frame_id[sample].astype(np.int32)

        cam2world_0 = pose_cam_0[sample, 1:].reshape(-1, 4, 4)[:, :3]
        sys2world = np.genfromtxt(os.path.join(dir_poses, "poses.txt"))
        sys2world = sys2world[sample, 1:].reshape(-1, 3, 4)
        cam2sys_1 = parse_calib_file(
            os.path.join(dir_calib, "calib_cam_to_pose.txt"), "image_01")
        cam2sys_1 = np.concatenate(
            [cam2sys_1.reshape(3, 4), [[0, 0, 0, 1]]], 0)
        R_rect_01 = parse_calib_file(intrinsic_path,
                                     "R_rect_01").reshape(3, 3)
        R_rect = np.eye(4)
        R_rect[:3, :3] = np.linalg.inv(R_rect_01)
        cam2world_1 = sys2world @ cam2sys_1 @ R_rect

        test_id = np.array(kwargs.get("test_id", []), np.int32)
        test_id_normalized = np.array(
            [i for i in range(len(frame_id))
             if (test_id == frame_id[i]).any()], np.int64)
        self.setup_poses(cam2world_0, cam2world_1, test_id_normalized)
        try:
            self.estimate_sunlight(dir_oxts, dir_calib, frame_id,
                                   cam2world_0)
        except Exception as e:  # OXTS optional for NVS benchmarks
            print(f"sunlight estimation skipped: {e}")

        if self.split != "train":
            frame_id = test_id
        elif self.nvs:
            keep = np.ones(len(frame_id), bool)
            keep[test_id_normalized] = False
            frame_id = frame_id[keep]

        rgb = [self.read_rgb(d, frame_id) for d in dir_rgb]
        self.rays = np.concatenate(rgb, 0).astype(np.float32)
        if self.split == "train":
            if os.path.isdir(dir_sem[0]):
                sem = [self.read_semantics(d, frame_id) for d in dir_sem]
                self.labels = np.concatenate(sem, 0)
            if os.path.isdir(dir_normal[0]):
                nrm = [self.read_normal(d, frame_id, half)
                       for d, half in zip(dir_normal, (0, 1))]
                self.normals = np.concatenate(nrm, 0).astype(np.float32)

    # ------------------------------------------------------------------
    def setup_poses(self, cam2world_0, cam2world_1, test_id_normalized):
        """Normalize the scene (kitti360.py:90-121): center poses, scale
        to half max pairwise distance, shift back along travel dir."""
        pos_0 = cam2world_0[:, :, -1]
        pos_1 = cam2world_1[:, :, -1]
        pos = np.concatenate([pos_0, pos_1], 0)
        center = pos.mean(0)
        forward = pos_0[-1] - pos_0[0]
        forward = forward / np.linalg.norm(forward)
        diff = pos[:, None] - pos[None]
        scale = np.sqrt((diff ** 2).sum(-1)).max() / 2
        self.scale = scale

        pos = (pos - center) / scale - forward * 0.5
        cam2world = np.concatenate([cam2world_0, cam2world_1], 0)
        cam2world[:, :, -1] = pos
        n_step = cam2world_0.shape[0]
        if self.split != "train":
            sel = np.concatenate([test_id_normalized,
                                  test_id_normalized + n_step])
            cam2world = cam2world[sel]
        elif self.nvs:
            keep = np.ones(n_step * 2, bool)
            keep[np.concatenate([test_id_normalized,
                                 test_id_normalized + n_step])] = False
            cam2world = cam2world[keep]

        self.poses = cam2world.astype(np.float32)
        if self.split != "train":
            render_c2w = generate_interpolated_path(cam2world, 120)[:400]
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

    # ------------------------------------------------------------------
    def read_rgb(self, dir_rgb, frame_id):
        out = []
        for i in frame_id:
            path = os.path.join(dir_rgb, "{:0>10d}.png".format(i))
            img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
            if (img.shape[1], img.shape[0]) != self.img_wh:
                img = cv2.resize(img, self.img_wh)
            out.append((img / 255.0).astype(np.float32).reshape(-1, 3))
        return np.stack(out)

    def read_semantics(self, dir_sem, frame_id):
        out = []
        for i in frame_id:
            path = os.path.join(dir_sem, "{:0>10d}.png".format(i))
            label = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
            if (label.shape[1], label.shape[0]) != self.img_wh:
                label = cv2.resize(label, self.img_wh,
                                   interpolation=cv2.INTER_NEAREST)
            out.append(self.label_mapping(label.flatten()))
        return np.stack(out)

    @staticmethod
    def label_mapping(label):
        """KITTI-360 ids -> 10 coarse classes (kitti360.py:155-181)."""
        groups = [
            ([6, 7, 8, 9, 10], 0),                                  # flat
            ([11, 12, 13, 14, 15, 16, 34, 35, 36, 42], 1),  # construction
            ([39, 40, 41, 44], 2),                                # object
            ([21, 22], 3),                                        # nature
            ([23], 4),                                            # sky
            ([24, 25], 5),                                        # human
            ([19, 20, 26, 27, 28, 29, 30, 31, 32, 33, 43, 255], 6),  # veh
            ([38], 7),                                       # light source
            ([17, 18, 37], 8),                                    # pole
        ]
        new = np.full_like(label, 9, dtype=np.int32)  # void
        for ids, cls in groups:
            new[np.isin(label, ids)] = cls
        return new

    def read_normal(self, dir_normal, frame_id, half):
        """Mono normals [0,1] -> [-1,1], rotated to world with the pose
        of the matching camera (kitti360.py:183-193)."""
        n = len(frame_id)
        poses = self.poses[half * n:(half + 1) * n]
        out = []
        for c2w, i in zip(poses, frame_id):
            path = os.path.join(dir_normal, "{:0>10d}.npy".format(i))
            img = np.load(path).transpose(1, 2, 0)
            normal = ((img - 0.5) * 2).reshape(-1, 3)
            out.append(normal @ c2w[:, :3].T)
        return np.stack(out)

    # ------------------------------------------------------------------
    def estimate_sunlight(self, dir_oxts, dir_calib, frame_id, cam2world):
        """Mean sun and up direction in world frame (kitti360.py:196-259).

        The KITTI-360 timestamps are local Etc/GMT+2 (i.e. UTC-2 in pvlib
        convention) — converted to UTC for the solar ephemeris.
        """
        import datetime as _dt
        with open(os.path.join(dir_oxts, "timestamps.txt")) as f:
            stamps = np.array([ln.strip() for ln in f])[frame_id]
        dir_data = os.path.join(dir_oxts, "data")
        files = np.array(sorted(
            os.path.join(dir_data, p) for p in os.listdir(dir_data)
        ))[frame_id]
        cam2sys_0 = parse_calib_file(
            os.path.join(dir_calib, "calib_cam_to_pose.txt"), "image_00")
        R_sys2cam_0 = cam2sys_0.reshape(3, 4)[:3, :3].T

        sun_dirs, up_dirs = [], []
        for i in range(len(frame_id)):
            ts = stamps[i].split(".")[0]
            when = _dt.datetime.strptime(ts, "%Y-%m-%d %H:%M:%S")
            when = when.replace(tzinfo=_dt.timezone.utc) \
                + _dt.timedelta(hours=2)  # Etc/GMT+2 -> UTC
            data = np.genfromtxt(files[i])
            lat, lon = data[0], data[1]
            zen, azi = solar_position(lat, lon, when)
            theta, phi = math.radians(zen), math.radians(azi)
            sun = np.array([math.sin(theta) * math.sin(phi),
                            math.sin(theta) * math.cos(phi),
                            math.cos(theta)])  # x=east y=north z=up
            roll, pitch, yaw = data[3], data[4], data[5]
            car2world = _euler_xyz(-pitch, roll, yaw - np.pi / 2)
            world2car = car2world.T
            R_cam2world = cam2world[i][:3, :3]

            def to_world(v_world_enu):
                v_car = world2car @ v_world_enu       # x=right y=fwd z=up
                v_gps = np.array([v_car[1], v_car[0], -v_car[2]])
                v_cam = R_sys2cam_0 @ v_gps
                return R_cam2world @ v_cam

            sun_dirs.append(to_world(sun))
            up_dirs.append(to_world(np.array([0, 0, 1.0])))

        self.sun_dir = np.mean(sun_dirs, 0).astype(np.float32)
        self.up_dir = np.mean(up_dirs, 0).astype(np.float32)
