"""Write a miniature NeRF-synthetic (Blender transforms_*.json) scene to
disk, rendered analytically from the hermetic sphere scene
(data/synthetic.py).

Bridges the no-datasets environment and the real on-disk loader path:
tests and quality runs can exercise `--dataset_name nerf` end to end
(datasets/nerf.py file format: transforms_{split}.json +
{file_path}.png frames with the Blender [right up back] camera
convention and cameras on a radius-1.5 shell after the loader's pose
normalization, nerf.py:52-55).
"""
from __future__ import annotations

import json
import os

import numpy as np


def write_blender_scene(root, img_size=64, n_train=30, n_test=4,
                        seed=0):
    """Create transforms_train/test.json + PNG frames under `root`.

    Returns the downsample factor that maps the loader's hard-coded
    800px intrinsics to `img_size`.
    """
    from ..core.rays import get_ray_directions
    from ..data.synthetic import trace_scene, look_at_pose
    from PIL import Image

    downsample = img_size / 800.0
    fov_x = 0.8  # rad; fx = 0.5*800/tan(0.4) at full res
    fx = 0.5 * img_size / np.tan(0.5 * fov_x)
    K = np.float32([[fx, 0, img_size / 2],
                    [0, fx, img_size / 2],
                    [0, 0, 1]])
    dirs = np.asarray(get_ray_directions(img_size, img_size, K))

    os.makedirs(root, exist_ok=True)
    for split, n, s in (("train", n_train, seed),
                        ("test", n_test, seed + 1)):
        rng = np.random.default_rng(s)
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n):
            # camera on the radius-1.5 shell (the loader normalizes to
            # 1.5 anyway), biased to the upper hemisphere like the
            # blender rigs
            v = rng.normal(size=3)
            v[1] = -abs(v[1])
            eye = 1.5 * v / np.linalg.norm(v)
            c2w = look_at_pose(eye)                # [right down front]
            ro = np.broadcast_to(eye, (len(dirs), 3))
            rd = dirs @ c2w[:, :3].T
            rgb, _, _, _, _ = trace_scene(ro, rd)
            img = (np.clip(rgb.reshape(img_size, img_size, 3), 0, 1)
                   * 255).astype(np.uint8)
            name = f"{split}/r_{i}"
            Image.fromarray(img).save(os.path.join(root, f"{name}.png"))
            # OpenCV -> Blender convention: negate the down/front columns
            mat = np.eye(4)
            mat[:3, :3] = c2w[:, :3] * np.array([1.0, -1.0, -1.0])
            mat[:3, 3] = c2w[:, 3]
            frames.append({"file_path": name,
                           "transform_matrix": mat.tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"),
                  "w") as f:
            json.dump({"camera_angle_x": fov_x, "frames": frames}, f)
    return downsample
