"""Mesh extraction entry point (reference extract_mesh.py equivalent):
`python -m ingp_tpu.extract_mesh_cli --config ... --ckpt_load ckpts/...`
"""
from __future__ import annotations

import os
from functools import partial

from .training.trainer import NeRFSystem, model_config_from_hparams
from .models.ngp import ngp_sigma
from .render.mesh import extract_mesh


def main(argv=None):
    from .training.config import build_parser, parse_config_file
    parser = build_parser()
    parser.add_argument("--mesh_resolution", type=int, nargs=3,
                        default=[512, 128, 512],
                        help="density probe grid (extract_mesh.py:84)")
    parser.add_argument("--sigma_threshold", type=float, default=10.0)
    hparams, _ = parser.parse_known_args(argv)
    if hparams.config:
        merged = parse_config_file(hparams.config) + (argv or [])
        hparams = parser.parse_args(merged)
    system = NeRFSystem(hparams)
    out_dir = os.path.join("results", hparams.dataset_name,
                           hparams.exp_name)
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "mesh.ply")
    density_fn = partial(ngp_sigma, system.model_cfg)
    verts, faces = extract_mesh(density_fn, system.params["model"],
                                hparams.scale,
                                resolution=tuple(hparams.mesh_resolution),
                                sigma_threshold=hparams.sigma_threshold,
                                out_path=out_path)
    print(f"wrote {len(verts)} verts / {len(faces)} faces to {out_path}")


if __name__ == "__main__":
    main()
