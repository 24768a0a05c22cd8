"""Panorama render entry point (reference render_panorama.py equivalent):
`python -m ingp_tpu.render_panorama_cli --config ... --ckpt_load ...`

The reference reads pano flags that opt.py never defines (SURVEY quirk);
here they are explicit arguments with sane defaults.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from .training.config import build_parser, parse_config_file
from .training.trainer import NeRFSystem
from .render.panorama import render_panorama


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--pano_h", type=int, default=512)
    parser.add_argument("--pano_w", type=int, default=1024)
    parser.add_argument("--pano_radius", type=float, default=0.0)
    parser.add_argument("--v_forward", type=float, nargs=3,
                        default=[0, 0, 1.0])
    parser.add_argument("--v_down", type=float, nargs=3,
                        default=[0, 1.0, 0])
    parser.add_argument("--v_right", type=float, nargs=3,
                        default=[1.0, 0, 0])
    parser.add_argument("--pano_origin", type=float, nargs=3,
                        default=[0.0, 0.0, 0.0])
    args, _ = parser.parse_known_args(argv)
    if args.config:
        merged = parse_config_file(args.config) + (argv or [])
        args = parser.parse_args(merged)

    system = NeRFSystem(args)
    out_dir = os.path.join("results", args.dataset_name, args.exp_name)
    emb = None
    if args.embed_a:
        emb = np.asarray(system.params["embedding_a"][0:1])
    res = render_panorama(
        system.model_cfg, system.render_cfg_test,
        system.params["model"], system.grid["bitfield"], out_dir,
        pano_hw=(args.pano_h, args.pano_w), origin=args.pano_origin,
        v_forward=args.v_forward, v_down=args.v_down,
        v_right=args.v_right, pano_radius=args.pano_radius,
        chunk_size=args.chunk_size, embedding_a=emb)
    print(f"wrote panorama to {out_dir}/panorama "
          f"(opacity mean {res['opacity'].mean():.3f})")


if __name__ == "__main__":
    main()
