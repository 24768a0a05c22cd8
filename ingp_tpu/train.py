"""Training entry point: `python -m ingp_tpu.train --config cfg.txt ...`

TPU-native equivalent of the reference's root train.py __main__
(train.py:401-455): seed, build NeRFSystem, fit, save full + slim
checkpoints, final validation (and offline render unless --no_save_test).
"""
from __future__ import annotations

import os

import numpy as np

from .training.config import get_opts
from .training.trainer import NeRFSystem


def main(argv=None):
    hparams = get_opts(argv)
    if hparams.val_only and not hparams.ckpt_load:
        raise ValueError("you need to provide --ckpt_load when --val_only")
    if getattr(hparams, "debug_nans", False):
        # debug mode replacing the reference's nan/inf sentinels
        # (networks.py:422-426, losses.py:133-138)
        import jax
        jax.config.update("jax_debug_nans", True)
    np.random.seed(hparams.seed)

    # multi-host first (before any backend init), then the device mesh
    # (train.py:430-432 DDPPlugin equivalent)
    distributed = False
    if hparams.distributed or hparams.coordinator_address:
        from .parallel.distributed import init_distributed
        distributed = init_distributed(hparams.coordinator_address,
                                       hparams.num_processes,
                                       hparams.process_id)

    mesh = None
    if distributed or hparams.num_gpus > 1:
        from .parallel.mesh import make_mesh
        # distributed: the mesh spans every global device (each host
        # feeds its local slice); single-host: the first num_gpus chips
        mesh = make_mesh(None if distributed else hparams.num_gpus)

    system = NeRFSystem(hparams, mesh=mesh)
    ckpt_dir = os.path.join("ckpts", hparams.dataset_name,
                            hparams.exp_name)
    os.makedirs(ckpt_dir, exist_ok=True)

    if not hparams.val_only:
        system.fit(ckpt_dir=ckpt_dir)

    metrics = system.validate()
    print(f"test/psnr {metrics['psnr']:.3f}  test/ssim "
          f"{metrics['ssim']:.4f}")

    if not hparams.no_save_test and not hparams.val_only:
        from .render.offline import render_for_test
        render_for_test(hparams, system=system)
    return metrics


if __name__ == "__main__":
    main()
