"""Aux render passes: semantic pseudo-labels + up-normal masks."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from ingp_tpu.models import NGPConfig, ngp_init, RenderConfig
from ingp_tpu.render.aux_heads import (render_semantic_labels,
                                       render_up_normal_masks)
from ingp_tpu.data.synthetic import SyntheticDataset


def _setup():
    cfg = NGPConfig(scale=0.5, density_L=4, density_log2T=12, rgb_L=4,
                    rgb_log2T=12, classes=4, grid_size=32)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    rcfg = RenderConfig(capacity=32, march_iters=128, samples_per_ray=8,
                        T_threshold=1e-2, stop_header_grads=True)
    bf = jnp.full((cfg.cascades * cfg.grid_size ** 3 // 32,),
                  0xFFFFFFFF, jnp.uint32)
    ds = SyntheticDataset(split="test", img_size=16, n_test=2)
    return cfg, rcfg, params, bf, ds


def test_render_semantic_labels(tmp_path):
    cfg, rcfg, params, bf, ds = _setup()
    out = render_semantic_labels(cfg, rcfg, params, bf, ds,
                                 str(tmp_path), chunk_size=256)
    files = sorted(os.listdir(out))
    assert files == ["00000.pgm", "00001.pgm"]
    import imageio.v2 as imageio
    label = imageio.imread(os.path.join(out, files[0]))
    assert label.shape == (16, 16)
    assert label.max() < cfg.classes


def test_render_up_normal_masks(tmp_path):
    cfg, rcfg, params, bf, ds = _setup()
    out = render_up_normal_masks(cfg, rcfg, params, bf, ds,
                                 up=[0, -1, 0], out_dir=str(tmp_path),
                                 chunk_size=256)
    files = sorted(os.listdir(out))
    assert files == ["msk_00000.pgm", "msk_00001.pgm"]
    import imageio.v2 as imageio
    mask = imageio.imread(os.path.join(out, files[0]))
    assert mask.shape == (16, 16)
