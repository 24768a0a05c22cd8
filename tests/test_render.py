"""Tests for the render package: mesh extraction, panorama, oracle
agreement, and metric helpers."""
import numpy as np
import jax
import jax.numpy as jnp

from ingp_tpu.render.mesh import marching_cubes, extract_mesh, write_ply
from ingp_tpu.render.panorama import panorama_directions, sample_panorama
from ingp_tpu.training.metrics import psnr, ssim


def test_marching_cubes_sphere():
    n = 32
    ax = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = 1.0 - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)  # >0 inside unit sphere
    verts, faces = marching_cubes(vol, 0.3)  # isosurface at r=0.7
    assert len(verts) > 100 and len(faces) > 100
    # vertices lie near the r=0.7 sphere (voxel -> world by hand)
    world = verts / (n - 1) * 2 - 1
    r = np.linalg.norm(world, axis=-1)
    assert abs(r.mean() - 0.7) < 0.05
    assert r.std() < 0.05
    assert faces.max() < len(verts)


def test_extract_mesh_from_density(tmp_path):
    def density_fn(params, x):
        r = jnp.linalg.norm(x, axis=-1)
        return jnp.where(r < 0.3, 30.0, 0.0)

    out = str(tmp_path / "mesh.ply")
    verts, faces = extract_mesh(density_fn, None, scale=0.5,
                                resolution=(48, 48, 48),
                                sigma_threshold=10.0, chunk=4096,
                                out_path=out)
    r = np.linalg.norm(verts, axis=-1)
    assert abs(r.mean() - 0.3) < 0.05
    import os
    assert os.path.getsize(out) > 1000


def test_panorama_direction_roundtrip():
    # sample_panorama(u,v grid directions) must return the panorama itself
    H, W = 32, 64
    fwd = np.array([0, 0, 1.0])
    down = np.array([0, 1.0, 0])
    right = np.array([1.0, 0, 0])
    dirs = panorama_directions(H, W, fwd, down, right)
    # smooth panorama: bilinear resample error ~ 0 between pixel centers
    yy, xx = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W),
                         indexing="ij")
    pano = np.stack([xx, yy, xx * yy], -1).astype(np.float32)
    got = sample_panorama(dirs, pano, fwd, down, right)
    got_img = got.reshape(H, W, 3)
    err = np.abs(got_img[:, 2:-2] - pano[:, 2:-2])
    assert np.median(err) < 0.02


def test_ssim_psnr_sanity():
    rng = np.random.default_rng(0)
    a = rng.random((32, 32, 3)).astype(np.float32)
    assert float(psnr(a, a)) > 60
    assert abs(float(ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-5
    noisy = np.clip(a + 0.1 * rng.normal(size=a.shape), 0, 1
                    ).astype(np.float32)
    assert float(psnr(a, noisy)) < 25
    assert float(ssim(jnp.asarray(a), jnp.asarray(noisy))) < 0.99


def test_march_agrees_with_oracle_renderer():
    """The fast path (march+compact+composite) must agree with the dense
    oracle renderer on a trained-free random field (same model params)."""
    from ingp_tpu.models import (NGPConfig, ngp_init, RenderConfig,
                                 render_rays, render_rays_oracle)
    from ingp_tpu.grid import grid_init

    cfg = NGPConfig(scale=0.5, density_L=4, density_log2T=12, rgb_L=4,
                    rgb_log2T=12, classes=3, grid_size=32)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    # scale tables up so the field has structure
    params["density_table"] = params["density_table"] * 2e3

    bitfield = jnp.full((cfg.cascades * cfg.grid_size ** 3 // 32,),
                        0xFFFFFFFF, jnp.uint32)
    rng = np.random.default_rng(3)
    R = 64
    ro = np.stack([rng.uniform(-0.3, 0.3, R), rng.uniform(-0.3, 0.3, R),
                   np.full(R, -1.4)], -1).astype(np.float32)
    rd = np.stack([rng.uniform(-0.1, 0.1, R), rng.uniform(-0.1, 0.1, R),
                   np.ones(R)], -1).astype(np.float32)

    # a box-crossing ray at dt=sqrt(3)/1024 needs ~600 samples; give
    # headroom so nothing is truncated
    rcfg = RenderConfig(capacity=1024, march_iters=1100,
                        samples_per_ray=1024, T_threshold=1e-4)
    fast = render_rays(cfg, rcfg, params, bitfield, jnp.asarray(ro),
                       jnp.asarray(rd), jnp.zeros(R))
    oracle = render_rays_oracle(cfg, params, jnp.asarray(ro),
                                jnp.asarray(rd), jax.random.PRNGKey(0),
                                n_samples=1024, perturb=False)
    # different quadrature (marcher uses dt-lattice, oracle stratified)
    # -> close but not identical
    np.testing.assert_allclose(np.asarray(fast["opacity"]),
                               np.asarray(oracle["opacity"]), atol=0.05)
    np.testing.assert_allclose(np.asarray(fast["rgb"]),
                               np.asarray(oracle["rgb"]), atol=0.05)
    np.testing.assert_allclose(np.asarray(fast["depth"]),
                               np.asarray(oracle["depth"]), atol=0.05)
