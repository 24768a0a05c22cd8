"""End-to-end render equality: Pallas-composite path vs XLA path."""
import numpy as np
import jax
import jax.numpy as jnp

from ingp_tpu.models import NGPConfig, ngp_init, RenderConfig
from ingp_tpu.models.rendering import render_rays


def test_render_rays_pallas_composite_matches_xla():
    cfg = NGPConfig(scale=0.5, density_L=4, density_log2T=12, rgb_L=4,
                    rgb_log2T=12, classes=3, grid_size=32)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    params["density_table"] = params["density_table"] * 2e3
    bf = jnp.full((cfg.cascades * cfg.grid_size ** 3 // 32,),
                  0xFFFFFFFF, jnp.uint32)
    rng = np.random.default_rng(0)
    R = 64
    ro = np.stack([rng.uniform(-0.2, 0.2, R), rng.uniform(-0.2, 0.2, R),
                   np.full(R, -1.5)], -1).astype(np.float32)
    rd = np.stack([rng.uniform(-0.1, 0.1, R), rng.uniform(-0.1, 0.1, R),
                   np.ones(R)], -1).astype(np.float32)
    noise = jnp.zeros(R)

    base = RenderConfig(capacity=128, march_iters=512, samples_per_ray=48)
    pal = RenderConfig(capacity=128, march_iters=512, samples_per_ray=48,
                       pallas_composite=True)

    a = render_rays(cfg, base, params, bf, jnp.asarray(ro),
                    jnp.asarray(rd), noise)
    b = render_rays(cfg, pal, params, bf, jnp.asarray(ro),
                    jnp.asarray(rd), noise)
    for k in ("rgb", "opacity", "depth", "normal_pred", "semantic",
              "distortion"):
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-4, atol=1e-5)

    # gradients agree too (kernel backward vs AD)
    def loss(p, rcfg):
        res = render_rays(cfg, rcfg, p, bf, jnp.asarray(ro),
                          jnp.asarray(rd), noise)
        return (jnp.mean(res["rgb"] ** 2) + jnp.mean(res["opacity"])
                + 1e-3 * jnp.mean(res["distortion"]))

    ga = jax.grad(lambda p: loss(p, base))(params)
    gb = jax.grad(lambda p: loss(p, pal))(params)
    np.testing.assert_allclose(np.asarray(ga["density_table"]),
                               np.asarray(gb["density_table"]),
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga["rgb_table"]),
                               np.asarray(gb["rgb_table"]),
                               rtol=5e-3, atol=1e-6)
