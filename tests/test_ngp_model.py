"""NGP model-level tests: density gradients, op-point shapes, HDR path."""
import numpy as np
import jax
import jax.numpy as jnp

from ingp_tpu.models import (NGPConfig, ngp_init, ngp_sigma, ngp_grad,
                             ngp_forward, ngp_forward_skybox,
                             log_radiance_to_rgb)


def small_cfg(**kw):
    d = dict(scale=0.5, density_L=4, density_log2T=12, rgb_L=4,
             rgb_log2T=12, classes=3, grid_size=32)
    d.update(kw)
    return NGPConfig(**d)


def test_ngp_grad_matches_ad():
    cfg = small_cfg()
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    params["density_table"] = params["density_table"] * 1e3
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3),
                           minval=-0.45, maxval=0.45)
    sig, feat, grads = ngp_grad(cfg, params, x)
    # AD reference: full reverse-mode through the encode+MLP
    sig_ad, vjp = jax.vjp(lambda xx: ngp_sigma(cfg, params, xx), x)
    grads_ad = vjp(jnp.ones_like(sig_ad))[0]
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ad),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(grads_ad),
                               rtol=1e-3, atol=1e-3)


def test_ngp_grad_second_order():
    # the loss backward differentiates through the analytic gradient
    cfg = small_cfg()
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3),
                           minval=-0.4, maxval=0.4)

    def loss(p):
        _, _, grads = ngp_grad(cfg, p, x)
        return jnp.sum(grads ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g["density_table"])).all()
    assert float(jnp.abs(g["density_table"]).sum()) > 0


def test_flagship_op_point_dims():
    cfg = NGPConfig(scale=0.5, embed_a=True, embed_a_len=12)
    # networks.py:36/63: L=16 F=8, T=2^19 / 2^21, SH deg 4
    assert cfg.density_grid_cfg.out_dim == 128
    assert cfg.rgb_grid_cfg.out_dim == 128
    assert cfg.rgb_in_dim == 16 + 128 + 12
    assert cfg.cascades == 1
    # per-level scale b = exp(ln(2048*scale/16)/15) (networks.py:37)
    assert abs(cfg.density_grid_cfg.per_level_scale
               - np.exp(np.log(2048 * 0.5 / 16) / 15)) < 1e-9


def test_hdr_tonemapper_path():
    cfg = small_cfg(rgb_act="none")
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    assert "tonemapper_r" in params
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 3),
                           minval=-0.4, maxval=0.4)
    d = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
    exp_t = jnp.full((4, 1), 2.0)
    _, rgb_ldr, _, _, _ = ngp_forward(cfg, params, x, d, exposure=exp_t)
    assert np.all((np.asarray(rgb_ldr) >= 0) & (np.asarray(rgb_ldr) <= 1))
    _, rgb_hdr, _, _, _ = ngp_forward(cfg, params, x, d,
                                      output_radiance=True)
    assert np.all(np.asarray(rgb_hdr) > 0)  # exp of log-radiance
    out = log_radiance_to_rgb(cfg, params, jnp.zeros((2, 3)),
                              exposure=jnp.ones((2, 1)))
    assert out.shape == (2, 3)


def test_skybox():
    cfg = small_cfg(use_skybox=True)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    d = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    rgb = ngp_forward_skybox(cfg, params, d)
    assert rgb.shape == (16, 3)
    assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))


def test_fused_encoder_grad_matches_ad():
    # fused table: one gather serves density feats + jacobian + rgb feats
    cfg = small_cfg(encoder="fused")
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    assert "grid_table" in params and "density_table" not in params
    params["grid_table"] = params["grid_table"] * 1e3
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3),
                           minval=-0.45, maxval=0.45)
    sig, feat, grads = ngp_grad(cfg, params, x)
    assert feat.shape == (32, cfg.rgb_L * cfg.rgb_F)
    sig_ad, vjp = jax.vjp(lambda xx: ngp_sigma(cfg, params, xx), x)
    grads_ad = vjp(jnp.ones_like(sig_ad))[0]
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ad),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(grads_ad),
                               rtol=1e-3, atol=1e-3)


def test_fused_encoder_rgb_feat_consistent():
    # the rgb features from the fused ngp_grad pass must equal the
    # standalone rgb encode of the same table
    from ingp_tpu.models.ngp import ngp_rgb_feat
    cfg = small_cfg(encoder="fused")
    params = ngp_init(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (16, 3),
                           minval=-0.4, maxval=0.4)
    _, feat_fused, _ = ngp_grad(cfg, params, x)
    feat_direct = ngp_rgb_feat(cfg, params, x)
    np.testing.assert_allclose(np.asarray(feat_fused),
                               np.asarray(feat_direct), rtol=1e-6,
                               atol=1e-6)


def test_fused_encoder_second_order():
    cfg = small_cfg(encoder="fused")
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3),
                           minval=-0.4, maxval=0.4)

    def loss(p):
        _, feat, grads = ngp_grad(cfg, p, x)
        return jnp.sum(grads ** 2) + jnp.sum(feat ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g["grid_table"])).all()
    assert float(jnp.abs(g["grid_table"]).sum()) > 0


def test_fused_full_forward():
    cfg = small_cfg(encoder="fused")
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3),
                           minval=-0.4, maxval=0.4)
    d = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    sig, rgb, nraw, npred, sem = ngp_forward(cfg, params, x, d)
    assert sig.shape == (16,) and rgb.shape == (16, 3)
    assert sem.shape == (16, cfg.classes)
    for a in (sig, rgb, nraw, npred, sem):
        assert np.isfinite(np.asarray(a)).all()
