"""The NGP radiance-field model, functional TPU form.

Re-implements the reference `NGP` module (models/networks.py:13-420) as a
pure-function model over an explicit parameter pytree:

  params = {
    "density_table": (rows, F)   hash grid, networks.py:40-52
    "xyz_net":       MLP L*F -> 128 -> 1 (Softplus hidden), networks.py:54-58
    "rgb_table":     (rows, F)   hash grid, networks.py:67-76
    "rgb_net":       MLP (16+L*F[+embed_a]) -> 128 -> 3, networks.py:89-100
    "norm_net":      MLP L*F -> 32 -> 3, networks.py:102-111
    "sem_net":       MLP L*F -> 32 -> classes, networks.py:114-123
    ["skybox_net"]   MLP 9 -> 32 -> 3, networks.py:137-148
    ["tonemapper_r/g/b"] MLP 1 -> 64 -> 1 Sigmoid, networks.py:150-163
  }

Direction encoding is closed-form SH (degree 4; skybox degree 3); the
density gradient for raw normals is exact reverse-mode AD through the
hash encoder (grad-of-grad works, replacing the create_graph double
backward of networks.py:186-196).

All *_act strings are lowercase ("sigmoid" / "none"); the reference's
'Sigmoid'/'None' map 1:1.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.hashgrid import (
    HashGridConfig, hashgrid_init, hashgrid_encode, hashgrid_encode_grad,
    per_level_scale_for,
)
from ..ops.brickgrid import (
    BrickGridConfig, brickgrid_init, brickgrid_encode,
)
from ..ops.sh import sh_encode, sh_encode_cm
from ..ops.activations import trunc_exp
from ..core.cascade import n_cascades
from .mlp import mlp_init, mlp_apply, mlp_apply_cm


@dataclasses.dataclass(frozen=True)
class NGPConfig:
    """Static model hyperparameters (networks.py:14, 36, 63)."""
    scale: float = 0.5
    rgb_act: str = "sigmoid"       # "sigmoid" | "none" (HDR tonemapping)
    use_skybox: bool = False
    embed_a: bool = False
    embed_a_len: int = 12
    classes: int = 7
    grid_size: int = 128
    density_L: int = 16
    density_F: int = 8
    density_log2T: int = 19
    rgb_L: int = 16
    rgb_F: int = 8
    rgb_log2T: int = 21
    base_res: int = 16
    sh_degree: int = 4
    skybox_sh_degree: int = 3
    compute_dtype: str = "float32"  # MLP matmul dtype ("bfloat16" on TPU)
    # encoder backend: "hash" = tcnn-layout parity (8 corner gathers);
    # "brick" = TPU-native brick-packed rows, ~8x fewer gather indices
    # (ops/brickgrid.py); "fused" = brick layout with the density and rgb
    # features co-located in ONE table row, halving the gather/scatter
    # index count again — gather rate is index-limited, not byte-limited
    # (measured: 512-lane rows gather at 1.32x the cost of 256-lane, so
    # one fused fetch beats two split fetches 1.5x; PERF_NOTES.md)
    encoder: str = "hash"
    table_dtype: str = "float32"    # table *gather/storage* dtype
    # ("bfloat16" halves the gathered row bytes). Parameters themselves
    # always stay float32 masters — Adam moments and the backward
    # scatter-add accumulate at full precision (ops/gather.py); only the
    # per-step read copy is low-precision.
    encode_remat: bool = True       # recompute encode gathers in bwd
    #                                 (False trades HBM for a pass)
    encode_chunk: int = 16384       # encoder chunk size (larger = fewer
    #                                 loop iterations, more live HBM)
    # stream-dedup encoding (ops/streambrick.py): callers that encode a
    # RAY-CONTIGUOUS compacted sample stream (the render paths) opt in
    # per call with stream=True; this flag arms it for brick/fused
    # encoders. Coarse levels then fetch one table row per brick RUN of
    # the stream instead of one per sample.
    stream_dedup: bool = False
    stream_tile: int = 256          # samples per dedup tile
    stream_slack: float = 1.5       # run-cap headroom (stream_caps)
    # fraction of the tile size above which a level's cap makes it
    # DIRECT (per-sample gather). 0.0 = all levels direct: per-sample
    # exact (no dedup caps anywhere) while keeping the stream path's
    # single multi-gather/scatter-chain plumbing — the quality-safe
    # mode (see PERF_NOTES round-3: the dedup'd stream showed a ~6 dB
    # novel-view deficit at 600 steps that the exactness tests at high
    # slack cannot see)
    stream_direct_frac: float = 0.7
    stream_seg: int = 4             # shortest typical per-ray segment.
    #   seg 4 / slack 1.5 is the VALIDATED op-point (26.13 dB novel ==
    #   the 26.15 per-sample control): the binding cap term is the
    #   ray-boundary BREAKS budget — the budget-truncated stream is
    #   bimodal (sky rays keep ~0-5 samples, surface rays ~24), so
    #   short-segment-rich tiles see ~50+ run breaks; the old seg 12
    #   budget (~21+4) overflowed there and cost ~5 dB novel-view
    #   (PERF_NOTES round-3 quality gate)
    # per-tile-CLASS caps (round 4): when the caller marks the stream
    # SORTED by per-ray kept count (stream="sorted", set by the
    # renderer's stream_sort), the first stream_head_frac of each
    # chunk's tiles hold the longest segments and use the tight
    # stream_seg_head breaks budget; the tail keeps stream_seg.
    # head_frac 0 disables (single cap class).
    stream_seg_head: int = 20
    stream_head_frac: float = 0.0
    # measured per-level cap override (tuple of L ints) replacing the
    # formula caps entirely — set by the trainer's auto-calibration
    # from run_count_quantiles of real batches (ops/streambrick.py);
    # None = formula caps at (stream_slack, stream_seg)
    stream_caps: tuple | None = None

    @property
    def cascades(self) -> int:
        return n_cascades(self.scale)

    @property
    def density_grid_cfg(self) -> HashGridConfig:
        return HashGridConfig(
            n_levels=self.density_L, n_features=self.density_F,
            log2_hashmap_size=self.density_log2T,
            base_resolution=self.base_res,
            per_level_scale=per_level_scale_for(
                self.scale, self.density_L, self.base_res))

    @property
    def rgb_grid_cfg(self) -> HashGridConfig:
        return HashGridConfig(
            n_levels=self.rgb_L, n_features=self.rgb_F,
            log2_hashmap_size=self.rgb_log2T,
            base_resolution=self.base_res,
            per_level_scale=per_level_scale_for(
                self.scale, self.rgb_L, self.base_res))

    @property
    def density_brick_cfg(self) -> BrickGridConfig:
        # log2T - 5 keeps parameter count comparable to the hash layout
        # (27 lattice values per brick row vs 32 rows' worth of slots)
        return BrickGridConfig(
            n_levels=self.density_L, n_features=self.density_F,
            log2_bricks=max(self.density_log2T - 5, 8),
            base_resolution=self.base_res,
            per_level_scale=per_level_scale_for(
                self.scale, self.density_L, self.base_res))

    @property
    def rgb_brick_cfg(self) -> BrickGridConfig:
        return BrickGridConfig(
            n_levels=self.rgb_L, n_features=self.rgb_F,
            log2_bricks=max(self.rgb_log2T - 5, 8),
            base_resolution=self.base_res,
            per_level_scale=per_level_scale_for(
                self.scale, self.rgb_L, self.base_res))

    @property
    def fused_brick_cfg(self) -> BrickGridConfig:
        """One table holding [density_F | rgb_F] features per lattice
        point. Both reference grids share L and the per-level scale
        (networks.py:36-52 vs 63-76), so the row/index computation is
        identical — only the feature payload widens. Brick count follows
        the larger (rgb) table."""
        assert self.density_L == self.rgb_L, \
            "fused encoder requires density_L == rgb_L"
        return BrickGridConfig(
            n_levels=self.rgb_L,
            n_features=self.density_F + self.rgb_F,
            log2_bricks=max(self.rgb_log2T - 5, 8),
            base_resolution=self.base_res,
            per_level_scale=per_level_scale_for(
                self.scale, self.rgb_L, self.base_res))

    @property
    def rgb_in_dim(self) -> int:
        d = self.sh_degree ** 2 + self.rgb_L * self.rgb_F
        return d + (self.embed_a_len if self.embed_a else 0)

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


def ngp_init(key, cfg: NGPConfig):
    keys = jax.random.split(key, 10)
    # tables are f32 masters regardless of cfg.table_dtype (which only
    # sets the per-step gather storage dtype — see NGPConfig)
    if cfg.encoder == "fused":
        tables = {"grid_table": brickgrid_init(keys[0],
                                               cfg.fused_brick_cfg)}
    elif cfg.encoder == "brick":
        tables = {
            "density_table": brickgrid_init(keys[0],
                                            cfg.density_brick_cfg),
            "rgb_table": brickgrid_init(keys[2], cfg.rgb_brick_cfg)}
    else:
        tables = {
            "density_table": hashgrid_init(keys[0], cfg.density_grid_cfg),
            "rgb_table": hashgrid_init(keys[2], cfg.rgb_grid_cfg)}
    params = {
        **tables,
        "xyz_net": mlp_init(keys[1],
                            (cfg.density_grid_cfg.out_dim, 128, 1)),
        "rgb_net": mlp_init(keys[3], (cfg.rgb_in_dim, 128, 3)),
        "norm_net": mlp_init(keys[4], (cfg.rgb_grid_cfg.out_dim, 32, 3)),
        "sem_net": mlp_init(keys[5],
                            (cfg.rgb_grid_cfg.out_dim, 32, cfg.classes)),
    }
    if cfg.use_skybox:
        params["skybox_net"] = mlp_init(
            keys[6], (cfg.skybox_sh_degree ** 2, 32, 3))
    if cfg.rgb_act == "none":
        for i, ch in enumerate("rgb"):
            params[f"tonemapper_{ch}"] = mlp_init(keys[7 + i], (1, 64, 1))
    return params


def _normalize_coords(cfg: NGPConfig, x):
    """[-scale, scale]^3 -> [0, 1]^3 (networks.py:174)."""
    return (x + cfg.scale) / (2.0 * cfg.scale)


def _split_fused(cfg: NGPConfig, feats):
    """(N, L*(Fd+Fr)) level-major fused features -> (density, rgb)."""
    N = feats.shape[0]
    L, Fd, Fr = cfg.rgb_L, cfg.density_F, cfg.rgb_F
    f = feats.reshape(N, L, Fd + Fr)
    return (f[:, :, :Fd].reshape(N, L * Fd),
            f[:, :, Fd:].reshape(N, L * Fr))


def _storage_dt(cfg: NGPConfig):
    return None if cfg.table_dtype == "float32" else cfg.table_dtype


def _use_stream(cfg: NGPConfig, stream) -> bool:
    """stream: False | True (ray-contiguous compact stream) |
    "sorted" (additionally sorted by per-ray kept count — arms the
    per-tile-class caps)."""
    return (bool(stream) and cfg.stream_dedup
            and cfg.encoder in ("brick", "fused"))


def _head_class(cfg: NGPConfig, stream):
    """(seg_head, head_frac) — tile-class caps only for SORTED streams:
    on an unsorted stream the head tiles would hold arbitrary-length
    segments and the tight breaks budget would overflow."""
    if stream == "sorted":
        return cfg.stream_seg_head, cfg.stream_head_frac
    return 0, 0.0


def _brick_encode(cfg: NGPConfig, bcfg, table, u, x_cm, stream):
    """brickgrid/streambrick encode dispatch (same output layout)."""
    sd = _storage_dt(cfg)
    if _use_stream(cfg, stream):
        from ..ops.streambrick import streambrick_encode
        sh, hf = _head_class(cfg, stream)
        # measured caps come from the RGB table's level schedule
        # (rendering.run_stats); an encoder with a DIFFERENT level
        # count (density_L != rgb_L) falls back to the formula caps —
        # a per-level tuple of the wrong length would mis-split the
        # dedup/direct boundary or fail the reshape at trace time
        caps = cfg.stream_caps
        if caps is not None and len(caps) != bcfg.n_levels:
            caps = None
        return streambrick_encode(
            bcfg, table, u if x_cm else u.T, tile=cfg.stream_tile,
            chunk=cfg.encode_chunk, remat=cfg.encode_remat,
            storage_dtype=sd, slack=cfg.stream_slack,
            seg_est=cfg.stream_seg,
            direct_frac=cfg.stream_direct_frac,
            seg_head=sh, head_frac=hf,
            caps_override=caps)
    return brickgrid_encode(bcfg, table, u, remat=cfg.encode_remat,
                            chunk=cfg.encode_chunk, storage_dtype=sd,
                            x_cm=x_cm)


def _encode_density(cfg: NGPConfig, params, u, x_cm=False,
                    stream=False):
    if cfg.encoder == "fused":
        feats = _brick_encode(cfg, cfg.fused_brick_cfg,
                              params["grid_table"], u, x_cm, stream)
        return _split_fused(cfg, feats)[0]
    if cfg.encoder == "brick":
        return _brick_encode(cfg, cfg.density_brick_cfg,
                             params["density_table"], u, x_cm, stream)
    return hashgrid_encode(cfg.density_grid_cfg,
                           params["density_table"], u,
                           storage_dtype=_storage_dt(cfg), x_cm=x_cm)


def _encode_rgb(cfg: NGPConfig, params, u, x_cm=False, stream=False):
    if cfg.encoder == "fused":
        feats = _brick_encode(cfg, cfg.fused_brick_cfg,
                              params["grid_table"], u, x_cm, stream)
        return _split_fused(cfg, feats)[1]
    if cfg.encoder == "brick":
        return _brick_encode(cfg, cfg.rgb_brick_cfg, params["rgb_table"],
                             u, x_cm, stream)
    return hashgrid_encode(cfg.rgb_grid_cfg, params["rgb_table"], u,
                           storage_dtype=_storage_dt(cfg), x_cm=x_cm)


def ngp_sigma_cm(cfg: NGPConfig, params, x_cm, stream=False):
    """Density only, channel-major: x_cm (3, N) world coords -> (N,)
    sigma (networks.py:165-184). stream=True only for ray-contiguous
    compacted sample streams (stream-dedup encode)."""
    u = _normalize_coords(cfg, x_cm)
    h = _encode_density(cfg, params, u, x_cm=True, stream=stream)
    raw = mlp_apply_cm(params["xyz_net"], h, "softplus", "none",
                       cfg.dtype)[0]
    return jax.nn.softplus(raw)


def ngp_sigma(cfg: NGPConfig, params, x):
    """Density only: grid-enc -> 128 Softplus MLP -> Softplus sigma
    (networks.py:165-184). x: (N, 3) world coords. Returns (N,)."""
    return ngp_sigma_cm(cfg, params, x.T)


def ngp_rgb_feat(cfg: NGPConfig, params, x):
    """RGB grid features at world coords (networks.py:182)."""
    u = _normalize_coords(cfg, x)
    return _encode_rgb(cfg, params, u)


def ngp_density(cfg: NGPConfig, params, x, return_feat=False):
    sigmas = ngp_sigma(cfg, params, x)
    if return_feat:
        return sigmas, ngp_rgb_feat(cfg, params, x)
    return sigmas


def ngp_grad_cm(cfg: NGPConfig, params, x_cm, stream=False):
    """(sigmas (N,), feat_rgb (N, LF), d sigma/dx (3, N)) —
    networks.py:186-196, channel-major.

    The spatial gradient uses the analytic trilerp jacobian computed in
    the same gather pass as the features (ops/hashgrid.py
    hashgrid_encode_grad) chained with a vjp through the tiny density
    MLP — identical values to full AD (tested) at one fewer traversal
    of the encoder graph. Everything stays differentiable w.r.t. params
    (the reference's create_graph double backward)."""
    u = _normalize_coords(cfg, x_cm)
    sd = _storage_dt(cfg)
    feat_rgb = None

    def grad_encode(bcfg, table, jac_lo, jac_hi):
        if _use_stream(cfg, stream):
            from ..ops.streambrick import streambrick_encode_grad
            sh, hf = _head_class(cfg, stream)
            # same level-count guard as _brick_encode: measured caps
            # only apply to an encoder with rgb_L levels
            caps = cfg.stream_caps
            if caps is not None and len(caps) != bcfg.n_levels:
                caps = None
            return streambrick_encode_grad(
                bcfg, table, u, tile=cfg.stream_tile,
                chunk=cfg.encode_chunk, remat=cfg.encode_remat,
                jac_lo=jac_lo, jac_hi=jac_hi, storage_dtype=sd,
                slack=cfg.stream_slack, seg_est=cfg.stream_seg,
                direct_frac=cfg.stream_direct_frac,
                seg_head=sh, head_frac=hf,
                caps_override=caps)
        from ..ops.brickgrid import brickgrid_encode_grad
        return brickgrid_encode_grad(
            bcfg, table, u, remat=cfg.encode_remat,
            chunk=cfg.encode_chunk, jac_lo=jac_lo, jac_hi=jac_hi,
            storage_dtype=sd, x_cm=True)

    if cfg.encoder == "fused":
        # ONE gather pass produces density features + density jacobian
        # + rgb features (the whole reason the fused layout exists)
        fused, jac = grad_encode(cfg.fused_brick_cfg,
                                 params["grid_table"], 0, cfg.density_F)
        feats, feat_rgb = _split_fused(cfg, fused)
    elif cfg.encoder == "brick":
        feats, jac = grad_encode(cfg.density_brick_cfg,
                                 params["density_table"], 0, None)
    else:
        feats, jac = hashgrid_encode_grad(cfg.density_grid_cfg,
                                          params["density_table"], u,
                                          storage_dtype=sd, x_cm=True)
    raw, mlp_vjp = jax.vjp(
        lambda h: mlp_apply_cm(params["xyz_net"], h, "softplus", "none",
                               cfg.dtype)[0], feats)
    sigmas = jax.nn.softplus(raw)
    dfeat = mlp_vjp(jax.nn.sigmoid(raw))[0]       # d softplus = sigmoid
    # du/dx = 1/(2*scale) from _normalize_coords
    grads = jnp.einsum("dnf,nf->dn", jac, dfeat) / (2.0 * cfg.scale)
    if feat_rgb is None:
        feat_rgb = _encode_rgb(cfg, params, u, x_cm=True, stream=stream)
    return sigmas, feat_rgb, grads


def ngp_grad(cfg: NGPConfig, params, x):
    """Sample-major wrapper: x (N, 3) -> grads (N, 3)."""
    sigmas, feat_rgb, grads = ngp_grad_cm(cfg, params, x.T)
    return sigmas, feat_rgb, grads.T


def _safe_normalize(v, eps=1e-6, axis=-1):
    """Smooth normalize v/sqrt(|v|^2 + eps^2): same values as the
    reference's F.normalize(eps=1e-6) away from zero, but with a bounded
    backward everywhere — the max(|v|, eps) form amplifies cotangents by
    1/eps near |v|=0 (empty space has near-zero density gradients),
    which overflows bf16 training through the Ref-NeRF loss."""
    v32 = v.astype(jnp.float32)
    n2 = jnp.sum(v32 * v32, axis=axis, keepdims=True)
    return v32 * jax.lax.rsqrt(n2 + eps * eps)


def log_radiance_to_rgb(cfg: NGPConfig, params, log_radiances,
                        exposure=None):
    """HDR-NeRF tonemapping: per-channel 64-unit MLPs on
    log-radiance + log-exposure (networks_noCUDA.py:238-259)."""
    log_exp = jnp.log(exposure) if exposure is not None else 0.0
    outs = []
    for i, ch in enumerate("rgb"):
        inp = log_radiances[:, i:i + 1] + log_exp
        outs.append(mlp_apply(params[f"tonemapper_{ch}"], inp,
                              "relu", "sigmoid", cfg.dtype))
    return jnp.concatenate(outs, axis=1)


def _rgb_net_cm(cfg: NGPConfig, params, dsh_cm, feat, embedding_a,
                out_act):
    """rgb_net with a block-split first layer: the SH block contracts a
    channel-major (16, N) input, the feature block contracts the
    sample-major (N, LF) encoder output, and the optional appearance
    block the (N, a) embedding — no lane-padded concat (a (N, 16) dsh
    pads 8x) and no activation transposes. Output (3, N)."""
    layers = params["rgb_net"]
    cd = cfg.dtype
    d2 = cfg.sh_degree ** 2
    lf = cfg.rgb_L * cfg.rgb_F
    w1 = layers[0]["w"]
    h = jnp.einsum("fh,fn->hn", w1[:d2].astype(cd), dsh_cm.astype(cd),
                   preferred_element_type=jnp.float32)
    h += jnp.einsum("fh,nf->hn", w1[d2:d2 + lf].astype(cd),
                    feat.astype(cd), preferred_element_type=jnp.float32)
    if cfg.embed_a:
        h += jnp.einsum("fh,nf->hn", w1[d2 + lf:].astype(cd),
                        embedding_a.astype(cd),
                        preferred_element_type=jnp.float32)
    h = jax.nn.relu(h + layers[0]["b"].astype(jnp.float32)[:, None])
    out = mlp_apply_cm(layers[1:], h.astype(cd), "relu", out_act,
                       cd, x_cm=True)
    return out


def ngp_forward_cm(cfg: NGPConfig, params, x_cm, d_cm, embedding_a=None,
                   exposure=None, output_radiance=False,
                   stop_header_grads=False, stream=False):
    """Full per-sample forward (networks.py:198-282), channel-major.

    Args:
      x_cm, d_cm: (3, N) positions / (unnormalized) view directions.
      embedding_a: (N, embed_a_len) per-sample appearance codes.
      stop_header_grads: True reproduces forward_test (networks.py:256-261)
        where the normal/semantic headers run under no_grad.

    Returns (sigmas (N,), rgbs (3, N), normals_raw (3, N),
    normals_pred (3, N), semantic (classes, N)) — channel axis leading
    so every array is lane-dense on TPU (a trailing 3 pads 42x).
    """
    sigmas, feat_rgb, grads = ngp_grad_cm(cfg, params, x_cm,
                                          stream=stream)
    return _forward_heads(cfg, params, sigmas, feat_rgb, grads, d_cm,
                          embedding_a, exposure, output_radiance,
                          stop_header_grads)


def _forward_heads(cfg: NGPConfig, params, sigmas, feat_rgb, grads,
                   d_cm, embedding_a, exposure, output_radiance,
                   stop_header_grads):
    """Shared per-sample head stack (normals/semantic/rgb) on top of the
    density+encode front half."""
    normals_raw = -_safe_normalize(grads, axis=0)

    feat_h = jax.lax.stop_gradient(feat_rgb) if stop_header_grads \
        else feat_rgb
    normals_pred = -_safe_normalize(
        mlp_apply_cm(params["norm_net"], feat_h, "relu", "none",
                     cfg.dtype), axis=0)
    semantic = jax.nn.softmax(
        mlp_apply_cm(params["sem_net"], feat_h, "relu", "none",
                     cfg.dtype), axis=0)

    dn = _safe_normalize(d_cm, axis=0)
    dsh_cm = sh_encode_cm(dn, cfg.sh_degree)

    out_act = "sigmoid" if cfg.rgb_act == "sigmoid" else "none"
    rgbs = _rgb_net_cm(cfg, params, dsh_cm, feat_rgb, embedding_a,
                       out_act)

    if cfg.rgb_act == "none":
        if output_radiance:
            rgbs = trunc_exp(rgbs)
        else:
            rgbs = log_radiance_to_rgb(cfg, params, rgbs.T, exposure).T

    return sigmas, rgbs, normals_raw, normals_pred, semantic


def ngp_forward(cfg: NGPConfig, params, x, d, embedding_a=None,
                exposure=None, output_radiance=False,
                stop_header_grads=False):
    """Sample-major wrapper (x, d (N, 3) -> per-sample (N, C) outputs);
    the hot render path uses ngp_forward_cm directly."""
    sigmas, rgbs, nraw, npred, sem = ngp_forward_cm(
        cfg, params, x.T, d.T, embedding_a=embedding_a,
        exposure=exposure, output_radiance=output_radiance,
        stop_header_grads=stop_header_grads)
    return sigmas, rgbs.T, nraw.T, npred.T, sem.T


def ngp_forward_skybox(cfg: NGPConfig, params, d):
    """Skybox background color from view direction (networks.py:284-291)."""
    dn = _safe_normalize(d)
    dsh = sh_encode(dn, cfg.skybox_sh_degree)
    out_act = "sigmoid" if cfg.rgb_act == "sigmoid" else "none"
    return mlp_apply(params["skybox_net"], dsh, "relu", out_act, cfg.dtype)
