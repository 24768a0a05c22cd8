"""Encoder-level A/B of the round-4 levers at bench shapes (TPU).

Times streambrick_encode_grad (density: value+jac) and
streambrick_encode (rgb) — forward AND backward-through — on a
realistic SORTED stream (bimodal segment lengths: surface rays ~24
kept, sky rays ~2-4, descending), for several tile-class configs.
Isolates the per-tile-class cap saving and the factored-weight kernel
without paying a full train-step compile per config through the (slow)
remote-compile tunnel.

Usage (serialize with other TPU jobs!):
    python benchmarking/probe_headclass.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def bench(fn, *args, iters=6):
    out = fn(*args)
    float(np.asarray(out))                 # honest sync through tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / iters


def sorted_stream(n_samples=196608, frac_long=0.72, seg_long=24,
                  seed=0):
    """Ray-contiguous stream sorted by segment length descending:
    frac_long of the samples come from seg_long-sample segments, the
    rest from short (2-5) segments — the budget-truncated bimodal
    distribution of PERF_NOTES round-3."""
    rng = np.random.default_rng(seed)
    lens = []
    n_long = int(n_samples * frac_long) // seg_long
    lens += [seg_long] * n_long
    rest = n_samples - n_long * seg_long
    while rest > 0:
        l = int(rng.integers(2, 6))
        l = min(l, rest)
        lens.append(l)
        rest -= l
    xs = []
    dt = np.sqrt(3) / 1024
    for ln in lens:                        # already sorted descending
        o = rng.random(3) * 0.5 + 0.25
        d = rng.standard_normal(3)
        d /= np.linalg.norm(d)
        t = np.arange(ln)[:, None] * dt
        xs.append(np.clip(o + t * d, 0.0, 1.0))
    x = np.concatenate(xs).astype(np.float32)
    return x.T                             # (3, N)


def main():
    import jax
    import jax.numpy as jnp
    from ingp_tpu.models.ngp import NGPConfig
    from ingp_tpu.ops.brickgrid import brickgrid_init
    from ingp_tpu.ops.streambrick import (streambrick_encode,
                                          streambrick_encode_grad)

    print(f"backend={jax.default_backend()}", flush=True)
    cfg = NGPConfig(scale=0.5, encoder="brick", table_dtype="bfloat16",
                    compute_dtype="bfloat16")
    bcfg_d = cfg.density_brick_cfg
    bcfg_r = cfg.rgb_brick_cfg
    key = jax.random.PRNGKey(0)
    td = brickgrid_init(key, bcfg_d)
    tr = brickgrid_init(jax.random.fold_in(key, 1), bcfg_r)
    x = jnp.asarray(sorted_stream())
    N = x.shape[1]
    print(f"stream N={N}", flush=True)

    CHUNK = 196608
    # (label, seg_head, head_frac, seg_est, slack) — seg_est/slack
    # override the SINGLE-class cap formula to measure the throughput
    # headroom of the whole cap budget (VERDICT r4 item 7: what does a
    # measured-calibration cap regime buy before quality gating?)
    CONFIGS = [
        ("baseline (single class)", 0, 0.0, 4, 1.5),
        ("head 0.50 seg 20", 20, 0.50, 4, 1.5),
        ("head 0.75 seg 20", 20, 0.75, 4, 1.5),
        ("single seg 12", 0, 0.0, 12, 1.5),
        ("single seg 24", 0, 0.0, 24, 1.5),
        ("single seg 24 slack 1.2", 0, 0.0, 24, 1.2),
    ]
    wd = jax.random.normal(jax.random.fold_in(key, 2),
                           (N, bcfg_d.out_dim))
    wr = jax.random.normal(jax.random.fold_in(key, 3),
                           (N, bcfg_r.out_dim))

    for label, sh, hf, se, sl in CONFIGS:
        kw = dict(tile=256, chunk=CHUNK, storage_dtype="bfloat16",
                  seg_head=sh, head_frac=hf, seg_est=se, slack=sl)

        @jax.jit
        def fwd(td, tr, x):
            f, j = streambrick_encode_grad(bcfg_d, td, x, **kw)
            fr = streambrick_encode(bcfg_r, tr, x, **kw)
            return (jnp.sum(f) + jnp.sum(j.astype(jnp.float32))
                    + jnp.sum(fr))

        @jax.jit
        def fwdbwd(td, tr, x):
            def loss(td, tr):
                f, j = streambrick_encode_grad(bcfg_d, td, x, **kw)
                fr = streambrick_encode(bcfg_r, tr, x, **kw)
                return (jnp.sum(f * wd)
                        + jnp.sum(j.astype(jnp.float32) ** 2)
                        + jnp.sum(fr * wr))
            gd, gr = jax.grad(loss, argnums=(0, 1))(td, tr)
            return jnp.sum(gd[:8]) + jnp.sum(gr[:8])

        t_f = bench(fwd, td, tr, x)
        t_fb = bench(fwdbwd, td, tr, x)
        print(f"{label:28s} fwd {t_f*1e3:7.2f} ms   "
              f"fwd+bwd {t_fb*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
