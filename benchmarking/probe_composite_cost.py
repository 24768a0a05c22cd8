"""Isolate the stream compositor's device cost at bench shapes (TPU).

The round-4 bench landed at ~29.9k rays/s — identical to the round-3
default — despite removing the (R, S) scatter_back round trips. Prime
suspect: the exact associative segmented scan costs what the round
trips saved. This probe times, fwd and fwd+bwd:

  1. composite_stream (the shipping segmented-scan compositor)
  2. the grid path it replaced: scatter_back + composite_rays +
     ref_loss + distortion_loss
  3. raw jax.lax.associative_scan of a (16, K) stack (scan floor)
  4. raw jnp.cumsum of the same stack (XLA's native scan floor)

Usage (serialize with other TPU jobs!):
    python benchmarking/probe_composite_cost.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def bench(fn, *args, iters=8):
    out = fn(*args)
    float(np.asarray(out))                 # honest sync through tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import jax.random as jr
    from ingp_tpu.ops.composite import (composite_stream, composite_rays,
                                        distortion_loss, ref_loss)
    from ingp_tpu.ops.pack import (compact_samples, gather_samples,
                                   scatter_back, scatter_back_cm)

    print(f"backend={jax.default_backend()}", flush=True)
    R, S = 8192, 48
    spr = 24
    K = R * spr
    key = jr.PRNGKey(0)

    # realistic validity: ~19 kept per ray
    kv, ks, kr = jr.split(key, 3)
    counts = jr.randint(kv, (R,), 12, 25)
    valid = (jnp.arange(S)[None, :] < counts[:, None])
    plan = compact_samples(valid, K)
    sig_k = jr.uniform(ks, (K,)) * 40
    sig_k = jnp.where(plan.slot_valid, sig_k, 0.0)
    rgb_cm = jr.uniform(kr, (3, K))
    t_k = jr.uniform(jr.fold_in(key, 3), (K,))
    dt_k = jnp.full((K,), 0.005)
    npred = jr.uniform(jr.fold_in(key, 4), (3, K))
    nraw = jr.uniform(jr.fold_in(key, 5), (3, K))
    sems = jr.uniform(jr.fold_in(key, 6), (7, K))
    ori = jr.uniform(jr.fold_in(key, 7), (K,))
    cnt = jnp.sum(plan.cell_valid, -1)

    def stream(sig, rgb):
        o = composite_stream(sig, rgb, t_k, dt_k, counts=cnt,
                             slot_valid=plan.slot_valid,
                             T_threshold=1e-4, normals_pred=npred,
                             normals_raw=nraw, sems=sems,
                             normals_diff=(nraw - npred) ** 2,
                             normals_ori=ori)
        return (jnp.sum(o["rgb"]) + jnp.sum(o["opacity"])
                + jnp.sum(o["depth"]) + jnp.sum(o["distortion"])
                + jnp.sum(o["Rp"]) + jnp.sum(o["normal_pred"]))

    ts_g = scatter_back(t_k, plan)
    dt_g = scatter_back(dt_k, plan)

    def grid(sig, rgb):
        sg = scatter_back(sig, plan)
        rg = scatter_back_cm(rgb, plan)
        ng = scatter_back_cm(npred, plan)
        nr = scatter_back_cm(nraw, plan)
        sm = scatter_back_cm(sems, plan)
        og = scatter_back(ori, plan)
        o = composite_rays(sg, rg, dt_g, ts_g, plan.cell_valid, 1e-4,
                           normals_pred=ng, normals_raw=nr, sems=sm)
        Ro, Rp = ref_loss(jax.lax.stop_gradient(sg), (nr - ng) ** 2,
                          og, dt_g, plan.cell_valid, 1e-4)
        di = distortion_loss(o["ws"], dt_g, ts_g, plan.cell_valid)
        return (jnp.sum(o["rgb"]) + jnp.sum(o["opacity"])
                + jnp.sum(o["depth"]) + jnp.sum(di) + jnp.sum(Rp)
                + jnp.sum(o["normal_pred"]))

    stack = jr.uniform(jr.fold_in(key, 8), (16, K))
    smask = jnp.zeros((K,), bool).at[::24].set(True)

    def raw_assoc(st):
        f = jnp.broadcast_to(smask[None], st.shape)

        def comb(a, b):
            af, av = a
            bf, bv = b
            return af | bf, jnp.where(bf, bv, av + bv)
        _, out = jax.lax.associative_scan(comb, (f, st), axis=-1)
        return jnp.sum(out)

    def raw_cumsum(st):
        return jnp.sum(jnp.cumsum(st, -1))

    for name, fn, args in [
            ("stream fwd", jax.jit(stream), (sig_k, rgb_cm)),
            ("stream fwd+bwd", jax.jit(jax.grad(
                lambda s, r: stream(s, r), argnums=(0, 1))),
             (sig_k, rgb_cm)),
            ("grid fwd", jax.jit(grid), (sig_k, rgb_cm)),
            ("grid fwd+bwd", jax.jit(jax.grad(
                lambda s, r: grid(s, r), argnums=(0, 1))),
             (sig_k, rgb_cm)),
            ("assoc_scan(16,K) fwd", jax.jit(raw_assoc), (stack,)),
            ("cumsum(16,K) fwd", jax.jit(raw_cumsum), (stack,)),
    ]:
        if "bwd" in name:
            out = fn(*args)
            float(np.asarray(out[0][0]))
            t0 = time.perf_counter()
            for _ in range(8):
                out = fn(*args)
            float(np.asarray(out[0][0]))
            d = (time.perf_counter() - t0) / 8
        else:
            d = bench(fn, *args)
        print(f"{name:24s} {d*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
