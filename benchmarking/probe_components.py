"""Probe: where does the bench train step actually spend its time?

Times the encoders (value_and_grad, both tables) in isolation at the
bench op-point shapes with RAY-COHERENT sample positions (24 contiguous
lattice samples per ray, like the real marcher output), and reports the
per-level run statistics that bound the per-ray brick-dedup win: how
many *distinct* brick rows a ray's samples actually touch per level.

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarking/probe_components.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ingp_tpu.ops.brickgrid import (brickgrid_init, brickgrid_encode,
                                    brickgrid_encode_grad)

R, SPR = 8192, 24
N = R * SPR
CHUNK = 98304
DT = np.sqrt(3.0) / 1024.0


def timeit(fn, *args, iters=10):
    tot = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)) * 1e-9,
        fn(*a), 0.0))
    # burn-in: the first few executions through the axon tunnel are
    # inflated (lazy runtime warmup) — never time them
    acc = 0.0
    for _ in range(3):
        acc = acc + tot(*args)
    float(acc)
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc = acc + tot(*args)
    float(acc)
    return (time.perf_counter() - t0) / iters * 1e3


def ray_coherent_x(key):
    """(3, N) positions: R rays, SPR contiguous dt-lattice samples each,
    clustered near a surface shell like a converged occupancy march."""
    k1, k2, k3 = jax.random.split(key, 3)
    d = jax.random.normal(k1, (R, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    o = -d * 0.867 + jax.random.normal(k2, (R, 3)) * 0.02
    t0 = 0.5 + jax.random.uniform(k3, (R, 1)) * 0.3
    t = t0 + jnp.arange(SPR)[None, :] * DT                  # (R, SPR)
    x = o[:, None, :] + t[..., None] * d[:, None, :]        # (R, SPR, 3)
    return jnp.clip(x.reshape(N, 3).T * 0.5 + 0.5, 0.0, 1.0)


def run_stats(cfg, x_cm):
    """Mean/99p distinct bricks per (ray, level)."""
    x = np.asarray(x_cm).T.reshape(R, SPR, 3)
    print("level  res  bricks/ray mean   p99  (SPR=%d)" % SPR)
    for l, (sc, br, hashed) in enumerate(zip(cfg.scales, cfg.brick_res,
                                             cfg.hashed)):
        pos = x * sc + 0.5
        cell = np.clip(np.floor(pos), 0, cfg.resolutions[l] - 2)
        bc = (cell // cfg.brick_size).astype(np.int64)
        bid = (bc[..., 2] * br + bc[..., 1]) * br + bc[..., 0]  # (R, SPR)
        uniq = (np.diff(bid, axis=1) != 0).sum(1) + 1
        print(f"{l:4d} {cfg.resolutions[l]:5d}   {uniq.mean():6.2f}      "
              f"{np.percentile(uniq, 99):5.0f}   "
              f"{'hash' if hashed else 'dense'}")


def main():
    from ingp_tpu.models.ngp import NGPConfig
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}")

    cfg = NGPConfig(scale=0.5, encoder="brick", table_dtype="bfloat16",
                    compute_dtype="bfloat16", encode_chunk=CHUNK)
    dcfg, rcfg = cfg.density_brick_cfg, cfg.rgb_brick_cfg
    dt_tab = brickgrid_init(key, dcfg)
    rt_tab = brickgrid_init(key, rcfg)
    x = ray_coherent_x(key)
    print(f"density bricks {dcfg.total_bricks}  rgb bricks "
          f"{rcfg.total_bricks}")
    run_stats(dcfg, x)

    enc_d = lambda t, x: brickgrid_encode_grad(
        dcfg, t, x, chunk=CHUNK, storage_dtype=jnp.bfloat16, x_cm=True)
    enc_r = lambda t, x: brickgrid_encode(
        rcfg, t, x, chunk=CHUNK, storage_dtype=jnp.bfloat16, x_cm=True)

    vg_d = lambda t, x: jax.value_and_grad(
        lambda tt: sum(jnp.sum(o) for o in enc_d(tt, x)))(t)
    vg_r = lambda t, x: jax.value_and_grad(
        lambda tt: jnp.sum(enc_r(tt, x)))(t)

    t_df = timeit(enc_d, dt_tab, x)
    t_dvg = timeit(vg_d, dt_tab, x)
    t_rf = timeit(enc_r, rt_tab, x)
    t_rvg = timeit(vg_r, rt_tab, x)
    print(f"density encode_grad: fwd {t_df:7.1f}  val+grad {t_dvg:7.1f}")
    print(f"rgb     encode:      fwd {t_rf:7.1f}  val+grad {t_rvg:7.1f}")


if __name__ == "__main__":
    main()
