"""Probe: fused_ray_reduce at grouped-uniform-cap shapes vs the current
single-call stream shapes.

Current stream call per chunk (98304 samples, tile 256):
  R=384 tiles, K=13*256=3328 cells, U=1024 (padded sum of caps)
Grouped calls: (tile, level) batch rows, K=256, uniform U per group.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarking/probe_grouped.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ingp_tpu.ops.pallas.rayreduce_pallas import fused_ray_reduce


def timeit(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    leaves = jax.tree.leaves(out)
    float(jnp.sum(leaves[0][..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaves = jax.tree.leaves(out)
    float(jnp.sum(leaves[0][..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


def mk(key, R, U, K, F=8, W=256):
    ks = jax.random.split(key, 3)
    g_u = jax.random.normal(ks[0], (R, U, W), jnp.bfloat16)
    uid = jax.random.randint(ks[1], (R, K), 0, U, jnp.int32)
    uid = jnp.sort(uid, axis=1)  # monotone like real runs
    lf = jnp.concatenate([
        jax.random.uniform(ks[2], (3, R, K)) * 2,   # local
        jax.random.uniform(ks[2], (3, R, K)),       # frac
        jnp.full((1, R, K), 64.0), jnp.zeros((1, R, K))], 0)
    return g_u, uid, lf


def run(name, R, U, K, with_jac, n=8):
    g_u, uid, lf = mk(jax.random.PRNGKey(0), R, U, K)
    fwd = jax.jit(lambda g: fused_ray_reduce(g, uid, lf, 8, with_jac,
                                             0, 8 if with_jac else None))
    tf = timeit(fwd, g_u, n=n)

    wf = jax.random.normal(jax.random.PRNGKey(1), (8, R, K)) * 1e-3
    wj = jax.random.normal(jax.random.PRNGKey(2), (24, R, K)) * 1e-3

    def loss(g):
        f, j = fused_ray_reduce(g, uid, lf, 8, with_jac,
                                0, 8 if with_jac else None)
        s = jnp.sum(f * wf)
        if with_jac:
            s += jnp.sum(j * wj)
        return s
    bwd = jax.jit(jax.grad(loss))
    tb = timeit(bwd, g_u, n=n)
    print(f"{name:42s} fwd {tf:7.2f}  fwd+bwd {tb:7.2f} [ms]", flush=True)


def main():
    print(f"device: {jax.devices()[0]}")
    # current stream shape, one chunk (jac = density pass)
    run("stream now: R=384 K=3328 U=1024 jac", 384, 1024, 3328, True, n=4)
    run("stream now: R=384 K=3328 U=1024", 384, 1024, 3328, False, n=4)
    # grouped: 8 coarse levels cap 64, 4 mid cap 160->168? use 160
    run("grp A: R=3072 (8 lvl) K=256 U=64 jac", 3072, 64, 256, True)
    run("grp B: R=1536 (4 lvl) K=256 U=160 jac", 1536, 160, 256, True)
    run("grp C: R=384 (1 lvl) K=256 U=224 jac", 384, 224, 256, True)
    run("grp A no-jac", 3072, 64, 256, False)
    run("grp B no-jac", 1536, 160, 256, False)
    run("grp C no-jac", 384, 224, 256, False)
    # single grouped call covering all 13 levels at uniform cap 128
    run("uni: R=4992 (13 lvl) K=256 U=128 jac", 4992, 128, 256, True)
    run("uni no-jac", 4992, 128, 256, False)


if __name__ == "__main__":
    main()
