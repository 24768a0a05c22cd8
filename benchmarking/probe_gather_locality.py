"""Microbench: does index LOCALITY change TPU gather / scatter-add row
rates? Decides whether a locality-preserving fine-level hash (nearby
bricks -> nearby table rows) can beat the uniform-random hash's
19 ns/row (PERF_NOTES round-3 trace).

Patterns: uniform random | fully sorted | clustered (run-of-16 bases
with +-8 offsets) | strided pages. Row widths 128 and 256 lanes, bf16.

Usage: python benchmarking/probe_gather_locality.py
"""
from __future__ import annotations

import time

import numpy as np


def bench(fn, *args, iters=8):
    # fn must return a SCALAR (device-side reduce): copying a gathered
    # block to host through the axon tunnel would swamp the timing
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

    ROWS, W, N = 715_199, 256, 1_179_648
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.standard_normal((ROWS, W), np.float32), jnp.bfloat16)
    table128 = table[:, :128]
    ftable = table.astype(jnp.float32)

    idx_rand = rng.integers(0, ROWS, N).astype(np.int32)
    idx_sort = np.sort(idx_rand)
    base = rng.integers(8, ROWS - 8, N // 16).astype(np.int32)
    idx_clus = (np.repeat(base, 16)
                + rng.integers(-8, 8, N).astype(np.int32))
    patterns = [("random", idx_rand), ("sorted", idx_sort),
                ("clustered16", idx_clus)]

    @jax.jit
    def take(t, i):
        g = t.at[i].get(mode="promise_in_bounds")
        return jnp.sum(g.astype(jnp.float32))

    @jax.jit
    def scat(t, i, v):
        out = t.at[i].add(v, mode="promise_in_bounds")
        return jnp.sum(out[:8])

    ct = jnp.asarray(rng.standard_normal((N, W), np.float32))
    ct128 = ct[:, :128]

    for name, idx in patterns:
        i = jnp.asarray(idx)
        dt = bench(take, table, i)
        dt128 = bench(take, table128, i)
        ds = bench(scat, jnp.zeros((ROWS, W), jnp.float32), i, ct)
        print(f"{name:12s} gather256 {dt*1e9/N:6.2f} ns/row   "
              f"gather128 {dt128*1e9/N:6.2f}   "
              f"scatter256f32 {ds*1e9/N:6.2f}", flush=True)
    # f32 vs bf16 source rows (random)
    i = jnp.asarray(idx_rand)
    print(f"{'random f32':12s} gather256 "
          f"{bench(take, ftable, i)*1e9/N:6.2f} ns/row", flush=True)
    # scatter of bf16 cotangents into f32 rows
    ds = bench(scat, jnp.zeros((ROWS, W), jnp.float32), i,
               ct.astype(jnp.bfloat16))
    print(f"{'random bf16ct':12s} scatter256 {ds*1e9/N:6.2f} ns/row",
          flush=True)


if __name__ == "__main__":
    main()
