"""Probe gather/scatter layouts and Mosaic in-kernel gather support.

Hypothesis (measured 2026-08-18): XLA row-gather from a 2D (rows, W)
table drags the full (16, 128)-bf16 tile column for each fetched row —
16x waste. A 3D (rows, 16, 128) layout makes one gathered row exactly
one tile, so traffic drops to the tile floor.

Usage: python benchmarking/probe_gather_layouts.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
        _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def _sync(out):
    x = jax.tree.leaves(out)[-1]
    np.asarray(jax.device_get(x.ravel()[:1]))


def main():
    N = 3_145_728          # 3.1M fetches (K=196608 x L=16)
    ROWS = 180_000

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, ROWS)

    # --- 2D layouts ---------------------------------------------------
    # wide-row probes use fewer indices so the output fits in HBM;
    # report ns/idx for comparability
    for W, dt, n_i in ((512, jnp.bfloat16, N), (2048, jnp.bfloat16, N // 4),
                       (512, jnp.float32, N // 2)):
        tb = jnp.zeros((ROWS, W), dt)
        ii = idx[:n_i]
        t = timeit(jax.jit(lambda tb, i: jnp.take(tb, i, axis=0)), tb, ii)
        gb = n_i * W * tb.dtype.itemsize / 1e9
        print(f"2D ({ROWS},{W}) {dt.__name__:8s}: {t*1e3:8.2f} ms "
              f"({gb/t:6.1f} GB/s useful, {t/n_i*1e9:5.1f} ns/idx)",
              flush=True)
        del tb

    # --- 3D tile layouts ----------------------------------------------
    for sub, lane, dt, n_i in (
            (16, 128, jnp.bfloat16, N // 4),
            (8, 128, jnp.float32, N // 4),
            (32, 128, jnp.bfloat16, N // 8),
            (16, 256, jnp.bfloat16, N // 8),
            (8, 128, jnp.bfloat16, N // 4)):
        tb = jnp.zeros((ROWS, sub, lane), dt)
        ii = idx[:n_i]
        t = timeit(jax.jit(lambda tb, i: jnp.take(tb, i, axis=0)), tb, ii)
        gb = n_i * sub * lane * tb.dtype.itemsize / 1e9
        print(f"3D ({ROWS},{sub},{lane}) {dt.__name__:8s}: {t*1e3:8.2f} ms "
              f"({gb/t:6.1f} GB/s useful, {t/n_i*1e9:5.1f} ns/idx)",
              flush=True)
        del tb

    # --- 3D tile scatter-add ----------------------------------------
    NS = N // 8  # keep memory sane
    idx4 = idx[:NS]
    ct = jnp.ones((NS, 16, 128), jnp.float32)

    def scat(i, c):
        z = jnp.zeros((ROWS, 16, 128), jnp.float32)
        return z.at[i].add(c)
    t = timeit(jax.jit(scat), idx4, ct)
    print(f"3D tile scatter-add {N//4/1e6:.2f}M x (16,128) f32: "
          f"{t*1e3:8.2f} ms", flush=True)

    ct2 = jnp.ones((NS, 512), jnp.float32)

    def scat2(i, c):
        z = jnp.zeros((ROWS, 512), jnp.float32)
        return z.at[i].add(c)
    t = timeit(jax.jit(scat2), idx4, ct2)
    print(f"2D scatter-add {N//4/1e6:.2f}M x 512 f32      : "
          f"{t*1e3:8.2f} ms", flush=True)

    # sorted variant
    def scat_sorted(i, c):
        order = jnp.argsort(i)
        i_s = i[order]
        c_s = jnp.take(c, order, axis=0)
        z = jnp.zeros((ROWS, 16, 128), jnp.float32)
        return z.at[i_s].add(c_s, indices_are_sorted=True)
    t = timeit(jax.jit(scat_sorted), idx4, ct)
    print(f"3D tile scatter-add sorted              : {t*1e3:8.2f} ms",
          flush=True)

    # --- Mosaic in-kernel dynamic gather forms ----------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("--- Mosaic in-kernel gather forms ---", flush=True)

    # (a) take_along_axis axis=0: out[s,l] = table[idx[s,l], l]
    def k_sub(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)

    table = jnp.arange(512 * 128, dtype=jnp.int32).reshape(512, 128)
    idxs = jax.random.randint(jax.random.PRNGKey(1), (256, 128), 0, 512)
    try:
        fn = pl.pallas_call(
            k_sub,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        out = jax.jit(fn)(table, idxs)
        ref = np.take_along_axis(np.asarray(table), np.asarray(idxs), 0)
        ok = np.array_equal(np.asarray(out), ref)
        print(f"(a) sublane take_along axis=0 (512,128)->(256,128): "
              f"LOWERS ok={ok}", flush=True)
        # time a bigger one
        idxs_big = jax.random.randint(jax.random.PRNGKey(2), (8192, 128),
                                      0, 512)
        fnb = pl.pallas_call(
            k_sub,
            out_shape=jax.ShapeDtypeStruct((8192, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        t = timeit(jax.jit(fnb), table, idxs_big)
        print(f"    (8192,128) sublane-gather: {t*1e3:.3f} ms "
              f"({8192*128/t/1e9:.2f} G elem/s)", flush=True)
    except Exception as e:
        print(f"(a) sublane gather FAILS: {type(e).__name__} "
              f"{str(e)[:160]}", flush=True)

    # (b) take_along_axis axis=-1 (lane gather)
    def k_lane(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=1)

    tbl = jnp.arange(256 * 128, dtype=jnp.int32).reshape(256, 128)
    idl = jax.random.randint(jax.random.PRNGKey(3), (256, 128), 0, 128)
    try:
        fn = pl.pallas_call(
            k_lane,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        out = jax.jit(fn)(tbl, idl)
        ref = np.take_along_axis(np.asarray(tbl), np.asarray(idl), 1)
        ok = np.array_equal(np.asarray(out), ref)
        print(f"(b) lane take_along axis=1 (256,128): LOWERS ok={ok}",
              flush=True)
    except Exception as e:
        print(f"(b) lane gather FAILS: {type(e).__name__} "
              f"{str(e)[:160]}", flush=True)

    # (c) flat jnp.take from a small VMEM table
    def k_take(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:].reshape(-1), idx_ref[:])

    flat = jnp.arange(65536, dtype=jnp.int32).reshape(512, 128)
    idf = jax.random.randint(jax.random.PRNGKey(4), (256, 128), 0, 65536)
    try:
        fn = pl.pallas_call(
            k_take,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        out = jax.jit(fn)(flat, idf)
        ref = np.asarray(flat).reshape(-1)[np.asarray(idf)]
        ok = np.array_equal(np.asarray(out), ref)
        print(f"(c) flat take 65536-entry VMEM table: LOWERS ok={ok}",
              flush=True)
    except Exception as e:
        print(f"(c) flat take FAILS: {type(e).__name__} {str(e)[:160]}",
              flush=True)


if __name__ == "__main__":
    main()
