"""Microbenchmarks of the brick-encoder internals on real hardware.

Splits encode cost into gather / weighting / select-dot / scatter-add
backward, and probes the structural alternatives:
  - chunked lax.map dense-dtable accumulation vs single scatter
  - sorted + unique-flag scatter vs plain scatter-add
  - one-hot MXU matmul gather for small dense levels
  - bf16 vs f32 materialization of the gathered block

Usage: python benchmarking/profile_encoder.py
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
        _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def _sync(out):
    leaves = jax.tree.leaves(out)
    x = leaves[-1]
    if jnp.issubdtype(x.dtype, jnp.floating):
        float(jnp.sum(x[..., :1].astype(jnp.float32)))
    else:
        jax.block_until_ready(out)


def main():
    from ingp_tpu.models.ngp import NGPConfig
    from ingp_tpu.ops.brickgrid import (brickgrid_encode, _select_matrix,
                                        _lane_coords)

    cfg = NGPConfig(scale=0.5, encoder="fused", table_dtype="bfloat16",
                    compute_dtype="bfloat16")
    bcfg = cfg.fused_brick_cfg
    K = 196608
    L = bcfg.n_levels
    rows_total = bcfg.total_bricks
    W = bcfg.row_width
    print(f"fused cfg: L={L} F={bcfg.n_features} rows={rows_total} "
          f"W={W} ({rows_total*W*2/1e6:.0f} MB bf16)", flush=True)

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (rows_total, W), jnp.bfloat16) * 0.01
    x = jax.random.uniform(jax.random.PRNGKey(1), (K, 3))

    # full encode baselines at different chunkings
    for chunk in (16384, 49152, 196608):
        fn = jax.jit(lambda tb: brickgrid_encode(bcfg, tb, x, chunk=chunk))
        try:
            t = timeit(fn, table)
            print(f"encode fwd chunk={chunk:6d}    : {t*1e3:8.2f} ms",
                  flush=True)
            g = jax.jit(jax.grad(lambda tb: jnp.sum(brickgrid_encode(
                bcfg, tb, x, chunk=chunk).astype(jnp.float32))))
            t = timeit(g, table)
            print(f"encode fwd+bwd chunk={chunk:6d}: {t*1e3:8.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"chunk={chunk}: {type(e).__name__} {str(e)[:120]}",
                  flush=True)

    # ---- raw pieces at the full (K*L,) index set --------------------
    idx = jax.random.randint(jax.random.PRNGKey(2), (K * L,), 0,
                             rows_total)

    gfn = jax.jit(lambda tb, i: jnp.take(tb, i, axis=0))
    t = timeit(gfn, table, idx)
    print(f"raw gather {K*L/1e6:.1f}M x {W} bf16 : {t*1e3:8.2f} ms "
          f"({K*L/t/1e6:.0f}M idx/s)", flush=True)

    # gather f32 table for comparison
    table32 = table.astype(jnp.float32)
    t = timeit(gfn, table32, idx)
    print(f"raw gather f32 rows          : {t*1e3:8.2f} ms", flush=True)

    # weighting + select dot alone (block resident)
    g_blk = gfn(table, idx)
    S = jnp.asarray(_select_matrix(bcfg), jnp.bfloat16)
    li, lj, lk = _lane_coords(bcfg)
    frac = jax.random.uniform(jax.random.PRNGKey(3), (K * L, 1))
    loc = jnp.zeros((K * L, 1), jnp.int32)

    def wdot(gb, fr):
        lane = li[None, :]
        w = (jnp.where(lane == loc, 1.0 - fr, 0.0)
             + jnp.where(lane == loc + 1, fr, 0.0))
        w = w * jnp.where(lj[None, :] >= 0, 1.0, 0.0)
        return jnp.dot((gb.astype(jnp.float32) * w).astype(jnp.bfloat16),
                       S, preferred_element_type=jnp.float32)

    t = timeit(jax.jit(wdot), g_blk, frac)
    print(f"weight+dot on resident block : {t*1e3:8.2f} ms", flush=True)

    # ---- scatter-add backward variants -------------------------------
    ct = jax.random.normal(jax.random.PRNGKey(4), (K * L, W),
                           jnp.float32) * 0.01

    def plain_scatter(i, c):
        z = jnp.zeros((rows_total, W), jnp.float32)
        return z.at[i].add(c)
    t = timeit(jax.jit(plain_scatter), idx, ct)
    print(f"plain scatter-add            : {t*1e3:8.2f} ms", flush=True)

    def sorted_scatter(i, c):
        order = jnp.argsort(i)
        i_s = i[order]
        c_s = jnp.take(c, order, axis=0)
        # segment boundaries: first occurrence of each run
        first = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                 i_s[1:] != i_s[:-1]])
        seg = jnp.cumsum(first) - 1
        # segment-sum within runs, then scatter unique rows
        summed = jax.ops.segment_sum(c_s, seg, num_segments=K * L)
        uniq = jnp.where(first, i_s, rows_total)  # pad rows -> OOB drop
        z = jnp.zeros((rows_total, W), jnp.float32)
        return z.at[uniq].add(summed, mode="drop", unique_indices=True,
                              indices_are_sorted=True)
    t = timeit(jax.jit(sorted_scatter), idx, ct)
    print(f"sorted+unique scatter        : {t*1e3:8.2f} ms", flush=True)

    def sorted_scatter_nosum(i, c):
        order = jnp.argsort(i)
        i_s = i[order]
        c_s = jnp.take(c, order, axis=0)
        z = jnp.zeros((rows_total, W), jnp.float32)
        return z.at[i_s].add(c_s, indices_are_sorted=True)
    t = timeit(jax.jit(sorted_scatter_nosum), idx, ct)
    print(f"sorted scatter (dup rows)    : {t*1e3:8.2f} ms", flush=True)

    # argsort cost alone
    t = timeit(jax.jit(lambda i: jnp.argsort(i)), idx)
    print(f"argsort 3.1M                 : {t*1e3:8.2f} ms", flush=True)

    # ---- one-hot MXU for a small dense level -------------------------
    for nrows in (512, 1728, 4096):
        tbl = jax.random.normal(jax.random.PRNGKey(5), (nrows, W),
                                jnp.bfloat16)
        ii = jax.random.randint(jax.random.PRNGKey(6), (K,), 0, nrows)

        def onehot_gather(tb, i):
            oh = jax.nn.one_hot(i, nrows, dtype=jnp.bfloat16)
            return jnp.dot(oh, tb, preferred_element_type=jnp.float32)
        t = timeit(jax.jit(onehot_gather), tbl, ii)
        tg = timeit(gfn, tbl, ii)
        print(f"one-hot {nrows:5d} rows x {K/1e3:.0f}k : {t*1e3:8.2f} ms "
              f"(gather: {tg*1e3:.2f} ms)", flush=True)

    # one-hot scatter-add transpose (backward of small level)
    nrows = 4096
    ii = jax.random.randint(jax.random.PRNGKey(6), (K,), 0, nrows)
    ctK = jax.random.normal(jax.random.PRNGKey(7), (K, W), jnp.bfloat16)

    def onehot_scatter(i, c):
        oh = jax.nn.one_hot(i, nrows, dtype=jnp.bfloat16)
        return jnp.dot(oh.T, c, preferred_element_type=jnp.float32)
    t = timeit(jax.jit(onehot_scatter), ii, ctK)

    def plain_scatter_small(i, c):
        z = jnp.zeros((nrows, W), jnp.float32)
        return z.at[i].add(c.astype(jnp.float32))
    tp = timeit(jax.jit(plain_scatter_small), ii, ctK)
    print(f"one-hot scatter 4096 rows    : {t*1e3:8.2f} ms "
          f"(plain: {tp*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
