"""Probe: can sorting + segment-sum beat XLA's scatter-add for the
table-gradient accumulation? (VERDICT r4 next-round item 1a.)

The backward's biggest op is `zeros.at[rows].add(ct)` — ~2.4M direct
fine-level rows + ~0.8M dedup urows per step at ~24-33 ns/row
(PERF_NOTES trace: 79.8 ms/step). Structure not yet exploited:

  * each hashed fine level has only 65536 target rows, so the direct
    stream carries >=3x duplication (196608 samples/level);
  * the direct rows of one table live in a CONTIGUOUS region
    [offset_Lc, total) of the table, so their gradient can be built as
    a DENSE block (segment_sum over local ids) and concatenated — no
    full-table scatter, no zeros init;
  * XLA's scatter/segment lowering has declared-sorted / declared-
    unique fast paths the round-3 locality probe never exercised (it
    varied the actual order, not the declaration).

Measures, at the bench op-point's real sizes (N=1.18M rows into a
393216-row fine region, 256-lane rows):
  baseline scatter-add (random, as shipped)  vs  sorted+declared
  scatter-add  vs  dense segment_sum (sorted/unsorted)  vs  pure
  scatter-SET of unique rows, plus the enabling costs (id sort,
  cotangent permute-gather) and realistic duplication factors from
  ray-coherent ids.

Usage: python benchmarking/probe_scatter_sorted.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def bench(fn, *args, iters=8):
    out = fn(*args)
    float(np.asarray(jax_sum(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax_sum(out)))
    return (time.perf_counter() - t0) / iters


def jax_sum(out):
    import jax.numpy as jnp
    if isinstance(out, (tuple, list)):
        out = out[0]
    if out.ndim == 0:
        return out
    return jnp.sum(out[:4].astype(jnp.float32))


def realistic_ids(n_rays=8192, spr=24):
    """Ray-coherent fine-level row ids from the real coordinate
    pipeline: random rays through [0,1]^3, spr samples at the march dt,
    brick_coords rows for the direct levels (10..15 at the bench
    op-point)."""
    import jax.numpy as jnp
    from ingp_tpu.ops.brickgrid import BrickGridConfig, brick_coords
    cfg = BrickGridConfig()
    rng = np.random.default_rng(1)
    o = rng.uniform(0.1, 0.9, (n_rays, 3)).astype(np.float32)
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dt = np.sqrt(3.0) / 1024
    t = (np.arange(spr, dtype=np.float32) * dt)[None, :, None]
    x = np.clip(o[:, None] + d[:, None] * t, 0.0, 0.999)
    xT = jnp.asarray(x.reshape(-1, 3).T)
    rows, _, _ = brick_coords(cfg, xT)
    return cfg, np.asarray(rows)          # (L, N) absolute row ids


def main():
    import jax
    import jax.numpy as jnp

    ROWS, W = 715_199, 256
    LC = 10                     # first direct level at the bench point
    cfg, rows_all = realistic_ids()
    off = cfg.offsets[LC]
    region = cfg.total_bricks - off            # 6 x 65536
    ids_real = (rows_all[LC:].reshape(-1) - off).astype(np.int32)
    N = ids_real.size
    uniq = np.unique(ids_real).size
    per_level = [np.unique(rows_all[l]).size for l in range(LC, 16)]
    print(f"N={N} region={region} unique={uniq} "
          f"(dup x{N/uniq:.2f}); per-level unique {per_level}",
          flush=True)

    rng = np.random.default_rng(0)
    ct = jnp.asarray(
        rng.standard_normal((N, W)).astype(np.float32)).astype(
            jnp.bfloat16)
    ids = jnp.asarray(ids_real)
    order = np.argsort(ids_real, kind="stable")
    ids_s = jnp.asarray(ids_real[order])
    perm = jnp.asarray(order.astype(np.int32))
    ct_s = np.asarray(ct)[order]
    ct_s = jnp.asarray(ct_s)

    # unique-row pre-sum (host, for the set/unique-scatter variants)
    u_ids, u_start = np.unique(ids_real[order], return_index=True)
    seg = np.zeros(N, np.int32)
    seg[u_start] = 1
    seg = np.cumsum(seg) - 1
    U = u_ids.size
    ct_u = jnp.asarray(np.zeros((U, W), np.float32))
    u_ids_j = jnp.asarray(u_ids.astype(np.int32))

    def line(name, dt, rows_n=N):
        print(f"{name:44s} {dt*1e3:8.2f} ms  {dt*1e9/rows_n:7.2f} ns/row",
              flush=True)

    # -- A: scatter-add paths into a dense (region, W) f32 block --
    zb = (region, W)

    @jax.jit
    def a1(i, v):          # shipped path (zeros + random-order RMW)
        return jnp.zeros(zb, jnp.float32).at[i].add(
            v.astype(jnp.float32), mode="promise_in_bounds")

    @jax.jit
    def a3(i, v):          # sorted + declared
        return jnp.zeros(zb, jnp.float32).at[i].add(
            v.astype(jnp.float32), mode="promise_in_bounds",
            indices_are_sorted=True)

    @jax.jit
    def a5(i, v):          # dense segment-sum, declared sorted
        return jax.ops.segment_sum(v.astype(jnp.float32), i,
                                   num_segments=region,
                                   indices_are_sorted=True)

    @jax.jit
    def a6(i, v):          # dense segment-sum, unsorted ids
        return jax.ops.segment_sum(v.astype(jnp.float32), i,
                                   num_segments=region)

    @jax.jit
    def a7(i, v):          # pure scatter-SET of unique pre-summed rows
        return jnp.zeros(zb, jnp.float32).at[i].set(
            v, mode="promise_in_bounds", indices_are_sorted=True,
            unique_indices=True)

    @jax.jit
    def a7b(i, v):         # scatter-ADD of unique rows, declared unique
        return jnp.zeros(zb, jnp.float32).at[i].add(
            v, mode="promise_in_bounds", indices_are_sorted=True,
            unique_indices=True)

    line("A1 scatter-add random (shipped)", bench(a1, ids, ct))
    line("A2 scatter-add sorted undeclared", bench(a1, ids_s, ct_s))
    line("A3 scatter-add sorted declared", bench(a3, ids_s, ct_s))
    line("A5 segment_sum sorted declared", bench(a5, ids_s, ct_s))
    line("A6 segment_sum unsorted", bench(a6, ids, ct))
    line("A7 set unique+sorted rows", bench(a7, u_ids_j, ct_u), U)
    line("A7b add unique+sorted rows", bench(a7b, u_ids_j, ct_u), U)

    # -- B: enabling costs --
    iota = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def b1(i, io):          # id sort (key + permutation payload)
        return jax.lax.sort((i, io), num_keys=1)

    @jax.jit
    def b2(p, v):           # cotangent permute-gather (bf16 rows)
        return v.at[p].get(mode="promise_in_bounds")

    @jax.jit
    def b3(i, io, v):       # sort + permute + dense segsum (fused E2E)
        i_s, p = jax.lax.sort((i, io), num_keys=1)
        vs = v.at[p].get(mode="promise_in_bounds")
        return jax.ops.segment_sum(vs.astype(jnp.float32), i_s,
                                   num_segments=region,
                                   indices_are_sorted=True)

    line("B1 lax.sort ids+perm", bench(b1, ids, iota))
    line("B2 permute-gather ct bf16", bench(b2, perm, ct))
    line("B3 E2E sort+permute+segsum", bench(b3, ids, iota, ct))

    # -- C: f32 ct variants (density path keeps f32 cotangents) --
    ctf = ct.astype(jnp.float32)
    line("C1 scatter-add random f32ct", bench(a1, ids, ctf))
    line("C3 E2E sorted segsum f32ct",
         bench(b3, ids, iota, ctf))


if __name__ == "__main__":
    main()
