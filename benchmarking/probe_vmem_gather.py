"""Probe: can a Pallas kernel gather rows from a VMEM-RESIDENT table
faster than the HBM gather engine? (VERDICT r4 item 2 viability.)

The dense coarse levels of the brick table (levels 0-3, ~17k rows x
256 lanes = 8.7 MB bf16) fit in the v5e's ~16 MB VMEM. If in-kernel
dynamic row reads (ref[pl.ds(idx,1), :]) sustain a few ns/row, a
VMEM-resident coarse-level encoder removes those rows from the
HBM-gather budget entirely (the algorithm-class break PERF_NOTES
fix-candidate 3 proposes). If Mosaic lowers them to slow scalar
loops, the design is refuted — record either number.

MEASURED VERDICT (v5e, 2026-08-21): REFUTED on this toolchain.
  - f32 VMEM loop gather: 26.6 ns/row — SLOWER than the XLA HBM
    gather engine (20.6 ns/row at these shapes). Mosaic lowers the
    per-row dynamic slice as a scalar loop; there is no vector-gather
    primitive, so VMEM residency buys nothing.
  - bf16 rows cannot be dynamically single-row sliced at all (min
    sublane tile 16): Mosaic crashes (opaque remote-compile HTTP 500).
  - Formulation notes: indices must ride a (g, 1, TILE) SMEM block —
    1-D and (1, TILE) 2-D SMEM specs both crash Mosaic.

Usage: python benchmarking/probe_vmem_gather.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

ROWS, W = 17408, 256           # dense coarse region, bf16 = 8.9 MB
N = 196608                     # gathered rows (a tile-class worth)
TILE = 256                     # rows gathered per grid step


def bench(fn, *args, iters=8):
    import jax.numpy as jnp
    out = fn(*args)
    float(np.asarray(jnp.sum(out[:2].astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jnp.sum(out[:2].astype(jnp.float32))))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    # f32 at a table size that fits VMEM alongside buffers: bf16 rows
    # cannot be dynamically row-sliced at all (see module docstring)
    rows = min(ROWS, 8192)
    table = jnp.asarray(
        rng.standard_normal((rows, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, rows, N).astype(np.int32))

    @jax.jit
    def xla_gather(t, i):
        return t.at[i].get(mode="promise_in_bounds")

    dt = bench(xla_gather, table, idx)
    print(f"XLA HBM gather      {dt*1e3:7.2f} ms  {dt*1e9/N:6.2f} ns/row",
          flush=True)

    # --- Pallas: table resident in VMEM, per-row dynamic reads -------
    # indices ride a (g, 1, TILE) SMEM block (the only legal SMEM
    # block shape found: 1-D and (1, TILE) 2-D specs both crash Mosaic
    # through the remote-compile tunnel); the table rides ONE unblocked
    # VMEM spec whose index_map is constant, so it stays resident
    # across grid steps with no re-DMA
    def loop_kernel2(idx_ref, tab_ref, out_ref):
        def body(r, _):
            out_ref[pl.ds(r, 1), :] = tab_ref[
                pl.ds(idx_ref[0, 0, r], 1), :]
            return 0
        jax.lax.fori_loop(0, TILE, body, 0)

    @jax.jit
    def vmem_loop(t, i2):
        return pl.pallas_call(
            loop_kernel2,
            grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((1, 1, TILE), lambda g: (g, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((rows, W), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, W), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
        )(i2, t)

    i2 = idx.reshape(N // TILE, 1, TILE)
    try:
        dt = bench(vmem_loop, table, i2)
        print(f"Pallas VMEM loop    {dt*1e3:7.2f} ms  "
              f"{dt*1e9/N:6.2f} ns/row", flush=True)
    except Exception as e:
        print(f"Pallas VMEM loop    FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
