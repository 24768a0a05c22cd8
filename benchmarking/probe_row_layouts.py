"""Microbench: per-row gather/scatter cost vs table ROW LAYOUT.

Hypothesis (round 4): the measured 15.4 ns/row gather of 256-lane rows
is sublane-TILE inflation, not a hard per-row toll. TPU arrays are
(8,128)-tiled (f32) / (16,128)-tiled (bf16); a (1, 256) row occupies
one sublane of two lane-tiles, so a random row fetch drags
2 tiles x 4 KB = 8 KB for 512 B useful (bf16) — ~16x. If rows that
span WHOLE tiles — (n, 8, 128) f32 or (n, 16, 128) bf16, 4 KB each —
gather near HBM bandwidth, the brick row layout should be redesigned
around tile-shaped rows (bigger bricks carrying more corners per
fetch), which would lift the ~75-80k rays/s algorithm-class ceiling
(PERF_NOTES.md speed-of-light section).

Measures XLA axis-0 gather and scatter-add at several row widths and
ranks, at constant USEFUL gathered bytes, and reports ns/row + useful
GB/s. Also probes a Pallas per-row-DMA gather kernel (8 in-flight
copies) to see whether manual DMA beats XLA's gather lowering.

Usage (serialize with other TPU jobs!):
    python benchmarking/probe_row_layouts.py
"""
from __future__ import annotations

import time

import numpy as np


def bench(fn, *args, iters=8):
    out = fn(*args)
    float(np.asarray(out))                 # honest sync through tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / iters


def xla_probe():
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    # all test data generated ON DEVICE: uploading GBs through the axon
    # tunnel costs minutes (memory: tpu-tunnel-operations)
    key = jr.PRNGKey(0)
    USEFUL = 512 << 20        # 512 MB useful gathered bytes per config

    @jax.jit
    def take(t, i):
        g = t.at[i].get(mode="promise_in_bounds")
        return jnp.sum(g.astype(jnp.float32))

    @jax.jit
    def scat(t, i, v):
        out = t.at[i].add(v, mode="promise_in_bounds")
        return jnp.sum(out[:1].astype(jnp.float32))

    # (label, inner_shape, dtype)
    CONFIGS = [
        ("256 f32  [base]", (256,), np.float32),
        ("256 bf16 [base]", (256,), "bf16"),
        ("1024 f32 flat", (1024,), np.float32),
        ("(8,128) f32 tile", (8, 128), np.float32),
        ("2048 bf16 flat", (2048,), "bf16"),
        ("(16,128) bf16 tile", (16, 128), "bf16"),
        ("(16,128) f32 2tile", (16, 128), np.float32),
        ("(32,128) bf16 2tile", (32, 128), "bf16"),
        ("512 bf16 flat", (512,), "bf16"),
        ("(16,256) bf16 2tile", (16, 256), "bf16"),
    ]
    import jax.numpy as jnp
    for label, inner, dt in CONFIGS:
        vals = int(np.prod(inner))
        bytes_per = vals * (2 if dt == "bf16" else 4)
        # table ~768 MB regardless of row size; N rows for USEFUL bytes
        rows = max((768 << 20) // bytes_per, 1024)
        n = max(USEFUL // bytes_per, 1024)
        jdt = jnp.bfloat16 if dt == "bf16" else jnp.float32
        kt, ki, kv = jr.split(jr.fold_in(key, hash(label) % 10000), 3)
        t = jax.jit(lambda k: jr.normal(k, (rows,) + inner,
                                        jnp.float32).astype(jdt))(kt)
        i = jax.jit(lambda k: jr.randint(k, (n,), 0, rows,
                                         jnp.int32))(ki)
        d_g = bench(take, t, i)
        line = (f"{label:22s} rows {rows:8d} n {n:8d}  "
                f"gather {d_g*1e9/n:7.2f} ns/row "
                f"{n*bytes_per/d_g/1e9:6.1f} GB/s")
        # scatter-add: f32 accumulator (master layout), same inner shape
        tz = jnp.zeros((rows,) + inner, jnp.float32)
        v = jax.jit(lambda k: jr.normal(k, (n,) + inner,
                                        jnp.float32).astype(jdt))(kv)
        d_s = bench(scat, tz, i, v)
        fbytes = vals * 4
        line += (f"   scat+f32 {d_s*1e9/n:7.2f} ns/row "
                 f"{n*fbytes/d_s/1e9:6.1f} GB/s(use)")
        print(line, flush=True)
        del t, tz, v, i


def pallas_probe():
    import jax
    import jax.numpy as jnp
    import jax.random as jr
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    key = jr.PRNGKey(1)

    def run(inner, dt_name, n, rows, blk=512, nsem=8):
        jdt = jnp.bfloat16 if dt_name == "bf16" else jnp.float32
        kt, ki = jr.split(jr.fold_in(key, n + rows))
        table = jax.jit(lambda k: jr.normal(k, (rows,) + inner,
                                            jnp.float32).astype(jdt))(kt)
        idx = jax.jit(lambda k: jr.randint(k, (n,), 0, rows,
                                           jnp.int32))(ki)

        def kernel(idx_ref, table_ref, out_ref, sem):
            base = pl.program_id(0) * blk

            def mk(j):
                r = idx_ref[base + j]
                return pltpu.make_async_copy(
                    table_ref.at[r], out_ref.at[j], sem.at[j % nsem])

            for j in range(nsem):
                mk(j).start()

            def body(j, carry):
                mk(j).wait()

                @pl.when(j + nsem < blk)
                def _():
                    mk(j + nsem).start()
                return carry
            jax.lax.fori_loop(0, blk, body, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // blk,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((blk,) + inner,
                                   lambda i, *_: (i,) + (0,) * len(inner),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,))],
        )
        gathered = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n,) + inner, jdt),
            grid_spec=grid_spec,
        )

        @jax.jit
        def go(i, t):
            return jnp.sum(gathered(i, t).astype(jnp.float32))

        d = bench(go, idx, table)
        bytes_per = int(np.prod(inner)) * (2 if dt_name == "bf16" else 4)
        print(f"pallas-dma {str(inner):10s} {dt_name:4s} n {n:8d}  "
              f"gather {d*1e9/n:7.2f} ns/row "
              f"{n*bytes_per/d/1e9:6.1f} GB/s", flush=True)

    for inner, dt_name, n, rows in [
        ((256,), "bf16", 1 << 20, 715_199),
        ((16, 128), "bf16", 1 << 18, 178_800),
        ((8, 128), np.float32, 1 << 18, 178_800),
    ]:
        try:
            run(inner, dt_name if isinstance(dt_name, str) else "f32",
                n, rows)
        except Exception as e:  # keep the XLA numbers if Mosaic balks
            print(f"pallas-dma {inner} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


def main():
    import jax
    print(f"backend={jax.default_backend()}", flush=True)
    xla_probe()
    pallas_probe()


if __name__ == "__main__":
    main()
