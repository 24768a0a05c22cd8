"""Probe: one-hot-matmul vs gather/scatter for coarse brick levels.

TPU gathers are index-rate bound (~130M rows/s, PERF_NOTES.md). For a
level with D bricks, `one_hot(rows, D) @ table` runs on the MXU at
n*D*W*2 FLOPs instead; for small D the matmul wins and — crucially —
the BACKWARD becomes `one_hot^T @ ct` (another matmul) instead of the
scatter-add RMW that dominates the step trace.

Run on TPU: python benchmarking/probe_onehot.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

W = 256           # brick row width (lanes)
N = 196608        # samples per level at the bench op-point (8192*24)


def timeit(fn, *args, iters=20):
    # block_until_ready is unreliable through the axon tunnel (see
    # bench.py) — force completion with a host copy of a dependent
    # scalar instead. The summed wrapper adds one small reduce.
    total = jax.jit(lambda *a: jnp.sum(fn(*a)) * 1e-9)
    float(total(*args))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc = acc + total(*args)
    float(acc)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}")

    for D in (512, 1331, 3375, 9261, 21952):
        table = jax.random.normal(key, (D, W), jnp.float32)
        tbf = table.astype(jnp.bfloat16)
        rows = jax.random.randint(key, (N,), 0, D, jnp.int32)
        rows_sorted = jnp.sort(rows)
        ct = jax.random.normal(key, (N, W), jnp.float32)

        gather = jax.jit(lambda t, r: jnp.take(t, r, axis=0))
        t_gather = timeit(gather, tbf, rows)

        @jax.jit
        def onehot_mm(t, r):
            oh = jax.nn.one_hot(r, D, dtype=jnp.bfloat16)
            return jnp.dot(oh, t, preferred_element_type=jnp.float32)

        t_oh = timeit(onehot_mm, tbf, rows)

        scatter = jax.jit(lambda r, c: jnp.zeros((D, W), jnp.float32)
                          .at[r].add(c))
        t_sc = timeit(scatter, rows, ct)
        t_sc_sorted = timeit(scatter, rows_sorted, ct)

        scatter_s = jax.jit(
            lambda r, c: jnp.zeros((D, W), jnp.float32)
            .at[r].add(c, indices_are_sorted=True))
        t_sc_flag = timeit(scatter_s, rows_sorted, ct)

        @jax.jit
        def onehot_bwd(r, c):
            oh = jax.nn.one_hot(r, D, dtype=jnp.bfloat16)
            return jnp.dot(oh.T, c.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        t_ohb = timeit(onehot_bwd, rows, ct)

        print(f"D={D:6d}: gather {t_gather:7.2f}  onehot_fwd {t_oh:7.2f}"
              f"  scatter {t_sc:7.2f} (sorted {t_sc_sorted:6.2f},"
              f" flag {t_sc_flag:6.2f})  onehot_bwd {t_ohb:7.2f}  [ms]")

    # reduce-shape probe: four (g*w)@S dots vs single-pass point reduce
    n = N
    g = jax.random.normal(key, (n, W), jnp.float32)
    ws = jax.random.normal(key, (4, n, W), jnp.float32)
    S = jnp.zeros((W, 8), jnp.float32).at[np.arange(216),
                                          np.arange(216) % 8].set(1.0)

    @jax.jit
    def four_dots(g, ws):
        return jnp.stack([jnp.dot(g * ws[i], S,
                                  preferred_element_type=jnp.float32)
                          for i in range(4)])

    @jax.jit
    def point_reduce(g, ws):
        gp = g.reshape(n, 32, 8)
        wp = ws[:, :, ::8].reshape(4, n, 32)   # per-point weights
        return jnp.einsum("np f,inp->inf", gp, wp,
                          preferred_element_type=jnp.float32)

    t4 = timeit(four_dots, g, ws)
    tp = timeit(point_reduce, g, ws)
    print(f"reduce n={n}: four_dots {t4:.2f}  point_reduce {tp:.2f} [ms]")


if __name__ == "__main__":
    main()
