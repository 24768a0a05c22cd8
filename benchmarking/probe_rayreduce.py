"""Probe: fused rayreduce kernel vs XLA expand+reduce, isolated.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarking/probe_rayreduce.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from ingp_tpu.models.ngp import NGPConfig
from ingp_tpu.ops.brickgrid import (brickgrid_init, brick_coords,
                                    reduce_feats_jac, reduce_feats)
from ingp_tpu.ops.raybrick import _unique_plan, _expand_unique
from ingp_tpu.ops.pallas.rayreduce_pallas import fused_ray_reduce
from benchmarking.probe_components import timeit, ray_coherent_x

R, SPR = 4096, 24         # one chunk


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}")
    cfg = NGPConfig(scale=0.5, encoder="brick", table_dtype="bfloat16")
    dcfg = cfg.density_brick_cfg
    L, F = dcfg.n_levels, dcfg.n_features
    K = L * SPR
    # per-level unique-run capacities at the historical rectangle-path
    # op-point (run_caps formula at its DEFAULT slack 1.0, preserved
    # inline after its deletion: U_l = min(spr, ceil(2.5 + 3 +
    # 0.7 * scale_l*spr*dt/B)) — keep the 0.7 coefficient so kernel
    # timings stay comparable to the historical PERF_NOTES numbers)
    dt = np.sqrt(3.0) / 1024
    caps = tuple(int(min(SPR, np.ceil(
        5.5 + 0.7 * sc * SPR * dt / dcfg.brick_size)))
        for sc in dcfg.scales)
    U = int(np.sum(caps))
    table = brickgrid_init(key, dcfg)

    x = ray_coherent_x(key)[:, :R * SPR]
    valid = jnp.ones((R, SPR), bool)
    rows, local, frac = brick_coords(dcfg, x)
    uid, urows = _unique_plan(dcfg, rows.reshape(L, R, SPR), valid, caps)
    g_u = jnp.take(table.astype(jnp.bfloat16), urows.reshape(-1), axis=0
                   ).astype(jnp.float32).reshape(R, U, -1)

    def to_rk(a):
        return jnp.transpose(a.reshape(3, L, R, SPR), (0, 2, 1, 3)
                             ).reshape(3, R, K)
    sc = jnp.repeat(jnp.asarray(dcfg.scales, jnp.float32), SPR)
    lf = jnp.concatenate([to_rk(local.astype(jnp.float32)), to_rk(frac),
                          jnp.broadcast_to(sc, (1, R, K)),
                          jnp.zeros((1, R, K), jnp.float32)], 0)

    # XLA path: expand + reduce_feats_jac
    def xla_fj(g_u):
        g = _expand_unique(g_u, uid, U, jnp.bfloat16)
        W = g.shape[-1]
        g = jnp.transpose(g.reshape(R, L, SPR, W), (1, 0, 2, 3)
                          ).reshape(L * R * SPR, W)
        return reduce_feats_jac(dcfg, g, local, frac, R * SPR)

    def pl_fj(g_u):
        return fused_ray_reduce(g_u, uid, lf, F, True)

    print(f"U={U} K={K}")
    print(f"fwd feats+jac: xla {timeit(xla_fj, g_u):7.1f}  "
          f"pallas {timeit(pl_fj, g_u):7.1f} [ms/chunk]")

    wf = jax.random.normal(key, (R * SPR, L * F)) * 1e-3
    wj = jax.random.normal(key, (3, R * SPR, L * F)) * 1e-3

    def loss_x(g_u):
        f, j = xla_fj(g_u)
        return jnp.sum(f * wf) + jnp.sum(j * wj)

    def loss_p(g_u):
        fc, jc = pl_fj(g_u)
        f = jnp.transpose(fc.reshape(F, R, L, SPR), (1, 3, 2, 0)
                          ).reshape(R * SPR, L * F)
        j = jnp.transpose(jc.reshape(3, F, R, L, SPR), (0, 2, 4, 3, 1)
                          ).reshape(3, R * SPR, L * F)
        return jnp.sum(f * wf) + jnp.sum(j * wj)

    gx = jax.jit(jax.grad(loss_x))
    gp = jax.jit(jax.grad(loss_p))
    print(f"grad(g_u):     xla {timeit(gx, g_u):7.1f}  "
          f"pallas {timeit(gp, g_u):7.1f} [ms/chunk]")

    # feats-only (rgb table shape)
    def xla_f(g_u):
        g = _expand_unique(g_u, uid, U, jnp.bfloat16)
        W = g.shape[-1]
        g = jnp.transpose(g.reshape(R, L, SPR, W), (1, 0, 2, 3)
                          ).reshape(L * R * SPR, W)
        return reduce_feats(dcfg, g, local, frac, R * SPR)

    def pl_f(g_u):
        return fused_ray_reduce(g_u, uid, lf, F, False)[0]

    print(f"fwd feats:     xla {timeit(xla_f, g_u):7.1f}  "
          f"pallas {timeit(pl_f, g_u):7.1f} [ms/chunk]")


if __name__ == "__main__":
    main()
