"""Probe: raybrick encoder component costs at the bench op-point.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarking/probe_raybrick.py
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ingp_tpu.models.ngp import NGPConfig
from ingp_tpu.ops.brickgrid import (brickgrid_init, brickgrid_encode,
                                    brickgrid_encode_grad, brick_coords)
from ingp_tpu.ops.raybrick import (raybrick_encode, raybrick_encode_grad,
                                   run_caps, _unique_plan,
                                   _expand_unique)
from benchmarking.probe_components import timeit, ray_coherent_x, R, SPR

CHUNK_RAYS = 4096


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}")
    cfg = NGPConfig(scale=0.5, encoder="brick", table_dtype="bfloat16",
                    encode_chunk=98304)
    dcfg, rcfg = cfg.density_brick_cfg, cfg.rgb_brick_cfg
    caps = run_caps(dcfg, spr=SPR)
    U_tot = int(np.sum(caps))
    print(f"caps: {caps}  U_tot={U_tot}  vs L*S={dcfg.n_levels * SPR}")

    d_tab = brickgrid_init(key, dcfg)
    r_tab = brickgrid_init(key, rcfg)
    x = ray_coherent_x(key)                       # (3, N)
    x3 = x.reshape(3, R, SPR)
    valid = jnp.ones((R, SPR), bool)

    # full encoders: dedup vs per-sample
    enc_ps = lambda t, x: brickgrid_encode(
        rcfg, t, x, chunk=98304, storage_dtype=jnp.bfloat16, x_cm=True)
    enc_dd = lambda t, x3: raybrick_encode(
        rcfg, t, x3, valid, caps, chunk_rays=CHUNK_RAYS,
        storage_dtype=jnp.bfloat16)
    print(f"rgb fwd:  per-sample {timeit(enc_ps, r_tab, x):7.1f}   "
          f"dedup {timeit(enc_dd, r_tab, x3):7.1f}")

    vg_ps = lambda t: jax.value_and_grad(
        lambda tt: jnp.sum(enc_ps(tt, x)))(t)
    vg_dd = lambda t: jax.value_and_grad(
        lambda tt: jnp.sum(enc_dd(tt, x3)))(t)
    print(f"rgb v+g:  per-sample {timeit(vg_ps, r_tab):7.1f}   "
          f"dedup {timeit(vg_dd, r_tab):7.1f}")

    encg_ps = lambda t: jax.value_and_grad(lambda tt: sum(
        jnp.sum(o) for o in brickgrid_encode_grad(
            dcfg, tt, x, chunk=98304, storage_dtype=jnp.bfloat16,
            x_cm=True)))(t)
    encg_dd = lambda t: jax.value_and_grad(lambda tt: sum(
        jnp.sum(o) for o in raybrick_encode_grad(
            dcfg, tt, x3, valid, caps, chunk_rays=CHUNK_RAYS,
            storage_dtype=jnp.bfloat16)))(t)
    print(f"density v+g: per-sample {timeit(encg_ps, d_tab):7.1f}   "
          f"dedup {timeit(encg_dd, d_tab):7.1f}")

    # components at one chunk (Rc=4096)
    Rc = CHUNK_RAYS
    xc = x3[:, :Rc].reshape(3, -1)
    vc = valid[:Rc]

    @jax.jit
    def plan_only(xc, vc):
        rows, _, _ = brick_coords(dcfg, xc)
        return _unique_plan(dcfg, rows.reshape(dcfg.n_levels, Rc, SPR),
                            vc, caps)

    t_plan = timeit(plan_only, xc, vc)

    uid, urows = plan_only(xc, vc)
    storage = d_tab.astype(jnp.bfloat16)

    @jax.jit
    def gather_only(urows):
        return jnp.take(storage, urows.reshape(-1), axis=0)

    t_gath = timeit(gather_only, urows)
    g_u = gather_only(urows).reshape(Rc, U_tot, -1)

    @jax.jit
    def expand_only(g_u, uid):
        return _expand_unique(g_u, uid, U_tot, jnp.bfloat16)

    t_exp = timeit(expand_only, g_u, uid)
    print(f"per-chunk (Rc={Rc}): plan {t_plan:6.2f}  unique-gather "
          f"{t_gath:6.2f}  expand {t_exp:6.2f} [ms] x2 chunks x2 tables")


if __name__ == "__main__":
    main()
