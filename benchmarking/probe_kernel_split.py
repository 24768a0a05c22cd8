"""Probe: where does the fused rayreduce kernel's time go?

Builds variant kernels at the bench op-point's grouped-stream shapes
(T*Lg batch rows, TS=256 cells, Ug unique slots) with pieces stubbed:

  full      — the shipping _fwd_kernel math
  no-planes — trilerp planes replaced by constant 1.0 (isolates the
              per-lane weight-plane build cost)
  no-expand — one-hot expansion replaced by a broadcast row (isolates
              the (KS, U) one-hot build + MXU expand cost)
  no-dot    — the final select matmul replaced by a slice

Times FORWARD only (the backward mirrors the same pieces). Shapes:
three level groups as group_levels produces at the bench caps.

Usage: python benchmarking/probe_kernel_split.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def bench(fn, *args, iters=10):
    import jax.numpy as jnp
    out = fn(*args)
    float(np.asarray(jnp.sum(out[0][:1].astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jnp.sum(out[0][:1].astype(jnp.float32))))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from ingp_tpu.ops.pallas.rayreduce_pallas import (
        _selT_blockdiag, _sel_np, RAY_TILE)
    from ingp_tpu.ops.pallas.brickreduce_pallas import (
        _plane_weights, _point_coords)

    F, Fj, W = 8, 8, 256
    TS = 256
    # bench-shape groups: (rows = T*Lg, Ug) per group_levels at seg 4
    T = 768
    GROUPS = [(T * 5, 96), (T * 3, 128), (T * 2, 176)]

    def make_kernel(mode, with_jac, U):
        def k(G_ref, uid_ref, lf_ref, sel_ref, E_ref, feats_ref, *jac_ref):
            mm_dt = G_ref.dtype
            TR, KS = uid_ref.shape
            if mode.startswith("rowpair"):
                # P rows per expand via ONE batch-dim dot_general —
                # tests whether the ~10 ms kernel floor is per-op
                # pipeline bubbles (7680 x ~1.3 us dots) or real work.
                # Measured: no win (Mosaic unrolls batch dims;
                # rowpair-2 17.9 vs full 17.6 ms, rowpair-4 22.0 as
                # the P x expand FLOPs take over).
                P = int(mode.split("-")[1])
                # batch-dim dot: (P, KS, U) x (P, U, W) in ONE
                # dot_general — tests whether Mosaic pipelines batched
                # small dots better than P serialized ones (the
                # block-diagonal lane formulation is rejected:
                # "Input offsets outside of the first tile")
                u_iota1 = jax.lax.broadcasted_iota(
                    jnp.int32, (P, KS, U), 2)
                pcoords = _point_coords()
                for r0 in range(0, TR, P):
                    uid_p = jnp.stack(
                        [uid_ref[r0 + p] for p in range(P)])
                    oh = (uid_p[:, :, None] == u_iota1).astype(mm_dt)
                    g_cat = jnp.stack(
                        [G_ref[r0 + p] for p in range(P)], axis=0)
                    g_all = jax.lax.dot_general(
                        oh, g_cat, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)  # (P,KS,W)
                    for p in range(P):
                        g = g_all[p]
                        lf = lf_ref[:, r0 + p, :]
                        w, d1, d2, d3 = _plane_weights(lf, pcoords, W, F)
                        big = jnp.concatenate(
                            [g * w, g * d1, g * d2, g * d3], axis=1)
                        out = jax.lax.dot_general(
                            sel_ref[...].astype(big.dtype), big,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        feats_ref[:, r0 + p, :] = out[0:F]
                        jac_ref[0][:, r0 + p, :] = \
                            out[F:] * lf[6][None, :]
                return
            u_iota = jax.lax.broadcasted_iota(jnp.int32, (KS, U), 1)
            pcoords = _point_coords()
            for r in range(TR):
                if mode == "no-expand":
                    g = jnp.broadcast_to(
                        G_ref[r][0:1, :].astype(jnp.float32), (KS, W))
                else:
                    oh = (uid_ref[r][:, None] == u_iota).astype(mm_dt)
                    g = jax.lax.dot_general(
                        oh, G_ref[r], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                lf = lf_ref[:, r, :]
                if mode == "no-planes":
                    w = d1 = d2 = d3 = 1.0
                elif mode == "bf16-planes":
                    w, d1, d2, d3 = _plane_weights(lf, pcoords, W, F)
                    w, d1, d2, d3 = (p.astype(jnp.bfloat16)
                                     for p in (w, d1, d2, d3))
                    g = g.astype(jnp.bfloat16)
                elif mode == "factored-E":
                    # build the 4 planes in the 27-POINT domain (one
                    # 128-lane register row) and expand lane-wise with
                    # ONE bf16 MXU dot against the 0/1 expansion matrix
                    pi, pj, pk = pcoords

                    def axis_w(lane, loc, fr):
                        at0 = lane == loc
                        at1 = lane == loc + 1
                        wv = jnp.where(at0, 1.0 - fr,
                                       jnp.where(at1, fr, 0.0))
                        dv = jnp.where(at0, -1.0,
                                       jnp.where(at1, 1.0, 0.0))
                        return wv, dv
                    ax, dax = axis_w(pi, lf[0][:, None], lf[3][:, None])
                    ay, day = axis_w(pj, lf[1][:, None], lf[4][:, None])
                    az, daz = axis_w(pk, lf[2][:, None], lf[5][:, None])
                    ayz = ay * az
                    p4 = jnp.concatenate(
                        [ax * ayz, dax * ayz, day * (ax * az),
                         daz * (ax * ay)], axis=1)          # (KS, 512)
                    ex = jax.lax.dot_general(
                        p4.astype(jnp.bfloat16), E_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (KS, 4W)
                    w, d1, d2, d3 = (ex[:, 0:W], ex[:, W:2 * W],
                                     ex[:, 2 * W:3 * W], ex[:, 3 * W:])
                else:
                    w, d1, d2, d3 = _plane_weights(lf, pcoords, W, F)
                if with_jac:
                    big = jnp.concatenate(
                        [g * w, g * d1, g * d2, g * d3], axis=1)
                    if mode == "no-dot":
                        feats_ref[:, r, :] = big[:, :F].T
                        jac_ref[0][:, r, :] = jnp.broadcast_to(
                            big[:, :3 * Fj].T, (3 * Fj, KS))
                    else:
                        out = jax.lax.dot_general(
                            sel_ref[...].astype(big.dtype), big,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        feats_ref[:, r, :] = out[0:F]
                        jac_ref[0][:, r, :] = out[F:] * lf[6][None, :]
        return k

    key = jax.random.PRNGKey(0)
    modes = ("full", "no-planes", "no-expand", "no-dot",
             "bf16-planes", "factored-E")
    if os.environ.get("PROBE_ROWPAIR", "0") == "1":
        modes = ("full", "rowpair-2", "rowpair-4")
    for mode in modes:
        total = 0.0
        for rows, U in GROUPS:
            g_u = jax.random.normal(key, (rows, U, W)).astype(jnp.bfloat16)
            E = np.zeros((512, 4 * W), np.float32)
            for grp in range(4):
                for q in range(W):
                    E[grp * 128 + q // F, grp * W + q] = 1.0
            E = jnp.asarray(E, jnp.bfloat16)
            uid = jax.random.randint(key, (rows, TS), 0, U, jnp.int32)
            lf = jax.random.uniform(key, (8, rows, TS), jnp.float32)
            sel = _selT_blockdiag(W, F, 0, Fj, True)
            rt = RAY_TILE

            @jax.jit
            def run(g_u, uid, lf, sel, E, U=U, rows=rows, mode=mode):
                return pl.pallas_call(
                    make_kernel(mode, True, U),
                    grid=(rows // rt, TS // TS),
                    in_specs=[
                        pl.BlockSpec((rt, U, W), lambda i, j: (i, 0, 0)),
                        pl.BlockSpec((rt, TS), lambda i, j: (i, j)),
                        pl.BlockSpec((8, rt, TS), lambda i, j: (0, i, j)),
                        pl.BlockSpec(sel.shape, lambda i, j: (0, 0)),
                        pl.BlockSpec((512, 4 * W), lambda i, j: (0, 0)),
                    ],
                    out_specs=[
                        pl.BlockSpec((F, rt, TS), lambda i, j: (0, i, j)),
                        pl.BlockSpec((3 * Fj, rt, TS),
                                     lambda i, j: (0, i, j)),
                    ],
                    out_shape=[
                        jax.ShapeDtypeStruct((F, rows, TS), jnp.float32),
                        jax.ShapeDtypeStruct((3 * Fj, rows, TS),
                                             jnp.float32),
                    ],
                )(g_u, uid, lf, sel, E)

            total += bench(run, g_u, uid, lf, sel, E)
        print(f"{mode:10s} fwd(all groups, jac) {total*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
