"""Prototype of the run-based block march occupancy test.

Instead of one bitfield word fetch per (ray, lattice step) — 8.4M
gathers at the flagship op-point — fetch ONE 16^3-cell neighborhood row
(128 uint32 = 4096 bits) per run of Q=16 consecutive steps (524k
fetches), then extract each sample's bit with elementwise math:
  word w = lz*8 + (ly>>1), bit = ((ly&1)<<4) | lx
  wordval = sum over lanes of row * (lane == w)   [fusible reduce]
  occ = (wordval >> bit) & 1

Validates exact agreement with the per-point bitfield_lookup and times
both paths.
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

from ingp_tpu.ops.pack import packbits_u32, bitfield_lookup


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
    x = jax.tree.leaves(out)[-1]
    np.asarray(jax.device_get(x.ravel()[:1]))


GS = 128
ANCH = GS // 4            # anchor grid (stride 4)
AMAX = GS - 16            # max anchor cell so the window stays inside


def build_nb_table(occ3d):
    """(gs,gs,gs) bool -> (ANCH^3, 128) uint32 neighborhood table.

    Row for anchor (az,ay,ax) holds the 16^3 window of cells starting at
    (4az,4ay,4ax) (clamped windows handled by the caller's anchor clamp
    — rows past AMAX//4 are still built from in-grid data because the
    occupancy is padded with zeros).
    """
    occ = jnp.pad(occ3d.astype(jnp.uint32), ((0, 16), (0, 16), (0, 16)))
    # pack 16 x-cells starting at 4*ax into one value's low 16 bits
    shifts = (2 ** jnp.arange(16, dtype=jnp.uint32))
    # bits16[z, y, ax] for ax in [0, ANCH)
    cols = [jnp.sum(occ[:, :, 4 * ax:4 * ax + 16].astype(jnp.uint32)
                    * shifts[None, None, :], axis=-1, dtype=jnp.uint32)
            for ax in range(ANCH)]
    bits16 = jnp.stack(cols, axis=-1)        # (gs+16, gs+16, ANCH)

    # row word w = lz*8 + ly>>1 ; the (ly&1) half selects the shift
    words = []
    for lz in range(16):
        for ly_pair in range(8):
            lo = bits16[lz:lz + 4 * ANCH:4, 2 * ly_pair:2 * ly_pair
                        + 4 * ANCH:4, :][:ANCH, :ANCH, :]
            hi = bits16[lz:lz + 4 * ANCH:4, 2 * ly_pair + 1:2 * ly_pair
                        + 1 + 4 * ANCH:4, :][:ANCH, :ANCH, :]
            words.append(lo | (hi << 16))
    # words: 128 arrays of (ANCH, ANCH, ANCH) -> (ANCH^3, 128)
    tb = jnp.stack(words, axis=-1).reshape(ANCH ** 3, 128)
    return tb


def block_occupancy(nb_table, cell_x, cell_y, cell_z, Q=16):
    """cell_*: (R, M) int32 per-sample cell coords (clipped to grid).
    Returns (R, M) bool occupancy."""
    R, M = cell_x.shape
    nrun = M // Q
    rx = cell_x.reshape(R, nrun, Q)
    ry = cell_y.reshape(R, nrun, Q)
    rz = cell_z.reshape(R, nrun, Q)

    def anchor(c):
        mn = jnp.minimum(c[:, :, 0], c[:, :, -1])
        return jnp.minimum((mn // 4) * 4, AMAX)
    ax, ay, az = anchor(rx), anchor(ry), anchor(rz)      # (R, nrun)

    row = ((az // 4) * ANCH + (ay // 4)) * ANCH + (ax // 4)
    rows = jnp.take(nb_table, row.reshape(-1), axis=0
                    ).reshape(R, nrun, 128)

    lx = rx - ax[:, :, None]
    ly = ry - ay[:, :, None]
    lz = rz - az[:, :, None]
    w = lz * 8 + (ly >> 1)                               # (R, nrun, Q)
    bit = ((ly & 1) << 4) | lx

    lanes = jnp.arange(128, dtype=jnp.int32)
    # two-stage select keeps materialized intermediates 8-16x smaller
    # than a flat 128-lane compare-reduce:
    #   stage A picks the lz-group of 8 words, stage B the word in it.
    grp = jnp.arange(16, dtype=jnp.int32)
    rows_g = rows.reshape(R, nrun, 16, 8)
    selA = jnp.sum(
        jnp.where(grp[None, None, :, None, None] == lz[:, :, None, :, None],
                  rows_g[:, :, :, None, :], jnp.uint32(0)),
        axis=2, dtype=jnp.uint32)                       # (R, nrun, Q, 8)
    sub = jnp.arange(8, dtype=jnp.int32)
    wsub = (ly >> 1)
    wordval = jnp.sum(
        jnp.where(sub[None, None, None, :] == wsub[..., None],
                  selA, jnp.uint32(0)),
        axis=-1, dtype=jnp.uint32)                      # (R, nrun, Q)
    occ = ((wordval >> bit.astype(jnp.uint32)) & 1).astype(jnp.bool_)
    return occ.reshape(R, M)


def main():
    R, M = 8192, 1024
    key = jax.random.PRNGKey(0)
    occ3d = jax.random.bernoulli(key, 0.03, (GS, GS, GS))
    bitfield = packbits_u32(occ3d.reshape(-1).astype(jnp.float32), 0.5)
    nb = build_nb_table(occ3d)
    print(f"nb table {nb.shape} {nb.nbytes/1e6:.1f} MB", flush=True)

    # synthetic coherent sample paths: random rays through the grid
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (R, 3), minval=0.0, maxval=127.0)
    d = jax.random.normal(k2, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    step = 0.25  # cells per lattice step (~4.6 steps/cell => 0.216)
    tgrid = jnp.arange(M, dtype=jnp.float32) * step
    cx = jnp.clip((o[:, 0:1] + tgrid[None] * d[:, 0:1]), 0, GS - 1
                  ).astype(jnp.int32)
    cy = jnp.clip((o[:, 1:2] + tgrid[None] * d[:, 1:2]), 0, GS - 1
                  ).astype(jnp.int32)
    cz = jnp.clip((o[:, 2:3] + tgrid[None] * d[:, 2:3]), 0, GS - 1
                  ).astype(jnp.int32)

    # reference: per-point lookup
    idx = (cz * GS + cy) * GS + cx
    ref_fn = jax.jit(lambda bf, i: bitfield_lookup(bf, i))
    ref = ref_fn(bitfield, idx)

    blk_fn = jax.jit(lambda nb, x, y, z: block_occupancy(nb, x, y, z))
    got = blk_fn(nb, cx, cy, cz)

    ok = bool(jnp.all(ref == got))
    print(f"exact match: {ok}", flush=True)
    if not ok:
        bad = jnp.argwhere(ref != got)[:4]
        print("mismatch at:", bad, flush=True)
        return

    t_ref = timeit(ref_fn, bitfield, idx)
    t_blk = timeit(blk_fn, nb, cx, cy, cz)
    print(f"per-point lookup : {t_ref*1e3:8.2f} ms", flush=True)
    print(f"block march      : {t_blk*1e3:8.2f} ms", flush=True)

    # table build cost
    t_build = timeit(jax.jit(build_nb_table), occ3d, n=3)
    print(f"nb table build   : {t_build*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
