"""Run-dedup plan machinery for brick-grid encoders.

TPU gathers and scatters are *index-rate* bound (~130M gather / ~60M
scatter rows/s measured on v5e, PERF_NOTES.md), so a brick encoder's
cost is set by the number of (sample, level) rows it touches. Marched
samples are ORDERED along their ray with spacing dt ~= sqrt3/1024,
while a level-l brick spans B/res_l of the scene — consecutive samples
usually land in the SAME brick at all but the finest levels, so
deduplicating consecutive-duplicate runs in the row-id stream cuts the
row count several-fold at coarse/mid levels.

This module holds the shared plan primitives consumed by the shipping
stream-dedup encoder (ops/streambrick.py) and the fused expand+reduce
kernel (ops/pallas/rayreduce_pallas.py):

  * `_unique_plan`: flag run boundaries (rows[s] != rows[s-1]), assign
    each run a slot in a per-(batch row, level) unique table of static
    per-level capacity U_l, and pack the unique row ids front-aligned
    with a batched stable sort (scatter-free — an element scatter here
    measured 10.5 ms/chunk on v5e).
  * `_expand_unique`: unique rows -> per-sample rows via a batched
    one-hot matmul on the MXU; its dot_general transpose makes the
    backward table gradient a batched matmul + a U-row scatter.
  * `_SAVE_PLAN`: the remat policy that saves outputs AND the plan so
    the backward recompute never re-runs the gather or the plan sort.

The rectangle (R, capacity)-grid encoder that first used these
primitives was superseded by the stream encoder (cost scales with the
kept budget, no per-ray cap calibration) and deleted in round 5; see
git history for `raybrick_encode`.

The reference has no analog: its CUDA hash encoder (tinycudann) leans
on the GPU L2 cache to absorb duplicate corner fetches. This is the
TPU-native expression of the same locality.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .brickgrid import BrickGridConfig

SQRT3 = float(np.sqrt(3.0))

# Remat policy for encoder chunk bodies: save the outputs (so the
# backward recompute never re-runs the unique-row gather — see
# brickgrid._SAVE_OUTS) AND the dedup plan (uid/urows are small int
# arrays whose construction costs a cumsum + batched sort per chunk;
# saving them keeps the backward recompute to elementwise weight math +
# the expand transpose).
_SAVE_PLAN = jax.checkpoint_policies.save_only_these_names(
    "brick_feats", "brick_jac", "raybrick_uid", "raybrick_urows")


def _unique_plan(cfg: BrickGridConfig, rows, valid, caps,
                 with_overflow: bool = False):
    """Run-dedup plan for one chunk.

    Args:
      rows: (L, R, S) int32 table row ids.
      valid: (R, S) bool sample mask (valid samples form a prefix).
      caps: per-level static capacities U_l.
      with_overflow: also return the (L, R, S) bool mask of samples
        whose run overflowed its level cap (they alias slot U_l-1 — a
        neighboring run's row; callers that cannot tolerate the alias
        zero those samples' trilerp weights instead, matching
        streambrick._unique_plan_uniform's overflow marking).

    Returns:
      uid:   (R, L*S) int32 global unique slot per sample, in
             [0, U_tot); level-major k = l*S + s sample axis.
      urows: (R, U_tot) int32 table row id per unique slot (slots past
             a ray's actual run count hold arbitrary never-referenced
             row ids: their expanded values multiply a zero one-hot and
             their backward cotangents are exact zeros).
    """
    L, R, S = rows.shape
    caps_a = jnp.asarray(caps, jnp.int32)[:, None, None]
    offs = np.concatenate([[0], np.cumsum(caps)]).astype(np.int32)

    prev = jnp.concatenate([jnp.full((L, R, 1), -1, rows.dtype),
                            rows[:, :, :-1]], axis=2)
    new = (rows != prev) & valid[None]                     # (L, R, S)
    run = jnp.cumsum(new.astype(jnp.int32), axis=2)        # 1-based
    u = jnp.clip(run - 1, 0, caps_a - 1)                   # (L, R, S)
    # only the first `new` sample of each non-overflowing run opens a
    # slot (overflow runs reuse slot U_l-1's row)
    new_eff = new & (run <= caps_a)

    uid = (u + jnp.asarray(offs[:-1], jnp.int32)[:, None, None])
    uid = jnp.transpose(uid, (1, 0, 2)).reshape(R, L * S)

    # pack run-opening samples' rows to the front of each (level, ray)
    # lane: a batched sort on a stable s-ordered key (scatter-free; an
    # element scatter here measured 10.5 ms/chunk on v5e)
    s_iota = jnp.arange(S, dtype=jnp.int32)[None, None, :]
    keys = jnp.where(new_eff, s_iota, S + s_iota)
    _, packed = jax.lax.sort(
        (jnp.broadcast_to(keys, rows.shape), rows),
        dimension=2, num_keys=1)                           # (L, R, S)
    urows = jnp.concatenate(
        [packed[l, :, :caps[l]] for l in range(L)], axis=1)
    if with_overflow:
        return uid, urows, run > caps_a
    return uid, urows


def _expand_unique(g_u, uid, U_tot, expand_dtype):
    """(R, U_tot, W) unique rows -> (R, K, W) per-sample rows via a
    batched one-hot matmul (K = L*S). The one-hot is exact in bf16, and
    bf16 unique rows reproduce a bf16 storage gather bit-for-bit."""
    R, K = uid.shape
    oh = jax.nn.one_hot(uid, U_tot, dtype=expand_dtype)     # (R, K, U)
    return jax.lax.dot_general(
        oh, g_u.astype(expand_dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                 # (R, K, W)
