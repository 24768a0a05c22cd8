"""Run-dedup plan primitives (ops/raybrick.py) vs a dense reference.

The rectangle-grid encoder that first used these primitives was
deleted in round 5 (superseded by ops/streambrick.py, which is covered
by tests/test_streambrick.py); _unique_plan and _expand_unique remain
the shared machinery of the stream encoder's XLA fallback and the
fused rayreduce kernel, so they keep direct coverage here.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ingp_tpu.ops.brickgrid import (BrickGridConfig, brickgrid_init,
                                    brick_coords)
from ingp_tpu.ops.raybrick import _unique_plan, _expand_unique

CFG = BrickGridConfig(n_levels=6, n_features=4, log2_bricks=8,
                      base_resolution=16, per_level_scale=1.5)
R, S = 32, 12


def ray_positions(key, R=R, S=S, dt=np.sqrt(3) / 256):
    ko, kd, kt = jax.random.split(key, 3)
    d = jax.random.normal(kd, (R, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    o = jax.random.uniform(ko, (R, 3)) * 0.3 + 0.2
    t = jax.random.uniform(kt, (R, 1)) * 0.1 \
        + jnp.arange(S)[None, :] * dt
    x = o[:, None, :] + t[..., None] * d[:, None, :]
    return jnp.clip(jnp.transpose(x, (2, 0, 1)), 0.0, 1.0)  # (3, R, S)


def _plan_inputs(seed, valid=None):
    key = jax.random.PRNGKey(seed)
    x = ray_positions(key)
    rows, _, _ = brick_coords(CFG, x.reshape(3, -1))
    rows3 = rows.reshape(CFG.n_levels, R, S)
    if valid is None:
        valid = jnp.ones((R, S), bool)
    return rows3, valid


def test_unique_plan_expand_reconstructs_rows():
    """With caps == S (no overflow possible), expanding the unique rows
    through uid must reproduce every valid sample's row id exactly."""
    rows3, valid = _plan_inputs(0)
    caps = (S,) * CFG.n_levels
    uid, urows = _unique_plan(CFG, rows3, valid, caps)

    # expand the row IDS themselves through the one-hot: exact in f32
    U = int(np.sum(caps))
    g_u = jnp.asarray(urows, jnp.float32)[..., None]     # (R, U, 1)
    expanded = _expand_unique(g_u, uid, U, jnp.float32)[..., 0]
    expanded = np.asarray(expanded).reshape(R, CFG.n_levels, S)
    want = np.transpose(np.asarray(rows3), (1, 0, 2))    # (R, L, S)
    np.testing.assert_array_equal(expanded, want)


def test_unique_plan_partial_valid_prefix():
    key = jax.random.PRNGKey(1)
    n = jax.random.randint(key, (R,), 0, S + 1)
    valid = jnp.arange(S)[None, :] < n[:, None]
    rows3, _ = _plan_inputs(1)
    caps = (S,) * CFG.n_levels
    uid, urows = _unique_plan(CFG, rows3, valid, caps)
    U = int(np.sum(caps))
    g_u = jnp.asarray(urows, jnp.float32)[..., None]
    expanded = np.asarray(
        _expand_unique(g_u, uid, U, jnp.float32)[..., 0]
        ).reshape(R, CFG.n_levels, S)
    want = np.transpose(np.asarray(rows3), (1, 0, 2))
    v = np.asarray(valid)
    np.testing.assert_array_equal(expanded[v.reshape(R, 1, S)
                                           .repeat(CFG.n_levels, 1)],
                                  want[v.reshape(R, 1, S)
                                       .repeat(CFG.n_levels, 1)])


def test_unique_plan_slot_count_matches_runs():
    """Slot ids are dense per (ray, level): max uid + 1 == run count."""
    rows3, valid = _plan_inputs(2)
    caps = (S,) * CFG.n_levels
    uid, _ = _unique_plan(CFG, rows3, valid, caps)
    uid = np.asarray(uid).reshape(R, CFG.n_levels, S)
    rows_n = np.asarray(rows3)
    offs = np.concatenate([[0], np.cumsum(caps)])
    for l in range(CFG.n_levels):
        for r in range(4):                # spot-check a few rays
            runs = 1 + int(np.sum(rows_n[l, r, 1:] != rows_n[l, r, :-1]))
            local = uid[r, l] - offs[l]
            assert local.max() == runs - 1
            # runs are consecutive-duplicate groups: uid monotone
            assert (np.diff(local) >= 0).all()


def test_unique_plan_overflow_marking():
    rows3, valid = _plan_inputs(3)
    caps = (2,) * CFG.n_levels           # force overflow at fine levels
    uid, urows, ovf = _unique_plan(CFG, rows3, valid, caps,
                                   with_overflow=True)
    ovf = np.asarray(ovf)
    assert ovf.any()                     # fine levels must overflow
    # overflowing samples alias the last slot of their level
    uid = np.asarray(uid).reshape(R, CFG.n_levels, S)
    offs = np.concatenate([[0], np.cumsum(caps)])
    for l in range(CFG.n_levels):
        ol = ovf[l]                      # (R, S), matches uid[:, l, :]
        if ol.any():
            assert (uid[:, l, :][ol] == offs[l] + caps[l] - 1).all()
    # non-overflowing cells still reconstruct exactly
    U = int(np.sum(caps))
    g_u = jnp.asarray(urows, jnp.float32)[..., None]
    expanded = np.asarray(_expand_unique(
        g_u, jnp.asarray(uid.reshape(R, -1)), U, jnp.float32)[..., 0]
        ).reshape(R, CFG.n_levels, S)
    want = np.transpose(np.asarray(rows3), (1, 0, 2))
    ok = ~np.transpose(ovf, (1, 0, 2))   # (R, L, S)
    np.testing.assert_array_equal(expanded[ok], want[ok])


def test_expand_unique_bf16_exact_for_bf16_rows():
    """bf16 one-hot expansion of bf16 rows is bitwise the gathered
    value (the one-hot is exact in bf16)."""
    rng = np.random.default_rng(7)
    Rr, U, K, W = 4, 8, 16, 32
    g_u = jnp.asarray(rng.standard_normal((Rr, U, W)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    uid = jnp.asarray(rng.integers(0, U, (Rr, K)).astype(np.int32))
    out = _expand_unique(g_u, uid, U, jnp.bfloat16)
    want = np.take_along_axis(np.asarray(g_u, np.float32),
                              np.asarray(uid)[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(out), want)
