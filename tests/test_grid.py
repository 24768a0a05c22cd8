"""Occupancy-grid lifecycle tests (mark_invisible / update / packbits)."""
import numpy as np
import jax
import jax.numpy as jnp

from ingp_tpu.grid import grid_init, mark_invisible_cells, \
    update_density_grid, all_cell_coords
from ingp_tpu.ops.pack import bitfield_lookup
from ingp_tpu.core.cascade import cell_index
from ingp_tpu.data.synthetic import look_at_pose

GS = 32
SCALE = 0.5


def _ring_poses(n=8, r=1.3):
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        eye = r * np.array([np.cos(th), 0.1, np.sin(th)])
        poses.append(look_at_pose(eye))
    return np.stack(poses)


def test_mark_invisible_cells():
    grid = grid_init(1, GS)
    K = np.float32([[35, 0, 16], [0, 35, 16], [0, 0, 1]])
    poses = _ring_poses()
    grid = mark_invisible_cells(grid, jnp.asarray(K), jnp.asarray(poses),
                                32, 32, GS, 1, SCALE)
    dg = np.asarray(grid["density_grid"]).reshape(GS, GS, GS)  # [z][y][x]
    cg = np.asarray(grid["count_grid"]).reshape(GS, GS, GS)
    # center cell: seen by all cameras
    c = GS // 2
    assert dg[c, c, c] == 0.0
    assert cg[c, c, c] == 1.0
    # with a ring of inward cameras everything near center is covered;
    # some cells should be marked invisible only if outside every frustum
    assert np.all((dg == 0.0) | (dg == -1.0))


def test_update_density_grid_marks_occupied_ball():
    grid = grid_init(1, GS)

    def density_fn(params, x):
        r = jnp.linalg.norm(x, axis=-1)
        return jnp.where(r < 0.25, 50.0, 0.0)

    grid = update_density_grid(density_fn, None, grid,
                               jax.random.PRNGKey(0), 5.0,
                               GS, 1, SCALE, warmup=True)
    dg = np.asarray(grid["density_grid"])[0]
    coords = np.asarray(all_cell_coords(GS))
    centers = (coords / (GS - 1) * 2 - 1) * (SCALE - SCALE / GS)
    r = np.linalg.norm(centers, axis=-1)
    inside = r < 0.2
    outside = r > 0.3
    assert dg[inside].min() > 5.0
    assert dg[outside].max() < 1e-6
    # bitfield agrees with the density grid
    idx = cell_index(jnp.asarray(coords), jnp.zeros(len(coords), jnp.int32),
                     GS)
    bits = np.asarray(bitfield_lookup(grid["bitfield"], idx))
    assert bits[inside].all()
    assert not bits[outside].any()


def test_update_density_grid_ema_decay():
    grid = grid_init(1, GS)
    hot = update_density_grid(
        lambda p, x: jnp.full(x.shape[:-1], 40.0), None, grid,
        jax.random.PRNGKey(0), 5.0, GS, 1, SCALE, warmup=True)
    # now the scene goes cold: values must decay by 0.95 per update
    cold = update_density_grid(
        lambda p, x: jnp.zeros(x.shape[:-1]), None, hot,
        jax.random.PRNGKey(1), 5.0, GS, 1, SCALE, warmup=True)
    np.testing.assert_allclose(np.asarray(cold["density_grid"]),
                               np.asarray(hot["density_grid"]) * 0.95,
                               rtol=1e-5)


def test_update_density_grid_keeps_invisible_cells():
    grid = grid_init(1, GS)
    dg = grid["density_grid"].at[0, :100].set(-1.0)
    grid = dict(grid, density_grid=dg)
    out = update_density_grid(
        lambda p, x: jnp.full(x.shape[:-1], 40.0), None, grid,
        jax.random.PRNGKey(0), 5.0, GS, 1, SCALE, warmup=True)
    assert np.all(np.asarray(out["density_grid"])[0, :100] == -1.0)
    # invisible cells never become occupied
    assert not np.asarray(bitfield_lookup(out["bitfield"],
                                          jnp.arange(100))).any()


def test_update_nonwarmup_samples_occupied():
    grid = grid_init(1, GS)
    ball = lambda p, x: jnp.where(
        jnp.linalg.norm(x, axis=-1) < 0.25, 50.0, 0.0)
    grid = update_density_grid(ball, None, grid, jax.random.PRNGKey(0),
                               5.0, GS, 1, SCALE, warmup=True)
    # several non-warmup rounds keep the ball occupied
    for i in range(3):
        grid = update_density_grid(ball, None, grid,
                                   jax.random.PRNGKey(i + 1), 5.0,
                                   GS, 1, SCALE, warmup=False)
    coords = np.asarray(all_cell_coords(GS))
    centers = (coords / (GS - 1) * 2 - 1) * (SCALE - SCALE / GS)
    r = np.linalg.norm(centers, axis=-1)
    idx = cell_index(jnp.asarray(coords), jnp.zeros(len(coords), jnp.int32),
                     GS)
    bits = np.asarray(bitfield_lookup(grid["bitfield"], idx))
    assert bits[r < 0.2].mean() > 0.99
