"""Unit tests for ingp_tpu.core geometry (rays, intersection, morton)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ingp_tpu.core import (
    get_ray_directions, get_rays, axisangle_to_R,
    ray_aabb_intersect, ray_sphere_intersect,
    morton3d, morton3d_invert,
)
from ingp_tpu.core.cascade import (
    n_cascades, calc_dt, mip_from_pos, mip_from_dt, cell_coord, cell_index,
)


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    coords = rng.integers(0, 128, size=(1000, 3)).astype(np.int32)
    codes = morton3d(jnp.asarray(coords))
    back = morton3d_invert(codes)
    np.testing.assert_array_equal(np.asarray(back), coords)


def test_morton_known_values():
    # interleaved bits: (1,0,0)->1, (0,1,0)->2, (0,0,1)->4, (3,0,0)->0b1001
    codes = morton3d(jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [3, 0, 0]]))
    np.testing.assert_array_equal(np.asarray(codes), [1, 2, 4, 0b1001])


def test_ray_aabb_intersect():
    rays_o = jnp.array([[0., 0., -5.], [0., 0., -5.], [0., 2., -5.]])
    rays_d = jnp.array([[0., 0., 1.], [0., 0., -1.], [0., 0., 1.]])
    hits = ray_aabb_intersect(rays_o, rays_d, jnp.zeros(3), jnp.ones(3) * 0.5)
    np.testing.assert_allclose(np.asarray(hits[0]), [4.5, 5.5], atol=1e-5)
    assert hits[1, 0] == -1 and hits[1, 1] == -1   # points away
    assert hits[2, 0] == -1                         # passes above the box


def test_ray_aabb_inside_origin():
    # ray starting inside the box: t_near clamps to 0
    hits = ray_aabb_intersect(jnp.zeros((1, 3)), jnp.array([[0., 0., 1.]]),
                              jnp.zeros(3), jnp.ones(3) * 0.5)
    np.testing.assert_allclose(np.asarray(hits[0]), [0.0, 0.5], atol=1e-6)


def test_ray_sphere_intersect():
    hits = ray_sphere_intersect(jnp.array([[0., 0., -5.]]),
                                jnp.array([[0., 0., 1.]]),
                                jnp.zeros(3), 1.0)
    np.testing.assert_allclose(np.asarray(hits[0]), [4.0, 6.0], atol=1e-5)


def test_get_ray_directions_center_pixel():
    H = W = 4
    K = np.array([[2., 0, 2.], [0, 2., 2.], [0, 0, 1]])
    d = get_ray_directions(H, W, K)
    assert d.shape == (16, 3)
    # pixel (u=1,v=1) center (1.5,1.5): ((1.5-2)/2, (1.5-2)/2, 1)
    np.testing.assert_allclose(d[1 * W + 1], [-0.25, -0.25, 1.0], atol=1e-6)


def test_get_rays_identity_pose():
    d = jnp.array([[0., 0., 1.], [0.1, -0.2, 1.]])
    c2w = jnp.concatenate([jnp.eye(3), jnp.array([[1.], [2.], [3.]])], 1)
    o, wd = get_rays(d, c2w)
    np.testing.assert_allclose(np.asarray(o), [[1, 2, 3]] * 2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(wd), np.asarray(d), atol=1e-6)


def test_axisangle_to_R_matches_scipy():
    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(1)
    v = rng.normal(size=(8, 3)).astype(np.float32) * 0.5
    R_ours = np.asarray(axisangle_to_R(jnp.asarray(v)))
    R_scipy = Rotation.from_rotvec(v).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-4)


def test_axisangle_grad_finite():
    g = jax.grad(lambda v: jnp.sum(axisangle_to_R(v)))(jnp.zeros((2, 3)))
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------------------
# cascade geometry
# ---------------------------------------------------------------------------

def test_n_cascades():
    assert n_cascades(0.5) == 1
    assert n_cascades(1.0) == 2
    assert n_cascades(8.0) == 5
    assert n_cascades(0.25) == 1


def test_calc_dt_clamps():
    dt = calc_dt(jnp.array([0.0, 1e9, 1.0]), 1 / 256, 1024, 128, 0.5)
    s3 = 1.7320508
    np.testing.assert_allclose(
        np.asarray(dt), [s3 / 1024, s3 / 128, 1.0 / 256], rtol=1e-5)


def test_mip_from_pos_ranges():
    # [0.25,0.5) -> 0 ; [0.5,1) -> 1 ; [1,2) -> 2 (raymarching.cu:15-18)
    x = jnp.array([[0.3, 0, 0], [0.6, 0, 0], [1.5, 0, 0], [3.0, 0, 0]])
    np.testing.assert_array_equal(
        np.asarray(mip_from_pos(x, 8)), [0, 1, 2, 3])
    # clamped by cascades
    np.testing.assert_array_equal(np.asarray(mip_from_pos(x, 2)),
                                  [0, 1, 1, 1])


def test_mip_from_dt_ranges():
    gs = 128
    dt = jnp.array([0.3 / gs, 1.5 / gs, 2.5 / gs])
    np.testing.assert_array_equal(np.asarray(mip_from_dt(dt, gs, 8)),
                                  [0, 1, 2])


def test_cell_coord_and_index():
    gs = 128
    x = jnp.array([[-0.5, -0.5, -0.5], [0.49999, 0.49999, 0.49999],
                   [0.0, 0.0, 0.0]])
    mip = jnp.zeros(3, jnp.int32)
    coord, bound = cell_coord(x, mip, gs, 0.5)
    np.testing.assert_allclose(np.asarray(bound), [0.5] * 3)
    np.testing.assert_array_equal(np.asarray(coord[0]), [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(coord[1]), [127, 127, 127])
    np.testing.assert_array_equal(np.asarray(coord[2]), [64, 64, 64])
    idx = cell_index(coord, mip, gs)
    assert int(idx[0]) == 0
    assert int(idx[1]) == gs ** 3 - 1
