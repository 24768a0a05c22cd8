"""Mesh/data-parallel tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from ingp_tpu.parallel import (make_mesh, shard_batch, all_gather_metrics,
                               is_main_process, host_local_batch)


def test_make_mesh_and_shard_batch():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8}
    batch = {"rgb": np.random.default_rng(0).random((64, 3)
                                                    ).astype(np.float32),
             "idx": np.arange(64, dtype=np.int32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["rgb"].sharding.is_fully_replicated is False
    np.testing.assert_allclose(np.asarray(sharded["rgb"]), batch["rgb"])


def test_sharded_reduction_matches_single_device():
    # a mean over the sharded axis must equal the unsharded mean
    # (GSPMD inserts the cross-device psum)
    mesh = make_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P
    x = np.random.default_rng(1).random((64, 16)).astype(np.float32)
    f = jax.jit(lambda v: jnp.mean(v * v),
                in_shardings=NamedSharding(mesh, P("data")),
                out_shardings=NamedSharding(mesh, P()))
    np.testing.assert_allclose(float(f(x)), float(np.mean(x * x)),
                               rtol=1e-6)


def test_single_process_helpers():
    assert is_main_process()
    assert all_gather_metrics([1.0, 2.0]) == [1.0, 2.0]
    mesh = make_mesh(8)
    out = host_local_batch(mesh, {"a": np.ones((16, 2), np.float32)})
    assert out["a"].shape == (16, 2)


def test_gradient_psum_equivalence():
    # data-parallel grad == single-device grad of the same global batch
    mesh = make_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P
    w = jnp.asarray(np.random.default_rng(2).random((16, 4)),
                    jnp.float32)
    x = np.random.default_rng(3).random((64, 16)).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_ref = jax.grad(loss)(w, jnp.asarray(x))
    g_dp = jax.jit(jax.grad(loss),
                   in_shardings=(NamedSharding(mesh, P()),
                                 NamedSharding(mesh, P("data"))),
                   out_shardings=NamedSharding(mesh, P()))(w, x)
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)
