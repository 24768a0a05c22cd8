"""Device-mesh data parallelism (replaces PL DDPPlugin/NCCL,
train.py:39, 430-432).

The reference's only parallel strategy is data parallelism: replicated
model, per-rank ray batches, NCCL all-reduce of gradients (SURVEY.md
§2.3). TPU-native form: a 1-D ('data',) jax.sharding.Mesh; the ray batch
is sharded on its leading axis, parameters and grid are replicated, and
the per-ray pipeline runs inside jax.shard_map with an explicit
gradient pmean over ICI (trainer.fwd_bwd_shard). Pure GSPMD
propagation is NOT enough for this model: the sort-based ray
compaction is a global op over the sharded axis, so the partitioner
would all-gather the batch and replicate the whole step — caught by
benchmarking/collective_accounting.py, which counts the all-reduce
bytes in the optimized HLO against the analytic DP payload. Tensor/
pipeline parallelism are deliberately absent: the whole model (hash
tables + tiny MLPs) fits comfortably in one chip's HBM, so replication
is the right layout; the scaling axis is rays.

Multi-host: call jax.distributed.initialize() per host before building
the mesh; each host feeds its local shard of the global batch
(jax.make_array_from_process_local_data).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, devices=None):
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict with leading ray axis onto the mesh."""
    sh = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def shard_step(step_fn, mesh: Mesh):
    """Compile step_fn(params, opt_state, bitfield, block_table,
    directions, poses, batch, step, key) with the ray batch sharded over
    ('data',) and everything else replicated. step_fn itself carries the
    shard_map + gradient pmean (trainer._build_step); these outer
    shardings just place the operands so no resharding precedes it.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        donate_argnums=(0, 1),
        in_shardings=(repl, repl, repl, repl, repl, repl, data, repl, repl),
        out_shardings=(repl, repl, repl, repl),
    )
