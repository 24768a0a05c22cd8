"""Multi-host utilities (replaces PL's DDP rank plumbing and
all_gather_ddp_if_available, train.py:43, 379-391).

One process per host; `init_distributed()` wires jax.distributed, the
trainer shards the global ray batch so each host feeds its local slice
(`host_local_batch`), and metric reduction uses process_allgather.
"""
from __future__ import annotations

import numpy as np
import jax


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """jax.distributed.initialize wrapper; no-op when single-process.

    On TPU pods the arguments are auto-detected from the environment.
    """
    if num_processes == 1 or (num_processes is None
                              and jax.process_count() == 1
                              and coordinator_address is None):
        return False
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)
    return True


def is_main_process() -> bool:
    """Rank-0 gate (mega_nerf/misc_utils.py:6-15 equivalent)."""
    return jax.process_index() == 0


def host_local_batch(mesh, global_batch):
    """Build a globally-sharded array from each host's local slice of
    the ray batch (per-host input pipeline, SURVEY §2.3)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P("data"))
    return {
        k: jax.make_array_from_process_local_data(sh, np.asarray(v))
        for k, v in global_batch.items()
    }


def broadcast_int(value):
    """Broadcast an int (or None, encoded -1) from process 0 to every
    process. Hosts must agree on control-flow decisions like "resume
    from step N" — a host whose local view of the checkpoint directory
    lags (e.g. a freshly restarted worker on a shared FS with stale
    metadata) would otherwise take a different branch and desync the
    collectives."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils
    v = np.asarray(-1 if value is None else int(value), np.int64)
    out = int(multihost_utils.broadcast_one_to_all(v))
    return None if out < 0 else out


def all_gather_metrics(values):
    """Gather per-host metric lists -> flat list on every host
    (all_gather_ddp_if_available equivalent)."""
    if jax.process_count() == 1:
        return list(values)
    from jax.experimental import multihost_utils
    arr = np.asarray(values, np.float32)
    gathered = multihost_utils.process_allgather(arr)
    return list(np.asarray(gathered).reshape(-1))
