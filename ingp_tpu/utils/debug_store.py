"""Global debug value store (reference models/global_var.py:1-18).

The reference stashes gradient tensors in a process-global dict for
ad-hoc logging (initialized at train.py:406, keys
log_dL_dsigmas/log_dL_dnormals_diff/log_dL_dnormals_ori). The JAX
equivalent is host-side: values are pulled out of jit via
jax.debug.callback (or logged from aux outputs) and recorded here.
"""
from __future__ import annotations

import numpy as np

_global_dict: dict = {}


def init():
    """global_var._init(): reset with the reference's gradient-log keys."""
    _global_dict.clear()
    for key in ("log_dL_dsigmas", "log_dL_dnormals_diff",
                "log_dL_dnormals_ori"):
        _global_dict[key] = np.zeros([1], np.float32)


def set_value(key, value):
    _global_dict[key] = value


def get_value(key):
    return _global_dict[key]


def record(key):
    """jax.debug.callback-compatible recorder: use inside jit as
    jax.debug.callback(record(\"k\"), value) to stash device values."""
    def _cb(value):
        _global_dict[key] = np.asarray(value)
    return _cb
