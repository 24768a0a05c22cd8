"""Checkpoint save/load (orbax) — replaces utils.py:7-42 + PL ckpting.

Full checkpoints carry {params, opt_state, grid, step}; `slim_state`
mirrors slim_ckpt (utils.py:32-42): model weights only, grids and
optimizer state dropped (the density grid re-warms on load, exactly like
the reference's behavior for slim ckpts, SURVEY.md §3.5).
"""
from __future__ import annotations

import os

import orbax.checkpoint as ocp


def save_ckpt(path, state):
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_ckpt(path, target=None):
    """Restore a pytree; `target` (optional) provides structure/dtypes."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, item=target)
        return ckptr.restore(path)


def slim_state(state, keep_embedding=True, keep_msk=True,
               keep_ext=False):
    """Strip optimizer/grid buffers for a slim export (utils.py:32-42)."""
    params = dict(state["params"])
    if not keep_embedding:
        params.pop("embedding_a", None)
    if not keep_msk:
        params.pop("msk", None)
    if not keep_ext:
        params.pop("ext", None)
    return {"params": params, "step": state.get("step", 0)}


def extract_model_state(state):
    """Model weights only (extract_model_state_dict, utils.py:7-22)."""
    return state["params"]["model"]
