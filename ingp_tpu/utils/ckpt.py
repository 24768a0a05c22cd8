"""Checkpoint save/load (orbax) — replaces utils.py:7-42 + PL ckpting.

Full checkpoints carry {params, opt_state, grid, step}; `slim_state`
mirrors slim_ckpt (utils.py:32-42): model weights only, grids and
optimizer state dropped (the density grid re-warms on load, exactly like
the reference's behavior for slim ckpts, SURVEY.md §3.5).

`AsyncCkptManager` is the TPU-native upgrade the reference lacks
(SURVEY.md §5 failure-recovery row): periodic saves run in a background
thread (training continues while bytes hit disk), each step's
checkpoint commits atomically into its own step directory, old steps
are garbage-collected, and `latest_step()` enables restore-on-start
after a preemption — a kill at ANY moment leaves the newest committed
checkpoint intact (unlike force-overwriting a single path, which
deletes the old checkpoint before the new one is durable).
"""
from __future__ import annotations

import os

import orbax.checkpoint as ocp


def save_ckpt(path, state):
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


class AsyncCkptManager:
    """Async step-directory checkpointing with retention + auto-resume.

    save() returns as soon as the on-device state is snapshotted; the
    serialization/commit runs in orbax's background thread (a second
    save waits for the first to commit). Directories are atomic: a
    step appears under `root` only after its write fully committed.
    """

    def __init__(self, root, max_to_keep: int = 2):
        self.root = os.path.abspath(root)
        self._mgr = ocp.CheckpointManager(
            self.root,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                enable_async_checkpointing=True,
            ))

    def save(self, step: int, state) -> None:
        self._mgr.save(step, args=ocp.args.PyTreeSave(state))

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, step: int | None = None, target=None):
        """Restore a step's state. `target` (a pytree of live arrays,
        e.g. the freshly-initialized trainer state) makes the restore
        topology-portable: leaves come back with the TARGET's shardings
        instead of the shardings recorded at save time — without it,
        a checkpoint written on one backend/topology (TPU run) fails to
        restore in another process (CPU resume, different device count)
        with "sharding ... Got None"."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        if target is None:
            return self._mgr.restore(step)
        restore_args = ocp.checkpoint_utils.construct_restore_args(target)
        try:
            return self._mgr.restore(
                step, args=ocp.args.PyTreeRestore(
                    item=target, restore_args=restore_args))
        except (ValueError, KeyError, TypeError) as e:
            # The saved tree's structure differs from the live target
            # (older checkpoint, slim export without opt_state, grid
            # saved without block_table, ...). PyTreeRestore(item=...)
            # requires an exact structure match and raises inside orbax
            # before the caller's tolerant prefix-filtered handling
            # (trainer.load_state) can run — fall back to the
            # untargeted restore and let the caller cope, as it did
            # before targeted restores existed. Say so loudly: when
            # the targeted path failed for a NON-structural reason
            # (topology-change sharding error), the untargeted restore
            # returns save-time shardings and the downstream failure
            # would otherwise hide this first error.
            print(f"[ckpt] targeted restore of step {step} failed "
                  f"({type(e).__name__}: {e}); falling back to "
                  f"untargeted restore — leaves come back with "
                  f"SAVE-time shardings", flush=True)
            return self._mgr.restore(step)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._mgr.close()


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
