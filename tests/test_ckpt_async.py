"""Async checkpointing + preemption recovery (utils/ckpt.py
AsyncCkptManager, trainer auto-resume — SURVEY.md §5 failure-recovery).
"""
import os

import numpy as np

from ingp_tpu.utils.ckpt import AsyncCkptManager

from test_training import make_system


def test_async_manager_roundtrip(tmp_path):
    root = os.path.join(tmp_path, "steps")
    mgr = AsyncCkptManager(root)
    state = {"params": {"w": np.arange(8.0)}, "step": 3}
    mgr.save(3, state)        # returns before commit
    mgr.save(5, {"params": {"w": np.arange(8.0) * 2}, "step": 5})
    mgr.wait()
    assert mgr.latest_step() == 5
    got = mgr.restore()
    np.testing.assert_allclose(got["params"]["w"], np.arange(8.0) * 2)
    assert int(got["step"]) == 5
    mgr.close()

    # a fresh manager on the same dir discovers the committed steps
    mgr2 = AsyncCkptManager(root)
    assert mgr2.latest_step() == 5
    mgr2.close()


def test_async_manager_retention(tmp_path):
    mgr = AsyncCkptManager(os.path.join(tmp_path, "steps"), max_to_keep=2)
    for s in (1, 2, 3, 4):
        mgr.save(s, {"x": np.full(4, float(s))})
    mgr.wait()
    steps = sorted(int(d) for d in os.listdir(mgr.root)
                   if d.isdigit())
    assert steps == [3, 4]
    mgr.close()


def test_fit_kill_and_restart_resumes(tmp_path):
    """A 'preempted' run (fit for 1 epoch, process state discarded)
    resumes from the committed step checkpoint and lands at the same
    final parameters as the per-step training would."""
    ckpt_dir = str(tmp_path / "run")
    # run 1: one epoch of 4 steps, then 'die' (drop the system)
    s1 = make_system(num_epochs=1, steps_per_epoch=4, batch_size=256)
    s1.fit(log_every=0, ckpt_dir=ckpt_dir)
    assert s1.global_step == 4
    del s1

    # run 2: same config, fresh process state, more epochs — must pick
    # up at step 4, not restart from 0
    s2 = make_system(num_epochs=2, steps_per_epoch=4, batch_size=256)
    resumed_from = {}
    orig_load_state = s2.load_state

    def spy(state):
        orig_load_state(state)
        resumed_from["step"] = s2.global_step

    s2.load_state = spy
    s2.fit(log_every=0, ckpt_dir=ckpt_dir)
    assert resumed_from.get("step") == 4
    assert s2.global_step == 8

    # run 3: no_resume opts out
    s3 = make_system(num_epochs=1, steps_per_epoch=4, batch_size=256,
                     no_resume=True)
    s3.fit(log_every=0, ckpt_dir=ckpt_dir + "2")
    assert s3.global_step == 4
