"""Worker for the 2-process distributed training test.

Usage: python _mp_worker.py <rank> <nprocs> <port> <outdir>

Each process initializes jax.distributed over localhost (CPU backend,
1 virtual device per process), builds the tiny NeRFSystem over a mesh
spanning ALL global devices, feeds its deterministic slice of a global
ray batch for 3 steps, and rank 0 dumps the resulting density table.
The parent test asserts equality with a single-process run on the full
batch — multi-host data parallelism must not change the math
(reference bar: train.py:430-432 DDPPlugin).
"""
import os
import sys

rank, nprocs, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1")
os.environ.setdefault("INGP_COMPILE_CACHE", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", nprocs, rank)
assert jax.process_count() == nprocs

import numpy as np  # noqa: E402
from types import SimpleNamespace  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from ingp_tpu.parallel.mesh import make_mesh  # noqa: E402
from ingp_tpu.training.trainer import NeRFSystem  # noqa: E402
from ingp_tpu.data.synthetic import SyntheticDataset  # noqa: E402

h = SimpleNamespace(
    dataset_name="synthetic", root_dir="", split="train",
    downsample=1.0, scale=0.5, use_skybox=False, use_exposure=False,
    embed_a=False, embed_a_len=4, embed_msk=False, num_classes=4,
    batch_size=128, ray_sampling_strategy="all_images", num_epochs=1,
    normal_epochs=0, steps_per_epoch=500, lr=1e-2,
    density_threshold=1e-2, depth_mono=False, normal_mono=False,
    normal_ref=False, optimize_ext=False, random_bg=False,
    render_semantic=False, chunk_size=2048, seed=0, ckpt_load=None,
    # capacity == spr: non-binding budget, exact parity with the
    # single-process reference (test_multiprocess._single_process_reference)
    compute_dtype="float32", capacity=16, march_iters=128,
    samples_per_ray=16, grid_size=32, density_L=4, density_F=2,
    density_log2T=12, rgb_L=4, rgb_F=2, rgb_log2T=12)

tr = SyntheticDataset(split="train", img_size=32, n_train=4)
te = SyntheticDataset(split="test", img_size=32, n_test=2)
mesh = make_mesh()  # all global devices
system = NeRFSystem(h, tr, te, mesh=mesh)

rng = np.random.default_rng(0)  # SAME stream on both ranks: the global
local = 256 // nprocs           # batch is sliced deterministically
for _ in range(3):
    g = tr.sample_batch(rng, 256)
    batch = {k: np.asarray(v)[rank * local:(rank + 1) * local]
             for k, v in g.items()}
    aux = system.training_step(batch)

# distributed eval: images round-robined over hosts, metrics gathered
m = system.validate()

if rank == 0:
    np.save(os.path.join(outdir, "table.npy"),
            np.asarray(system.params["model"]["density_table"]))
    np.save(os.path.join(outdir, "loss.npy"),
            np.asarray(float(aux["loss"])))
    np.save(os.path.join(outdir, "psnr.npy"), np.asarray(m["psnr"]))
print(f"rank {rank}: done loss={float(aux['loss']):.6f} "
      f"val_psnr={m['psnr']:.3f}")

# --- multi-host checkpoint save + preemption resume ------------------
# EVERY process participates in the orbax save and restore (advisor r3
# medium finding: a host-0-only restore leaves the other hosts at
# fresh init/global_step=0 and desyncs the collectives).
import copy  # noqa: E402

h2 = copy.deepcopy(h)
h2.steps_per_epoch = 2
ckdir = os.path.join(outdir, "mh_run")
sys2 = NeRFSystem(h2, tr, te, mesh=mesh)
sys2.fit(log_every=0, ckpt_dir=ckdir)
assert sys2.global_step == 2, sys2.global_step

# cold start on the same run dir: every rank must resume at step 2
sys3 = NeRFSystem(h2, tr, te, mesh=mesh)
sys3.fit(log_every=0, ckpt_dir=ckdir)
assert sys3.global_step == 2, (rank, sys3.global_step)
np.save(os.path.join(outdir, f"resume_step_{rank}.npy"),
        np.asarray(sys3.global_step))
print(f"rank {rank}: resumed at step {sys3.global_step}")
