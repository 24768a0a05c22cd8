"""ingp_tpu — a TPU-native (JAX/XLA/Pallas) Instant-NGP++ framework.

A from-scratch reimplementation of the capabilities of
zhihao-lin/instant-ngp-pp (PyTorch + tinycudann + CUDA `vren` extension),
redesigned for TPU:

- multiresolution hash-grid encoding (XLA gather + Pallas variants)
- occupancy-grid-accelerated ray marching with *fixed-capacity* sample
  segments (static shapes for XLA) instead of the reference's ragged
  atomic-compacted buffers (models/csrc/raymarching.cu:237-241)
- exclusive-scan transmittance compositing (replaces the sequential
  per-ray CUDA loops of models/csrc/volumerendering.cu) with JAX AD
  providing backward passes
- jit-compiled training loop with optax + orbax instead of
  pytorch-lightning, and `jax.sharding` data parallelism instead of DDP.

Package layout (mirrors SURVEY.md §7):
  core/      pure geometry: rays, poses, intersection, morton
  ops/       compute ops: hash grid, SH, march, composite, packing
  models/    NGP model, implicit mask, rendering orchestration, oracle
  grid/      occupancy grid lifecycle (mark_invisible / update / packbits)
  data/      dataset loaders + ray samplers
  training/  losses, metrics, config, trainer
  parallel/  device-mesh sharding of the train step
  render/    offline trajectory rendering, video output
  utils/     checkpoint helpers
"""

__version__ = "0.1.0"

MAX_SAMPLES = 1024  # reference: models/rendering.py:9
NEAR_DISTANCE = 0.01  # reference: models/rendering.py:10
SQRT3 = 1.7320508075688772
