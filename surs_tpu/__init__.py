"""SuRS-TPU: TPU-native super-resolution 3D human shape reconstruction.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
"Super-Resolution 3D Human Shape from a Single Low-Resolution Image"
(ECCV 2022, reference: marcopesavento/Super-resolution-3D-Human-Shape-
from-a-Single-Low-Resolution-Image).

Layout (channels-last / NHWC everywhere; point features are [B, N, C]):
  ops/       projection, pixel-aligned sampling, bicubic resize, fused
             Pallas point-query kernels, on-device mesh containment
  models/    Flax modules: SR U-Net, stacked hourglass, point MLPs, SuRSNet
  recon/     grid creation, dense + octree evaluators, marching cubes,
             mesh I/O (native C++ backends in csrc/)
  data/      THuman-style dataset pipeline, calibration math, point sampling
  train/     losses, train step, optimizers, schedules, Orbax checkpointing
  parallel/  device mesh + sharding rules (DP over batch, SP over points)
  compat/    PyTorch state-dict import shim
  utils/     profiling, logging
"""

__version__ = "0.1.0"
