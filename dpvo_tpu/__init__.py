"""dpvo_tpu — a TPU-native deep patch visual odometry / SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of DPVO /
DPV-SLAM (reference: cuteboyqq/DPVO): sparse patch-based monocular visual
odometry with a recurrent update operator, correlation-volume feature
matching, Schur-complement bundle adjustment over a dynamic patch graph,
and loop-closure backends — expressed as pure-functional, fixed-shape,
jit-compiled programs that map onto the TPU MXU/VPU and scale over device
meshes with XLA collectives.

Layers (mirrors SURVEY.md §2 component inventory):
  lie/      SE(3)/SO(3)/Sim(3) manifold math        (ref: dpvo/lietorch/*)
  geom/     projective ops + analytic Jacobians     (ref: dpvo/projective_ops.py)
  ba/       Schur-complement bundle adjustment      (ref: dpvo/fastba/*, dpvo/ba.py)
  ops/      patch correlation + patchify kernels    (ref: dpvo/altcorr/*)
  models/   feature encoders + update operator      (ref: dpvo/net.py, extractor.py, blocks.py)
  runtime/  the VO state machine / patch graph      (ref: dpvo/dpvo.py, patchgraph.py)
  slam/     loop-closure backends + Sim(3) PGO      (ref: dpvo/loop_closure/*)
  parallel/ device-mesh sharding + distributed BA   (TPU-native; ref has no collectives)
  data/     frame streams + dataset readers         (ref: dpvo/stream.py, data_readers/*)
  train/    training loop, loss, checkpoints        (ref: train.py, dpvo/logger.py)
  eval/     trajectory alignment + ATE metrics      (ref: evaluate_*.py)
"""

__version__ = "0.1.0"

from dpvo_tpu.config import Config, load_config  # noqa: F401
