"""sota_imagenet_tpu — a TPU-native ImageNet training framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of bonlime/sota_imagenet
(reference layout surveyed in SURVEY.md): config-driven CNN models, a DALI-class
input pipeline (host decode + on-device fused augmentation), a data-parallel
pjit training loop with callbacks/EMA/SAM, an experimental optimizer and loss
zoo, and progressive-resolution training.

Design principles (TPU-first, not a port):
  * NHWC layout, bfloat16 compute / float32 params — MXU-friendly.
  * One jitted train step; SPMD over a ``jax.sharding.Mesh`` ("data" axis for
    DP); gradients reduced by XLA collectives over ICI.
  * Static shapes per training stage; progressive resize == per-stage recompile.
  * Cross-replica BatchNorm falls out of global-view jit semantics.
  * Functional state: ``TrainState`` pytree carries params/batch_stats/opt/EMA.
"""

__version__ = "0.1.0"

from sota_imagenet_tpu import config  # noqa: F401
