"""DMHomo-TPU: a TPU-native (JAX/XLA/Pallas) framework for diffusion-based
unsupervised homography estimation.

This is a from-scratch rebuild of the capabilities of lhaippp/DMHomo
("Learning Homography with Diffusion Models", ACM TOG 2024):

* ``dmhomo_tpu.geometry``   - one unified homography/flow geometry library
  (the reference scatters ~4 copies of it across DGM and HEM).
* ``dmhomo_tpu.diffusion``  - Gaussian diffusion schedules, losses and a
  jit-compiled ``lax.scan`` DDIM sampler with classifier-free guidance.
* ``dmhomo_tpu.models``     - Flax conditional UNet (DGM) and multi-scale
  Swin homography regressor + mask estimator (HEM), NHWC/TPU layouts.
* ``dmhomo_tpu.data``       - condition pipeline, generated-shard IO and
  CAHomo readers with per-host sharding.
* ``dmhomo_tpu.train``      - data-parallel trainers over a jax.sharding.Mesh
  (EMA, checkpointing, two-stage HEM schedule).
* ``dmhomo_tpu.evaluation`` - CAHomo point-matching-error metric and category
  reports.
* ``dmhomo_tpu.ops``        - Pallas TPU kernels for the hot ops.

Conventions (TPU-first, unlike the torch reference):
* images / flows / masks are **NHWC** (``(B, H, W, C)``); flows carry ``(u, v)``
  = (x-displacement, y-displacement) in the last axis.
* homographies are ``(B, 3, 3)`` row-major, acting on ``(x, y, 1)`` columns.
* all device code is pure-functional jnp; host-side IO is numpy.
"""

__version__ = "0.1.0"
