"""Gaussian diffusion core: schedules, q/p processes, DDIM sampler, CFG.

Parity target: DGM/denoising_diffusion_models/classifier_free_guidance.py:472-842.
TPU-native design: schedules are host-computed in float64 then cast fp32
(matching the reference's register_buffer convention); the DDIM loop is a
single `lax.scan` inside one jit, and the classifier-free-guidance pair
(conditional + null) runs as one doubled-batch forward instead of two
sequential UNet calls.
"""

from dmhomo_tpu.diffusion.schedules import (
    linear_beta_schedule,
    cosine_beta_schedule,
    DiffusionSchedule,
)
from dmhomo_tpu.diffusion.gaussian import GaussianDiffusion, DiffusionConfig

__all__ = [
    "linear_beta_schedule",
    "cosine_beta_schedule",
    "DiffusionSchedule",
    "GaussianDiffusion",
    "DiffusionConfig",
]
