"""Neural network blocks: DGM conditional UNet, HEM Swin regressor + heads."""

from dmhomo_tpu.models.unet import ConditionalUNet, UNetConfig
from dmhomo_tpu.models.swin import SwinTransformer, SwinConfig
from dmhomo_tpu.models.estimator import HomographyEstimator, EstimatorConfig

__all__ = [
    "ConditionalUNet",
    "UNetConfig",
    "SwinTransformer",
    "SwinConfig",
    "HomographyEstimator",
    "EstimatorConfig",
]
