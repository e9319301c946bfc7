"""Training infrastructure: EMA, configs, DGM and HEM trainers."""

from dmhomo_tpu.train.ema import EMAState, ema_init, ema_update
from dmhomo_tpu.train.config import DGMTrainConfig, HEMTrainConfig, Params

__all__ = [
    "EMAState",
    "ema_init",
    "ema_update",
    "DGMTrainConfig",
    "HEMTrainConfig",
    "Params",
]
