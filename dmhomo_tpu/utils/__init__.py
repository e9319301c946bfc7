"""Shared utilities: checkpointing, logging, meters."""

from dmhomo_tpu.utils.checkpoint import save_checkpoint, load_checkpoint, latest_step
from dmhomo_tpu.utils.constructor import NetConstructor, model_constructor
from dmhomo_tpu.utils.meters import AverageMeter, MetricTracker
from dmhomo_tpu.utils.logging import get_logger
from dmhomo_tpu.utils.platform import enable_persistent_compile_cache

__all__ = [
    "NetConstructor",
    "model_constructor",
    "save_checkpoint",
    "load_checkpoint",
    "latest_step",
    "AverageMeter",
    "MetricTracker",
    "get_logger",
    "enable_persistent_compile_cache",
]
