"""Host-side data pipeline: DGM conditions, generated-shard IO, HEM datasets."""

from dmhomo_tpu.data.conditions import (
    TRAIN_CATEGORIES,
    build_condition,
    flow_to_rgb_np,
    morph_close_mask,
    pair_name_to_class,
    prefix2label,
)
from dmhomo_tpu.data.shards import (
    save_generation_shard,
    load_generation_shard,
    explode_shards_to_samples,
    load_sample,
)
from dmhomo_tpu.data.hem_data import (
    HEMTrainDataset,
    CAHomoTestDataset,
    SyntheticHomoPairs,
    MEAN_I,
    STD_I,
    device_build_patches,
)
from dmhomo_tpu.data.image_data import CifarDataset, GHOFTestDataset
from dmhomo_tpu.data.loader import DataLoader

__all__ = [
    "TRAIN_CATEGORIES",
    "build_condition",
    "pair_name_to_class",
    "prefix2label",
    "flow_to_rgb_np",
    "morph_close_mask",
    "save_generation_shard",
    "load_generation_shard",
    "explode_shards_to_samples",
    "load_sample",
    "HEMTrainDataset",
    "CAHomoTestDataset",
    "SyntheticHomoPairs",
    "MEAN_I",
    "STD_I",
    "DataLoader",
    "device_build_patches",
    "CifarDataset",
    "GHOFTestDataset",
]
