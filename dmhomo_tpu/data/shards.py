"""Generated-trainset shard IO.

Format parity with the reference so shards interoperate both ways:
* a generation shard is an .npy holding a list of dicts, each
  {"imgs": (N, 6, 256, 256) uint8, "homos": (N, 3, 3) float}
  (`saveTrainPair` + dgm_sample.py:73-77; note CHW uint8 inside).
* per-sample files are {"img12": (6, 256, 256) uint8, "homo12": (3, 3)}
  (generate_nyps_to_single_case.py:24-39).

Shard filenames follow the reference pattern
`idx_{i}_rank_{r}_part_{p}_dm_cahomo_{n}k.npy`.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np


def shard_filename(idx: int, rank: int, part: int, n_samples: int) -> str:
    return f"idx_{idx}_rank_{rank}_part_{part}_dm_cahomo_{n_samples / 1000}k.npy"


def save_generation_shard(path: str, batches: Sequence[dict]) -> None:
    """batches: list of {"imgs": (N,6,S,S) uint8, "homos": (N,3,3)}."""
    for b in batches:
        imgs, homos = b["imgs"], b["homos"]
        assert imgs.dtype == np.uint8 and imgs.shape[1] == 6, imgs.shape
        assert homos.shape[-2:] == (3, 3), homos.shape
    np.save(path, np.asarray(batches, dtype=object), allow_pickle=True)


def load_generation_shard(path: str) -> List[dict]:
    data = np.load(path, allow_pickle=True)
    return list(data)


def explode_shards_to_samples(
    shard_paths: Sequence[str], out_dir: str, start_index: int = 0
) -> int:
    """Explode shards into per-sample npys; returns the next free index."""
    os.makedirs(out_dir, exist_ok=True)
    idx = start_index
    for sp in shard_paths:
        for batch in load_generation_shard(sp):
            imgs, homos = batch["imgs"], batch["homos"]
            for i in range(imgs.shape[0]):
                np.save(
                    os.path.join(out_dir, f"{idx}.npy"),
                    {"img12": imgs[i], "homo12": np.asarray(homos[i])},
                    allow_pickle=True,
                )
                idx += 1
    return idx


def load_sample(path: str) -> dict:
    return np.load(path, allow_pickle=True).item()
