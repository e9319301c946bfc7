"""Typed configs for both trainers + a params.json-compatible loader.

The reference splits configuration between hardcoded literals (DGM/demo.py)
and a JSON->attr-dict (`Params`, HEM/common/utils.py:12-39) merged with
argparse.  Here both modules share typed dataclasses; `Params` keeps
reading the reference's params.json files unchanged so HEM experiment dirs
carry over.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence, Union

from dmhomo_tpu.diffusion import DiffusionConfig
from dmhomo_tpu.losses import LossWeights
from dmhomo_tpu.models import EstimatorConfig, SwinConfig, UNetConfig


class Params:
    """JSON -> attribute object, update()-able (HEM/common/utils.py parity)."""

    def __init__(self, json_path: Optional[str] = None, **kwargs):
        if json_path:
            with open(json_path) as f:
                self.__dict__.update(json.load(f))
        self.__dict__.update(kwargs)

    def update(self, other: dict):
        self.__dict__.update(other)

    def save(self, json_path: str):
        with open(json_path, "w") as f:
            json.dump(self.__dict__, f, indent=4)

    @property
    def dict(self):
        return self.__dict__

    def __repr__(self):
        return f"Params({self.__dict__})"


@dataclasses.dataclass(frozen=True)
class DGMTrainConfig:
    """DGM diffusion training (reference: DGM/demo.py:15-52)."""

    unet: UNetConfig = UNetConfig(dim=64, num_classes=5)
    diffusion: DiffusionConfig = DiffusionConfig(
        image_size=256, timesteps=1000, sampling_timesteps=32,
        objective="pred_x0", loss_type="l1",
    )
    train_batch_size: int = 128  # global
    lr: float = 5e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.99
    train_num_steps: int = 112_500  # 450k pairs x 32 epochs / bs 128
    gradient_accumulate_every: int = 1
    grad_clip_norm: float = 1.0
    ema_beta: float = 0.995
    ema_update_every: int = 10
    save_every: int = 500
    sample_every: int = 1000
    results_dir: str = "results"
    seed: int = 0
    bf16: bool = True  # compute dtype on TPU (params stay fp32)
    # shard params/Adam moments/EMA channel-wise over the mesh's 'model'
    # axis (parallel/tp.py); no-op on a model-axis-1 mesh
    shard_params: bool = False


@dataclasses.dataclass(frozen=True)
class HEMTrainConfig:
    """HEM estimator training (reference: HEM/experiments/params.json)."""

    estimator: EstimatorConfig = EstimatorConfig()
    loss: LossWeights = LossWeights(sup=0.0, unsup=0.0, mask_reg=0.0, nll=1.0)
    lr: float = 1e-4
    gamma: float = 0.8  # ExponentialLR per-epoch decay
    train_batch_size: int = 32  # global
    eval_batch_size: int = 32
    num_epochs: int = 10
    train_num_steps: int = 2000  # eval cadence
    rho: int = 16
    major_metric: str = "AVG"
    model_dir: str = "experiments/hem"
    seed: int = 0
    # TPU training knobs (the reference trains fp32 on GPUs): bf16
    # activations (params/norm stats stay fp32) and SwinBlock remat - the
    # full-config fp32 bs=32 backward wants 84 GB HBM without them (BENCH.md).
    # remat 'auto': OFF when the fused Pallas window attention is active and
    # grad_accum >= 4 — the kernel keeps the (Bn,h,N,N) logits in VMEM and
    # accumulation shrinks the per-microbatch working set, so the saved
    # activations fit and skipping the per-block forward recompute is a
    # measured +19% step throughput (BENCH.md r4: 1.96 -> 1.65 s/step);
    # ON otherwise (the XLA einsum path's logits do not fit un-remat'ed).
    bf16: bool = True
    remat: Union[bool, str] = "auto"
    # microbatch gradient accumulation inside the jitted step (lax.scan):
    # same update as one bs=train_batch_size step, 1/grad_accum the
    # activation memory (BN stats run per microbatch, like the reference's
    # per-rank unsynced BN under DDP).  Default 4: microbatch 8 = exactly
    # the reference's per-rank BN batch (bs 32 / 4 GPUs), and peak HBM
    # temp drops 14.4 -> 9.8 GiB, below the memory-pressure regime where
    # XLA auto-remats on top of the explicit SwinBlock remat (BENCH.md
    # AOT table + its loop-body caveat).  Clamped to the per-device batch.
    grad_accum: int = 4
    # window-attention implementation: 'auto' resolves to the fused Pallas
    # kernel ('pallas', ops/window_attention.py - the (Bn,h,64,64) logits
    # never touch HBM, 1.9-2x fwd+bwd at the shipped level shapes,
    # BENCH.md) on accelerator backends and to 'xla' on CPU (where the
    # kernel would run interpret-mode); 'xla'/'pallas'/'fused_block' force
    # the choice; None keeps whatever `estimator.swin.attn_impl` says.
    attn_impl: Optional[str] = "auto"

    @staticmethod
    def stage2(**overrides) -> "HEMTrainConfig":
        """Stage-2: + mask-weighted supervised L1 (stage2/params.json)."""
        base = dict(loss=LossWeights(sup=1.0, nll=1.0))
        base.update(overrides)
        return HEMTrainConfig(**base)

    @classmethod
    def from_params(cls, params: Params, **overrides) -> "HEMTrainConfig":
        """Build from a reference-format params.json."""
        p = params.dict
        swin = SwinConfig(
            crop_size=tuple(p.get("crop_size", (320, 576))),
            patch_size=p.get("patch_size", 4),
            in_chans=p.get("in_chans", 2),
            num_basis=p.get("num_basis", 8),
            embed_dim=p.get("embed_dim", 24),
            depths=tuple(p.get("depths", (2, 4, 6))),
            layer_depth=tuple(p.get("layer_depth", (3, 2, 1))),
            num_heads=tuple(p.get("num_heads", (3, 12, 24))),
            window_size=p.get("window_size", 8),
            mlp_ratio=p.get("mlp_ratio", 3),
            qkv_bias=p.get("qkv_bias", True),
        )
        est = EstimatorConfig(
            crop_size=tuple(p.get("crop_size", (320, 576))),
            ori_size=tuple(p.get("ori_size", (360, 640))),
            in_channels=p.get("in_channels", 2),
            num_basis=p.get("num_basis", 8),
            swin=swin,
        )
        loss = LossWeights(
            sup=p.get("sup_loss_weight", 0.0),
            unsup=p.get("unsup_loss_weight", 0.0),
            mask_reg=p.get("mask_reg_loss_weight", 0.0),
            nll=p.get("mask_nll_loss_weight", 1.0),
            normalize_mask=p.get("normalize_mask", False),
        )
        kw = dict(
            estimator=est,
            loss=loss,
            lr=p.get("learning_rate", 1e-4),
            gamma=p.get("gamma", 0.8),
            train_batch_size=p.get("train_batch_size", 32),
            eval_batch_size=p.get("eval_batch_size", 32),
            num_epochs=p.get("num_epochs", 10),
            train_num_steps=p.get("train_num_steps", 2000),
            rho=p.get("rho", 16),
            major_metric=p.get("major_metric", "AVG"),
        )
        kw.update(overrides)
        return cls(**kw)
