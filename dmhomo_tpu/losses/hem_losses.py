"""HEM loss suite (parity target: HEM/loss/losses.py).

* `nll_laplace` - Laplace negative log likelihood with the mask-as-log-variance
  convention: loss = sqrt(2) * exp(-0.5 lv) * |dflow| + 0.5 lv, masked mean
  with NaN/Inf guard (losses.py:51-111).  The estimator's (1 - mask) feeds lv
  (losses.py:150-152).
* `mask_bce_loss` - BCE of the mask against the vertical-gradient target;
  with the shipped weight=(1,1) the target is constant 0 (losses.py:30-48).
* `compute_losses` - total = sup * L1(mask*flow, mask*flow_gt)
  + mask_reg * mask_bce + unsup * L1(mask*feat, mask*warped feat)
  + nll * NLLLaplace, both directions (losses.py:122-163).
  Stage-1 config: only nll active; stage-2 adds sup (params.json).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossWeights:
    sup: float = 0.0
    unsup: float = 0.0
    mask_reg: float = 0.0
    nll: float = 1.0
    normalize_mask: bool = False  # swap masks for mask_fusion (losses.py:129-131)


def nll_laplace(gt_flow, est_flow, log_var, mask=None):
    """Masked-mean Laplace NLL.

    gt_flow/est_flow: (B, H, W, 2); log_var: (B, H, W, 1); mask optional bool.
    """
    loss = math.sqrt(2.0) * jnp.exp(-0.5 * log_var) * jnp.abs(gt_flow - est_flow)
    loss = loss + 0.5 * log_var
    valid = jnp.isfinite(loss)
    if mask is not None:
        valid = valid & mask
    total = jnp.sum(jnp.where(valid, loss, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count


def mask_bce_loss(mask, weight=(1.0, 1.0), eps=1e-7):
    """BCE of mask vs a vertical linear-gradient target (losses.py:30-48).

    With the default weight the target is identically zero, which reduces to
    -mean(log(1 - mask)); kept general for parity.
    """
    B, H, W, _ = mask.shape
    interval = weight[1] - weight[0]
    target = interval * jnp.arange(H, dtype=jnp.float32) / H + weight[0] - 1.0
    target = jnp.broadcast_to(target[None, :, None, None], mask.shape)
    m = jnp.clip(mask, eps, 1.0 - eps)
    bce = -(target * jnp.log(m) + (1.0 - target) * jnp.log(1.0 - m))
    return bce.mean()


def _l1(a, b):
    return jnp.abs(a - b).mean()


def compute_losses(batch: dict, outputs: dict, weights: LossWeights) -> dict:
    """Total HEM loss from a train batch + estimator outputs.

    batch['flow_gt_patch']: (B, H, W, 4) - backward 2ch then forward 2ch
    (matching the reference channel order, data_loader.py:203-204).
    """
    flow_gt = batch["flow_gt_patch"]
    flow_b_gt, flow_f_gt = flow_gt[..., :2], flow_gt[..., 2:]
    flow_b, flow_f = outputs["flow_b"], outputs["flow_f"]
    mask_b, mask_f = outputs["mask_b"], outputs["mask_f"]
    if weights.normalize_mask:
        mask_b = mask_f = outputs["mask_fusion"]
    feats = outputs["fil_features"]

    loss = {}
    loss["unsup"] = weights.unsup * (
        _l1(mask_f * feats["img1_patch_fea"], mask_f * feats["img2_patch_fea_warp"])
        + _l1(mask_b * feats["img2_patch_fea"], mask_b * feats["img1_patch_fea_warp"])
    )
    loss["mask_reg"] = weights.mask_reg * (mask_bce_loss(mask_b) + mask_bce_loss(mask_f))
    loss["nll"] = weights.nll * (
        nll_laplace(flow_f_gt, flow_f, 1.0 - mask_f)
        + nll_laplace(flow_b_gt, flow_b, 1.0 - mask_b)
    )
    loss["supervise"] = weights.sup * (
        _l1(mask_b * flow_b, mask_b * flow_b_gt) + _l1(mask_f * flow_f, mask_f * flow_f_gt)
    )
    loss["total"] = loss["supervise"] + loss["mask_reg"] + loss["unsup"] + loss["nll"]
    return loss
