"""HEM homography estimator (the reference's OSNet / Ms_Transformer), Flax/NHWC.

Parity target: HEM/model/net.py:697-1016 with the shipped "HomoGAN" config:
* `fea_extra`: shared 3-conv (1->4->8->1, BN+ReLU) feature extractor (:759-775)
* h_net = SwinTransformer -> 8 basis weights; flow = sum_k w_k * basis_k
  (:806-815), run forward and backward by swapping the inputs
* `FlowMaskEstimator` (DenseNet-style concat growth, channels 8,16,32,16,8 ->
  sigmoid 1ch) on (feat1, warp(feat2)) pairs (:635-694, :817-822)
* mask_fusion = clamp(warp(mask_b, flow_f), 0, 1) * mask_f, then global
  min/absmax normalization (:824-830)
* eval branch: flows bilinear-upsampled to full res with magnitude rescale,
  masks nearest-upsampled, fusion recomputed at full res (:955-984)

The train/eval output resolutions differ, so the full-res branch lives in
`upsample_outputs` as a separate pure function - two static-shape jit
programs instead of the reference's in-graph branch (SURVEY.md hard parts).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from dmhomo_tpu.geometry.basis import gen_homography_basis
from dmhomo_tpu.geometry.warp import resize_nearest, upsample_flow_to, warp_by_flow
from dmhomo_tpu.models.swin import SwinConfig, SwinTransformer


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    crop_size: tuple = (320, 576)
    ori_size: tuple = (360, 640)
    in_channels: int = 2
    num_basis: int = 8
    swin: SwinConfig = SwinConfig()
    dtype: jnp.dtype = jnp.float32
    # diagnostics-only (r4: config, not env vars — see SwinConfig):
    # skip the feature/mask warps (A/B probes; NOT the reference algorithm)
    ablate_warps: bool = False
    # skip the full-res FlowMaskEstimator heads (masks become ones) — the
    # step-time decomposition probe's lever for the mask path's share
    # (scripts/hem_step_probe.py --ablate-mask); NOT the reference
    ablate_mask: bool = False
    # mask-head formulation: 'concat' materializes the reference's DenseNet
    # concat growth (bf16[B,320,576,82] & friends are the step's largest
    # HBM allocations); 'split' computes conv(concat(ys)) as a sum of
    # sliced-kernel convs — same params, same math, no concats in HBM.
    # MEASURED NEGATIVE on chip (r5, BENCH.md lever sweep): 16.0 vs 19.5
    # pairs/s — each group is re-read by every later conv, which costs
    # more than the one-off concat writes.  'concat' stays the default;
    # 'split' kept as the documented-negative A/B lever.
    mask_impl: str = "concat"
    # bilinear warp formulation: None = 'matmul'; 'gather' = oracle
    warp_method: Optional[str] = None


class SharedFeatureExtractor(nn.Module):
    """1 -> 4 -> 8 -> 1 conv+BN+ReLU stack (ref feature_extractor :759-775)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate([4, 8, 1]):
            x = nn.Conv(ch, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=jnp.float32, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class _SlicedConv(nn.Module):
    """A 3x3 conv over an IMPLICIT channel concat: same kernel/bias params
    as `nn.Conv(features, (3,3), name=...)` on the materialized concat, but
    applied as a sum of kernel-slice convs over the feature groups — the
    (B, H, W, sum_c) concat never exists.  fp32 partial accumulation, one
    cast at the end (== XLA's internal fp32 conv accumulation, modulo
    fp32-sum associativity across groups)."""

    features: int
    cin: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, groups):
        import jax

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        acc = None
        off = 0
        dn = jax.lax.conv_dimension_numbers(
            groups[0].shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        for g in groups:
            gc = g.shape[-1]
            # conv in the activation dtype (fp32 MXU accumulation is
            # internal); partials summed in fp32 — one bf16 rounding per
            # group instead of the concat path's single one, ~1e-2 rel
            y = jax.lax.conv_general_dilated(
                g.astype(self.dtype),
                kernel[:, :, off:off + gc, :].astype(self.dtype),
                (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            ).astype(jnp.float32)
            acc = y if acc is None else acc + y
            off += gc
        assert off == self.cin, (off, self.cin)
        return (acc + bias).astype(self.dtype)


class FlowMaskEstimator(nn.Module):
    """DenseNet-style concat-growth mask head (ref :635-694).

    impl='split' (TPU default via EstimatorConfig.mask_impl) computes each
    conv directly on the list of feature groups with sliced kernels: the
    82/74/58-channel full-res concats — the HEM step's largest HBM
    allocations — are never materialized, and every group is read once
    per consumer instead of being re-copied into each later concat.
    Identical param tree; equivalence tested in tests/test_models.py."""

    f_channels: Sequence[int] = (8, 16, 32, 16, 8)
    dtype: jnp.dtype = jnp.float32
    impl: str = "concat"

    @nn.compact
    def __call__(self, x):
        if self.impl == "split":
            groups = [x]  # newest-first, matching concat([y, x])
            cin = x.shape[-1]
            for i, ch in enumerate(self.f_channels):
                y = _SlicedConv(ch, cin, self.dtype, name=f"conv{i + 1}")(groups)
                groups.insert(0, nn.leaky_relu(y, 0.1))
                cin += ch
            out = _SlicedConv(1, cin, self.dtype, name="conv_last")(groups)
            return nn.sigmoid(out.astype(jnp.float32))

        for i, ch in enumerate(self.f_channels):
            y = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i + 1}")(x)
            y = nn.leaky_relu(y, 0.1)
            x = jnp.concatenate([y, x], axis=-1)
        # conv in the activation dtype (upcasting the 82-ch concat to fp32
        # costs ~3 GB of backward HBM at bs=32); the 1-ch logit goes fp32
        out = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="conv_last")(x)
        return nn.sigmoid(out.astype(jnp.float32))


def _normalize_fusion(mask_fusion: jnp.ndarray) -> jnp.ndarray:
    """Global (whole-tensor) min / absmax normalization (ref :828-830)."""
    mn = jnp.min(mask_fusion)
    mx = jnp.max(jnp.abs(mask_fusion))
    return (mask_fusion - mn) / mx


class HomographyEstimator(nn.Module):
    """Forward+backward homography flows and uncertainty masks.

    Input: imgs_gray_patch (B, hp, wp, 2) - normalized grayscale pair.
    Returns a dict of patch-resolution outputs (training view); use
    `upsample_outputs` for the full-resolution eval view.
    """

    config: EstimatorConfig = EstimatorConfig()

    @nn.compact
    def __call__(self, imgs_gray_patch, train: bool = False):
        cfg = self.config
        B, hp, wp, _ = imgs_gray_patch.shape
        img1 = imgs_gray_patch[..., :1]
        img2 = imgs_gray_patch[..., 1:2]

        basis = jnp.asarray(
            gen_homography_basis(cfg.crop_size[0], cfg.crop_size[1]).reshape(
                1, cfg.num_basis, -1
            )
        )

        fea = SharedFeatureExtractor(cfg.dtype, name="fea_extra")
        f1 = fea(img1, train)
        f2 = fea(img2, train)

        h_net = SwinTransformer(cfg.swin, name="h_net")
        w_f = h_net(jnp.concatenate([f1, f2], axis=-1), train)  # (B, 8, 1)
        w_b = h_net(jnp.concatenate([f2, f1], axis=-1), train)

        flow_f = jnp.einsum("bko,okn->bn", w_f, basis).reshape(B, hp, wp, 2)
        flow_b = jnp.einsum("bko,okn->bn", w_b, basis).reshape(B, hp, wp, 2)

        # feature/mask warps run in the activation dtype (bf16 configs hit
        # the fast matmul-warp path; fp32 configs stay exact for parity)
        if cfg.ablate_warps:  # diagnostics only, NOT the reference
            f2_warp, f1_warp = f2.astype(cfg.dtype), f1.astype(cfg.dtype)
        else:
            f2_warp = warp_by_flow(f2.astype(cfg.dtype), flow_f,
                                   mode="collapse", method=cfg.warp_method)
            f1_warp = warp_by_flow(f1.astype(cfg.dtype), flow_b,
                                   mode="collapse", method=cfg.warp_method)

        if cfg.ablate_mask:  # diagnostics only, NOT the reference
            mask_f = jnp.ones((B, hp, wp, 1), jnp.float32)
            mask_b = jnp.ones((B, hp, wp, 1), jnp.float32)
        else:
            MaskNet = (nn.remat(FlowMaskEstimator) if cfg.swin.remat
                       else FlowMaskEstimator)
            mask_net = MaskNet(dtype=cfg.dtype, impl=cfg.mask_impl,
                               name="mask_generator")
            mask_f = mask_net(
                jnp.concatenate([f1.astype(cfg.dtype), f2_warp], axis=-1))
            mask_b = mask_net(
                jnp.concatenate([f2.astype(cfg.dtype), f1_warp], axis=-1))

        if cfg.ablate_warps:  # diagnostics only, NOT the reference
            mask_b_warp = jnp.clip(mask_b.astype(cfg.dtype), 0.0, 1.0)
        else:
            mask_b_warp = jnp.clip(
                warp_by_flow(mask_b.astype(cfg.dtype), flow_f,
                             mode="collapse", method=cfg.warp_method),
                0.0, 1.0,
            )
        mask_fusion = _normalize_fusion(mask_b_warp * mask_f)

        return {
            "flow_f": flow_f,
            "flow_b": flow_b,
            "mask_f": mask_f,
            "mask_b": mask_b,
            "mask_fusion": mask_fusion,
            "weight_f": w_f,
            "weight_b": w_b,
            "fil_features": {
                "img1_patch_fea": f1,
                "img2_patch_fea": f2,
                "img1_patch_fea_warp": f1_warp,
                "img2_patch_fea_warp": f2_warp,
            },
        }


def upsample_outputs(outputs: dict, full_hw) -> dict:
    """Eval-resolution view of the estimator outputs (ref :955-984).

    Flows are bilinear-upsampled with magnitude rescale; masks nearest;
    fusion recomputed and renormalized at full resolution.
    """
    flow_f = upsample_flow_to(outputs["flow_f"], full_hw, scale=True)
    flow_b = upsample_flow_to(outputs["flow_b"], full_hw, scale=True)
    mask_f = resize_nearest(outputs["mask_f"], full_hw)
    mask_b = resize_nearest(outputs["mask_b"], full_hw)
    mask_b_warp = jnp.clip(warp_by_flow(mask_b, flow_f, mode="collapse"), 0.0, 1.0)
    mask_fusion = _normalize_fusion(mask_b_warp * mask_f)
    return {
        **outputs,
        "flow_f": flow_f,
        "flow_b": flow_b,
        "mask_f": mask_f,
        "mask_b": mask_b,
        "mask_fusion": mask_fusion,
    }
