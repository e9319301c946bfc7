"""Conditional denoising UNet (the DGM backbone), Flax/NHWC.

Parity target: `Unet` in classifier_free_guidance.py:302-466 with the shipped
config dim=64, dim_mults=(1,2,4,8), channels=6 (+3 condition channels -> 9 in),
num_classes 5 (train) / 1 (sample):

* WeightStandardizedConv + GroupNorm(8) + scale-shift ResnetBlocks (:196-241)
* LinearAttention (softmax-q/k efficient attention, heads=4 dh=32, :244-270)
  on every resolution, full Attention at the bottleneck (:273-296)
* sinusoidal time MLP (:159-172, :353) and class embedding with a learned
  null embedding for classifier-free guidance (:357-362, :419-425)
* init 7x7 conv, 4 down stages (conv4x4 s2), mid, 4 up stages
  (nearest-up + conv3x3), final ResnetBlock over concat(x, r) (:400-466)

TPU notes: NHWC layout end-to-end; `dtype` selects the compute/activation
dtype (bf16 for training throughput) while parameters stay fp32; weight
standardization runs in fp32 regardless (its eps depends on it, :121).
The per-sample null-class selection is a `jnp.where` on a (B,) bool
``keep_mask`` so CFG's cond/null pair can run as one doubled batch.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    dim: int = 64
    num_classes: int = 5
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 6
    cond_channels: int = 3
    resnet_block_groups: int = 8
    attn_heads: int = 4
    attn_dim_head: int = 32
    dtype: jnp.dtype = jnp.float32
    # use the block-diagonal fused linear attention (TPU-tuned pure-XLA,
    # runs and differentiates on every backend); False selects the naive
    # per-head jnp formulation (the parity oracle)
    fused_attention: bool = True
    # rematerialize each ResnetBlock/attention in the backward pass - trades
    # ~30% step FLOPs for activation memory (the reference burns ~300 GB for
    # global bs=128; remat makes per-chip microbatches fit 16 GB HBM)
    remat: bool = False
    # feed the up-path skip connections as SECOND conv operands instead of
    # materializing the (B, H, W, 2C) concats: conv(cat(a, b), K) ==
    # conv(a, K[:, :, :C1]) + conv(b, K[:, :, C1:]) (kernel standardization
    # runs on the full kernel first, so the math is exact and the param
    # tree identical).  Perf knob - flip per AOT/on-chip measurement.
    split_skip_convs: bool = False


class WeightStandardizedConv(nn.Module):
    """Conv2d with per-output-channel weight standardization (eps 1e-5 fp32)."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: str | Sequence = "SAME"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x2=None):
        """``x2`` (optional): second input whose channels extend x's - the
        conv behaves exactly as if applied to concat(x, x2) on the channel
        axis, but the concat is never materialized (the kernel is split
        after standardization, which runs on the full kernel)."""
        in_ch = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, in_ch, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        # standardize in fp32 over (kh, kw, in) per output channel
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        var = kernel.var(axis=(0, 1, 2), keepdims=True)  # biased, like torch.var(unbiased=False)
        kernel = (kernel - mean) * jax.lax.rsqrt(var + 1e-5)

        def conv(inp, k):
            return jax.lax.conv_general_dilated(
                inp.astype(self.dtype),
                k.astype(self.dtype),
                window_strides=self.strides,
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if x2 is None:
            y = conv(x, kernel)
        else:
            C1 = x.shape[-1]
            y = conv(x, kernel[:, :, :C1]) + conv(x2, kernel[:, :, C1:])
        return y + bias.astype(self.dtype)


class ChannelLayerNorm(nn.Module):
    """Per-position LayerNorm over channels, learned gain only (ref :131-141).

    ``return_stats=True`` skips materializing the normalized tensor and
    returns (mean, rstd, gain) instead, so a downstream matmul can fold
    the normalization into its epilogue:
        LN(x) @ W  ==  rstd * (x @ (diag(g) W)  -  mean * (g @ W))
    (exact in reals; the correction runs in fp32 on the MXU's fp32
    accumulator, so it is also numerically sound)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_stats: bool = False):
        g = self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = xf.var(axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + 1e-5)
        if return_stats:
            return mean, rstd, g
        out = (xf - mean) * rstd * g
        return out.astype(self.dtype)


class SinusoidalPosEmb(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        freqs = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / (half - 1)))
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class Block(nn.Module):
    """WSConv3x3 -> GroupNorm(8) -> (scale-shift) -> SiLU."""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None, skip=None):
        x = WeightStandardizedConv(self.dim_out, (3, 3), dtype=self.dtype, name="proj")(x, skip)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        )
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x).astype(self.dtype)


class SplitConv1x1(nn.Module):
    """1x1 conv over the virtual concat(x, x2) without materializing it.
    Parameter names/shapes identical to nn.Conv."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x2):
        in_total = x.shape[-1] + x2.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, in_total, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        C1 = x.shape[-1]
        k = kernel.astype(self.dtype)

        def conv(inp, kk):
            return jax.lax.conv_general_dilated(
                inp.astype(self.dtype), kk, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        return conv(x, k[:, :, :C1]) + conv(x2, k[:, :, C1:]) + bias.astype(self.dtype)


class ResnetBlock(nn.Module):
    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond_emb=None, skip=None):
        """``skip`` (optional): the up-path skip tensor; the block behaves
        exactly as if called on concat(x, skip) but both consumers (the
        block1 WSConv and res_conv) take it as a split second operand, so
        the (B, H, W, C+Cs) concat never hits HBM."""
        scale_shift = None
        if cond_emb is not None:
            h = nn.silu(cond_emb)
            h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="mlp")(h)
            h = h[:, None, None, :]
            scale_shift = jnp.split(h, 2, axis=-1)

        h = Block(self.dim_out, self.groups, self.dtype, name="block1")(x, scale_shift, skip)
        h = Block(self.dim_out, self.groups, self.dtype, name="block2")(h)
        in_total = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        if skip is not None:
            if in_total != self.dim_out:
                x = SplitConv1x1(self.dim_out, self.dtype, name="res_conv")(x, skip)
            else:
                x = jnp.concatenate([x, skip], axis=-1)
        elif in_total != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="res_conv")(x)
        return h + x


class _ConvKernel(nn.Module):
    """Bare conv-kernel parameter holder (keeps the to_qkv/kernel tree path
    of nn.Conv so torch importers stay oblivious to the fused attention)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32)


class LinearAttention(nn.Module):
    """Efficient attention: softmax(q over d) . (softmax(k over n) v^T).

    The per-head softmaxes + contractions run through the block-diagonal
    XLA formulation (dmhomo_tpu.ops.linear_attention) - full 128-lane
    tensors, MXU matmuls for the per-head structure, native autodiff.
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32
    fused: bool = True

    @nn.compact
    def __call__(self, x, prenorm=None):
        from dmhomo_tpu.ops.linear_attention import (
            _ref_linear_attention,
            fused_linear_attention,
        )

        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        w_qkv = _ConvKernel((1, 1, C, hidden * 3), name="to_qkv")().reshape(C, hidden * 3)

        xf = x.reshape(B, H * W, C)
        if self.fused:
            pn = None
            if prenorm is not None:
                mean, rstd, g = prenorm
                pn = (mean.reshape(B, H * W, 1), rstd.reshape(B, H * W, 1), g)
            out = fused_linear_attention(xf, w_qkv, self.heads, self.dim_head, prenorm=pn)
        else:
            out = _ref_linear_attention(xf, w_qkv, self.heads, self.dim_head)
        # reference normalizes v by (h*w) == N
        out = out.reshape(B, H, W, hidden)
        out = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)
        return ChannelLayerNorm(self.dim, self.dtype, name="out_norm")(out)


class Attention(nn.Module):
    """Full softmax attention over all H*W tokens (bottleneck only)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q * (self.dim_head**-0.5)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v)
        out = out.reshape(B, H, W, hidden)
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)


class NearestUpConv(nn.Module):
    """nearest x2 upsample + conv3x3, fused into ONE lhs-dilated conv.

    `repeat(x, 2x2) -> conv3x3(SAME)` is algebraically a stride-2 transposed
    conv whose 4x4 kernel is the separable per-axis expansion
    [w0, w0+w1, w1+w2, w2] of the 3x3 kernel - so the 4x-size nearest-up
    intermediate never touches HBM (measured 2.05x on v5e, BENCH.md).
    Parameters stay the reference (3,3,in,out) kernel + bias, so torch
    importers and checkpoints are unchanged (ref Upsample, :106-107)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, in_ch, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        def expand(w, axis):
            w0, w1, w2 = jnp.take(w, 0, axis), jnp.take(w, 1, axis), jnp.take(w, 2, axis)
            return jnp.stack([w0, w0 + w1, w1 + w2, w2], axis=axis)

        w4 = expand(expand(kernel.astype(self.dtype), 0), 1)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w4, (1, 1), padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class PreNormResidual(nn.Module):
    dim: int
    inner: nn.Module
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm = ChannelLayerNorm(self.dim, self.dtype, name="norm")
        if isinstance(self.inner, LinearAttention) and self.inner.fused:
            # fold the pre-norm into the inner qkv projection (stats only;
            # the normalized tensor never hits HBM - see ChannelLayerNorm)
            return self.inner(x, prenorm=norm(x, return_stats=True)) + x
        return self.inner(norm(x)) + x


class ConditionalUNet(nn.Module):
    """The DGM denoiser.  Input x (B,H,W,6) + rgb_flow*mask condition."""

    config: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(self, x, time, classes, rgb_flow, mask, keep_mask, train: bool = False):
        cfg = self.config
        dt = cfg.dtype
        dim = cfg.dim
        time_dim = dim * 4
        classes_dim = dim * 4

        # class conditioning with learned null embedding (CFG)
        classes_emb = nn.Embed(cfg.num_classes, dim, name="classes_emb")(classes)
        null_emb = self.param("null_classes_emb", nn.initializers.normal(1.0), (dim,))
        classes_emb = jnp.where(keep_mask[:, None], classes_emb, null_emb[None, :])
        c = nn.Dense(classes_dim, name="classes_mlp_0")(classes_emb)
        c = nn.gelu(c, approximate=False)
        c = nn.Dense(classes_dim, name="classes_mlp_1")(c)

        # time conditioning
        t = SinusoidalPosEmb(dim, name="sinu_pos_emb")(time)
        t = nn.Dense(time_dim, name="time_mlp_0")(t)
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(time_dim, name="time_mlp_1")(t)

        cond = jnp.concatenate([t, c], axis=-1).astype(dt)

        # condition concat: (x, rgb_flow * mask) -> 9 channels (ref :430);
        # operands cast BEFORE the concat so the 9-ch buffer (and the
        # CFG-doubled x) is written once in the activation dtype, not fp32
        x = jnp.concatenate([x.astype(dt), (rgb_flow * mask).astype(dt)], axis=-1)
        x = nn.Conv(dim, (7, 7), padding=3, dtype=dt, name="init_conv")(x)
        r = x

        dims = [dim] + [dim * m for m in cfg.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)
        groups = cfg.resnet_block_groups

        # optional per-block rematerialization (UNetConfig.remat)
        Res = nn.remat(ResnetBlock) if cfg.remat else ResnetBlock
        Wrap = nn.remat(PreNormResidual) if cfg.remat else PreNormResidual

        hs = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= num_res - 1
            x = Res(dim_in, groups, dt, name=f"down_{i}_block1")(x, cond)
            hs.append(x)
            x = Res(dim_in, groups, dt, name=f"down_{i}_block2")(x, cond)
            x = Wrap(
                dim_in,
                LinearAttention(dim_in, cfg.attn_heads, cfg.attn_dim_head, dt, cfg.fused_attention, name=f"down_{i}_attn"),
                dtype=dt,
                name=f"down_{i}_attn_wrap",
            )(x)
            hs.append(x)
            if not is_last:
                # conv 4x4 stride 2 pad 1 (ref Downsample :110-111)
                x = nn.Conv(dim_out, (4, 4), strides=(2, 2), padding=1, dtype=dt,
                            name=f"down_{i}_downsample")(x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding=1, dtype=dt, name=f"down_{i}_downsample")(x)

        mid_dim = dims[-1]
        x = Res(mid_dim, groups, dt, name="mid_block1")(x, cond)
        x = Wrap(
            mid_dim,
            Attention(mid_dim, cfg.attn_heads, cfg.attn_dim_head, dt, name="mid_attn"),
            dtype=dt,
            name="mid_attn_wrap",
        )(x)
        x = Res(mid_dim, groups, dt, name="mid_block2")(x, cond)

        split = cfg.split_skip_convs
        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i == len(in_out) - 1
            if split:
                x = Res(dim_out, groups, dt, name=f"up_{i}_block1")(x, cond, skip=hs.pop())
                x = Res(dim_out, groups, dt, name=f"up_{i}_block2")(x, cond, skip=hs.pop())
            else:
                x = jnp.concatenate([x, hs.pop()], axis=-1)
                x = Res(dim_out, groups, dt, name=f"up_{i}_block1")(x, cond)
                x = jnp.concatenate([x, hs.pop()], axis=-1)
                x = Res(dim_out, groups, dt, name=f"up_{i}_block2")(x, cond)
            x = Wrap(
                dim_out,
                LinearAttention(dim_out, cfg.attn_heads, cfg.attn_dim_head, dt, cfg.fused_attention, name=f"up_{i}_attn"),
                dtype=dt,
                name=f"up_{i}_attn_wrap",
            )(x)
            if not is_last:
                # nearest x2 upsample + conv3x3 (ref Upsample :106-107),
                # fused into one lhs-dilated conv (NearestUpConv)
                x = NearestUpConv(dim_in, dtype=dt, name=f"up_{i}_upsample")(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding=1, dtype=dt, name=f"up_{i}_upsample")(x)

        if split:
            x = Res(dim, groups, dt, name="final_res_block")(x, cond, skip=r)
        else:
            x = jnp.concatenate([x, r], axis=-1)
            x = Res(dim, groups, dt, name="final_res_block")(x, cond)
        out = nn.Conv(cfg.channels, (1, 1), dtype=jnp.float32, name="final_conv")(
            x.astype(jnp.float32)
        )
        return out


def make_unet_apply(model: ConditionalUNet):
    """Adapter to the GaussianDiffusion model_fn signature."""

    def apply_fn(params, x, t, classes, rgb_flow, mask, keep_mask, train=False, rngs=None):
        return model.apply(
            {"params": params}, x, t, classes, rgb_flow, mask, keep_mask, train=train
        )

    return apply_fn
