"""Unconditional UNet (the reference's lucidrains-baseline twin).

Parity target: `Unet` in denoising_diffusion_pytorch.py:315-520 - same block
vocabulary as the conditional UNet but:
* optional self-conditioning (input channels doubled, :345-350)
* Downsample via pixel-unshuffle rearrange + 1x1 conv (:110-113) instead of
  the conditional file's strided conv
* optional random/learned Fourier time embedding (:175-190)
* time-only conditioning in the ResnetBlocks (no class embedding)

Not wired into the shipped CLIs (the reference never trains it) but part of
the component inventory; also the home of self-conditioning support.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dmhomo_tpu.models.unet import (
    Attention,
    ChannelLayerNorm,
    LinearAttention,
    NearestUpConv,
    PreNormResidual,
    ResnetBlock,
    SinusoidalPosEmb,
)


@dataclasses.dataclass(frozen=True)
class UncondUNetConfig:
    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    self_condition: bool = False
    resnet_block_groups: int = 8
    learned_sinusoidal: bool = False
    random_fourier: bool = False
    learned_sinusoidal_dim: int = 16
    attn_heads: int = 4
    attn_dim_head: int = 32
    dtype: jnp.dtype = jnp.float32


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    dim: int
    random: bool = False  # random -> frozen weights (stop_gradient)

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,))
        if self.random:
            w = jax.lax.stop_gradient(w)
        freqs = t.astype(jnp.float32)[:, None] * w[None, :] * 2 * jnp.pi
        return jnp.concatenate(
            [t.astype(jnp.float32)[:, None], jnp.sin(freqs), jnp.cos(freqs)], axis=-1
        )


def _pixel_unshuffle_downsample(x, dim_out, dtype, name):
    """Rearrange 'b (h 2) (w 2) c -> b h w (c 4)' + 1x1 conv (ref :110-113)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(B, H // 2, W // 2, C * 4)
    return nn.Conv(dim_out, (1, 1), dtype=dtype, name=name)(x)


class UncondUNet(nn.Module):
    config: UncondUNetConfig = UncondUNetConfig()

    @nn.compact
    def __call__(self, x, time, x_self_cond: Optional[jnp.ndarray] = None, train: bool = False):
        cfg = self.config
        dt = cfg.dtype
        dim = cfg.dim
        time_dim = dim * 4

        if cfg.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        if cfg.learned_sinusoidal or cfg.random_fourier:
            t = RandomOrLearnedSinusoidalPosEmb(
                cfg.learned_sinusoidal_dim, cfg.random_fourier, name="sinu_pos_emb"
            )(time)
        else:
            t = SinusoidalPosEmb(dim, name="sinu_pos_emb")(time)
        t = nn.Dense(time_dim, name="time_mlp_0")(t)
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(time_dim, name="time_mlp_1")(t).astype(dt)

        x = nn.Conv(dim, (7, 7), padding=3, dtype=dt, name="init_conv")(x.astype(dt))
        r = x

        dims = [dim] + [dim * m for m in cfg.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        groups = cfg.resnet_block_groups
        hs = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= len(in_out) - 1
            x = ResnetBlock(dim_in, groups, dt, name=f"down_{i}_block1")(x, t)
            hs.append(x)
            x = ResnetBlock(dim_in, groups, dt, name=f"down_{i}_block2")(x, t)
            x = PreNormResidual(
                dim_in, LinearAttention(dim_in, cfg.attn_heads, cfg.attn_dim_head, dt,
                                        name=f"down_{i}_attn"),
                dtype=dt, name=f"down_{i}_attn_wrap",
            )(x)
            hs.append(x)
            if not is_last:
                x = _pixel_unshuffle_downsample(x, dim_out, dt, f"down_{i}_downsample")
            else:
                x = nn.Conv(dim_out, (3, 3), padding=1, dtype=dt, name=f"down_{i}_downsample")(x)

        mid = dims[-1]
        x = ResnetBlock(mid, groups, dt, name="mid_block1")(x, t)
        x = PreNormResidual(
            mid, Attention(mid, cfg.attn_heads, cfg.attn_dim_head, dt, name="mid_attn"),
            dtype=dt, name="mid_attn_wrap",
        )(x)
        x = ResnetBlock(mid, groups, dt, name="mid_block2")(x, t)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i == len(in_out) - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock(dim_out, groups, dt, name=f"up_{i}_block1")(x, t)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock(dim_out, groups, dt, name=f"up_{i}_block2")(x, t)
            x = PreNormResidual(
                dim_out, LinearAttention(dim_out, cfg.attn_heads, cfg.attn_dim_head, dt,
                                         name=f"up_{i}_attn"),
                dtype=dt, name=f"up_{i}_attn_wrap",
            )(x)
            if not is_last:
                # nearest x2 + conv3x3 fused (see unet.NearestUpConv)
                x = NearestUpConv(dim_in, dtype=dt, name=f"up_{i}_upsample")(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding=1, dtype=dt, name=f"up_{i}_upsample")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock(dim, groups, dt, name="final_res_block")(x, t)
        return nn.Conv(cfg.channels, (1, 1), dtype=jnp.float32, name="final_conv")(
            x.astype(jnp.float32)
        )
