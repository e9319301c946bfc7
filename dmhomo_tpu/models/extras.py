"""Auxiliary reference components (present in the reference, unused by its
shipped configs - implemented for inventory completeness; SURVEY.md 2.4):

* Discriminator (net.py:326-366) - HomoGAN-legacy conv classifier
* SpatialAttention (net.py:515-562) - channel-transposed attention
* MaskPredictor (net.py:565-632) - pixel-(un)shuffle U-block mask head,
  superseded by FlowMaskEstimator in the shipped config
* gradient_reversal (model/GradientReversal) - GRL via jax.custom_vjp
* ASPP (model/module/aspp.py) - atrous spatial pyramid pooling
* WindowCrossAttention (swin_multi.py:607-881) - cross-image windowed
  attention variant (built but never wired into the default forward)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dmhomo_tpu.models.swin import relative_position_index, window_partition, window_reverse


# ---------------------------------------------------------------------------
# gradient reversal (GRL)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def gradient_reversal(x, alpha=1.0):
    return x


def _grl_fwd(x, alpha):
    return x, alpha


def _grl_bwd(alpha, g):
    return (-alpha * g, None)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


class Discriminator(nn.Module):
    """5-layer strided conv classifier (net.py:326-366)."""

    in_channels: int = 1
    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels = [32, 64, 128, 256, 512]
        for i, ch in enumerate(channels):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=jnp.float32, name=f"bn{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(self.n_classes, (1, 1), use_bias=False, dtype=jnp.float32,
                    name="conv_last")(x.astype(jnp.float32))
        return x.mean(axis=(1, 2))  # adaptive average pool -> (B, n_classes)


class SpatialAttention(nn.Module):
    """Channel-transposed attention with temperature (net.py:515-562)."""

    dim: int
    num_heads: int = 8
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        temperature = self.param("temperature", nn.initializers.ones, (self.num_heads, 1, 1))
        qkv = nn.Conv(C * 3, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="qkv")(x)
        qkv = nn.Conv(C * 3, (3, 3), padding=1, feature_group_count=C * 3,
                      use_bias=self.use_bias, dtype=self.dtype, name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = C // self.num_heads

        def heads(t):  # (B, H, W, C) -> (B, heads, hd, N)
            return t.reshape(B, H * W, self.num_heads, hd).transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jnp.einsum("bhdn,bhen->bhde", q, k) * temperature[None]
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhde,bhen->bhdn", attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(B, H, W, C)
        return nn.Conv(C, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="project_out")(out)


def pixel_unshuffle(x, r: int):
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // r, W // r, C * r * r)


def pixel_shuffle(x, r: int):
    B, H, W, C = x.shape
    x = x.reshape(B, H, W, r, r, C // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * r, W * r, C // (r * r))


class MaskPredictor(nn.Module):
    """Legacy mask head: conv stack + 2x SpatialAttention at half res
    (net.py:565-632)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out0 = nn.Conv(16, (3, 3), padding=1, feature_group_count=2, use_bias=False,
                       dtype=self.dtype, name="conv0")(x)
        out0 = nn.Conv(16, (3, 3), padding=1, feature_group_count=2, use_bias=False,
                       dtype=self.dtype, name="conv1")(out0)
        out0 = nn.relu(out0)
        d = pixel_unshuffle(out0, 2)  # (B, H/2, W/2, 64)
        d = SpatialAttention(64, 8, dtype=self.dtype, name="attention0")(d)
        d = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(d)
        d = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv3")(d)
        d = SpatialAttention(64, 8, dtype=self.dtype, name="attention1")(d)
        u = pixel_shuffle(d, 2)
        y = nn.Conv(8, (3, 3), padding=1, feature_group_count=8, use_bias=False,
                    dtype=self.dtype, name="conv4")(u + out0)
        y = nn.Conv(1, (1, 1), use_bias=False, dtype=jnp.float32, name="conv5")(
            y.astype(jnp.float32)
        )
        return nn.sigmoid(y)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (model/module/aspp.py)."""

    out_channels: int = 256
    dilations: tuple = (1, 6, 12, 18)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        branches = []
        for i, d in enumerate(self.dilations):
            k = (1, 1) if d == 1 else (3, 3)
            y = nn.Conv(self.out_channels, k, padding="SAME", kernel_dilation=(d, d),
                        use_bias=False, dtype=self.dtype, name=f"branch{i}")(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=jnp.float32, name=f"bn{i}")(y)
            branches.append(nn.relu(y))
        gp = x.mean(axis=(1, 2), keepdims=True)
        gp = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                     name="global_conv")(gp)
        gp = nn.relu(gp)
        gp = jnp.broadcast_to(gp, (B, H, W, self.out_channels))
        y = jnp.concatenate(branches + [gp], axis=-1)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(y)
        return nn.relu(y)


class WindowCrossAttention(nn.Module):
    """Cross-image windowed attention: q from image A tokens, k/v from image
    B tokens, shared relative-position bias (swin_multi.py:607-881)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xa, xb):
        # xa, xb: (B, H, W, C)
        ws = self.window_size
        B, H, W, C = xa.shape
        hd = self.dim // self.num_heads
        wa = window_partition(xa, ws)  # (Bn, N, C)
        wb = window_partition(xb, ws)
        Bn, N, _ = wa.shape

        q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(wa)
        kv = nn.Dense(self.dim * 2, use_bias=self.qkv_bias, dtype=self.dtype, name="kv")(wb)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(Bn, N, self.num_heads, hd) * (hd**-0.5)
        k = k.reshape(Bn, N, self.num_heads, hd)
        v = v.reshape(Bn, N, self.num_heads, hd)
        attn = jnp.einsum("bihd,bjhd->bhij", q, k)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
        )
        idx = jnp.asarray(relative_position_index(ws).reshape(-1))
        bias = table[idx].reshape(N, N, self.num_heads).transpose(2, 0, 1)
        attn = jax.nn.softmax((attn + bias[None]).astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(Bn, N, C)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return window_reverse(out, ws, H, W)
