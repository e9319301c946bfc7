"""BasesHomo baseline estimator (the reference's second HEM model family).

Parity target: `Net` (HEM/model/net.py:389-512), selected by
params.net_type == "BasesHomo" (net.py:1019-1026):

* ShareFeature: 3x conv+BN+ReLU (1->4->8->1) shared across both images
* ResNet-34-style trunk: conv7x7 s2 + maxpool + BasicBlocks [3,4,6,3]
  (LeakyReLU), Subspace projection blocks after layers 3 and 4
* grouped 1x1 conv (groups=8) -> global average pool -> 8 numbers = the
  4-point corner offsets; exact 4-pt DLT -> homography; forward and
  backward by swapping the input pair.

`subspace_project` (net.py:157-173): V = L1-normalized learned basis maps,
P = V (V^T V)^-1 V^T applied to the features - batched tiny solves + MXU
matmuls in jnp.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dmhomo_tpu.geometry.homography import dlt_solve_4pt


@dataclasses.dataclass(frozen=True)
class BasesHomoConfig:
    crop_size: tuple = (320, 576)
    layers: Sequence[int] = (3, 4, 6, 3)
    basis_vector_num: int = 16
    dtype: jnp.dtype = jnp.float32


def subspace_project(x: jnp.ndarray, vectors: jnp.ndarray) -> jnp.ndarray:
    """Project features onto the span of learned basis maps (net.py:157-173).

    x: (B, H, W, C); vectors: (B, H, W, K) -> (B, H, W, C).
    """
    B, H, W, C = x.shape
    K = vectors.shape[-1]
    Vt = vectors.reshape(B, H * W, K).transpose(0, 2, 1)  # (B, K, HW)
    Vt = Vt / (1e-6 + jnp.abs(Vt).sum(axis=2, keepdims=True))
    V = Vt.transpose(0, 2, 1)  # (B, HW, K)
    hi = jax.lax.Precision.HIGHEST
    mat = jnp.matmul(Vt, V, precision=hi)  # (B, K, K)
    proj = jnp.linalg.solve(mat, Vt)  # (B, K, HW) == (V^T V)^-1 V^T
    xf = x.reshape(B, H * W, C)
    coef = jnp.matmul(proj, xf, precision=hi)  # (B, K, C)
    out = jnp.matmul(V, coef, precision=hi)  # (B, HW, C)
    return out.reshape(B, H, W, C)


class ShareFeature(nn.Module):
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


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn1")(y)
        y = nn.leaky_relu(y, 0.01)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=jnp.float32, name="down_bn")(residual)
        return nn.leaky_relu(y + residual, 0.01)


class SubspaceBlock(nn.Module):
    planes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = nn.Conv(self.planes, (1, 1), dtype=self.dtype, name="conv0")(x)
        r = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn0")(r)
        r = nn.leaky_relu(r, 0.01)
        y = nn.Conv(self.planes, (1, 1), dtype=self.dtype, name="conv1")(r)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn1")(y)
        y = nn.leaky_relu(y, 0.01)
        y = nn.Conv(self.planes, (1, 1), dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn2")(y)
        return y + r


class Subspace(nn.Module):
    k: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        sub = SubspaceBlock(self.k, self.dtype, name="block")(x, train)
        return subspace_project(x, sub)


class BasesHomoNet(nn.Module):
    """4-point homography regressor with motion-basis subspace projection."""

    config: BasesHomoConfig = BasesHomoConfig()

    @nn.compact
    def __call__(self, imgs_gray_patch, train: bool = False):
        cfg = self.config
        dt = cfg.dtype
        B, ph, pw, _ = imgs_gray_patch.shape
        img1 = imgs_gray_patch[..., :1]
        img2 = imgs_gray_patch[..., 1:2]

        share = ShareFeature(dt, name="share_feature")
        f1 = share(img1, train)
        f2 = share(img2, train)

        # modules constructed ONCE - the trunk is weight-shared between the
        # forward and backward (swapped-input) passes like the reference
        conv1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                        dtype=dt, name="conv1")
        bn1 = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                           dtype=jnp.float32, name="bn1")
        planes = (64, 128, 256, 512)
        blocks = []
        for li, (pl_, n_blocks) in enumerate(zip(planes, cfg.layers)):
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                blocks.append(
                    (li, BasicBlock(pl_, stride if bi == 0 else 1, dt,
                                    name=f"layer{li + 1}_block{bi}"))
                )
        sp3 = Subspace(cfg.basis_vector_num, dt, name="sp_layer3")
        sp4 = Subspace(cfg.basis_vector_num, dt, name="sp_layer4")
        conv_last = nn.Conv(8, (1, 1), use_bias=False, feature_group_count=8,
                            dtype=jnp.float32, name="conv_last")

        def run(x):
            x = conv1(x)
            x = bn1(x)
            x = nn.leaky_relu(x, 0.01)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            prev_li = 0
            for li, blk in blocks:
                if li == 3 and prev_li == 2:
                    x = sp3(x, train)  # Subspace after layer3 (net.py:488)
                x = blk(x, train)
                prev_li = li
            x = sp4(x, train)  # Subspace after layer4 (net.py:489)
            x = conv_last(x.astype(jnp.float32))
            return x.mean(axis=(1, 2))  # global average pool -> (B, 8)

        offset_f = run(jnp.concatenate([f1, f2], axis=-1))
        offset_b = run(jnp.concatenate([f2, f1], axis=-1))

        # corner points of the patch (HomoTestData 'pts', data_loader.py:334-335)
        corners = jnp.asarray(
            [[0, 0], [pw - 1, 0], [0, ph - 1], [pw - 1, ph - 1]], jnp.float32
        )
        h4pt = jnp.broadcast_to(corners[None], (B, 4, 2))
        homo_f = dlt_solve_4pt(h4pt, offset_f.reshape(B, 4, 2))
        homo_b = dlt_solve_4pt(h4pt, offset_b.reshape(B, 4, 2))
        return {
            "homo_f": homo_f,
            "homo_b": homo_b,
            "offset_f": offset_f,
            "offset_b": offset_b,
        }


def fetch_model(net_type: str, **kwargs):
    """Model-family dispatch (parity: fetch_net, net.py:1019-1026)."""
    if net_type == "BasesHomo":
        return BasesHomoNet(kwargs.get("config", BasesHomoConfig()))
    if net_type == "HomoGAN":
        from dmhomo_tpu.models.estimator import EstimatorConfig, HomographyEstimator

        return HomographyEstimator(kwargs.get("config", EstimatorConfig()))
    raise NotImplementedError(net_type)
