"""Multi-scale Swin homography-weight regressor (the HEM h_net), Flax/NHWC.

Parity target: `SwinTransformer` + blocks in HEM/model/swin_multi.py with the
shipped config (HEM/experiments/params.json): crop 320x576, patch 4,
in_chans 2, num_basis 8, embed_dim 24, depths [2,4,6], layer_depth [3,2,1],
heads [3,12,24], window 8, mlp_ratio 3, qkv_bias, no dropout/droppath.

Architecture (swin_multi.py:145-183):
  conv feature pyramids for both images (:186-217), coarse-to-fine over 3
  levels; at each level the second image's features are warped by the current
  flow estimate (basis . weights), the pair is tokenized and run through a
  stack of W-MSA/SW-MSA Swin blocks with conv PatchMerging between sub-levels
  (:931-976, :979-1057), then 8 learned query tokens are updated by a
  class-attention block (:220-321) and regressed to per-basis weight deltas,
  accumulated with a resolution scale factor.

TPU notes: window partition is pure reshape/transpose; the SW-MSA attention
mask and relative-position index are host-precomputed constants; all shapes
static so each level compiles to one fused region.  Softmax normalizers are
fp32-accumulated; the logits tensor dtype is configurable (`sim_dtype`,
bf16 under the bf16 training mode - BENCH.md AOT analysis).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dmhomo_tpu.geometry.basis import gen_homography_basis
from dmhomo_tpu.geometry.warp import upsample_flow_to, warp_by_flow


def _level_impl(attn_impl: str, enc_idx: int) -> str:
    """Per-encoder-level attention impl from a comma-separated spec
    ('pallas,pallas,fused_block', indexed by enc_idx); a plain name applies
    to every level."""
    if "," not in attn_impl:
        return attn_impl
    impls = attn_impl.split(",")
    return impls[min(enc_idx, len(impls) - 1)]


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    crop_size: tuple = (320, 576)
    patch_size: int = 4
    in_chans: int = 2
    num_basis: int = 8
    embed_dim: int = 24
    depths: Sequence[int] = (2, 4, 6)
    layer_depth: Sequence[int] = (3, 2, 1)
    num_heads: Sequence[int] = (3, 12, 24)
    window_size: int = 8
    mlp_ratio: float = 3.0
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    # rematerialize each SwinBlock in the backward pass: the window-attention
    # (nW*B, heads, 64, 64) matrices dominate training HBM (a full-config
    # bs=32 fp32 step wants 84 GB without it - BENCH.md)
    remat: bool = False
    # optional jax.checkpoint_policies name (e.g.
    # 'dots_with_no_batch_dims_saveable': keep Dense/MLP outputs, recompute
    # only the batched attention einsums) - None = recompute everything
    remat_policy: Optional[str] = None
    # attention-logits dtype (see WindowAttention.sim_dtype); None = fp32
    sim_dtype: Optional[jnp.dtype] = None
    # window-attention implementation: 'xla' (einsum path), 'pallas'
    # (ops/window_attention.py fused kernel - logits never touch HBM;
    # sim_dtype is then moot since VMEM logits are always fp32), or
    # 'fused_block' (ops/swin_block.py - the ENTIRE SwinBlock in one
    # Pallas kernel: LN1/qkv/attention/proj/LN2/MLP all in VMEM, HBM
    # traffic ~= x in + y out; falls back to 'xla' when fold_ln is set
    # or the resolution is not window-divisible).  A comma-separated spec
    # ('pallas,pallas,fused_block') selects per ENCODER level, indexed by
    # enc_idx (0 = C=embed_dim level ... nL-1 = widest level) - the r5 A/B
    # lever for fused_block at C=96 where the VPU lanes aren't starved.
    attn_impl: str = "xla"
    # fold the pre-LayerNorms into the following qkv/MLP projections
    # (LayerNormStats/FoldedDense): the fp32 normalized (B, L, C) tensors
    # are never materialized - same trick as unet.ChannelLayerNorm's
    # stats-folding.  Parameter tree is identical either way.
    fold_ln: bool = False
    # --- diagnostics-only switches (r4: moved out of env vars so they are
    # part of the traced config, never read inside a jitted forward) ---
    # skip the inter-level feature warps (isolates warp cost in A/B probes;
    # NOT the reference algorithm)
    ablate_warps: bool = False
    # data-max softmax with the normalized attention tensor materialized
    # (A/B oracle for the max-free production softmax)
    legacy_win_softmax: bool = False
    # bilinear warp formulation: None = 'matmul' (MXU-friendly);
    # 'gather' = the 4-tap gather oracle (geometry/warp.py)
    warp_method: Optional[str] = None

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (self.num_layers - 1))

    def __post_init__(self):
        # every encoder stage must end at num_features channels so the
        # class-attention query tokens see a constant width:
        # embed_dim * 2^i * 2^(layer_depth[i]-1) == num_features
        for i, ld in enumerate(self.layer_depth):
            if ld != self.num_layers - i:
                raise ValueError(
                    f"layer_depth[{i}]={ld} must equal num_layers-{i}="
                    f"{self.num_layers - i} so all stages end at num_features"
                )


# ---------------------------------------------------------------------------
# host-precomputed constants
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2ws-1)^2 bias table (ref :385-399)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=64)
def shifted_window_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws*ws, ws*ws) additive mask (0 / -100) for SW-MSA (ref :521-544)."""
    img_mask = np.zeros((H, W))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    m = img_mask.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(wins: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    C = wins.shape[-1]
    B = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


class LayerNormStats(nn.Module):
    """LayerNorm parameters WITHOUT materializing the normalized tensor:
    returns (mean, rstd, scale, bias) so a following matmul can fold the
    normalization into its epilogue (see FoldedDense).  Parameter
    names/shapes identical to nn.LayerNorm, so checkpoints are
    interchangeable with the materializing path."""

    dim: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = xf.var(axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + self.epsilon)
        return mean, rstd, scale, bias


class FoldedDense(nn.Module):
    """Dense with a pre-LayerNorm folded into its epilogue (exact in reals):

        LN(x) @ W + b = rstd*(x @ (diag(g) W)) - (rstd*mean)*(g @ W)
                        + (b_ln @ W + b)

    The big matmul runs on the raw activations in the compute dtype; the
    per-token (mean, rstd) correction and the two tiny per-feature vectors
    run fp32 and fuse into the matmul epilogue - the fp32 normalized
    (B, L, C) tensor of a materializing pre-LN never exists.  Parameter
    names/shapes identical to nn.Dense."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ln):
        mean, rstd, g, b_ln = ln
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_ch, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias else 0.0
        )
        dt = self.dtype
        Wg = (kernel * g[:, None]).astype(dt)
        y = jnp.einsum("...c,cf->...f", x.astype(dt), Wg,
                       preferred_element_type=jnp.float32)
        u = g @ kernel  # (features,) fp32
        const = b_ln @ kernel + bias
        out = rstd * y - (rstd * mean) * u + const
        return out.astype(dt)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ln=None):
        if ln is not None:  # pre-LN folded into fc1
            x = FoldedDense(self.hidden, dtype=self.dtype, name="fc1")(x, ln)
        else:
            x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class WindowAttention(nn.Module):
    """W-MSA over ws*ws-token windows (ref swin_multi.py:330-430).

    Two equivalent formulations (same params, same math):
    * packed=True: the per-head structure lives in the LANE dim - sim is
      (Bn, N, heads*N) via a block-expanded K', the per-head softmax
      normalizer comes from one thin matmul (a global row max is
      softmax-invariant per head-block), and the context matmul uses a
      block-expanded V'.  Everything stays 128-lane-aligned and no
      (Bn, heads, N, N) fp32 tensor is materialized - but measured
      TRAFFIC-NEUTRAL on v5e (the block expansions move as many bytes as
      the naive layout saves; 20.5 vs 19.8 ms at the shipped stage-0 shape,
      BENCH.md), so the simpler naive path stays the default.
    * packed=False (default): the naive (Bn, heads, N, N) einsum.
    """

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    packed: bool = False
    # dtype of the attention logits (sim) tensor: None = fp32 (the
    # softmax-stats-fp32 convention).  bf16 halves the dominant HBM
    # traffic of HEM training (the (Bn,h,N,N) sims are ~8x the token
    # volume); the softmax normalizer stays fp32-accumulated either way.
    sim_dtype: Optional[jnp.dtype] = None
    attn_impl: str = "xla"
    # diagnostic A/B path (SwinConfig.legacy_win_softmax)
    legacy_softmax: bool = False

    @nn.compact
    def __call__(self, x, mask=None, ln=None):
        Bn, N, C = x.shape  # N = ws*ws
        ws = self.window_size
        h = self.num_heads
        hd = self.dim // h
        dt = self.dtype

        if ln is not None:  # pre-LN folded into the qkv projection
            qkv = FoldedDense(self.dim * 3, self.qkv_bias, dt, name="qkv")(x, ln)
        else:
            qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=dt, name="qkv")(x)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), h),
        )
        idx = jnp.asarray(relative_position_index(ws).reshape(-1))
        bias_ijh = table[idx].reshape(N, N, h)  # (i, j, head)

        if self.attn_impl == "pallas" and not self.packed:
            # fused kernel: logits live in VMEM only; q scaled in-kernel
            from dmhomo_tpu.ops.window_attention import fused_window_attention

            m = jnp.asarray(mask, jnp.float32) if mask is not None else None
            out = fused_window_attention(
                qkv, bias_ijh.transpose(2, 0, 1).astype(jnp.float32), m,
                num_heads=h, scale=hd**-0.5,
            )
        elif self.packed:
            q, k, v = jnp.split(qkv, 3, axis=-1)  # (Bn, N, C), channels (h, d)
            q = q * (hd**-0.5)
            head_of_c = np.arange(C) // hd
            bm = jnp.asarray(
                (head_of_c[:, None] == np.arange(h)[None, :]).astype(np.float32)
            ).astype(dt)  # (C, h)

            # K'[b, c, (g, j)] = k[b, j, c] * [head(c) == g]
            kt = jnp.swapaxes(k, 1, 2)  # (Bn, C, N)
            Kp = (kt[:, :, None, :] * bm[None, :, :, None]).reshape(Bn, C, h * N)
            sim = jnp.einsum("bic,bcl->bil", q, Kp,
                             preferred_element_type=jnp.float32)  # (Bn, N, h*N)
            # bias packed to lanes (g, j)
            sim = sim + bias_ijh.transpose(0, 2, 1).reshape(N, h * N)[None]
            if mask is not None:
                nW = mask.shape[0]
                mp = jnp.tile(jnp.asarray(mask), (1, 1, h))  # (nW, N, h*N), g-major
                sim = (sim.reshape(Bn // nW, nW, N, h * N) + mp[None]).reshape(
                    Bn, N, h * N
                )
            # a global row max shifts every head-block by the same constant
            m = jnp.max(sim, axis=-1, keepdims=True)
            e = jnp.exp(sim - m).astype(dt)
            M3 = jnp.asarray(np.repeat(np.eye(h, dtype=np.float32), N, axis=0)).astype(dt)
            s3 = jnp.einsum("bil,lg->big", e, M3,
                            preferred_element_type=jnp.float32)  # (Bn, N, h)
            # V'[b, (g, j), c] = v[b, j, c] * [head(c) == g]
            Vp = (v[:, None, :, :] * bm.T[None, :, None, :]).reshape(Bn, h * N, C)
            out = jnp.einsum("bil,blc->bic", e, Vp,
                             preferred_element_type=jnp.float32)  # (Bn, N, C)
            out = (out / jnp.repeat(s3, hd, axis=-1)).astype(dt)
        elif self.legacy_softmax:
            # diagnostic A/B path: data-max softmax with the normalized
            # attention tensor materialized
            qkv = qkv.reshape(Bn, N, 3, h, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (Bn, N, h, d)
            q = q * (hd**-0.5)
            attn = jnp.einsum("bihd,bjhd->bhij", q, k)
            attn = attn + bias_ijh.transpose(2, 0, 1)[None]
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.reshape(Bn // nW, nW, h, N, N) + mask[None, :, None]
                attn = attn.reshape(Bn, h, N, N)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dt)
            out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(Bn, N, C)
        else:
            sdt = self.sim_dtype or jnp.float32
            qkv = qkv.reshape(Bn, N, 3, h, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (Bn, N, h, d)
            q = q * (hd**-0.5)
            sim = jnp.einsum("bihd,bjhd->bhij", q, k,
                             preferred_element_type=sdt)
            sim = sim + bias_ijh.transpose(2, 0, 1)[None].astype(sdt)
            sim_nomask = sim
            if mask is not None:
                nW = mask.shape[0]
                sim = sim.reshape(Bn // nW, nW, h, N, N) + jnp.asarray(mask, sdt)[None, :, None]
                sim = sim.reshape(Bn, h, N, N)
            # clip-validity diagnostic: max |real logit| (mask excluded -
            # its -100 rows are MEANT to clip).  A no-op unless the caller
            # runs apply(..., mutable=['intermediates']) - under jit the
            # max is DCE'd otherwise.  HEMTrainer.logit_health surfaces it;
            # the max-free softmax below is exact only while this stays
            # under 60.
            self.sow("intermediates", "max_abs_logit",
                     jnp.max(jnp.abs(sim_nomask.astype(jnp.float32))))
            # max-free softmax: shift-invariance makes the data max
            # unnecessary (a static clip guards exp's range; the SW-MSA
            # -100 mask clips to -60 -> weight ~1e-26, as dead as -inf;
            # NOTE the clip is exact only while real logits stay within
            # +-60 - tracked by the bf16-sim learning validation and the
            # max_abs_logit sow above), and by
            # linearity the row normalizer divides out AFTER the context
            # matmul - the normalized (Bn,h,N,N) attention tensor is never
            # materialized.  The normalizer stays fp32-accumulated; logits
            # are in sim_dtype (fp32 default, bf16 under bf16 training).
            e = jnp.exp(jnp.clip(sim, -60.0, 60.0)).astype(dt)
            s = jnp.sum(e, axis=-1, dtype=jnp.float32)  # (Bn, h, i)
            out = jnp.einsum("bhij,bjhd->bihd", e, v,
                             preferred_element_type=jnp.float32)
            out = (out / s.transpose(0, 2, 1)[..., None]).astype(dt)
            out = out.reshape(Bn, N, C)
        return nn.Dense(self.dim, dtype=dt, name="proj")(out)


class _LNParams(nn.Module):
    """Declares LayerNorm params identically to nn.LayerNorm (fused path)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _DenseParams(nn.Module):
    """Declares Dense params identically to nn.Dense (fused path)."""

    in_dim: int
    out_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.linear.default_kernel_init,
                       (self.in_dim, self.out_dim))
        b = (self.param("bias", nn.initializers.zeros, (self.out_dim,))
             if self.use_bias else jnp.zeros((self.out_dim,), jnp.float32))
        return k, b


class _MlpParams(nn.Module):
    """Declares Mlp's fc1/fc2 params (same names/init as the module)."""

    in_dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, c1 = _DenseParams(self.in_dim, self.hidden, name="fc1")()
        w2, c2 = _DenseParams(self.hidden, self.in_dim, name="fc2")()
        return w1, c1, w2, c2


class _AttnParams(nn.Module):
    """Declares WindowAttention's params (same names/init as the module)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        ws = self.window_size
        wq, bq = _DenseParams(self.dim, self.dim * 3, self.qkv_bias,
                              name="qkv")()
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
        )
        wp, bp = _DenseParams(self.dim, self.dim, True, name="proj")()
        return wq, bq, table, wp, bp


class SwinBlock(nn.Module):
    dim: int
    input_resolution: tuple
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    sim_dtype: Optional[jnp.dtype] = None
    fold_ln: bool = False
    attn_impl: str = "xla"
    legacy_softmax: bool = False

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        if min(H, W) <= ws:  # ref :497-500
            ws, shift = min(H, W), 0
        B, L, C = x.shape

        if (self.attn_impl == "fused_block" and not self.fold_ln
                and H % ws == 0 and W % ws == 0):
            # whole-block Pallas fusion (ops/swin_block.py): identical
            # param tree, declared here without running the XLA ops
            from dmhomo_tpu.ops.swin_block import fused_swin_block

            g1, b1 = _LNParams(C, name="norm1")()
            wq, bq, table, wp, bp = _AttnParams(
                self.dim, ws, self.num_heads, self.qkv_bias, name="attn")()
            g2, b2 = _LNParams(C, name="norm2")()
            hidden = int(self.dim * self.mlp_ratio)
            w1, c1, w2, c2 = _MlpParams(C, hidden, name="mlp")()
            N = ws * ws
            idx = jnp.asarray(relative_position_index(ws).reshape(-1))
            bias_hnn = table[idx].reshape(N, N, self.num_heads).transpose(2, 0, 1)
            mask = (jnp.asarray(shifted_window_mask(H, W, ws, shift),
                                jnp.float32) if shift > 0 else None)
            return fused_swin_block(
                x, (g1, b1, wq, bq, bias_hnn, wp, bp, g2, b2, w1, c1, w2, c2),
                mask, resolution=(H, W), window_size=ws,
                num_heads=self.num_heads, shift=shift,
            )

        shortcut = x
        attn = WindowAttention(
            self.dim, ws, self.num_heads, self.qkv_bias, self.dtype,
            sim_dtype=self.sim_dtype, attn_impl=self.attn_impl,
            legacy_softmax=self.legacy_softmax, name="attn"
        )
        if self.fold_ln:
            # norm1 stays un-materialized: the per-token (mean, rstd) ride
            # through the same roll/partition permutations as x and fold
            # into the qkv matmul inside WindowAttention
            mean, rstd, g, b_ln = LayerNormStats(C, name="norm1")(x)
            x4 = x.reshape(B, H, W, C)
            m4 = mean.reshape(B, H, W, 1)
            r4 = rstd.reshape(B, H, W, 1)
            if shift > 0:
                x4 = jnp.roll(x4, shift=(-shift, -shift), axis=(1, 2))
                m4 = jnp.roll(m4, shift=(-shift, -shift), axis=(1, 2))
                r4 = jnp.roll(r4, shift=(-shift, -shift), axis=(1, 2))
                mask = jnp.asarray(shifted_window_mask(H, W, ws, shift))
            else:
                mask = None
            wins = attn(
                window_partition(x4, ws), mask,
                ln=(window_partition(m4, ws), window_partition(r4, ws), g, b_ln),
            )
        else:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
            x = x.reshape(B, H, W, C)
            if shift > 0:
                x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
                mask = jnp.asarray(shifted_window_mask(H, W, ws, shift))
            else:
                mask = None
            wins = attn(window_partition(x, ws), mask)
        x = window_reverse(wins, ws, H, W)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        x = x.reshape(B, L, C)

        x = shortcut + x
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype, name="mlp")
        if self.fold_ln:
            x = x + mlp(x, ln=LayerNormStats(C, name="norm2")(x))
        else:
            y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
            x = x + mlp(y)
        return x


class PatchMerging(nn.Module):
    """Conv downsample merge: conv3s2+BN+LReLU, conv3+BN+LReLU (ref :931-976)."""

    dim: int
    input_resolution: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        x = nn.Conv(2 * self.dim, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="norm1")(x)
        x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(2 * self.dim, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="norm2")(x)
        x = nn.leaky_relu(x, 0.01)
        return x.reshape(B, (H // 2) * (W // 2), 2 * C)


class PatchEmbed(nn.Module):
    """Image -> patch tokens: conv3x3(C->E/3), conv3x3(E/3->E/3),
    conv(patch, stride=patch)(E/3->E), flatten to (B, Ph*Pw, E), optional LN
    (ref swin_multi.py:1063-1139; the `proj` conv there is itself unused).

    NOTE: the reference *constructs* PatchEmbed inside SwinTransformer
    (swin_multi.py:62-69) but its forward never calls it — the encoder
    embeds via FeatureExtractor instead — so these are dead params there.
    We ship the module for API completeness but likewise do not wire it
    into SwinTransformer (keeping our param tree free of the reference's
    dead weight; models/import_torch.py documents the importer-side skip).
    """

    img_size: tuple  # (H, W)
    patch_size: int = 4
    embed_dim: int = 96
    patch_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if (H, W) != tuple(self.img_size):
            raise ValueError(
                f"Input image size ({H}*{W}) doesn't match model "
                f"({self.img_size[0]}*{self.img_size[1]})."
            )
        e3 = self.embed_dim // 3
        ps = self.patch_size
        x = nn.Conv(e3, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        x = nn.Conv(e3, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x)
        x = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps), padding="VALID",
                    dtype=self.dtype, name="proj")(x)
        x = x.reshape(B, (H // ps) * (W // ps), self.embed_dim)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return x


class BasicLayer(nn.Module):
    """One encoder stage: layer_depth sub-levels of Swin blocks + merges."""

    dim: int
    input_resolution: tuple
    depth: int
    layer_depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    sim_dtype: Optional[jnp.dtype] = None
    fold_ln: bool = False
    attn_impl: str = "xla"
    legacy_softmax: bool = False
    remat: bool = False
    remat_policy: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.remat:
            policy = (
                getattr(jax.checkpoint_policies, self.remat_policy)
                if self.remat_policy else None
            )
            Blk = nn.remat(SwinBlock, policy=policy)
        else:
            Blk = SwinBlock
        for l in range(self.layer_depth):
            res = (self.input_resolution[0] // 2**l, self.input_resolution[1] // 2**l)
            dim = self.dim * 2**l
            for i in range(self.depth):
                x = Blk(
                    dim=dim,
                    input_resolution=res,
                    num_heads=self.num_heads,
                    window_size=self.window_size,
                    shift_size=0 if i % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    dtype=self.dtype,
                    sim_dtype=self.sim_dtype,
                    fold_ln=self.fold_ln,
                    attn_impl=self.attn_impl,
                    legacy_softmax=self.legacy_softmax,
                    name=f"sub{l}_block{i}",
                )(x)
            if l < self.layer_depth - 1:
                x = PatchMerging(dim, res, self.dtype, name=f"sub{l}_merge")(x, train)
        return x


class ClassAttention(nn.Module):
    """8 query tokens attend over all tokens (ref Class_Attention :220-263)."""

    dim: int
    num_heads: int
    num_queries: int = 8
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, u, ln=None):
        B, N, C = u.shape
        nq = self.num_queries
        hd = self.dim // self.num_heads
        if ln is not None:  # pre-LN folded into q/k/v projections
            mean, rstd, g, b_ln = ln
            ln_q = (mean[:, :nq], rstd[:, :nq], g, b_ln)
            q = FoldedDense(self.dim, self.qkv_bias, self.dtype, name="q")(u[:, :nq], ln_q)
            k = FoldedDense(self.dim, self.qkv_bias, self.dtype, name="k")(u, ln)
            v = FoldedDense(self.dim, self.qkv_bias, self.dtype, name="v")(u, ln)
        else:
            q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(u[:, :nq])
            k = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="k")(u)
            v = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="v")(u)
        q = q.reshape(B, nq, self.num_heads, hd) * (hd**-0.5)
        k = k.reshape(B, N, self.num_heads, hd)
        v = v.reshape(B, N, self.num_heads, hd)
        attn = jnp.einsum("bihd,bjhd->bhij", q, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, nq, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class LayerScaleBlockCA(nn.Module):
    """Query-token update block (ref LayerScale_Block_CA :266-321)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    fold_ln: bool = False

    @nn.compact
    def __call__(self, x_cls, x):
        init_val = 1e-5 if self.dim <= 24 else 1e-6
        gamma_1 = self.param("gamma_1", nn.initializers.constant(init_val), (self.dim,))
        gamma_2 = self.param("gamma_2", nn.initializers.constant(init_val), (self.dim,))

        u = jnp.concatenate([x_cls, x], axis=1)
        attn = ClassAttention(
            self.dim, self.num_heads, qkv_bias=self.qkv_bias, dtype=self.dtype, name="attn"
        )
        if self.fold_ln:
            # the (B, nq+L, C) fp32 normalized concat never materializes
            x_cls = x_cls + gamma_1 * attn(u, ln=LayerNormStats(self.dim, name="norm1")(u))
        else:
            u = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(u)
            x_cls = x_cls + gamma_1 * attn(u)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x_cls)
        x_cls = x_cls + gamma_2 * Mlp(
            int(self.dim * self.mlp_ratio), self.dim, self.dtype, name="mlp1"
        )(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x_cls)
        return Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype, name="mlp2")(y)


class FeatureExtractor(nn.Module):
    """Conv pyramid: stride-2 conv + GELU + conv + GELU per level (ref :186-217).

    Returns coarsest-first (reversed) like the reference.
    """

    embed_dim: int  # embed_dim // 2 of the Swin config
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pyramid = []
        for i in range(self.num_layers):
            out_ch = int(self.embed_dim * 2**i)
            x = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                        name=f"conv{i}_0")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}_1")(x)
            x = nn.gelu(x, approximate=False)
            pyramid.append(x)
        return pyramid[::-1]


class SwinTransformer(nn.Module):
    """Coarse-to-fine homography-basis-weight regressor.

    Input x: (B, h_patch, w_patch, 2) - the two 1-channel feature maps.
    Output: (B, num_basis, 1) accumulated weights.
    """

    config: SwinConfig = SwinConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dt = cfg.dtype
        B, hp, wp, _ = x.shape
        nL = cfg.num_layers
        nf = cfg.num_features

        basis = jnp.asarray(
            gen_homography_basis(cfg.crop_size[0], cfg.crop_size[1]).reshape(
                1, cfg.num_basis, -1
            )
        )  # (1, 8, h*w*2) in (h, w, 2) flat order

        query_init = self.param(
            "query_token", nn.initializers.truncated_normal(0.02), (1, cfg.num_basis, nf)
        )
        query_token = jnp.broadcast_to(query_init, (B, cfg.num_basis, nf)).astype(dt)

        extractor = FeatureExtractor(cfg.embed_dim // 2, nL, dt, name="feature_pyramid")
        x1_pyr = extractor(x[..., :1].astype(dt))
        x2_pyr = extractor(x[..., 1:].astype(dt))

        # shared final norm / heads (ref :136-139)
        norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")
        head1 = nn.Dense(nf, dtype=dt, name="head1")
        head2 = nn.Dense(1, dtype=jnp.float32, name="head2")

        weight = jnp.zeros((B, cfg.num_basis, 1), jnp.float32)
        for l, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
            _, h_x, w_x, _ = x1.shape
            if l == 0:
                x2_warp = x2
            else:
                flow = jnp.einsum("bko,okn->bn", weight, basis).reshape(
                    B, cfg.crop_size[0], cfg.crop_size[1], 2
                )
                flow_l = upsample_flow_to(flow, (h_x, w_x), scale=True)
                # warp in the activation dtype: bf16 configs take the fast
                # matmul-warp path, fp32 configs stay exact
                if cfg.ablate_warps:  # diagnostics only, NOT the reference
                    x2_warp = x2.astype(dt)
                else:
                    x2_warp = warp_by_flow(x2.astype(dt), flow_l,
                                           mode="collapse",
                                           method=cfg.warp_method)

            # warp_by_flow returns fp32 (geometry precision); the encoder
            # runs in the activation dtype
            tok = jnp.concatenate(
                [x1.astype(dt), x2_warp.astype(dt)], axis=-1
            ).reshape(B, h_x * w_x, -1)
            enc_idx = nL - l - 1
            tok = BasicLayer(
                dim=int(cfg.embed_dim * 2**enc_idx),
                input_resolution=(
                    cfg.crop_size[0] // 2 ** (enc_idx + 1),
                    cfg.crop_size[1] // 2 ** (enc_idx + 1),
                ),
                depth=cfg.depths[enc_idx],
                layer_depth=cfg.layer_depth[enc_idx],
                num_heads=cfg.num_heads[enc_idx],
                window_size=cfg.window_size,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                dtype=dt,
                sim_dtype=cfg.sim_dtype,
                fold_ln=cfg.fold_ln,
                attn_impl=_level_impl(cfg.attn_impl, enc_idx),
                legacy_softmax=cfg.legacy_win_softmax,
                remat=cfg.remat,
                remat_policy=cfg.remat_policy,
                name=f"encoder_{enc_idx}",
            )(tok, train)

            # blocks_token_only heads list = [1, 2, 2] (ref :117-118)
            blk_heads = list(cfg.num_heads[1:]) + [cfg.num_heads[-1]]
            query_token = LayerScaleBlockCA(
                dim=nf,
                num_heads=blk_heads[enc_idx],
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                dtype=dt,
                fold_ln=cfg.fold_ln,
                name=f"token_block_{enc_idx}",
            )(query_token, tok)
            query_token = norm(query_token).astype(dt)

            h = nn.gelu(head1(query_token), approximate=False)
            h = head2(h)  # (B, 8, 1)
            scale = hp // h_x
            weight = weight + h.astype(jnp.float32) * scale

        return weight
