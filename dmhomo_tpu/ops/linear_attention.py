"""Fused linear-attention Pallas kernel (the DGM UNet's per-stage attention).

Reference math (classifier_free_guidance.py:244-270):
    q, k, v = split(x @ W_qkv)            # (N, heads, d), no bias
    out[n,h,e] = sum_d softmax_d(q)[n,h,d] * scale
                 * ( sum_m softmax_N(k)[m,h,d] * v[m,h,e] / N )

XLA materialises q/k/v and the fp32 softmax intermediates - at 256^2 that is
3 x (B, 65536, 128) plus upcasts per attention, all HBM round-trips.  This
kernel streams N in tiles and fuses the qkv projection:

* pass 1 (grid B x tiles): k_t, v_t = x_t @ W_k, x_t @ W_v on the MXU; emits
  per-tile online-softmax partials (max, sum, exp(k)^T v) - the context is
  only (heads*d, heads*e), so the whole reduction state is tiny.
* combine (plain XLA, negligible): logsumexp-merge the partials, build a
  block-diagonal (hd, he) context.
* pass 2 (grid B x tiles): q_t = x_t @ W_q, per-head softmax over d, one
  (T, hd) @ (hd, he) matmul -> out tile.

HBM traffic drops from ~10x to ~2x the input size.  Gradients fall back to
autodiff of the pure-jnp reference via custom_vjp (sampling is the hot
path; the backward recompute matches the reference exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ref_linear_attention(x, w_qkv, heads: int, dim_head: int):
    """Pure-jnp reference (used on CPU, for gradients, and in tests)."""
    B, N, C = x.shape
    hd = heads * dim_head
    qkv = jnp.einsum("bnc,ck->bnk", x, w_qkv.astype(x.dtype))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, N, heads, dim_head)
    k = k.reshape(B, N, heads, dim_head)
    v = v.reshape(B, N, heads, dim_head)
    q = jax.nn.softmax(q.astype(jnp.float32), axis=-1).astype(x.dtype)
    k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(x.dtype)
    q = q * (dim_head**-0.5)
    v = v / N
    context = jnp.einsum("bnhd,bnhe->bhde", k, v)
    out = jnp.einsum("bhde,bnhd->bnhe", context, q)
    return out.reshape(B, N, hd)


def _pass1_kernel(x_ref, wk_ref, wv_ref, m_ref, s_ref, c_ref):
    t = pl.program_id(1)
    x = x_ref[0]  # (T, C)
    k = jnp.dot(x, wk_ref[:], preferred_element_type=jnp.float32)  # (T, HD)
    v = jnp.dot(x, wv_ref[:], preferred_element_type=jnp.float32)  # (T, HE)
    m = jnp.max(k, axis=0)  # (HD,)
    e = jnp.exp(k - m[None, :])  # (T, HD) fp32
    s = jnp.sum(e, axis=0)  # (HD,)
    # full cross matrix; block-diagonal per-head parts extracted in combine
    c = jax.lax.dot_general(
        e, v, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (HD, HE)
    m_ref[0, t] = m
    s_ref[0, t] = s
    c_ref[0] = c


def _pass2_kernel(x_ref, wq_ref, ctx_ref, o_ref, *, heads: int, dim_head: int, out_dtype):
    x = x_ref[0]  # (T, C)
    q = jnp.dot(x, wq_ref[:], preferred_element_type=jnp.float32)  # (T, HD)
    parts = []
    for h in range(heads):  # per-head softmax over d (static loop)
        qh = q[:, h * dim_head : (h + 1) * dim_head]
        qh = qh - jnp.max(qh, axis=1, keepdims=True)
        eh = jnp.exp(qh)
        parts.append(eh / jnp.sum(eh, axis=1, keepdims=True))
    qs = jnp.concatenate(parts, axis=1) * (dim_head**-0.5)  # (T, HD)
    out = jnp.dot(qs, ctx_ref[0], preferred_element_type=jnp.float32)  # (T, HE)
    o_ref[0] = out.astype(out_dtype)


def _fused_forward(x, w_qkv, heads: int, dim_head: int, tile: int, interpret: bool = False):
    B, N, C = x.shape
    hd = heads * dim_head
    nT = N // tile
    wq, wk, wv = jnp.split(w_qkv, 3, axis=-1)
    dt = x.dtype

    m, s, c = pl.pallas_call(
        _pass1_kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hd), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hd), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nT, hd), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nT, hd), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd, hd), lambda b, t: (b * nT + t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nT, hd), jnp.float32),
            jax.ShapeDtypeStruct((B, nT, hd), jnp.float32),
            jax.ShapeDtypeStruct((B * nT, hd, hd), jnp.float32),
        ],
        interpret=interpret,
    )(x, wk.astype(dt), wv.astype(dt))
    c = c.reshape(B, nT, hd, hd)

    # logsumexp-merge the tile partials (tiny tensors - plain XLA)
    M = jnp.max(m, axis=1, keepdims=True)  # (B, 1, HD)
    r = jnp.exp(m - M)  # (B, nT, HD)
    S = jnp.sum(s * r, axis=1)  # (B, HD)
    Cm = jnp.sum(c * r[:, :, :, None], axis=1)  # (B, HD, HE)

    # block-diagonal context: keep only the per-head (d, e) blocks,
    # normalized by the softmax sum and the reference's 1/N on v
    blocks = []
    for h in range(heads):
        sl = slice(h * dim_head, (h + 1) * dim_head)
        blocks.append(Cm[:, sl, sl] / (S[:, sl, None] * N))
    context = jnp.zeros((B, hd, hd), jnp.float32)
    for h, blk in enumerate(blocks):
        sl = slice(h * dim_head, (h + 1) * dim_head)
        context = context.at[:, sl, sl].set(blk)

    out = pl.pallas_call(
        functools.partial(_pass2_kernel, heads=heads, dim_head=dim_head, out_dtype=dt),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hd), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd, hd), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, hd), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, hd), dt),
        interpret=interpret,
    )(x, wq.astype(dt), context.astype(dt))
    return out


def _pick_tile(n: int) -> int:
    for t in (2048, 1024, 512, 256, 128):
        if n % t == 0:
            return t
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_linear_attention(x, w_qkv, heads: int = 4, dim_head: int = 32):
    """x: (B, N, C); w_qkv: (C, 3*heads*dim_head) -> (B, N, heads*dim_head).

    Uses the Pallas path on TPU when N tiles cleanly; falls back to the
    jnp reference otherwise (CPU tests, ragged shapes).
    """
    tile = _pick_tile(x.shape[1])
    if tile and jax.default_backend() not in ("cpu",):
        return _fused_forward(x, w_qkv, heads, dim_head, tile)
    return _ref_linear_attention(x, w_qkv, heads, dim_head)


def _fla_fwd(x, w_qkv, heads, dim_head):
    return fused_linear_attention(x, w_qkv, heads, dim_head), (x, w_qkv)


def _fla_bwd(heads, dim_head, res, g):
    x, w_qkv = res
    _, vjp = jax.vjp(lambda xx, ww: _ref_linear_attention(xx, ww, heads, dim_head), x, w_qkv)
    return vjp(g)


fused_linear_attention.defvjp(_fla_fwd, _fla_bwd)
