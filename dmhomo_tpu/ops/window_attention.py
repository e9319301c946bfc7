"""Fused window attention (W-MSA / SW-MSA) as a Pallas TPU kernel.

Parity target: the window attention inside `models/swin.py::WindowAttention`
(reference HEM/model/swin_multi.py:330-430).  The XLA formulation there
materializes the (Bn, heads, N, N) logits tensor in HBM between the q@k^T
and attn@v matmuls — at the shipped HEM stage-0 shape (B=32 over 720
windows of 64 tokens) that tensor is ~370 MB *per layer per direction*,
and BENCH.md's component profile shows it dominating the HBM-bound train
step.  This kernel keeps the logits entirely in VMEM:

* grid over window tiles (TB windows per step, TB a divisor of nW so the
  SW-MSA mask block lines up with the window-in-image index);
* per head: batched q@k^T on the MXU, bias+mask add, the repo's max-free
  clipped-exp softmax (shift-invariance makes the data max unnecessary;
  fp32 normalizer), context matmul, normalize after — all in VMEM;
* flash-style backward (custom_vjp): recomputes e from q, k in-kernel and
  produces dqkv and the relative-position-bias gradient with the same
  no-HBM-logits property.  The bias gradient accumulates across the grid
  by revisiting one output block.

HBM traffic per call drops from ~(qkv + 2·sims) to ~(qkv + out); the
platform's Pallas DMA ceiling (BENCH.md: 47-87 GB/s vs ~500 for XLA) is
more than paid for by the ~10x byte cut.  A/B vs the XLA path is in
`scripts/win_attn_probe.py`; numerics match the max-free XLA branch
(tests/test_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_windows(n_windows: int, cap: int = 64) -> int:
    """Largest divisor of n_windows that is <= cap (mask-block alignment)."""
    for tb in range(min(cap, n_windows), 0, -1):
        if n_windows % tb == 0:
            return tb
    return 1


def _vmem_tile(nW: int, N: int, C: int, h: int, bytes_el: int,
               with_mask: bool, *, bwd: bool, cap: int) -> int:
    """VMEM-fit window tile: largest divisor of nW whose estimated scoped
    VMEM stays inside a probe-calibrated budget.

    The round-4 on-chip runs found the fixed 64/24-window caps overflow
    Mosaic's 16 MB scoped VMEM at the L2 shape (C=96, h=24) — a compile
    error, not a silent wrong answer — and, crucially, that bf16 I/O
    blocks do NOT reduce scoped usage proportionally (bf16-L2 fwd tb=60
    OOMs exactly like fp32 would; scripts/vmem_tile_recheck.py, twice).
    So the model below counts every block at fp32-equivalent width:
    double-buffered qkv/out/gout/dqkv/mask blocks + the single-buffered
    (constant-index) bias/dbias blocks + one head's live temporaries.
    Mosaic's real usage runs ~1.7-2x this estimate (scheduling slack,
    sublane padding), so the budgets are EFFECTIVE values fitted to the
    on-chip pass/fail boundaries (v5e, scripts/vmem_tile_probe.py +
    vmem_tile_recheck.py): fwd 8.4 MiB, bwd 7.2 MiB.  Resulting tiles at
    the shipped shapes — L0 fwd 60 / bwd 24, L1 fwd 60 / bwd 20 (all
    compiled in the r4 parity run), L2 fwd 36 (proven fp32+bf16, ±mask)
    / bwd 15 (proven fp32; bf16 proven up to 24) — every choice is a
    measured-OK configuration, with the first measured-FAIL (fp32 fwd 45,
    bf16 fwd 60, fp32 bwd 20) excluded by construction.
    """
    be = 4  # fp32-equivalent accounting (see docstring: bf16 saves ~nothing)
    bias_fixed = h * N * N * 4 * (2 if bwd else 1)  # bias in (+ dbias out)
    per = 2 * N * 3 * C * be          # qkv in, double-buffered
    if bwd:
        per += 2 * N * C * be         # gout in
        per += 2 * N * 3 * C * be     # dqkv out
        per += N * N * (12 + 2 * be)  # sim/e32/de fp32 + e/dsim
    else:
        per += 2 * N * C * be         # out, double-buffered
        per += N * N * (4 + be)       # sim fp32 + e
    if with_mask:
        per += 2 * N * N * 4          # mask block, double-buffered
    budget = int((7.2 if bwd else 8.4) * 2**20)
    fit = max(1, (budget - bias_fixed) // per)
    return _tile_windows(nW, min(cap, int(fit)))


def _heads_of(qkv_c: int, num_heads: int):
    c = qkv_c // 3
    return c, c // num_heads


def _fwd_kernel(qkv_ref, bias_ref, mask_ref, out_ref, *, num_heads, clip, dt,
                scale):
    C, hd = _heads_of(qkv_ref.shape[-1], num_heads)
    x = qkv_ref[...]
    # per-head sequential: each head's output slice is written immediately
    # so its (TB, N, N) temporaries can be reclaimed (VMEM is the budget)
    for g in range(num_heads):
        q = x[:, :, g * hd:(g + 1) * hd] * jnp.asarray(scale, x.dtype)
        k = x[:, :, C + g * hd:C + (g + 1) * hd]
        v = x[:, :, 2 * C + g * hd:2 * C + (g + 1) * hd]
        sim = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, N, N)
        sim = sim + bias_ref[g][None].astype(jnp.float32)
        if mask_ref is not None:
            sim = sim + mask_ref[...].astype(jnp.float32)
        e = jnp.exp(jnp.clip(sim, -clip, clip)).astype(dt)
        s = jnp.sum(e.astype(jnp.float32), axis=-1)  # (TB, N) fp32
        ctx = jax.lax.dot_general(
            e, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, N, hd)
        out_ref[:, :, g * hd:(g + 1) * hd] = (ctx / s[..., None]).astype(dt)


def _bwd_kernel(qkv_ref, bias_ref, mask_ref, g_ref, dqkv_ref, dbias_ref, *,
                num_heads, clip, dt, scale):
    C, hd = _heads_of(qkv_ref.shape[-1], num_heads)
    x = qkv_ref[...]
    gout = g_ref[...]
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for g in range(num_heads):
        # q here is the SCALED q (sim = (scale*q) @ k^T)
        q = x[:, :, g * hd:(g + 1) * hd] * jnp.asarray(scale, x.dtype)
        k = x[:, :, C + g * hd:C + (g + 1) * hd]
        v = x[:, :, 2 * C + g * hd:2 * C + (g + 1) * hd]
        sim = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        sim = sim + bias_ref[g][None].astype(jnp.float32)
        if mask_ref is not None:
            sim = sim + mask_ref[...].astype(jnp.float32)
        inrange = (jnp.abs(sim) < clip).astype(jnp.float32)
        e32 = jnp.exp(jnp.clip(sim, -clip, clip))
        e = e32.astype(dt)
        s = jnp.sum(e.astype(jnp.float32), axis=-1)  # (TB, N)
        ctx = jax.lax.dot_general(
            e, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # un-normalized out
        gg = gout[:, :, g * hd:(g + 1) * hd].astype(jnp.float32) / s[..., None]
        # dL/ds = -(g . out)/s = -(g . ctx)/s^2 = -(gg . ctx)/s
        ds = -jnp.sum(gg * ctx, axis=-1) / s  # (TB, N)
        # de[w,i,j] = gg . v[j]  +  ds[w,i]
        de = jax.lax.dot_general(
            gg.astype(dt), v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + ds[..., None]
        dsim = (e32 * de * inrange).astype(dt)  # (TB, N, N)
        dq = jax.lax.dot_general(
            dsim, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # chain rule through the in-kernel q scaling
        dk = jax.lax.dot_general(
            dsim, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dv = jax.lax.dot_general(
            e, gg.astype(dt), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, g * hd:(g + 1) * hd] = dq.astype(dt)
        dqkv_ref[:, :, C + g * hd:C + (g + 1) * hd] = dk.astype(dt)
        dqkv_ref[:, :, 2 * C + g * hd:2 * C + (g + 1) * hd] = dv.astype(dt)
        dbias_ref[g, :, :] += jnp.sum(dsim.astype(jnp.float32), axis=0)


def _specs(Bn, N, C3, h, nW, tb, with_mask):
    qkv_spec = pl.BlockSpec((tb, N, C3), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((h, N, N), lambda t: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    specs = [qkv_spec, bias_spec]
    if with_mask:
        ntile = nW // tb
        specs.append(pl.BlockSpec((tb, N, N), lambda t: (t % ntile, 0, 0),
                                  memory_space=pltpu.VMEM))
    return specs


@functools.lru_cache(maxsize=None)
def _make_fused(Bn, N, C3, num_heads, nW, with_mask, dt_name, clip, scale,
                interpret):
    dt = jnp.dtype(dt_name)
    C = C3 // 3
    tb = _vmem_tile(nW, N, C, num_heads, dt.itemsize, with_mask,
                    bwd=False, cap=64)
    grid = (Bn // tb,)
    in_specs = _specs(Bn, N, C3, num_heads, nW, tb, with_mask)
    # backward holds ~4x the per-head temporaries (sim, e32, de, dsim all
    # live fp32) - smaller tiles keep it inside the 16 MB VMEM budget
    tb_b = _vmem_tile(nW, N, C, num_heads, dt.itemsize, with_mask,
                      bwd=True, cap=24)
    grid_b = (Bn // tb_b,)
    in_specs_b = _specs(Bn, N, C3, num_heads, nW, tb_b, with_mask)

    def fwd_call(qkv, bias, mask):
        args = (qkv, bias) + ((mask,) if with_mask else ())
        if with_mask:
            def kern(qkv_ref, bias_ref, mask_ref, out_ref):
                _fwd_kernel(qkv_ref, bias_ref, mask_ref, out_ref,
                            num_heads=num_heads, clip=clip, dt=dt, scale=scale)
        else:
            def kern(qkv_ref, bias_ref, out_ref):
                _fwd_kernel(qkv_ref, bias_ref, None, out_ref,
                            num_heads=num_heads, clip=clip, dt=dt, scale=scale)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tb, N, C), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bn, N, C), dt),
            interpret=interpret,
        )(*args)

    def bwd_call(qkv, bias, mask, gout):
        args = (qkv, bias) + ((mask,) if with_mask else ()) + (gout,)
        if with_mask:
            def kern(qkv_ref, bias_ref, mask_ref, g_ref, dqkv_ref, dbias_ref):
                _bwd_kernel(qkv_ref, bias_ref, mask_ref, g_ref, dqkv_ref,
                            dbias_ref, num_heads=num_heads, clip=clip, dt=dt,
                            scale=scale)
        else:
            def kern(qkv_ref, bias_ref, g_ref, dqkv_ref, dbias_ref):
                _bwd_kernel(qkv_ref, bias_ref, None, g_ref, dqkv_ref,
                            dbias_ref, num_heads=num_heads, clip=clip, dt=dt,
                            scale=scale)
        dqkv, dbias = pl.pallas_call(
            kern,
            grid=grid_b,
            in_specs=in_specs_b + [
                pl.BlockSpec((tb_b, N, C), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=(
                pl.BlockSpec((tb_b, N, C3), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((num_heads, N, N), lambda t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Bn, N, C3), dt),
                jax.ShapeDtypeStruct((num_heads, N, N), jnp.float32),
            ),
            interpret=interpret,
        )(*args)
        return dqkv, dbias

    @jax.custom_vjp
    def attend(qkv, bias, mask):
        return fwd_call(qkv, bias, mask)

    def attend_fwd(qkv, bias, mask):
        return fwd_call(qkv, bias, mask), (qkv, bias, mask)

    def attend_bwd(res, gout):
        qkv, bias, mask = res
        dqkv, dbias = bwd_call(qkv, bias, mask, gout)
        return dqkv, dbias.astype(bias.dtype), None

    attend.defvjp(attend_fwd, attend_bwd)
    return attend


def fused_window_attention(qkv, bias, mask=None, *, num_heads, clip=60.0,
                           scale=1.0, interpret=False):
    """Window attention with VMEM-resident logits.

    Args:
      qkv: (Bn, N, 3C) — concatenated q|k|v straight from the projection;
        pass scale=head_dim**-0.5 and the q slice is scaled in VMEM (no
        scaled copy ever materializes in HBM).
      bias: (h, N, N) relative-position bias (differentiable).
      mask: optional (nW, N, N) additive SW-MSA mask; Bn must be a
        multiple of nW (windows flattened image-major).
      num_heads: h; C = qkv.shape[-1] // 3 must be divisible by h.

    Returns (Bn, N, C) in qkv.dtype.  Numerics match the max-free clipped
    softmax branch of models/swin.py::WindowAttention.
    """
    import jax as _jax

    if not interpret and _jax.default_backend() == "cpu":
        interpret = True  # CPU (tests / virtual mesh): Mosaic is TPU-only
    Bn, N, C3 = qkv.shape
    # without a mask the tiling has no alignment constraint beyond
    # dividing Bn; _tile_windows picks the per-call tile from this
    nW = mask.shape[0] if mask is not None else Bn
    if Bn % nW:
        raise ValueError(f"Bn={Bn} not a multiple of nW={nW}")
    attend = _make_fused(Bn, N, C3, num_heads, nW, mask is not None,
                         jnp.dtype(qkv.dtype).name, float(clip), float(scale),
                         interpret)
    if mask is None:
        mask_arg = jnp.zeros((0,), qkv.dtype)  # unused placeholder
        return attend(qkv, bias, mask_arg)
    return attend(qkv, bias, mask)
