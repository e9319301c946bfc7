"""Whole-SwinBlock fusion as a Pallas TPU kernel.

Parity target: `models/swin.py::SwinBlock` (reference swin_multi.py:433-531)
— the full residual block

    x = x + proj(attn(partition(roll(LN1(x)))))            (reversed/unrolled)
    x = x + fc2(gelu(fc1(LN2(x))))

The XLA graph materializes ~8 full-size tensors per block in HBM (LN
outputs, windowed qkv, logits, context, MLP hidden, residuals); on the
HBM-bound HEM step that IS the cost (BENCH.md component profile).  Here
one kernel invocation processes a row of windows and keeps every
intermediate in VMEM: HBM traffic per block drops to ~(x in + y out) plus
the (tiny) weights.

Design notes:
* `jnp.roll` (shift blocks) stays in XLA: every op in the block except the
  window partition commutes with the roll, so
  `unroll(block_kernel(roll(x)))` is exact and the two C-wide roll copies
  are the only layout cost left.
* The window partition/reverse happen in-kernel as VMEM reshuffles —
  the (B, nW, N, C) windowed tensors never exist in HBM.
* grid = (B * H/ws,): one window-row per step; the SW-MSA mask block for
  row r is the contiguous mask[r*W/ws:(r+1)*W/ws] slice.
* backward is a second kernel (custom_vjp): recomputes the forward in
  VMEM and emits dx plus all 12 parameter gradients, accumulated across
  the grid by revisiting fp32 output blocks (LN backward in fp32, matmul
  weight grads contract over the row-of-windows token axis on the MXU).
* numerics: LN stats fp32, activations/matmuls in the module dtype with
  fp32 MXU accumulation, max-free clipped-exp softmax with fp32
  normalizer — the same conventions as the XLA path (attention logits are
  effectively fp32 here, i.e. >= the sim_dtype=bf16 production setting).

Used by SwinBlock when `SwinConfig.attn_impl == 'fused_block'`; parameter
tree and init are identical to the XLA path (tests/test_ops.py +
tests/test_models.py check values and grads against the unfused module).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _ln_fwd(xf, g, b):
    """fp32 LayerNorm over the last axis; returns (y, xhat, rstd)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = xc * rstd
    return xhat * g + b, xhat, rstd


def _ln_bwd(dy, xhat, rstd, g):
    """fp32 LayerNorm input-grad; returns (dx, dg_partial, db_partial)."""
    dg = jnp.sum(dy * xhat, axis=tuple(range(dy.ndim - 1)))
    db = jnp.sum(dy, axis=tuple(range(dy.ndim - 1)))
    dxh = dy * g
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxh - m1 - xhat * m2)
    return dx, dg, db


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| <= 1.5e-7) — Mosaic has
    no native erf lowering; this uses only exp, which it does have."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_fwd_grad(m):
    """Exact (erf-form) gelu and its derivative (fp32)."""
    inv_sqrt2 = 0.7071067811865476
    inv_sqrt2pi = 0.3989422804014327
    cdf = 0.5 * (1.0 + _erf(m * inv_sqrt2))
    pdf = inv_sqrt2pi * jnp.exp(-0.5 * m * m)
    return m * cdf, cdf + m * pdf


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _attn_rows(qkv, bias_ref, mask_ref, nwr, N, num_heads, clip, dt, scale):
    """Window attention over a row tile: qkv (nwr, N, 3C) -> (nwr, N, C)."""
    C = qkv.shape[-1] // 3
    hd = C // num_heads
    parts = []
    for g in range(num_heads):
        q = qkv[:, :, g * hd:(g + 1) * hd] * jnp.asarray(scale, qkv.dtype)
        k = qkv[:, :, C + g * hd:C + (g + 1) * hd]
        v = qkv[:, :, 2 * C + g * hd:2 * C + (g + 1) * hd]
        sim = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        sim = sim + bias_ref[g][None].astype(jnp.float32)
        if mask_ref is not None:
            sim = sim + mask_ref[...].astype(jnp.float32)
        e = jnp.exp(jnp.clip(sim, -clip, clip)).astype(dt)
        s = jnp.sum(e.astype(jnp.float32), axis=-1)
        ctx = jax.lax.dot_general(e, v, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        parts.append((ctx / s[..., None]).astype(dt))
    return jnp.concatenate(parts, axis=-1)


def _fwd_kernel(x_ref, g1_ref, b1_ref, wq_ref, bq_ref, bias_ref, mask_ref,
                wp_ref, bp_ref, g2_ref, b2_ref, w1_ref, c1_ref, w2_ref,
                c2_ref, y_ref, *, ws, num_heads, clip, dt):
    R, W, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    nwr = W // ws
    N = ws * ws
    hd = (C // num_heads)
    scale = hd ** -0.5
    T = R * W  # tokens in this tile

    xb = x_ref[0]  # (R, W, C) dt
    xf = xb.astype(jnp.float32)
    n1, _, _ = _ln_fwd(xf, g1_ref[...].astype(jnp.float32),
                       b1_ref[...].astype(jnp.float32))
    n1 = n1.astype(dt).reshape(T, C)
    qkv = (_dot(n1, wq_ref[...].astype(dt))
           + bq_ref[...].astype(jnp.float32)).astype(dt)
    # partition: (R, W, 3C) -> (nwr, N=ws*ws, 3C)
    q3 = qkv.reshape(ws, nwr, ws, 3 * C).transpose(1, 0, 2, 3).reshape(
        nwr, N, 3 * C)
    att = _attn_rows(q3, bias_ref, mask_ref, nwr, N, num_heads, clip, dt,
                     scale)
    # reverse: (nwr, N, C) -> (R*W, C)
    ao = att.reshape(nwr, ws, ws, C).transpose(1, 0, 2, 3).reshape(T, C)
    p = (_dot(ao, wp_ref[...].astype(dt))
         + bp_ref[...].astype(jnp.float32)).astype(dt)
    h = (xb.reshape(T, C) + p).astype(dt)

    hf = h.astype(jnp.float32)
    n2, _, _ = _ln_fwd(hf, g2_ref[...].astype(jnp.float32),
                       b2_ref[...].astype(jnp.float32))
    n2 = n2.astype(dt)
    m1 = _dot(n2, w1_ref[...].astype(dt)) + c1_ref[...].astype(jnp.float32)
    gm, _ = _gelu_fwd_grad(m1)
    m2 = (_dot(gm.astype(dt), w2_ref[...].astype(dt))
          + c2_ref[...].astype(jnp.float32)).astype(dt)
    y_ref[0] = (h + m2).reshape(R, W, C)


def _bwd_kernel(x_ref, g1_ref, b1_ref, wq_ref, bq_ref, bias_ref, mask_ref,
                wp_ref, bp_ref, g2_ref, b2_ref, w1_ref, c1_ref, w2_ref,
                c2_ref, dy_ref,
                dx_ref, dg1_ref, db1_ref, dwq_ref, dbq_ref, dbias_ref,
                dwp_ref, dbp_ref, dg2_ref, db2_ref, dw1_ref, dc1_ref,
                dw2_ref, dc2_ref, *, ws, num_heads, clip, dt):
    R, W, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    nwr = W // ws
    N = ws * ws
    hd = C // num_heads
    scale = hd ** -0.5
    T = R * W
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for r in (dg1_ref, db1_ref, dwq_ref, dbq_ref, dbias_ref, dwp_ref,
                  dbp_ref, dg2_ref, db2_ref, dw1_ref, dc1_ref, dw2_ref,
                  dc2_ref):
            r[...] = jnp.zeros_like(r)

    g1 = g1_ref[...].astype(jnp.float32)
    g2 = g2_ref[...].astype(jnp.float32)

    # ---- forward recompute (VMEM) ----
    xb = x_ref[0]
    xf = xb.astype(jnp.float32)
    n1f, xhat1, rstd1 = _ln_fwd(xf, g1, b1_ref[...].astype(jnp.float32))
    n1 = n1f.astype(dt).reshape(T, C)
    qkv = (_dot(n1, wq_ref[...].astype(dt))
           + bq_ref[...].astype(jnp.float32)).astype(dt)
    q3 = qkv.reshape(ws, nwr, ws, 3 * C).transpose(1, 0, 2, 3).reshape(
        nwr, N, 3 * C)
    att = _attn_rows(q3, bias_ref, mask_ref, nwr, N, num_heads, clip, dt,
                     scale)
    ao = att.reshape(nwr, ws, ws, C).transpose(1, 0, 2, 3).reshape(T, C)
    p = (_dot(ao, wp_ref[...].astype(dt))
         + bp_ref[...].astype(jnp.float32)).astype(dt)
    h = (xb.reshape(T, C) + p).astype(dt)
    hf = h.astype(jnp.float32).reshape(R, W, C)
    n2f, xhat2, rstd2 = _ln_fwd(hf, g2, b2_ref[...].astype(jnp.float32))
    n2 = n2f.astype(dt).reshape(T, C)
    m1 = _dot(n2, w1_ref[...].astype(dt)) + c1_ref[...].astype(jnp.float32)
    gm, dgelu = _gelu_fwd_grad(m1)
    gmd = gm.astype(dt)

    # ---- backward ----
    dy = dy_ref[0].reshape(T, C)  # dt
    dyf = dy.astype(jnp.float32)
    # y = h + m2
    dm2 = dyf
    dw2_ref[...] += jax.lax.dot_general(
        gmd, dm2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dc2_ref[...] += jnp.sum(dm2, axis=0)
    dgm = jax.lax.dot_general(
        dm2.astype(dt), w2_ref[...].astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dm1 = dgm * dgelu
    dw1_ref[...] += jax.lax.dot_general(
        n2, dm1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dc1_ref[...] += jnp.sum(dm1, axis=0)
    dn2 = jax.lax.dot_general(
        dm1.astype(dt), w1_ref[...].astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(R, W, C)
    dh_ln, dg2p, db2p = _ln_bwd(dn2, xhat2, rstd2, g2)
    dg2_ref[...] += dg2p
    db2_ref[...] += db2p
    dh = dyf + dh_ln.reshape(T, C)  # fp32

    # h = x + p;  p = ao @ Wp + bp
    dp = dh
    dwp_ref[...] += jax.lax.dot_general(
        ao, dp, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbp_ref[...] += jnp.sum(dp, axis=0)
    dao = jax.lax.dot_general(
        dp.astype(dt), wp_ref[...].astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
    # reverse the reverse: (T, C) -> (nwr, N, C)
    datt = dao.reshape(ws, nwr, ws, C).transpose(1, 0, 2, 3).reshape(
        nwr, N, C)

    # attention backward per head -> dqkv (window layout)
    dqs, dks, dvs = [], [], []
    for g in range(num_heads):
        q = q3[:, :, g * hd:(g + 1) * hd] * jnp.asarray(scale, dt)
        k = q3[:, :, C + g * hd:C + (g + 1) * hd]
        v = q3[:, :, 2 * C + g * hd:2 * C + (g + 1) * hd]
        sim = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        sim = sim + bias_ref[g][None].astype(jnp.float32)
        if mask_ref is not None:
            sim = sim + mask_ref[...].astype(jnp.float32)
        inr = (jnp.abs(sim) < clip).astype(jnp.float32)
        e32 = jnp.exp(jnp.clip(sim, -clip, clip))
        e = e32.astype(dt)
        s = jnp.sum(e.astype(jnp.float32), axis=-1)
        ctx = jax.lax.dot_general(e, v, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        gg = datt[:, :, g * hd:(g + 1) * hd].astype(jnp.float32) / s[..., None]
        ds = -jnp.sum(gg * ctx, axis=-1) / s
        de = jax.lax.dot_general(
            gg.astype(dt), v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) + ds[..., None]
        dsim = (e32 * de * inr).astype(dt)
        dq = jax.lax.dot_general(dsim, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(dsim, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(e, gg.astype(dt), (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq.astype(dt))
        dks.append(dk.astype(dt))
        dvs.append(dv.astype(dt))
        dbias_ref[g, :, :] += jnp.sum(dsim.astype(jnp.float32), axis=0)

    # (nwr, N, 3C) channel order [q heads | k heads | v heads], then
    # un-partition to (T, 3C) - concatenate, not scatter (Mosaic has no
    # scatter lowering)
    dqkv_w = jnp.concatenate(dqs + dks + dvs, axis=-1)
    dqkv = dqkv_w.reshape(nwr, ws, ws, 3 * C).transpose(1, 0, 2, 3).reshape(
        T, 3 * C)
    dwq_ref[...] += jax.lax.dot_general(
        n1, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbq_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0)
    dn1 = jax.lax.dot_general(
        dqkv, wq_ref[...].astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(R, W, C)
    dx_ln, dg1p, db1p = _ln_bwd(dn1, xhat1, rstd1, g1)
    dg1_ref[...] += dg1p
    db1_ref[...] += db1p
    dx_ref[0] = (dh.reshape(R, W, C).astype(jnp.float32) + dx_ln).astype(dt)


def _full(shape_dtype):
    return pl.BlockSpec(shape_dtype, lambda t: tuple(0 for _ in shape_dtype),
                        memory_space=pltpu.VMEM)


def _pick_split(nwr: int, tokens_x_ch: int, budget: int) -> int:
    """Smallest divisor S of the windows-per-row so a (ws, W/S) tile's
    token*channel volume fits the VMEM-derived budget."""
    for s in range(1, nwr + 1):
        if nwr % s == 0 and tokens_x_ch // s <= budget:
            return s
    return nwr


@functools.lru_cache(maxsize=None)
def _make_block(B, H, W, C, ws, num_heads, hidden, with_mask, dt_name, clip,
                interpret, fwd_budget, bwd_budget):
    dt = jnp.dtype(dt_name)
    nwr = W // ws
    nrows = H // ws
    N = ws * ws
    # tile = a (ws, W/S) strip of one image; budgets are token*channel
    # volumes per tile, tuned on-chip (scripts/swin_block_probe.py) -
    # bigger tiles amortize grid-step overhead until Mosaic's VMEM
    # ceiling (L0 full-row bwd wanted 23.7 MB > 16)
    s_fwd = _pick_split(nwr, ws * W * C, fwd_budget)
    s_bwd = _pick_split(nwr, ws * W * C, bwd_budget)

    def mk_specs(S):
        grid = (B * nrows * S,)
        nt = nrows * S

        def xspec(c):
            return pl.BlockSpec(
                (1, ws, W // S, c),
                lambda t: (t // nt, (t % nt) // S, t % S, 0),
                memory_space=pltpu.VMEM)

        pspecs = [
            _full((C,)), _full((C,)),               # g1, b1
            _full((C, 3 * C)), _full((3 * C,)),     # Wq, bq
            _full((num_heads, N, N)),               # bias
        ]
        if with_mask:
            pspecs.append(pl.BlockSpec((nwr // S, N, N),
                                       lambda t: (t % nt, 0, 0),
                                       memory_space=pltpu.VMEM))
        pspecs += [
            _full((C, C)), _full((C,)),             # Wp, bp
            _full((C,)), _full((C,)),               # g2, b2
            _full((C, hidden)), _full((hidden,)),   # W1, c1
            _full((hidden, C)), _full((C,)),        # W2, c2
        ]
        return grid, xspec, pspecs

    grid, xspec, pspecs = mk_specs(s_fwd)
    grid_b, xspec_b, pspecs_b = mk_specs(s_bwd)

    kw = dict(ws=ws, num_heads=num_heads, clip=clip, dt=dt)

    def fwd_call(x, params, mask):
        args = list(params[:5]) + ([mask] if with_mask else []) + list(params[5:])

        def kern(*refs):
            if with_mask:
                (x_r, g1, b1, wq, bq, bias, m, wp, bp, g2, b2, w1, c1, w2,
                 c2, y) = refs
            else:
                (x_r, g1, b1, wq, bq, bias, wp, bp, g2, b2, w1, c1, w2,
                 c2, y) = refs
                m = None
            _fwd_kernel(x_r, g1, b1, wq, bq, bias, m, wp, bp, g2, b2, w1,
                        c1, w2, c2, y, **kw)

        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[xspec(C)] + pspecs,
            out_specs=xspec(C),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), dt),
            interpret=interpret,
        )(x, *args)

    def bwd_call(x, params, mask, dy):
        args = (list(params[:5]) + ([mask] if with_mask else [])
                + list(params[5:]) + [dy])

        def kern(*refs):
            if with_mask:
                (x_r, g1, b1, wq, bq, bias, m, wp, bp, g2, b2, w1, c1, w2,
                 c2, dy_r) = refs[:16]
                outs = refs[16:]
            else:
                (x_r, g1, b1, wq, bq, bias, wp, bp, g2, b2, w1, c1, w2,
                 c2, dy_r) = refs[:15]
                m = None
                outs = refs[15:]
            _bwd_kernel(x_r, g1, b1, wq, bq, bias, m, wp, bp, g2, b2, w1,
                        c1, w2, c2, dy_r, *outs, **kw)

        f32 = jnp.float32
        out_shapes = (
            jax.ShapeDtypeStruct((B, H, W, C), dt),        # dx
            jax.ShapeDtypeStruct((C,), f32),               # dg1
            jax.ShapeDtypeStruct((C,), f32),               # db1
            jax.ShapeDtypeStruct((C, 3 * C), f32),         # dWq
            jax.ShapeDtypeStruct((3 * C,), f32),           # dbq
            jax.ShapeDtypeStruct((num_heads, N, N), f32),  # dbias
            jax.ShapeDtypeStruct((C, C), f32),             # dWp
            jax.ShapeDtypeStruct((C,), f32),               # dbp
            jax.ShapeDtypeStruct((C,), f32),               # dg2
            jax.ShapeDtypeStruct((C,), f32),               # db2
            jax.ShapeDtypeStruct((C, hidden), f32),        # dW1
            jax.ShapeDtypeStruct((hidden,), f32),          # dc1
            jax.ShapeDtypeStruct((hidden, C), f32),        # dW2
            jax.ShapeDtypeStruct((C,), f32),               # dc2
        )
        out_specs = (xspec_b(C),) + tuple(
            _full(s.shape) for s in out_shapes[1:]
        )
        return pl.pallas_call(
            kern,
            grid=grid_b,
            in_specs=[xspec_b(C)] + pspecs_b + [xspec_b(C)],
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(x, *args)

    @jax.custom_vjp
    def block(x, params, mask):
        return fwd_call(x, params, mask)

    def block_fwd(x, params, mask):
        return fwd_call(x, params, mask), (x, params, mask)

    def block_bwd(res, dy):
        x, params, mask = res
        outs = bwd_call(x, params, mask, dy)
        dx, dparams = outs[0], outs[1:]
        dparams = tuple(d.astype(p.dtype) for d, p in zip(dparams, params))
        return dx, dparams, None

    block.defvjp(block_fwd, block_bwd)
    return block


def fused_swin_block(x, params, mask=None, *, resolution, window_size,
                     num_heads, shift=0, clip=60.0, interpret=False,
                     fwd_budget=60000, bwd_budget=30000):
    """One full SwinBlock on (B, L, C) tokens via the fused kernel.

    params: tuple (g1, b1, Wq, bq, bias_hNN, Wp, bp, g2, b2, W1, c1, W2, c2)
    — the exact tensors of the XLA SwinBlock (bias already expanded from
    the relative-position table, so the table's grad flows through XLA).
    shift>0 applies the cyclic roll outside the kernel (it commutes with
    everything but the partition) and requires the matching SW-MSA mask.
    """
    H, W = resolution
    B, L, C = x.shape
    if interpret is False and jax.default_backend() == "cpu":
        interpret = True
    x4 = x.reshape(B, H, W, C)
    if shift > 0:
        x4 = jnp.roll(x4, shift=(-shift, -shift), axis=(1, 2))
    hidden = params[9].shape[1]
    import os
    fwd_budget = int(os.environ.get("DMHOMO_SWINBLK_FWD_BUDGET", fwd_budget))
    bwd_budget = int(os.environ.get("DMHOMO_SWINBLK_BWD_BUDGET", bwd_budget))
    block = _make_block(B, H, W, C, window_size, num_heads, hidden,
                        mask is not None, jnp.dtype(x.dtype).name,
                        float(clip), bool(interpret),
                        fwd_budget, bwd_budget)
    y = block(x4, tuple(params), mask)
    if shift > 0:
        y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))
    return y.reshape(B, L, C)
