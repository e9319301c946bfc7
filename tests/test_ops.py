"""Linear-attention op tests: block-diagonal XLA path (the production op)
vs the naive jnp reference, plus the retained Pallas kernel in interpret
mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmhomo_tpu.ops.linear_attention import (
    _fused_forward,
    _pick_tile,
    _ref_linear_attention,
    blockdiag_linear_attention,
    fused_linear_attention,
    pallas_linear_attention,
)


def test_pick_tile():
    assert _pick_tile(65536) == 2048
    assert _pick_tile(4096) == 2048
    assert _pick_tile(1024) == 1024
    assert _pick_tile(640) == 128
    assert _pick_tile(100) == 0  # ragged -> fallback


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_blockdiag_matches_reference(rng, dtype):
    """The production op (block-diagonal formulation) vs the jnp reference."""
    B, N, C, H, D = 2, 512, 32, 4, 32
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.normal(0, 0.1, (C, 3 * H * D)).astype(np.float32))
    out = blockdiag_linear_attention(x, w, H, D)
    ref = _ref_linear_attention(x, w, H, D)
    atol = 1e-6 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol
    )


def test_blockdiag_ragged_and_odd_shapes(rng):
    """No tiling constraint: any (B, N, C) works, incl. ragged N."""
    for B, N, C, H, D in ((1, 100, 16, 2, 16), (3, 257, 24, 4, 8)):
        x = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.1, (C, 3 * H * D)).astype(np.float32))
        out = fused_linear_attention(x, w, H, D)
        ref = _ref_linear_attention(x, w, H, D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_blockdiag_gradients_match_reference(rng):
    """Native autodiff through the block-diagonal form equals the reference
    gradient (replaces the old custom_vjp recompute)."""
    B, N, C, H, D = 1, 256, 16, 2, 16
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (C, 3 * H * D)).astype(np.float32))

    gx, gw = jax.grad(lambda x, w: fused_linear_attention(x, w, H, D).sum(), (0, 1))(x, w)
    gx_r, gw_r = jax.grad(lambda x, w: _ref_linear_attention(x, w, H, D).sum(), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=1e-5)
    assert float(jnp.abs(gw).max()) > 0


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_kernel_matches_reference_interpret(rng, dtype):
    """The retained Pallas kernel logic (interpret mode) vs the reference."""
    B, N, C, H, D = 2, 512, 32, 4, 32
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.normal(0, 0.1, (C, 3 * H * D)).astype(np.float32))
    fused = _fused_forward(x, w, H, D, tile=128, interpret=True)
    ref = _ref_linear_attention(x, w, H, D)
    atol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(ref, np.float32), atol=atol
    )


def test_pallas_kernel_tile_invariance(rng):
    """Different tile sizes give identical results (online-softmax combine)."""
    B, N, C, H, D = 1, 1024, 16, 2, 16
    x = jnp.asarray(rng.normal(0, 2, (B, N, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (C, 3 * H * D)).astype(np.float32))
    o1 = _fused_forward(x, w, H, D, tile=128, interpret=True)
    o2 = _fused_forward(x, w, H, D, tile=512, interpret=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_pallas_entry_ragged_fallback(rng):
    """pallas_linear_attention falls back to the reference on ragged N."""
    B, N, C, H, D = 1, 100, 16, 2, 16
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (C, 3 * H * D)).astype(np.float32))
    out = pallas_linear_attention(x, w, H, D)
    ref = _ref_linear_attention(x, w, H, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_blockdiag_prenorm_fold_matches_explicit_ln(rng):
    """Folding a channelwise pre-LayerNorm into the qkv projection
    (prenorm=(mean, rstd, gain)) equals normalizing first: LN(x) @ W ==
    rstd * (x @ diag(g)W - mean * (g @ W))."""
    B, N, C, H, D = 2, 256, 32, 4, 32
    x = jnp.asarray(rng.normal(3.0, 2.0, (B, N, C)).astype(np.float32))  # nonzero mean
    w = jnp.asarray(rng.normal(0, 0.1, (C, 3 * H * D)).astype(np.float32))
    g = jnp.asarray(rng.normal(1.0, 0.2, (C,)).astype(np.float32))

    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    y = (x - mean) * rstd * g

    folded = blockdiag_linear_attention(x, w, H, D, prenorm=(mean, rstd, g))
    explicit = blockdiag_linear_attention(y, w, H, D)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(explicit), atol=2e-5)


# ---------------------------------------------------------------------------
# fused window attention (ops/window_attention.py)


def _win_attn_xla(qkv, bias, mask, num_heads, clip=60.0):
    """The max-free clipped-softmax branch of models/swin.py, stand-alone."""
    Bn, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    dt = qkv.dtype
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(Bn, N, num_heads, hd)
    k = k.reshape(Bn, N, num_heads, hd)
    v = v.reshape(Bn, N, num_heads, hd)
    sim = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
    sim = sim + jnp.transpose(bias, (0, 1, 2))[None].astype(jnp.float32)
    if mask is not None:
        nW = mask.shape[0]
        sim = sim.reshape(Bn // nW, nW, num_heads, N, N) + jnp.asarray(
            mask, jnp.float32)[None, :, None]
        sim = sim.reshape(Bn, num_heads, N, N)
    e = jnp.exp(jnp.clip(sim, -clip, clip)).astype(dt)
    s = jnp.sum(e.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhij,bjhd->bihd", e, v, preferred_element_type=jnp.float32)
    out = (out / s.transpose(0, 2, 1)[..., None]).astype(dt)
    return out.reshape(Bn, N, C)


def test_fused_window_attention_small_window(rng):
    """ws=4 (N=16) — the learning-demo shape: the kernel must stay exact
    below the 128-lane width (Mosaic pads internally)."""
    from dmhomo_tpu.ops.window_attention import fused_window_attention

    B, nW, N, h, hd = 2, 8, 16, 2, 8
    C = h * hd
    qkv = jnp.asarray(rng.normal(0, 1, (B * nW, N, 3 * C)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, (h, N, N)), jnp.float32)
    got = fused_window_attention(qkv, bias, None, num_heads=h, interpret=True)
    want = _win_attn_xla(qkv, bias, None, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_window_attention_matches_xla(rng, with_mask, dtype):
    """Pallas fused W-MSA/SW-MSA (interpret mode) vs the swin.py max-free
    branch: forward values match (ref swin_multi.py:330-430 semantics)."""
    from dmhomo_tpu.ops.window_attention import fused_window_attention

    B, nW, N, h, hd = 2, 6, 64, 3, 8
    C = h * hd
    Bn = B * nW
    qkv = jnp.asarray(rng.normal(0, 1, (Bn, N, 3 * C)), dtype)
    bias = jnp.asarray(rng.normal(0, 0.5, (h, N, N)), jnp.float32)
    mask = None
    if with_mask:
        m = np.zeros((nW, N, N), np.float32)
        m[rng.uniform(size=(nW, N, N)) < 0.3] = -100.0
        mask = jnp.asarray(m)

    got = fused_window_attention(qkv, bias, mask, num_heads=h, interpret=True)
    want = _win_attn_xla(qkv, bias, mask, h)
    atol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=atol
    )


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_window_attention_grads_match_xla(rng, with_mask):
    """custom_vjp backward (flash-style recompute) vs autodiff through the
    XLA branch: dqkv and dbias match."""
    from dmhomo_tpu.ops.window_attention import fused_window_attention

    B, nW, N, h, hd = 1, 4, 64, 2, 8
    C = h * hd
    Bn = B * nW
    qkv = jnp.asarray(rng.normal(0, 1, (Bn, N, 3 * C)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, (h, N, N)), jnp.float32)
    mask = None
    if with_mask:
        m = np.zeros((nW, N, N), np.float32)
        m[rng.uniform(size=(nW, N, N)) < 0.3] = -100.0
        mask = jnp.asarray(m)
    tgt = jnp.asarray(rng.normal(0, 1, (Bn, N, C)), jnp.float32)

    def loss_fused(qkv, bias):
        o = fused_window_attention(qkv, bias, mask, num_heads=h, interpret=True)
        return jnp.sum((o - tgt) ** 2)

    def loss_xla(qkv, bias):
        return jnp.sum((_win_attn_xla(qkv, bias, mask, h) - tgt) ** 2)

    gq_f, gb_f = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
    gq_x, gb_x = jax.grad(loss_xla, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_x),
                               rtol=1e-4, atol=1e-4)
