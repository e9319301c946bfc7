"""Pallas fused-linear-attention kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmhomo_tpu.ops.linear_attention import (
    _fused_forward,
    _pick_tile,
    _ref_linear_attention,
    fused_linear_attention,
)


def test_pick_tile():
    assert _pick_tile(65536) == 2048
    assert _pick_tile(4096) == 2048
    assert _pick_tile(1024) == 1024
    assert _pick_tile(640) == 128
    assert _pick_tile(100) == 0  # ragged -> fallback


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference_interpret(rng, dtype):
    """The actual Pallas kernel logic (interpret mode) vs the jnp reference."""
    B, N, C, H, D = 2, 512, 32, 4, 32
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.normal(0, 0.1, (C, 3 * H * D)).astype(np.float32))
    fused = _fused_forward(x, w, H, D, tile=128, interpret=True)
    ref = _ref_linear_attention(x, w, H, D)
    atol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(ref, np.float32), atol=atol
    )


def test_kernel_tile_invariance(rng):
    """Different tile sizes give identical results (online-softmax combine)."""
    B, N, C, H, D = 1, 1024, 16, 2, 16
    x = jnp.asarray(rng.normal(0, 2, (B, N, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (C, 3 * H * D)).astype(np.float32))
    o1 = _fused_forward(x, w, H, D, tile=128, interpret=True)
    o2 = _fused_forward(x, w, H, D, tile=512, interpret=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_public_entry_falls_back_on_cpu(rng):
    """On the CPU backend the public op must route to the jnp reference."""
    B, N, C, H, D = 1, 256, 16, 2, 16
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (C, 3 * H * D)).astype(np.float32))
    out = fused_linear_attention(x, w, H, D)
    ref = _ref_linear_attention(x, w, H, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_gradients_flow_through_custom_vjp(rng):
    B, N, C, H, D = 1, 256, 16, 2, 16
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (C, 3 * H * D)).astype(np.float32))

    def loss(w):
        return fused_linear_attention(x, w, H, D).sum()

    g = jax.grad(loss)(w)
    # must equal the reference gradient exactly (bwd recomputes the ref)
    g_ref = jax.grad(lambda w: _ref_linear_attention(x, w, H, D).sum())(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-6)
    assert float(jnp.abs(g).max()) > 0
