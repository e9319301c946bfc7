"""Shape/behaviour tests for the UNet and Swin/estimator models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmhomo_tpu.models import (
    ConditionalUNet,
    EstimatorConfig,
    HomographyEstimator,
    SwinConfig,
    SwinTransformer,
    UNetConfig,
)
from dmhomo_tpu.models.estimator import upsample_outputs
from dmhomo_tpu.models.swin import (
    relative_position_index,
    shifted_window_mask,
    window_partition,
    window_reverse,
)


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


def _tiny_unet(num_classes=5):
    return ConditionalUNet(UNetConfig(dim=16, num_classes=num_classes, dim_mults=(1, 2)))


def _unet_inputs(B=2, H=32):
    return dict(
        x=jnp.zeros((B, H, H, 6)),
        time=jnp.linspace(3, 500, B).astype(jnp.int32),
        classes=jnp.zeros((B,), jnp.int32),
        rgb_flow=jnp.zeros((B, H, H, 3)),
        mask=jnp.ones((B, H, H, 1)),
        keep_mask=jnp.ones((B,), bool),
    )


def test_unet_shapes_and_init():
    model = _tiny_unet()
    inp = _unet_inputs()
    variables = model.init(jax.random.PRNGKey(0), **inp)
    out = model.apply(variables, **inp)
    assert out.shape == (2, 32, 32, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_full_config_param_count():
    """The shipped config (dim=64, mults 1-2-4-8, 9->6ch) must exactly match
    the reference UNet's parameter count."""
    model = ConditionalUNet(UNetConfig(dim=64, num_classes=5))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), **_unet_inputs(1, 256))
    )
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables))
    # the reference torch Unet(dim=64, mults (1,2,4,8), ch 6, classes 5)
    # has exactly 38,417,990 parameters - structural parity check
    assert n == 38_417_990, f"param count {n} != reference 38,417,990"


def test_unet_null_class_embedding_changes_output():
    model = _tiny_unet()
    inp = _unet_inputs()
    variables = model.init(jax.random.PRNGKey(0), **inp)
    out_cond = model.apply(variables, **inp)
    inp_null = dict(inp, keep_mask=jnp.zeros((2,), bool))
    out_null = model.apply(variables, **inp_null)
    assert np.abs(np.asarray(out_cond - out_null)).max() > 1e-6


def test_unet_keep_mask_per_sample():
    """Per-sample keep_mask == concatenating cond and null runs (CFG batching)."""
    model = _tiny_unet()
    inp = _unet_inputs()
    variables = model.init(jax.random.PRNGKey(0), **inp)
    mixed = dict(inp, keep_mask=jnp.asarray([True, False]))
    out_mixed = model.apply(variables, **mixed)
    out_cond = model.apply(variables, **inp)
    out_null = model.apply(variables, **dict(inp, keep_mask=jnp.zeros((2,), bool)))
    np.testing.assert_allclose(np.asarray(out_mixed[0]), np.asarray(out_cond[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_mixed[1]), np.asarray(out_null[1]), atol=1e-5)


def test_unet_condition_channels_used():
    model = _tiny_unet()
    inp = _unet_inputs()
    variables = model.init(jax.random.PRNGKey(0), **inp)
    out0 = model.apply(variables, **inp)
    inp2 = dict(inp, rgb_flow=jnp.ones((2, 32, 32, 3)) * 0.5)
    out1 = model.apply(variables, **inp2)
    assert np.abs(np.asarray(out0 - out1)).max() > 1e-6
    # with mask == 0 the rgb_flow condition is gated off (x concat rgb*mask)
    inp3 = dict(inp2, mask=jnp.zeros((2, 32, 32, 1)))
    inp4 = dict(inp, mask=jnp.zeros((2, 32, 32, 1)))
    np.testing.assert_allclose(
        np.asarray(model.apply(variables, **inp3)),
        np.asarray(model.apply(variables, **inp4)),
        atol=1e-6,
    )


# ---------------------------------------------------------------------------
# Swin pieces
# ---------------------------------------------------------------------------


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 24, 3)).astype(np.float32))
    wins = window_partition(x, 8)
    assert wins.shape == (2 * 2 * 3, 64, 3)
    back = window_reverse(wins, 8, 16, 24)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_relative_position_index_matches_torch():
    import torch

    ws = 8
    coords = torch.stack(torch.meshgrid([torch.arange(ws), torch.arange(ws)], indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    golden = rel.sum(-1).numpy()
    np.testing.assert_array_equal(relative_position_index(ws), golden)


def test_shifted_window_mask_matches_torch():
    import torch

    H, W, ws, shift = 40, 72, 8, 4
    img_mask = torch.zeros((1, H, W, 1))
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = img_mask.view(1, H // ws, ws, W // ws, ws, 1)
    mw = mw.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    att = mw.unsqueeze(1) - mw.unsqueeze(2)
    golden = att.masked_fill(att != 0, -100.0).masked_fill(att == 0, 0.0).numpy()
    np.testing.assert_allclose(shifted_window_mask(H, W, ws, shift), golden)


def _small_swin_cfg():
    # small but same structure; all pyramid resolutions divide the window
    return SwinConfig(
        crop_size=(64, 128),
        embed_dim=8,
        depths=(2, 2, 2),
        layer_depth=(3, 2, 1),
        num_heads=(2, 4, 8),
        window_size=4,
        mlp_ratio=2.0,
    )


def test_swin_forward_shapes():
    cfg = _small_swin_cfg()
    model = SwinTransformer(cfg)
    x = jnp.zeros((2, 64, 128, 2))
    variables = model.init(jax.random.PRNGKey(0), x)
    w = model.apply(variables, x)
    assert w.shape == (2, 8, 1)
    assert np.isfinite(np.asarray(w)).all()


def test_swin_per_level_attn_impl_spec(rng):
    """A comma-separated attn_impl ('xla,xla,xla') must behave exactly like
    the plain name - the per-level spec only routes the impl choice (the r5
    fused_block-at-C=96 A/B lever)."""
    import dataclasses

    cfg = _small_swin_cfg()
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 128, 2)).astype(np.float32))
    model = SwinTransformer(cfg)
    variables = model.init(jax.random.PRNGKey(0), x)
    base = model.apply(variables, x)
    spec = SwinTransformer(dataclasses.replace(cfg, attn_impl="xla,xla,xla"))
    got = spec.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_estimator_forward_and_eval_views(rng):
    cfg = EstimatorConfig(crop_size=(64, 128), ori_size=(72, 144), swin=_small_swin_cfg())
    model = HomographyEstimator(cfg)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 128, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert out["flow_f"].shape == (2, 64, 128, 2)
    assert out["mask_f"].shape == (2, 64, 128, 1)
    m = np.asarray(out["mask_f"])
    assert (m >= 0).all() and (m <= 1).all()
    assert "batch_stats" in mutated

    full = upsample_outputs(out, (72, 144))
    assert full["flow_f"].shape == (2, 72, 144, 2)
    assert full["mask_f"].shape == (2, 72, 144, 1)
    fusion = np.asarray(full["mask_fusion"])
    assert fusion.min() >= -1e-6 and np.isfinite(fusion).all()


@pytest.mark.heavy  # shipped-off flag equivalence (BENCH r5: 'split' is
# measured-negative on chip); runs by default, skipped in the fast loop
def test_mask_head_split_impl_matches_concat(rng):
    """FlowMaskEstimator impl='split' (sliced-kernel convs over implicit
    concats) == impl='concat' (the reference formulation): same param tree,
    same values, same grads — fp32 tight, bf16 within rounding."""
    from dmhomo_tpu.models.estimator import FlowMaskEstimator

    x = jnp.asarray(rng.normal(0, 1, (2, 16, 24, 2)).astype(np.float32))

    def loss(p, m):
        return jnp.mean(m.apply(p, x) ** 2)

    # fp32: exact equivalence (same params, same math, fp32 associativity)
    ref = FlowMaskEstimator(dtype=jnp.float32, impl="concat")
    new = FlowMaskEstimator(dtype=jnp.float32, impl="split")
    params = ref.init(jax.random.PRNGKey(0), x)
    params_s = new.init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(jnp.shape, params) == jax.tree.map(jnp.shape, params_s)
    np.testing.assert_allclose(
        np.asarray(params["params"]["conv3"]["kernel"]),
        np.asarray(params_s["params"]["conv3"]["kernel"]))  # same init
    v32, g32 = jax.value_and_grad(loss)(params, ref)
    v_s, g_s = jax.value_and_grad(loss)(params, new)
    np.testing.assert_allclose(float(v_s), float(v32), rtol=2e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-5), g32, g_s)

    # bf16: the two formulations round in different places (split sums
    # fp32-cast partials; concat rounds one conv output), so compare each
    # against the fp32 truth: split must be no worse an approximation
    v_rb, g_rb = jax.value_and_grad(loss)(
        params, FlowMaskEstimator(dtype=jnp.bfloat16, impl="concat"))
    v_sb, g_sb = jax.value_and_grad(loss)(
        params, FlowMaskEstimator(dtype=jnp.bfloat16, impl="split"))
    assert abs(float(v_sb) - float(v32)) <= 4 * abs(float(v_rb) - float(v32)) + 1e-3
    jax.tree.map(
        lambda t, a, b: np.testing.assert_array_less(
            np.abs(np.asarray(b) - np.asarray(t)).max(),
            4 * np.abs(np.asarray(a) - np.asarray(t)).max() + 1e-2),
        g32, g_rb, g_sb)


def test_estimator_swap_symmetry(rng):
    """Backward pass = forward pass with swapped inputs (shared h_net)."""
    cfg = EstimatorConfig(crop_size=(64, 128), swin=_small_swin_cfg())
    model = HomographyEstimator(cfg)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 128, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    x_sw = x[..., ::-1]
    out_sw = model.apply(variables, x_sw, train=False)
    np.testing.assert_allclose(
        np.asarray(out["flow_f"]), np.asarray(out_sw["flow_b"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["weight_b"]), np.asarray(out_sw["weight_f"]), atol=1e-4
    )


@pytest.mark.slow
def test_swin_full_config_compiles():
    """The shipped 320x576 config initializes and runs one forward."""
    model = HomographyEstimator(EstimatorConfig())
    x = jnp.zeros((1, 320, 576, 2))
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(variables))
    assert 0.5e6 < n < 20e6, f"estimator params {n/1e6:.2f}M out of range"


def test_window_attention_packed_matches_naive(rng):
    """The lane-packed W-MSA formulation == the naive per-head einsum,
    with and without the SW-MSA additive mask (fp32)."""
    from dmhomo_tpu.models.swin import WindowAttention, shifted_window_mask

    Bn, ws, h = 6, 4, 3
    N, C = ws * ws, 12
    x = jnp.asarray(rng.normal(0, 1, (Bn, N, C)).astype(np.float32))

    packed = WindowAttention(C, ws, h, packed=True)
    naive = WindowAttention(C, ws, h, packed=False)
    params = packed.init(jax.random.PRNGKey(0), x)["params"]

    o_p = packed.apply({"params": params}, x)
    o_n = naive.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_n), atol=1e-5)

    mask = jnp.asarray(shifted_window_mask(8, 12, ws, 2))  # (nW=6, N, N)
    o_pm = packed.apply({"params": params}, x, mask)
    o_nm = naive.apply({"params": params}, x, mask)
    np.testing.assert_allclose(np.asarray(o_pm), np.asarray(o_nm), atol=1e-5)


def test_window_attention_legacy_softmax_matches(rng):
    """The legacy data-max softmax diagnostic path (now a module flag,
    formerly the DMHOMO_LEGACY_WIN_SOFTMAX env var) == the production
    max-free clipped path, with and without mask."""
    from dmhomo_tpu.models.swin import WindowAttention, shifted_window_mask

    Bn, ws, h = 6, 4, 3
    N, C = ws * ws, 12
    x = jnp.asarray(rng.normal(0, 1, (Bn, N, C)).astype(np.float32))

    prod = WindowAttention(C, ws, h)
    legacy = WindowAttention(C, ws, h, legacy_softmax=True)
    params = prod.init(jax.random.PRNGKey(0), x)["params"]

    np.testing.assert_allclose(
        np.asarray(prod.apply({"params": params}, x)),
        np.asarray(legacy.apply({"params": params}, x)), atol=1e-5)
    mask = jnp.asarray(shifted_window_mask(8, 12, ws, 2))
    np.testing.assert_allclose(
        np.asarray(prod.apply({"params": params}, x, mask)),
        np.asarray(legacy.apply({"params": params}, x, mask)), atol=1e-5)


def test_estimator_diagnostic_config_knobs(rng):
    """ablate_warps / warp_method ride through EstimatorConfig+SwinConfig
    (r4: replaced trace-time env vars).  gather == matmul warp; ablation
    changes the output (the warps really were skipped)."""
    import dataclasses

    from dmhomo_tpu.models.estimator import EstimatorConfig, HomographyEstimator
    from dmhomo_tpu.models.swin import SwinConfig

    crop = (32, 64)
    base = EstimatorConfig(
        crop_size=crop, ori_size=(36, 72),
        swin=SwinConfig(crop_size=crop, embed_dim=6, depths=(1, 1, 1),
                        layer_depth=(3, 2, 1), num_heads=(2, 2, 2)),
    )
    x = jnp.asarray(rng.normal(0, 1, (1, *crop, 2)).astype(np.float32))
    params = HomographyEstimator(base).init(jax.random.PRNGKey(0), x, train=False)

    out = HomographyEstimator(base).apply(params, x, train=False)
    out_g = HomographyEstimator(
        dataclasses.replace(
            base, warp_method="gather",
            swin=dataclasses.replace(base.swin, warp_method="gather"))
    ).apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(out["mask_fusion"]),
                               np.asarray(out_g["mask_fusion"]), atol=1e-4)

    out_a = HomographyEstimator(
        dataclasses.replace(
            base, ablate_warps=True,
            swin=dataclasses.replace(base.swin, ablate_warps=True))
    ).apply(params, x, train=False)
    assert np.abs(np.asarray(out["mask_fusion"]) -
                  np.asarray(out_a["mask_fusion"])).max() > 1e-6

    # ablate_mask: mask heads become ones, flow path untouched (param init
    # is per-path in flax, so fea/h_net params match the full model's)
    cfg_m = dataclasses.replace(base, ablate_mask=True)
    params_m = HomographyEstimator(cfg_m).init(jax.random.PRNGKey(0), x,
                                               train=False)
    assert "mask_generator" not in params_m["params"]
    out_m = HomographyEstimator(cfg_m).apply(params_m, x, train=False)
    assert np.all(np.asarray(out_m["mask_f"]) == 1.0)
    np.testing.assert_allclose(np.asarray(out_m["flow_f"]),
                               np.asarray(out["flow_f"]), atol=1e-6)


@pytest.mark.heavy  # shipped-off flag equivalence (remat_policy is an
# AOT-negative lever, BENCH r3); runs by default, skipped in the fast loop
def test_swin_remat_policy_matches_full_remat(rng):
    """remat_policy='dots_with_no_batch_dims_saveable' gives the same
    outputs and gradients as full SwinBlock remat (it only changes what
    the backward recomputes)."""
    import dataclasses

    from dmhomo_tpu.models.swin import SwinConfig, SwinTransformer

    base = SwinConfig(
        crop_size=(64, 64), embed_dim=8, depths=(1, 1, 1), layer_depth=(3, 2, 1),
        num_heads=(2, 2, 2), remat=True,
    )
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 2)).astype(np.float32))

    m_full = SwinTransformer(base)
    v = m_full.init(jax.random.PRNGKey(0), x, True)

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            x, True, mutable=["batch_stats"],
        )
        return (out * out).sum()

    m_pol = SwinTransformer(
        dataclasses.replace(base, remat_policy="dots_with_no_batch_dims_saveable")
    )
    g_full = jax.grad(lambda p: loss(m_full, p))(v["params"])
    g_pol = jax.grad(lambda p: loss(m_pol, p))(v["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        g_full, g_pol,
    )


@pytest.mark.heavy  # shipped-off flag equivalence (fold_ln is an
# AOT-negative lever, BENCH r3); runs by default, skipped in the fast loop
def test_swin_fold_ln_matches_materialized(rng):
    """fold_ln=True (pre-LayerNorms folded into qkv/MLP epilogues, the fp32
    normalized tensors never materialized) is numerically equivalent to the
    materializing path with the SAME parameter tree: identical tree
    structure/shapes, forward within fp32 rounding, grads within relative
    tolerance."""
    import dataclasses

    cfg = _small_swin_cfg()
    cfg_f = dataclasses.replace(cfg, fold_ln=True)
    m, mf = SwinTransformer(cfg), SwinTransformer(cfg_f)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 128, 2)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    vf = mf.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vf)
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(v),
                                jax.tree_util.tree_leaves_with_path(vf)):
        assert np.asarray(a).shape == np.asarray(b).shape, (ka, kb)

    y1 = m.apply(v, x, train=False)
    y2 = mf.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    def loss(variables, model):
        out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
        return jnp.sum(out**2)

    g1 = jax.grad(lambda p: loss(p, m))(v)
    g2 = jax.grad(lambda p: loss(p, mf))(v)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.max(np.abs(a - b) / np.maximum(np.abs(a), 1e-2))
        assert rel < 5e-3, rel


def test_unet_split_skip_convs_matches_concat(rng):
    """split_skip_convs=True (skip tensors as second conv operands; the
    up-path concats never materialize) is numerically equivalent to the
    concat path with the SAME parameter tree: forward within fp32
    rounding, grads within reassociation noise (scaled per-tensor)."""
    import dataclasses

    from dmhomo_tpu.models import ConditionalUNet, UNetConfig

    cfg = UNetConfig(dim=8, num_classes=2, dim_mults=(1, 2))
    cfg_s = dataclasses.replace(cfg, split_skip_convs=True)
    m, ms = ConditionalUNet(cfg), ConditionalUNet(cfg_s)
    B, S = 2, 16
    args = dict(
        x=jnp.asarray(rng.normal(0, 1, (B, S, S, 6)).astype(np.float32)),
        time=jnp.asarray([3, 7]), classes=jnp.asarray([0, 1]),
        rgb_flow=jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32)),
        mask=jnp.ones((B, S, S, 1)), keep_mask=jnp.asarray([True, False]),
    )
    v = m.init(jax.random.PRNGKey(0), **args)
    vs = ms.init(jax.random.PRNGKey(0), **args)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vs)
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(vs)):
        assert np.asarray(a).shape == np.asarray(b).shape

    y1, y2 = m.apply(v, **args), ms.apply(v, **args)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    g1 = jax.grad(lambda p: jnp.sum(m.apply(p, **args) ** 2))(v)
    g2 = jax.grad(lambda p: jnp.sum(ms.apply(p, **args) ** 2))(v)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(a))), 1.0)
        assert float(np.max(np.abs(a - b))) / scale < 1e-4


def test_patch_embed_matches_reference():
    """PatchEmbed forward parity vs the reference module (swin_multi.py:1063;
    dead params there - constructed but never called, see the module
    docstring - shipped here for API completeness)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from reference_oracle import install_stubs, reference_available
    if not reference_available():
        pytest.skip("reference not mounted")
    install_stubs()
    import torch
    from HEM.model.swin_multi import PatchEmbed as RefPatchEmbed

    from dmhomo_tpu.models.swin import PatchEmbed

    torch.manual_seed(0)
    H, W, C, E, PS = 32, 48, 2, 24, 4
    ref = RefPatchEmbed(img_size=[H, W], patch_size=PS, in_chans=C, embed_dim=E)
    ref.eval()

    m = PatchEmbed(img_size=(H, W), patch_size=PS, embed_dim=E, patch_norm=True)
    x = np.random.default_rng(0).normal(0, 1, (1, H, W, C)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    # copy torch conv weights (OIHW -> HWIO) and the LN affine
    def conv_w(t):
        return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))

    params = jax.tree.map(lambda a: a, params)  # unfreeze copy semantics
    for name, layer in zip(("conv1", "conv2", "proj"), ref.layers):
        params[name]["kernel"] = conv_w(layer.weight)
        params[name]["bias"] = jnp.asarray(layer.bias.detach().numpy())
    params["norm"]["scale"] = jnp.asarray(ref.norm.weight.detach().numpy())
    params["norm"]["bias"] = jnp.asarray(ref.norm.bias.detach().numpy())

    got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("shift", [0, 4])
def test_window_attention_pallas_impl_matches_xla(rng, shift):
    """attn_impl='pallas' (fused kernel) vs the default XLA einsum path:
    same params, same output, through the full SwinBlock (incl. SW-MSA
    mask + relative-position bias)."""
    from dmhomo_tpu.models.swin import SwinBlock

    H = W = 16
    dim, heads, ws = 24, 3, 8
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, H * W, dim)),
                    jnp.float32)

    def run(impl):
        blk = SwinBlock(dim=dim, input_resolution=(H, W), num_heads=heads,
                        window_size=ws, shift_size=shift, mlp_ratio=2.0,
                        attn_impl=impl)
        params = blk.init(jax.random.PRNGKey(0), x)
        return np.asarray(blk.apply(params, x))

    np.testing.assert_allclose(run("pallas"), run("xla"), atol=2e-5)


@pytest.mark.parametrize("shift", [0, 4])
def test_swin_block_fused_impl_matches_xla(rng, shift):
    """attn_impl='fused_block' (whole-block Pallas kernel,
    ops/swin_block.py): identical param tree, forward values and all
    gradients match the unfused module."""
    from dmhomo_tpu.models.swin import SwinBlock

    H = W = 16
    dim, heads, ws = 24, 3, 8
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(0, 1, (2, H * W, dim)), jnp.float32)
    tgt = jnp.asarray(r.normal(0, 1, (2, H * W, dim)), jnp.float32)

    def mk(impl):
        return SwinBlock(dim=dim, input_resolution=(H, W), num_heads=heads,
                         window_size=ws, shift_size=shift, mlp_ratio=2.0,
                         attn_impl=impl)

    params = mk("xla").init(jax.random.PRNGKey(0), x)
    assert (jax.tree.map(lambda a: a.shape, params)
            == jax.tree.map(lambda a: a.shape,
                            mk("fused_block").init(jax.random.PRNGKey(0), x)))

    def loss(impl, p, xx):
        return jnp.sum((mk(impl).apply(p, xx) - tgt) ** 2)

    y1 = mk("xla").apply(params, x)
    y2 = mk("fused_block").apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    gp1, gx1 = jax.grad(lambda p, xx: loss("xla", p, xx), (0, 1))(params, x)
    gp2, gx2 = jax.grad(lambda p, xx: loss("fused_block", p, xx), (0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
    for a, b in zip(jax.tree.leaves(gp1), jax.tree.leaves(gp2)):
        scale = max(float(np.max(np.abs(np.asarray(a)))), 1.0)
        assert float(np.max(np.abs(np.asarray(a - b)))) / scale < 1e-5
