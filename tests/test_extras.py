"""Tests for the BasesHomo model family and the auxiliary modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dmhomo_tpu.models.baseshomo import (
    BasesHomoConfig,
    BasesHomoNet,
    fetch_model,
    subspace_project,
)
from dmhomo_tpu.models.extras import (
    ASPP,
    Discriminator,
    MaskPredictor,
    SpatialAttention,
    WindowCrossAttention,
    gradient_reversal,
    pixel_shuffle,
    pixel_unshuffle,
)
from dmhomo_tpu.geometry import apply_homography

from reference_oracle import make_reference_baseshomo, reference_available

needs_ref = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


def test_subspace_project_matches_torch(rng):
    x = rng.normal(0, 1, (2, 8, 12, 6)).astype(np.float32)
    v = rng.normal(0, 1, (2, 8, 12, 4)).astype(np.float32)
    ours = np.asarray(subspace_project(jnp.asarray(x), jnp.asarray(v)))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    tv = torch.from_numpy(v).permute(0, 3, 1, 2)
    b, c, h, w = tx.shape
    Vt = tv.reshape(b, 4, h * w)
    Vt = Vt / (1e-6 + Vt.abs().sum(dim=2, keepdim=True))
    V = Vt.permute(0, 2, 1)
    mat_inv = torch.inverse(torch.bmm(Vt, V))
    project_mat = torch.bmm(mat_inv, Vt)
    input_ = tx.reshape(b, c, h * w)
    pf = torch.bmm(project_mat, input_.permute(0, 2, 1))
    golden = torch.bmm(V, pf).permute(0, 2, 1).reshape(b, c, h, w)
    golden = golden.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-3)


def test_baseshomo_forward_shapes(rng):
    cfg = BasesHomoConfig(crop_size=(64, 96))
    model = BasesHomoNet(cfg)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 96, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["homo_f"].shape == (2, 3, 3)
    assert out["offset_f"].shape == (2, 8)
    np.testing.assert_allclose(np.asarray(out["homo_f"][:, 2, 2]), 1.0, atol=1e-5)
    # H must map corners to corners + offsets
    corners = jnp.asarray([[0, 0], [95, 0], [0, 63], [95, 63]], jnp.float32)
    mapped = apply_homography(out["homo_f"], jnp.broadcast_to(corners, (2, 4, 2)))
    golden = corners[None] + np.asarray(out["offset_f"]).reshape(2, 4, 2)
    np.testing.assert_allclose(np.asarray(mapped), golden, atol=1e-2)


def test_fetch_model_dispatch():
    m1 = fetch_model("BasesHomo")
    m2 = fetch_model("HomoGAN")
    assert type(m1).__name__ == "BasesHomoNet"
    assert type(m2).__name__ == "HomographyEstimator"
    with pytest.raises(NotImplementedError):
        fetch_model("nope")


@needs_ref
def test_baseshomo_import_forward_parity(rng):
    torch.manual_seed(5)
    crop = (64, 96)
    ref = make_reference_baseshomo(crop_size=crop)
    ref.eval()

    from dmhomo_tpu.models.import_torch import import_baseshomo_state_dict

    cfg = BasesHomoConfig(crop_size=crop)
    model = BasesHomoNet(cfg)
    params, batch_stats = import_baseshomo_state_dict(ref.state_dict(), cfg)

    x0 = jnp.zeros((1, *crop, 2))
    init_vars = model.init(jax.random.PRNGKey(0), x0, train=False)

    def shapes(tree):
        return {
            "/".join(str(k.key) for k in path): leaf.shape
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert shapes(init_vars["params"]) == shapes(params)
    assert shapes(init_vars.get("batch_stats", {})) == shapes(batch_stats)

    # Full-forward numeric parity is not testable at random init: the
    # subspace projection inverts V^T V of *untrained* basis maps, which is
    # ill-conditioned - fp32 torch.inverse vs jnp solve diverge ~1e-1 and
    # the divergence amplifies chaotically through layer4.  Instead verify
    # stage-by-stage: stem + layers1-3 end-to-end (tight), then the
    # remaining stages in isolation.
    import flax.linen as nn

    from dmhomo_tpu.models.baseshomo import BasicBlock, ShareFeature, Subspace

    patch = rng.normal(0, 0.5, (2, *crop, 2)).astype(np.float32)
    t_patch = torch.from_numpy(patch).permute(0, 3, 1, 2)

    with torch.no_grad():
        f1_t = ref.share_feature(t_patch[:, :1])
        f2_t = ref.share_feature(t_patch[:, 1:])
        x_t = torch.cat([f1_t, f2_t], 1)
        y_t = ref.maxpool(ref.relu(ref.bn1(ref.conv1(x_t))))
        l3_t = ref.layer3(ref.layer2(ref.layer1(y_t)))

    sf = ShareFeature()
    f1 = sf.apply(
        {"params": params["share_feature"], "batch_stats": batch_stats["share_feature"]},
        jnp.asarray(patch[..., :1]), train=False,
    )
    f2 = sf.apply(
        {"params": params["share_feature"], "batch_stats": batch_stats["share_feature"]},
        jnp.asarray(patch[..., 1:2]), train=False,
    )
    xj = jnp.concatenate([f1, f2], -1)
    xj = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False).apply(
        {"params": params["conv1"]}, xj
    )
    xj = nn.BatchNorm(use_running_average=True, epsilon=1e-5).apply(
        {"params": params["bn1"], "batch_stats": batch_stats["bn1"]}, xj
    )
    xj = nn.max_pool(nn.leaky_relu(xj, 0.01), (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    def blockseq(xj, layer, planes, n):
        for bi in range(n):
            name = f"layer{layer}_block{bi}"
            xj = BasicBlock(planes, 2 if (bi == 0 and layer > 1) else 1).apply(
                {"params": params[name], "batch_stats": batch_stats[name]}, xj, train=False
            )
        return xj

    xj = blockseq(xj, 1, 64, 3)
    xj = blockseq(xj, 2, 128, 4)
    xj = blockseq(xj, 3, 256, 6)
    err = np.abs(np.asarray(xj) - l3_t.permute(0, 2, 3, 1).numpy()).max()
    assert err < 5e-3, f"stem+layers1-3 mismatch {err}"

    # layer4 + conv_last in isolation (bypassing the chaotic subspace)
    z = rng.normal(0, 0.5, (2, 8, 12, 256)).astype(np.float32)
    with torch.no_grad():
        l4_t = ref.layer4(torch.from_numpy(z).permute(0, 3, 1, 2))
        cl_t = ref.conv_last(l4_t)
    zj = blockseq(jnp.asarray(z), 4, 512, 3)
    err = np.abs(np.asarray(zj) - l4_t.permute(0, 2, 3, 1).numpy()).max()
    assert err < 5e-3, f"layer4 mismatch {err}"
    clj = nn.Conv(8, (1, 1), use_bias=False, feature_group_count=8).apply(
        {"params": params["conv_last"]}, zj
    )
    err = np.abs(np.asarray(clj) - cl_t.permute(0, 2, 3, 1).numpy()).max()
    assert err < 5e-3, f"conv_last mismatch {err}"

    # subspace stage in isolation with well-conditioned input
    w = rng.normal(0, 0.2, (1, 8, 12, 256)).astype(np.float32)
    with torch.no_grad():
        s3_t = ref.sp_layer3(torch.from_numpy(w).permute(0, 3, 1, 2))
    s3j = Subspace(16).apply(
        {"params": params["sp_layer3"], "batch_stats": batch_stats["sp_layer3"]},
        jnp.asarray(w), train=False,
    )
    err = np.abs(np.asarray(s3j) - s3_t.permute(0, 2, 3, 1).numpy()).max()
    assert err < 0.3, f"sp_layer3 mismatch {err} (loose: fp32 inverse conditioning)"


# ---------------------------------------------------------------------------
# extras
# ---------------------------------------------------------------------------


def test_gradient_reversal():
    f = lambda x: jnp.sum(gradient_reversal(x, 2.0) ** 1)
    g = jax.grad(f)(jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(g), -2.0)
    # forward is identity
    np.testing.assert_allclose(np.asarray(gradient_reversal(jnp.arange(3.0))), [0, 1, 2])


def test_pixel_shuffle_roundtrip(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 4)).astype(np.float32))
    d = pixel_unshuffle(x, 2)
    assert d.shape == (2, 4, 4, 16)
    back = pixel_shuffle(d, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_pixel_unshuffle_matches_torch(rng):
    x = rng.normal(0, 1, (1, 6, 8, 4)).astype(np.float32)
    ours = np.asarray(pixel_unshuffle(jnp.asarray(x), 2))
    golden = (
        torch.nn.functional.pixel_unshuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    # torch pixel_unshuffle interleaves channels as (C, r, r); ours is
    # (r, r, C) - both are valid packings and roundtrip with their own
    # shuffle; check content equality up to that fixed permutation
    B, H2, W2, C16 = ours.shape
    ours_r = ours.reshape(B, H2, W2, 2, 2, 4).transpose(0, 1, 2, 5, 3, 4).reshape(B, H2, W2, C16)
    np.testing.assert_allclose(ours_r, golden, atol=1e-6)


def test_discriminator_shapes(rng):
    m = Discriminator(in_channels=1)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 2)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 1)


def test_spatial_attention_and_mask_predictor(rng):
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 2)).astype(np.float32))
    mp = MaskPredictor()
    v = mp.init(jax.random.PRNGKey(0), x)
    mask = mp.apply(v, x)
    assert mask.shape == (1, 16, 16, 1)
    m = np.asarray(mask)
    assert (m >= 0).all() and (m <= 1).all()

    sa = SpatialAttention(dim=8, num_heads=2)
    xs = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 8)).astype(np.float32))
    vs = sa.init(jax.random.PRNGKey(0), xs)
    out = sa.apply(vs, xs)
    assert out.shape == xs.shape


def test_aspp_shapes(rng):
    m = ASPP(out_channels=16, dilations=(1, 2, 4))
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 32, 8)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 32, 32, 16)


def test_window_cross_attention(rng):
    m = WindowCrossAttention(dim=16, window_size=4, num_heads=2)
    xa = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 16)).astype(np.float32))
    xb = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 16)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), xa, xb)
    out = m.apply(v, xa, xb)
    assert out.shape == xa.shape
    # output depends on xb (it is cross attention)
    out2 = m.apply(v, xa, xb * 2.0)
    assert np.abs(np.asarray(out - out2)).max() > 1e-6
