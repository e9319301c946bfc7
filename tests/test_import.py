"""Weight-importer parity: random-init reference models, imported into flax,
must produce numerically matching forwards.  This is the harness that
guarantees DGM.pt / HEM.pth reproduce reference numbers (SURVEY.md section 4 /
BASELINE.md north star).  Guarded on the reference being mounted.

Tier: heavy (torch-oracle builds + forwards are minutes-long on 1 CPU).
Runs by default; deselect with `-m "not heavy"` for the fast dev loop."""

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.heavy

import jax
import jax.numpy as jnp

from dmhomo_tpu.models import (
    ConditionalUNet,
    EstimatorConfig,
    HomographyEstimator,
    SwinConfig,
    UNetConfig,
)
from dmhomo_tpu.models.import_torch import (
    import_estimator_state_dict,
    import_unet_state_dict,
)

from reference_oracle import (
    make_reference_osnet,
    make_reference_unet,
    reference_available,
)

needs_ref = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


@pytest.fixture(autouse=True)
def _clear_basis_overrides():
    """import_estimator_state_dict installs the checkpoint's h_net.basis
    buffer as the process-wide basis for its crop size (required for flow
    parity — torch's fp32 QR is ~2e-2 off the true Q at 320x576).  Clear
    it after each test so non-import tests keep the regenerated basis."""
    yield
    from dmhomo_tpu.geometry import basis as _basis

    _basis._BASIS_OVERRIDES.clear()


def _tree_shapes(tree):
    return {
        "/".join(str(k.key) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


@needs_ref
def test_unet_import_forward_parity():
    torch.manual_seed(0)
    ref = make_reference_unet(num_classes=5)
    ref.eval()
    sd = ref.state_dict()

    cfg = UNetConfig(dim=64, num_classes=5)
    model = ConditionalUNet(cfg)
    params = import_unet_state_dict(sd, cfg)

    # structure: imported tree must exactly match an init tree
    B, S = 2, 64
    inp = dict(
        x=jnp.zeros((B, S, S, 6)),
        time=jnp.asarray([7, 531]),
        classes=jnp.asarray([1, 3], jnp.int32),
        rgb_flow=jnp.zeros((B, S, S, 3)),
        mask=jnp.ones((B, S, S, 1)),
        keep_mask=jnp.ones((B,), bool),
    )
    ref_tree = _tree_shapes(model.init(jax.random.PRNGKey(0), **inp)["params"])
    got_tree = _tree_shapes(params)
    assert ref_tree == got_tree

    # forward parity on random input
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (B, S, S, 6)).astype(np.float32)
    rgb = rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32)
    mask = rng.uniform(0, 1, (B, S, S, 1)).astype(np.float32)
    t = np.asarray([7, 531])
    classes = np.asarray([1, 3])

    ours = model.apply(
        {"params": params},
        jnp.asarray(x), jnp.asarray(t), jnp.asarray(classes),
        jnp.asarray(rgb), jnp.asarray(mask), jnp.ones((B,), bool),
    )

    with torch.no_grad():
        golden = ref(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(t),
            torch.from_numpy(classes),
            torch.from_numpy(rgb).permute(0, 3, 1, 2),
            torch.from_numpy(mask).permute(0, 3, 1, 2),
            cond_drop_prob=0.0,
        )
    golden = golden.permute(0, 2, 3, 1).numpy()
    err = np.abs(np.asarray(ours) - golden).max()
    assert err < 5e-3, f"UNet forward mismatch {err}"


@needs_ref
def test_unet_null_embedding_parity():
    """cond_drop_prob=1 (all null) must also match."""
    torch.manual_seed(1)
    ref = make_reference_unet(num_classes=5)
    ref.eval()
    cfg = UNetConfig(dim=64, num_classes=5)
    model = ConditionalUNet(cfg)
    params = import_unet_state_dict(ref.state_dict(), cfg)

    rng = np.random.default_rng(1)
    B, S = 1, 64
    x = rng.normal(0, 1, (B, S, S, 6)).astype(np.float32)
    rgb = rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32)
    mask = np.ones((B, S, S, 1), np.float32)
    t = np.asarray([100])
    classes = np.asarray([2])

    ours = model.apply(
        {"params": params},
        jnp.asarray(x), jnp.asarray(t), jnp.asarray(classes),
        jnp.asarray(rgb), jnp.asarray(mask), jnp.zeros((B,), bool),
    )
    with torch.no_grad():
        golden = ref(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t),
            torch.from_numpy(classes), torch.from_numpy(rgb).permute(0, 3, 1, 2),
            torch.from_numpy(mask).permute(0, 3, 1, 2), cond_drop_prob=1.0,
        )
    err = np.abs(np.asarray(ours) - golden.permute(0, 2, 3, 1).numpy()).max()
    assert err < 5e-3, f"null-class forward mismatch {err}"


@needs_ref
def test_estimator_import_forward_parity():
    torch.manual_seed(2)
    crop = (64, 128)
    ref = make_reference_osnet(crop_size=crop)
    ref.eval()
    sd = ref.state_dict()

    cfg = EstimatorConfig(
        crop_size=crop,
        ori_size=(72, 144),
        swin=SwinConfig(crop_size=crop),
    )
    model = HomographyEstimator(cfg)
    params, batch_stats = import_estimator_state_dict(sd, cfg)

    # tree structure parity with an init tree
    x0 = jnp.zeros((1, *crop, 2))
    init_vars = model.init(jax.random.PRNGKey(0), x0, train=False)
    assert _tree_shapes(init_vars["params"]) == _tree_shapes(params)
    assert _tree_shapes(init_vars.get("batch_stats", {})) == _tree_shapes(batch_stats)

    rng = np.random.default_rng(2)
    patch = rng.normal(0, 1, (2, *crop, 2)).astype(np.float32)

    ours = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(patch), train=False
    )

    t_patch = torch.from_numpy(patch).permute(0, 3, 1, 2)
    data_batch = {
        "imgs_gray_patch": t_patch,
        "imgs_gray_full": t_patch,  # full==patch keeps the eval branch trivial
        "imgs_rgb_full": torch.zeros(2, 6, *crop),
        "ganhomo_mask": torch.ones(2, 1, *crop),
    }
    with torch.no_grad():
        golden = ref(data_batch, step=1)

    # reference eval branch upsamples flows to 'full' (same size here) and
    # permutes BHWC - directly comparable with ours after upsample_outputs
    from dmhomo_tpu.models.estimator import upsample_outputs

    ours_full = upsample_outputs(ours, crop)

    for ok, tk, pick in [
        ("flow_f", "flow_f", lambda t: t.numpy()),
        ("flow_b", "flow_b", lambda t: t.numpy()),
        ("mask_f", "mask_f", lambda t: t.permute(0, 2, 3, 1).numpy()),
        ("mask_b", "mask_b", lambda t: t.permute(0, 2, 3, 1).numpy()),
    ]:
        g = pick(golden[tk])
        o = np.asarray(ours_full[ok])
        err = np.abs(o - g).max()
        assert err < 5e-3, f"{ok} mismatch {err}"


@needs_ref
def test_import_strict_accounts_every_key():
    """strict=True: every reference state_dict key is either consumed by the
    mapping or on the documented dead-param skip list (round-3 judge item 4).
    The random-init reference modules carry every dead param (patch_embed,
    info_flatten, index/mask buffers), so this exercises the full layouts of
    DGM.pt's inner Unet and HEM.pth's OSNet."""
    torch.manual_seed(4)
    ref = make_reference_unet(num_classes=5)
    import_unet_state_dict(ref.state_dict(), UNetConfig(dim=64, num_classes=5), strict=True)

    crop = (64, 128)
    osnet = make_reference_osnet(crop_size=crop)
    sd = osnet.state_dict()
    # sanity: the dead modules really are present in the reference state_dict
    assert any(k.startswith("h_net.patch_embed.") for k in sd)
    assert any(k.endswith("relative_position_index") for k in sd)
    assert any(k.endswith(".reduction.weight") for k in sd)  # dead PatchMerging
    ecfg = EstimatorConfig(crop_size=crop, swin=SwinConfig(crop_size=crop))
    import_estimator_state_dict(sd, ecfg, strict=True)

    # BasesHomo: dead subspace_block (net.py:427) + regenerated basis buffer
    from reference_oracle import make_reference_baseshomo

    from dmhomo_tpu.models.import_torch import import_baseshomo_state_dict

    bh = make_reference_baseshomo(crop_size=crop)
    bsd = bh.state_dict()
    assert any(k.startswith("subspace_block.") for k in bsd)
    import_baseshomo_state_dict(bsd, strict=True)


@needs_ref
def test_import_strict_rejects_foreign_keys():
    """A renamed/extra key must raise instead of importing a silently-wrong
    model."""
    torch.manual_seed(5)
    ref = make_reference_unet(num_classes=5)
    sd = dict(ref.state_dict())
    sd["some_new_module.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="neither consumed"):
        import_unet_state_dict(sd, UNetConfig(dim=64, num_classes=5), strict=True)

    crop = (64, 128)
    osnet = make_reference_osnet(crop_size=crop)
    sd = dict(osnet.state_dict())
    sd["fea_extra_v2.0.weight"] = torch.zeros(3)
    ecfg = EstimatorConfig(crop_size=crop, swin=SwinConfig(crop_size=crop))
    with pytest.raises(ValueError, match="neither consumed"):
        import_estimator_state_dict(sd, ecfg, strict=True)


@needs_ref
def test_import_strict_dgm_checkpoint_layout(tmp_path):
    """Full DGM.pt layout (Trainer.save: classifier_free_guidance.py:1782-1826
    — 'model' = GaussianDiffusion.state_dict() with schedule buffers, 'ema' =
    ema_pytorch.EMA.state_dict() with initted/step + online_model.* +
    ema_model.*) imports under strict wrapper-level key-accounting."""
    torch.manual_seed(6)
    from reference_oracle import install_stubs

    install_stubs()
    from denoising_diffusion_models.classifier_free_guidance import GaussianDiffusion

    from dmhomo_tpu.models.import_torch import load_dgm_checkpoint

    unet = make_reference_unet(num_classes=5)
    gd = GaussianDiffusion(unet, image_size=64, timesteps=8, sampling_timesteps=2)
    gd_sd = gd.state_dict()
    assert any(k == "betas" for k in gd_sd)  # schedule buffers present

    # ema_pytorch.EMA layout: initted/step buffers + both wrapped copies
    ema_sd = {"initted": torch.tensor(True), "step": torch.tensor(123)}
    ema_sd.update({f"online_model.{k}": v for k, v in gd_sd.items()})
    ema_sd.update({f"ema_model.{k}": v for k, v in gd_sd.items()})
    path = tmp_path / "DGM.pt"
    torch.save({"model": gd_sd, "ema": ema_sd, "step": 9}, path)

    cfg = UNetConfig(dim=64, num_classes=5)
    params, info = load_dgm_checkpoint(str(path), cfg, use_ema=True, strict=True)
    assert info["step"] == 9
    assert "init_conv" in params or len(params) > 0

    # a foreign wrapper-level key must raise
    bad = dict(gd_sd)
    bad["mystery_buffer"] = torch.zeros(2)
    torch.save({"model": bad, "ema": None, "step": 1}, tmp_path / "bad.pt")
    with pytest.raises(ValueError, match="neither consumed"):
        load_dgm_checkpoint(str(tmp_path / "bad.pt"), cfg, use_ema=False, strict=True)


@needs_ref
def test_import_strict_hem_checkpoint_layout(tmp_path):
    """HEM.pth layout (manager.py:218-259: 'state_dict' under DDP 'module.'
    prefix) round-trips through load_hem_checkpoint(strict=True)."""
    torch.manual_seed(7)
    from dmhomo_tpu.models.import_torch import load_hem_checkpoint

    crop = (64, 128)
    osnet = make_reference_osnet(crop_size=crop)
    sd = {f"module.{k}": v for k, v in osnet.state_dict().items()}
    path = tmp_path / "HEM.pth"
    torch.save({"state_dict": sd, "epoch": 3, "step": 42}, path)

    ecfg = EstimatorConfig(crop_size=crop, swin=SwinConfig(crop_size=crop))
    params, batch_stats, info = load_hem_checkpoint(str(path), ecfg, strict=True)
    assert info["epoch"] == 3 and info["step"] == 42
    assert params


@needs_ref
def test_estimator_import_forward_parity_fullsize():
    """Checkpoint-day rehearsal at the SHIPPED config (VERDICT r4 #7): full
    crop 320x576, embed_dim 24, depths (2,4,6) — the exact geometry HEM.pth
    ships at (HEM/experiments/params.json:40-70; manager.py:218-259 load
    path).  One sample through the torch oracle vs the imported flax
    forward, full-res eval branch included."""
    torch.manual_seed(8)
    crop = (320, 576)
    ref = make_reference_osnet(crop_size=crop)  # shipped Swin defaults
    ref.eval()

    cfg = EstimatorConfig(crop_size=crop, ori_size=(360, 640),
                          swin=SwinConfig(crop_size=crop))
    model = HomographyEstimator(cfg)
    params, batch_stats = import_estimator_state_dict(
        ref.state_dict(), cfg, strict=True)

    rng = np.random.default_rng(8)
    patch = rng.normal(0, 1, (1, *crop, 2)).astype(np.float32)
    ours = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(patch),
        train=False)

    t_patch = torch.from_numpy(patch).permute(0, 3, 1, 2)
    data_batch = {
        "imgs_gray_patch": t_patch,
        "imgs_gray_full": t_patch,  # full==patch keeps the eval branch 1:1
        "imgs_rgb_full": torch.zeros(1, 6, *crop),
        "ganhomo_mask": torch.ones(1, 1, *crop),
    }
    with torch.no_grad():
        golden = ref(data_batch, step=1)

    from dmhomo_tpu.models.estimator import upsample_outputs

    ours_full = upsample_outputs(ours, crop)
    # basis weights first (tight): any trunk divergence shows here
    with torch.no_grad():
        f1 = ref.fea_extra(t_patch[:, :1])
        f2 = ref.fea_extra(t_patch[:, 1:])
        w_f = ref.h_net(torch.cat([f1, f2], 1))
    werr = np.abs(np.asarray(ours["weight_f"]) - w_f.numpy()).max()
    assert werr < 2e-3, f"full-size basis weight mismatch {werr}"
    for ok, tk, pick in [
        ("flow_f", "flow_f", lambda t: t.numpy()),
        ("flow_b", "flow_b", lambda t: t.numpy()),
        ("mask_f", "mask_f", lambda t: t.permute(0, 2, 3, 1).numpy()),
        ("mask_b", "mask_b", lambda t: t.permute(0, 2, 3, 1).numpy()),
    ]:
        g = pick(golden[tk])
        o = np.asarray(ours_full[ok])
        err = np.abs(o - g).max()
        assert err < 1e-2, f"full-size {ok} mismatch {err}"


@needs_ref
def test_dgm_ema_import_forward_parity_fullres(tmp_path):
    """Checkpoint-day rehearsal for DGM.pt's EMA branch at the shipped
    sampling resolution (VERDICT r4 #7): dim=64 @ 256^2.  The EMA copy is
    perturbed away from the online weights, so use_ema=True is verified to
    select the EMA tree; forward parity vs the torch EMA model."""
    torch.manual_seed(9)
    from reference_oracle import install_stubs

    install_stubs()
    from denoising_diffusion_models.classifier_free_guidance import GaussianDiffusion

    from dmhomo_tpu.models.import_torch import load_dgm_checkpoint

    unet = make_reference_unet(num_classes=5)
    gd = GaussianDiffusion(unet, image_size=256, timesteps=8, sampling_timesteps=2)
    gd_sd = gd.state_dict()

    # distinct EMA copy: final_conv.bias + 0.5 (detectable if the wrong
    # branch loads — the output shifts by exactly 0.5).  Perturbing EVERY
    # weight (the first draft) drives a 20-layer net's output to ~3e11,
    # where fp32 accumulation-order noise alone is ~2e5 and an absolute
    # tolerance is meaningless.
    ema_inner = {k: v.clone() for k, v in gd_sd.items()}
    ema_inner["model.final_conv.bias"] = ema_inner["model.final_conv.bias"] + 0.5
    ema_sd = {"initted": torch.tensor(True), "step": torch.tensor(5)}
    ema_sd.update({f"online_model.{k}": v for k, v in gd_sd.items()})
    ema_sd.update({f"ema_model.{k}": v for k, v in ema_inner.items()})
    path = tmp_path / "DGM.pt"
    torch.save({"model": gd_sd, "ema": ema_sd, "step": 5}, path)

    cfg = UNetConfig(dim=64, num_classes=5)
    params, info = load_dgm_checkpoint(str(path), cfg, use_ema=True, strict=True)
    model = ConditionalUNet(cfg)

    # torch EMA twin: load the perturbed weights into a fresh reference UNet
    ema_unet = make_reference_unet(num_classes=5)
    ema_unet.load_state_dict(
        {k[len("model."):]: v for k, v in ema_inner.items()
         if k.startswith("model.")})
    ema_unet.eval()

    rng = np.random.default_rng(9)
    B, S = 1, 256
    x = rng.normal(0, 1, (B, S, S, 6)).astype(np.float32)
    rgb = rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32)
    mask = rng.uniform(0, 1, (B, S, S, 1)).astype(np.float32)
    t = np.asarray([500])
    classes = np.asarray([0])

    ours = model.apply(
        {"params": params},
        jnp.asarray(x), jnp.asarray(t), jnp.asarray(classes),
        jnp.asarray(rgb), jnp.asarray(mask), jnp.ones((B,), bool),
    )
    with torch.no_grad():
        golden = ema_unet(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t),
            torch.from_numpy(classes), torch.from_numpy(rgb).permute(0, 3, 1, 2),
            torch.from_numpy(mask).permute(0, 3, 1, 2), cond_drop_prob=0.0,
        )
    g = golden.permute(0, 2, 3, 1).numpy()
    err = np.abs(np.asarray(ours) - g).max()
    assert err < 5e-3, f"EMA-branch 256^2 forward mismatch {err}"

    # branch check: the online twin differs from the EMA twin by the 0.5
    # bias shift; if use_ema=True had loaded online weights, err above
    # would be ~0.5, and this distance confirms the probe is visible.
    unet.eval()
    with torch.no_grad():
        online = unet(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t),
            torch.from_numpy(classes), torch.from_numpy(rgb).permute(0, 3, 1, 2),
            torch.from_numpy(mask).permute(0, 3, 1, 2), cond_drop_prob=0.0,
        )
    sep = np.abs(online.permute(0, 2, 3, 1).numpy() - g).max()
    assert sep > 0.4, f"EMA probe not visible in output ({sep})"


@needs_ref
def test_estimator_weight_parity():
    """The raw 8 basis weights (pre-flow) must match tightly."""
    torch.manual_seed(3)
    crop = (64, 128)
    ref = make_reference_osnet(crop_size=crop)
    ref.eval()
    cfg = EstimatorConfig(crop_size=crop, swin=SwinConfig(crop_size=crop))
    model = HomographyEstimator(cfg)
    params, batch_stats = import_estimator_state_dict(ref.state_dict(), cfg)

    rng = np.random.default_rng(3)
    patch = rng.normal(0, 1, (1, *crop, 2)).astype(np.float32)
    ours = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(patch), train=False
    )

    t_patch = torch.from_numpy(patch).permute(0, 3, 1, 2)
    with torch.no_grad():
        f1 = ref.fea_extra(t_patch[:, :1])
        f2 = ref.fea_extra(t_patch[:, 1:])
        w_f = ref.h_net(torch.cat([f1, f2], 1))
    err = np.abs(np.asarray(ours["weight_f"]) - w_f.numpy()).max()
    assert err < 1e-3, f"basis weight mismatch {err}"
