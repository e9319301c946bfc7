"""Tests for the unconditional diffusion twin, flow ops, viz, profiling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmhomo_tpu.diffusion.uncond import UncondDiffusionConfig, UnconditionalGaussianDiffusion
from dmhomo_tpu.geometry.flow_ops import (
    RandomHomography,
    border_mask,
    convert_flow_to_mapping,
    convert_mapping_to_flow,
    correspondence_mask,
    normalize_mapping,
    unnormalize_mapping,
    zero_border_mask,
)
from dmhomo_tpu.geometry.flow_viz import flow_to_rgb_middlebury
from dmhomo_tpu.models.unet_uncond import UncondUNet, UncondUNetConfig
from dmhomo_tpu.utils.profiling import StepTimer
from dmhomo_tpu.utils.viz import image_grid, sample_panel, save_flip_gif, save_png


# ---------------------------------------------------------------------------
# unconditional twin
# ---------------------------------------------------------------------------


def _uncond(self_condition=False, objective="pred_noise"):
    cfg = UncondUNetConfig(dim=8, dim_mults=(1, 2), channels=3, self_condition=self_condition)
    model = UncondUNet(cfg)
    dcfg = UncondDiffusionConfig(
        image_size=16, channels=3, timesteps=40, sampling_timesteps=5,
        self_condition=self_condition, objective=objective,
    )

    def model_fn(params, x, t, x_self_cond, train=False):
        return model.apply({"params": params}, x, t, x_self_cond, train=train)

    x0 = jnp.zeros((1, 16, 16, 3))
    params = model.init(
        jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32),
        x0 if self_condition else None,
    )["params"]
    return UnconditionalGaussianDiffusion(model_fn, dcfg), params


from dmhomo_tpu.utils.constructor import model_constructor as _model_constructor


@_model_constructor
def _constructor_demo_factory(dim=2):
    return UncondUNet(UncondUNetConfig(dim=dim * 8, dim_mults=(1, 2)))


@_model_constructor
def _constructor_demo_tuple_factory(dim=2):
    return (UncondUNet(UncondUNetConfig(dim=dim * 8, dim_mults=(1, 2))), "aux")


def test_uncond_unet_shapes():
    cfg = UncondUNetConfig(dim=8, dim_mults=(1, 2), channels=3)
    model = UncondUNet(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([0, 5]))["params"]
    out = model.apply({"params": params}, x, jnp.asarray([0, 5]))
    assert out.shape == (2, 16, 16, 3)


def test_uncond_unet_learned_sinusoidal():
    cfg = UncondUNetConfig(dim=8, dim_mults=(1, 2), channels=3, learned_sinusoidal=True)
    model = UncondUNet(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))["params"]
    assert "sinu_pos_emb" in params
    out = model.apply({"params": params}, x, jnp.zeros((1,), jnp.int32))
    assert np.isfinite(np.asarray(out)).all()


def test_uncond_loss_and_sample():
    gd, params = _uncond()
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    loss = gd.loss(params, jax.random.PRNGKey(2), img)
    assert np.isfinite(float(loss))
    out = np.asarray(jax.jit(lambda p, k: gd.sample(p, k, 2))(params, jax.random.PRNGKey(3)))
    assert out.shape == (2, 16, 16, 3)
    assert out.min() >= -1e-5 and out.max() <= 1 + 1e-5


def test_uncond_self_conditioning_paths():
    gd, params = _uncond(self_condition=True)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    loss = gd.loss(params, jax.random.PRNGKey(2), img)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: gd.loss(p, jax.random.PRNGKey(2), img))(params)
    norm = float(jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(g))))
    assert np.isfinite(norm) and norm > 0
    out = np.asarray(gd.sample(params, jax.random.PRNGKey(3), 1))
    assert np.isfinite(out).all()


def test_uncond_p2_weighting_changes_loss():
    cfg0 = UncondDiffusionConfig(image_size=16, channels=3, timesteps=40,
                                 sampling_timesteps=5, p2_loss_weight_gamma=0.0)
    cfg1 = UncondDiffusionConfig(image_size=16, channels=3, timesteps=40,
                                 sampling_timesteps=5, p2_loss_weight_gamma=1.0)
    model_fn = lambda params, x, t, sc, train=False: jnp.zeros_like(x)
    g0 = UnconditionalGaussianDiffusion(model_fn, cfg0)
    g1 = UnconditionalGaussianDiffusion(model_fn, cfg1)
    img = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 3))
    l0 = float(g0.loss(None, jax.random.PRNGKey(1), img))
    l1 = float(g1.loss(None, jax.random.PRNGKey(1), img))
    assert l0 != l1 and np.isfinite([l0, l1]).all()


# ---------------------------------------------------------------------------
# flow ops
# ---------------------------------------------------------------------------


def test_flow_mapping_roundtrip(rng):
    flow = jnp.asarray(rng.normal(0, 5, (2, 8, 12, 2)).astype(np.float32))
    m = convert_flow_to_mapping(flow)
    back = convert_mapping_to_flow(m)
    np.testing.assert_allclose(np.asarray(back), np.asarray(flow), atol=1e-6)
    mn = normalize_mapping(m)
    m2 = unnormalize_mapping(mn)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-4)


def test_correspondence_mask():
    flow = np.zeros((1, 8, 10, 2), np.float32)
    flow[0, :, :, 0] = 100.0  # push x out of bounds
    mask = np.asarray(correspondence_mask(jnp.asarray(flow)))
    assert not mask.any()
    z = np.zeros((1, 8, 10, 2), np.float32)
    mask = np.asarray(correspondence_mask(jnp.asarray(z)))
    assert mask[0, 1:, 1:].all()  # strictly-inside convention: (0,0) excluded
    assert not mask[0, 0, 0]
    bm = np.asarray(border_mask(jnp.asarray(z)))
    assert bm.dtype == np.float32


def test_zero_border_mask(rng):
    img = rng.uniform(0.1, 1, (4, 6, 3)).astype(np.float32)
    img[0, :] = 0.0
    m = np.asarray(zero_border_mask(jnp.asarray(img)))
    assert not m[0].any() and m[1:].all()


def test_random_homography_sampler():
    rh = RandomHomography(max_rotation=5, max_translation=4)
    rng = np.random.default_rng(0)
    Hs = [rh.sample(rng, 64, 96) for _ in range(5)]
    for H in Hs:
        assert H.shape == (3, 3) and abs(H[2, 2] - 1) < 1e-9
        # centre maps near centre (all transforms are centred)
        c = H @ np.array([47.5, 31.5, 1.0])
        c = c[:2] / c[2]
        assert np.linalg.norm(c - [47.5, 31.5]) < 15
    assert not np.allclose(Hs[0], Hs[1])


def test_middlebury_render(rng):
    flow = rng.normal(0, 5, (16, 16, 2)).astype(np.float32)
    img = flow_to_rgb_middlebury(flow)
    assert img.shape == (16, 16, 3)
    assert img.min() >= 0 and img.max() <= 1


# ---------------------------------------------------------------------------
# viz + profiling
# ---------------------------------------------------------------------------


def test_sample_panel_and_grid(tmp_path, rng):
    imgs = rng.uniform(0, 1, (2, 16, 16, 6)).astype(np.float32)
    mask = np.ones((2, 16, 16, 1), np.float32)
    flow = np.zeros((2, 16, 16, 2), np.float32)
    panel = sample_panel(imgs, mask, flow)
    assert panel.shape == (2, 32, 64, 3)
    # zero flow => row1 col2 (img1) and row2 col2 (warp==img2) identical cols elsewhere
    np.testing.assert_allclose(panel[:, 16:, 16:31], imgs[..., 3:][:, :, 0:15], atol=1e-5)

    grid = image_grid(panel, nrow=2)
    assert grid.ndim == 3
    save_png(str(tmp_path / "grid.png"), grid)
    save_flip_gif(str(tmp_path / "flip.gif"), [panel[0], panel[1]])
    assert (tmp_path / "grid.png").exists() and (tmp_path / "flip.gif").exists()


def test_vis_bad_case(tmp_path, rng):
    """Counterpart of GaussianDiffusion.vis_bad_case
    (classifier_free_guidance.py:753-768): zero flow => warp(img2)==img2,
    so the two GIF frames differ only in their left halves."""
    from dmhomo_tpu.utils.viz import vis_bad_case

    imgs = rng.uniform(0, 1, (2, 16, 16, 6)).astype(np.float32)
    flow = np.zeros((2, 16, 16, 2), np.float32)
    path = vis_bad_case(str(tmp_path), imgs, flow, motion=3.0)
    assert path.endswith("badcase_3.0.gif")
    import imageio

    frames = imageio.mimread(path)
    assert len(frames) == 2
    # right half of frame 2 == img2 under zero flow (uint8 rounding only)
    got = frames[1][:, 16:, :3].astype(np.float32) / 255.0
    np.testing.assert_allclose(got, imgs[0, ..., 3:], atol=2 / 255)


def test_step_timer():
    import time

    t = StepTimer(window=10)
    t.tick()
    time.sleep(0.01)
    dt = t.tick()
    assert dt is not None and dt > 0
    assert t.steps_per_sec > 0
    assert t.samples_per_sec(32) == pytest.approx(t.steps_per_sec * 32)


def test_build_test_condition(rng):
    from dmhomo_tpu.data.conditions import build_test_condition

    img1 = rng.uniform(0, 1, (360, 640, 3)).astype(np.float32)
    img2 = rng.uniform(0, 1, (360, 640, 3)).astype(np.float32)
    # matched points from a known homography
    d = rng.normal(0, 0.01, (3, 3)); d[2, :2] *= 1e-4; d[2, 2] = 0
    H = np.eye(3) + d
    from dmhomo_tpu.geometry import apply_homography

    src = rng.uniform(50, 300, (6, 2)).astype(np.float32)
    dst = np.asarray(apply_homography(jnp.asarray(H, jnp.float32)[None], jnp.asarray(src[None])))[0]
    pts = np.stack([src, dst], axis=1)
    cond = build_test_condition(img1, img2, pts, image_size=64)
    assert cond.shape == (64, 64, 11)
    assert np.isfinite(cond).all()


def test_mask_vis(tmp_path, rng):
    from dmhomo_tpu.evaluation.mask_vis import mask_vis

    batch = {"imgs_gray_full": rng.normal(0, 1, (2, 24, 32, 2)).astype(np.float32)}
    outputs = {
        "flow_f": rng.normal(0, 2, (2, 24, 32, 2)).astype(np.float32),
        "mask_fusion": rng.uniform(0, 1, (2, 24, 32, 1)).astype(np.float32),
    }
    paths = mask_vis(batch, outputs, str(tmp_path), max_items=2)
    assert len(paths) == 4
    import os

    assert all(os.path.exists(p) for p in paths)


def test_dgm_trainer_preview(tmp_path):
    import dataclasses

    from dmhomo_tpu.diffusion import DiffusionConfig
    from dmhomo_tpu.models import UNetConfig
    from dmhomo_tpu.parallel import make_mesh
    from dmhomo_tpu.train.config import DGMTrainConfig
    from dmhomo_tpu.train.dgm_trainer import DGMTrainer

    cfg = DGMTrainConfig(
        unet=UNetConfig(dim=8, num_classes=2, dim_mults=(1, 2)),
        diffusion=DiffusionConfig(image_size=16, timesteps=20, sampling_timesteps=3),
        train_batch_size=8, bf16=False,
    )
    tr = DGMTrainer(cfg, mesh=make_mesh())
    tr.init_state()
    rng_ = np.random.default_rng(0)
    cond = rng_.uniform(0, 1, (8, 16, 16, 12)).astype(np.float32)
    path, photo_err = tr.save_preview(cond, np.zeros((8,), np.int32), str(tmp_path / "p.png"))
    import os

    assert os.path.exists(path)
    assert np.isfinite(photo_err) and photo_err >= 0


def test_mask_vis_categories(tmp_path, rng):
    """Reference-format per-category dumps (HEM/evaluate.py:165-329):
    5 files per pair under the scene-category subdir; unknown ids skipped."""
    from dmhomo_tpu.evaluation.mask_vis import mask_vis_categories

    B, H, W = 3, 24, 32
    batch = {
        "imgs_rgb_full": rng.uniform(0, 1, (B, H, W, 6)).astype(np.float32),
        "video_names": ["0000011", "0000038", "zzz_unknown"],
    }
    outputs = {
        "flow_b": rng.normal(0, 2, (B, H, W, 2)).astype(np.float32),
        "mask_f": rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32),
        "mask_b": rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32),
    }
    counts = {}
    paths = mask_vis_categories(batch, outputs, str(tmp_path), counts=counts)
    assert len(paths) == 10  # 2 known ids x 5 files
    assert counts == {"RE": 1, "LT": 1}
    import os

    assert all(os.path.exists(p) for p in paths)
    assert any(os.sep + "RE" + os.sep in p for p in paths)
    assert any(p.endswith(".gif") for p in paths)


def test_multihost_io_gated_on_process_zero(tmp_path, monkeypatch):
    """Checkpoint + metric-JSON writes run on process 0 only (the reference
    gates all I/O on accelerate's is_main_process,
    denoising_diffusion_pytorch.py:1766,1783,1863); non-zero processes
    return without touching the filesystem."""
    import os

    import jax

    from dmhomo_tpu.utils import save_checkpoint
    from dmhomo_tpu.utils.meters import MetricTracker

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    path = save_checkpoint(str(tmp_path / "ck"), 1, {"a": np.zeros(2)})
    assert not os.path.exists(path)
    assert not os.path.exists(tmp_path / "ck")
    mt = MetricTracker()
    mt.update("val", {"AVG": 1.0})
    mt.dump(str(tmp_path / "m.json"), "val")
    assert not os.path.exists(tmp_path / "m.json")

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    path = save_checkpoint(str(tmp_path / "ck"), 1, {"a": np.zeros(2)})
    assert os.path.exists(path)
    mt.dump(str(tmp_path / "m.json"), "val")
    assert os.path.exists(tmp_path / "m.json")


def test_model_constructor_roundtrip(tmp_path):
    """NetConstructor parity (HEM/utils_operations/model_constructor.py:5-66):
    the decorated factory's output carries .constructor; save/load/get()
    rebuilds an identical architecture."""
    from dmhomo_tpu.utils import NetConstructor

    net = _constructor_demo_factory(dim=3)
    assert net.constructor.fun_name == "_constructor_demo_factory"
    assert net.config.dim == 24  # attribute proxying to the wrapped module

    path = net.constructor.save(str(tmp_path))
    assert path.endswith("constructor.json")
    rebuilt = NetConstructor.load(str(tmp_path)).get()
    assert rebuilt.config.dim == 24
    assert type(rebuilt.module).__name__ == type(net.module).__name__


def test_model_constructor_tuple_return():
    net, aux = _constructor_demo_tuple_factory(5)
    assert aux == "aux"
    assert net.constructor.args == (5,)
    rebuilt, aux2 = net.constructor.get()
    assert rebuilt.config.dim == 40 and aux2 == "aux"
