"""End-to-end CLI smoke tests on tiny shapes (8-device CPU mesh via conftest).

Covers the trainset-generation chain the reference runs by hand:
dgm_train checkpoint -> dgm_sample (native orbax restore against a proper
target tree + previews) -> make_samples (per-sample npys + warp-check GIFs).
"""

import glob
import os

import numpy as np
import pytest

from dmhomo_tpu.cli import dgm_sample, make_samples
from dmhomo_tpu.diffusion import DiffusionConfig
from dmhomo_tpu.models import UNetConfig
from dmhomo_tpu.train.config import DGMTrainConfig
from dmhomo_tpu.train.dgm_trainer import DGMTrainer


def test_dgm_sample_cli_restore_and_previews(tmp_path):
    """The cli restore path must survive orbax custom-pytree (EMAState)
    roundtrips via the abstract target tree (VERDICT r1 #9) and land
    reference-format shards, previews and warp-check GIFs."""
    S = 16
    ckpt_root = str(tmp_path / "ckpt")
    cfg = DGMTrainConfig(
        unet=UNetConfig(dim=8, num_classes=2, dim_mults=(1, 2)),
        diffusion=DiffusionConfig(image_size=S, timesteps=50, sampling_timesteps=2),
        train_batch_size=8,
        results_dir=ckpt_root,
        bf16=False,
    )
    trainer = DGMTrainer(cfg)
    trainer.init_state()
    batch = np.random.default_rng(0).uniform(0, 1, (8, S, S, 12)).astype(np.float32)
    import jax

    trainer.train_step(batch, np.zeros((8,), np.int32), jax.random.PRNGKey(0))
    trainer.save()

    out = str(tmp_path / "gen")
    dgm_sample.main([
        "--ckpt", ckpt_root, "--synthetic", "16", "--dim", "8",
        "--dim-mults", "1,2", "--num-classes", "2", "--image-size", str(S),
        "--s-step", "2", "--bs", "4", "--batches", "2", "--batches-per-shard", "1",
        "--exp", "smoke", "--out", out, "--preview-every", "1",
    ])

    shards = sorted(glob.glob(os.path.join(out, "smoke", "dataset", "*.npy")))
    assert shards, "no shards written"
    previews = glob.glob(os.path.join(out, "smoke", "previews", "*.png"))
    assert previews, "no preview PNGs written"

    samples_dir = str(tmp_path / "samples")
    gif_dir = str(tmp_path / "unit_test")
    make_samples.main([
        "--shards", os.path.join(out, "smoke", "dataset", "*.npy"),
        "--out", samples_dir, "--warp-check", gif_dir,
    ])
    samples = glob.glob(os.path.join(samples_dir, "*.npy"))
    assert len(samples) >= 4
    buf = np.load(samples[0], allow_pickle=True).item()
    assert buf["img12"].shape == (6, S, S) and buf["img12"].dtype == np.uint8
    assert buf["homo12"].shape == (3, 3)
    gifs = glob.glob(os.path.join(gif_dir, "*.gif"))
    assert len(gifs) == len(shards)


def _write_fake_cahomo(root, n_pairs=11, hw=(40, 72)):
    """Minimal CAHomo test layout: test.txt + img/ + pt/*.npy."""
    import cv2

    rng = np.random.default_rng(7)
    vids = ["0000011", "0000038", "0000085", "00000244", "00000104"]
    os.makedirs(os.path.join(root, "pt"), exist_ok=True)
    lines = []
    for i in range(n_pairs):
        vid = vids[i % len(vids)]
        d = os.path.join(root, "img", vid)
        os.makedirs(d, exist_ok=True)
        n1, n2 = f"p{i}_1.jpg", f"p{i}_2.jpg"
        for n in (n1, n2):
            cv2.imwrite(os.path.join(d, n),
                        rng.integers(0, 255, (*hw, 3)).astype(np.uint8))
        pts = rng.uniform(2, min(hw) - 2, (6, 2, 2)).astype(np.float32)
        np.save(os.path.join(root, "pt", f"{n1}_{n2}.npy"),
                {"matche_pts": pts}, allow_pickle=True)
        lines.append(f"{vid}/{n1} {vid}/{n2}")
    with open(os.path.join(root, "test.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_hem_eval_cli_ragged_tail(tmp_path):
    """hem_eval CLI on a fabricated CAHomo layout with a ragged tail batch:
    the padded forward must compile once and report finite categories."""
    import json

    from dmhomo_tpu.cli import hem_eval
    from dmhomo_tpu.models import EstimatorConfig, SwinConfig
    from dmhomo_tpu.train.config import HEMTrainConfig
    from dmhomo_tpu.train.hem_trainer import HEMTrainer

    data = str(tmp_path / "CAHomo")
    _write_fake_cahomo(data, n_pairs=11)

    model_dir = str(tmp_path / "exp")
    os.makedirs(model_dir)
    with open(os.path.join(model_dir, "params.json"), "w") as f:
        json.dump({
            "crop_size": [32, 64], "ori_size": [40, 72], "embed_dim": 8,
            "depths": [1, 1, 1], "layer_depth": [3, 2, 1], "num_heads": [2, 2, 4],
            "window_size": 4, "mlp_ratio": 2.0,
        }, f)

    swin = SwinConfig(crop_size=(32, 64), embed_dim=8, depths=(1, 1, 1),
                      layer_depth=(3, 2, 1), num_heads=(2, 2, 4), window_size=4,
                      mlp_ratio=2.0)
    cfg = HEMTrainConfig(
        estimator=EstimatorConfig(crop_size=(32, 64), ori_size=(40, 72), swin=swin),
        model_dir=str(tmp_path / "ckpt"),
    )
    trainer = HEMTrainer(cfg)
    trainer.init_state()
    trainer.save(tag="best")

    vis_dir = str(tmp_path / "vis")
    report = hem_eval.main([
        "--test-data", data, "--model-dir", model_dir,
        "--ckpt", os.path.join(str(tmp_path / "ckpt"), "best"),
        "--batch-size", "8", "--mask-vis", vis_dir,
    ])
    assert set(report) == {"RE", "LT", "LL", "SF", "LF", "AVG"}
    assert np.isfinite(report["AVG"])
    gifs = glob.glob(os.path.join(vis_dir, "*", "*.gif"))
    assert gifs, "no per-category mask_vis GIFs written"


@pytest.mark.heavy
def test_full_pipeline_integration(tmp_path):
    """The complete SURVEY §0 pipeline in one chain on tiny shapes:
    DGM checkpoint -> dgm_sample shards -> make_samples per-sample npys ->
    hem_train stage-1 -> hem_train --stage2 --resume -> hem_eval.  Every
    hand-off format (shard schema, HEMTrainDataset ingestion, two-stage
    checkpoint resume, eval restore) is exercised by the actual CLIs —
    the reference runs these steps by hand (README.md pipeline)."""
    import json

    from dmhomo_tpu.cli import hem_eval, hem_train

    S = 16
    # --- DGM: init, one step, checkpoint ---
    ckpt_root = str(tmp_path / "dgm_ckpt")
    cfg = DGMTrainConfig(
        unet=UNetConfig(dim=8, num_classes=2, dim_mults=(1, 2)),
        diffusion=DiffusionConfig(image_size=S, timesteps=50, sampling_timesteps=2),
        train_batch_size=8,
        results_dir=ckpt_root,
        bf16=False,
    )
    trainer = DGMTrainer(cfg)
    trainer.init_state()
    batch = np.random.default_rng(0).uniform(0, 1, (8, S, S, 12)).astype(np.float32)
    import jax

    trainer.train_step(batch, np.zeros((8,), np.int32), jax.random.PRNGKey(0))
    trainer.save()

    # --- generate shards, explode to per-sample npys ---
    gen = str(tmp_path / "gen")
    dgm_sample.main([
        "--ckpt", ckpt_root, "--synthetic", "16", "--dim", "8",
        "--dim-mults", "1,2", "--num-classes", "2", "--image-size", str(S),
        "--s-step", "2", "--bs", "4", "--batches", "2",
        "--batches-per-shard", "1", "--exp", "pipe", "--out", gen,
    ])
    samples_dir = str(tmp_path / "samples")
    make_samples.main([
        "--shards", os.path.join(gen, "pipe", "dataset", "*.npy"),
        "--out", samples_dir,
    ])
    assert len(glob.glob(os.path.join(samples_dir, "*.npy"))) >= 8

    # --- HEM stage 1 on the generated samples ---
    exp1 = str(tmp_path / "hem_stage1")
    hem_train.main([
        "--samples", samples_dir, "--tiny", "--steps", "2", "--out", exp1,
        "--attn", "xla", "--seed", "0",
    ])
    assert os.path.isdir(os.path.join(exp1, "latest")), "stage-1 ckpt missing"

    # --- stage 2: sup L1 on, resumed from the stage-1 checkpoint ---
    exp2 = str(tmp_path / "hem_stage2")
    hem_train.main([
        "--samples", samples_dir, "--tiny", "--stage2", "--resume",
        "--restore-dir", exp1, "--steps", "2", "--out", exp2, "--attn", "xla",
    ])
    assert os.path.isdir(os.path.join(exp2, "latest")), "stage-2 ckpt missing"

    # --- evaluate the stage-2 checkpoint on a CAHomo-layout testset ---
    data = str(tmp_path / "CAHomo")
    _write_fake_cahomo(data, n_pairs=6)
    model_dir = str(tmp_path / "exp")
    os.makedirs(model_dir)
    with open(os.path.join(model_dir, "params.json"), "w") as f:
        json.dump({
            "crop_size": [32, 64], "ori_size": [40, 72], "embed_dim": 8,
            "depths": [1, 1, 1], "layer_depth": [3, 2, 1],
            "num_heads": [2, 2, 4], "window_size": 4, "mlp_ratio": 2.0,
        }, f)
    report = hem_eval.main([
        "--test-data", data, "--model-dir", model_dir,
        "--ckpt", os.path.join(exp2, "latest"), "--batch-size", "8",
    ])
    assert set(report) == {"RE", "LT", "LL", "SF", "LF", "AVG"}
    assert np.isfinite(report["AVG"])


def test_make_conditions_cli(tmp_path):
    """make_conditions builds a ConditionCache with prefix-derived 5-way
    class ids (the reference defines prefix2label but hardcodes class 0)."""
    from dmhomo_tpu.cli.make_conditions import main as make_conditions_main
    from dmhomo_tpu.data.conditions import ConditionCache

    out = str(tmp_path / "cache")
    make_conditions_main([
        "--synthetic", "10", "--out", out, "--image-size", "32",
        "--src-hw", "36,64",
    ])
    cache = ConditionCache(out)
    assert len(cache) == 10
    cond, cls = cache[0]
    assert cond.shape == (32, 32, 12)
    assert sorted(set(cache.classes.tolist())) == [0, 1, 2, 3, 4]
