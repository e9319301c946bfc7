"""End-to-end CLI smoke tests on tiny shapes (8-device CPU mesh via conftest).

Covers the trainset-generation chain the reference runs by hand:
dgm_train checkpoint -> dgm_sample (native orbax restore against a proper
target tree + previews) -> make_samples (per-sample npys + warp-check GIFs).
"""

import glob
import os

import numpy as np

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
