"""DGM diffusion training CLI (reference: accelerate launch DGM/demo.py).

Conditions come from a prebuilt cache dir (see ConditionCache) or, for smoke
runs, from synthetic homographies (--synthetic N).  Resume with --resume.

Example:
  python -m dmhomo_tpu.cli.dgm_train --conditions cache_dir --steps 112500 \
      --batch-size 128 --lr 5e-4
  python -m dmhomo_tpu.cli.dgm_train --synthetic 256 --steps 50 \
      --dim 16 --image-size 64 --batch-size 8   # smoke
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def synthetic_condition_batches(n: int, image_size: int, batch_size: int, num_classes: int, seed=0):
    """Endless 12-ch condition batches from random homographies (no disk)."""
    from dmhomo_tpu.data.conditions import flow_to_rgb_np
    from dmhomo_tpu.geometry.host import homography_to_flow_np

    rng = np.random.default_rng(seed)
    conds = np.zeros((n, image_size, image_size, 12), np.float32)
    classes = rng.integers(0, num_classes, (n,)).astype(np.int32)
    for i in range(n):
        d = rng.normal(0, 0.01, (3, 3))
        d[2, :2] *= 1e-4
        d[2, 2] = 0
        flow = homography_to_flow_np(np.eye(3) + d, image_size, image_size)
        small = rng.uniform(0, 1, (image_size // 8, image_size // 8, 6)).astype(np.float32)
        import cv2

        imgs = cv2.resize(small, (image_size, image_size))
        conds[i, ..., :6] = imgs
        conds[i, ..., 6:7] = 1.0
        conds[i, ..., 7:10] = flow_to_rgb_np(flow)
        conds[i, ..., 10:12] = flow
    while True:
        idx = rng.integers(0, n, (batch_size,))
        yield conds[idx], classes[idx]


def cache_condition_batches(cache_dir: str, batch_size: int, seed=0):
    from dmhomo_tpu.data.conditions import ConditionCache

    cache = ConditionCache(cache_dir)
    rng = np.random.default_rng(seed)
    n = len(cache)
    while True:
        idx = rng.integers(0, n, (batch_size,))
        yield cache.batch(idx)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--conditions", type=str, default=None, help="ConditionCache dir")
    parser.add_argument("--synthetic", type=int, default=0, help="use N synthetic conditions")
    parser.add_argument("--steps", type=int, default=112_500)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--num-classes", type=int, default=5)
    parser.add_argument("--timesteps", type=int, default=1000)
    parser.add_argument("--s-step", type=int, default=32)
    parser.add_argument("--accum", type=int, default=1)
    parser.add_argument("--results", type=str, default="results/dgm")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--save-every", type=int, default=500)
    parser.add_argument("--no-bf16", action="store_true")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize UNet blocks (bigger per-chip batch)")
    parser.add_argument("--fuse-steps", type=int, default=1,
                        help="optimizer steps fused per dispatch (lax.scan driver)")
    parser.add_argument("--preview-every", type=int, default=0,
                        help="sample an EMA preview grid every N steps "
                             "(0 = at every checkpoint milestone)")
    parser.add_argument("--no-preview", action="store_true",
                        help="skip milestone preview sampling")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from dmhomo_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    from dmhomo_tpu.diffusion import DiffusionConfig
    from dmhomo_tpu.models import UNetConfig
    from dmhomo_tpu.train.config import DGMTrainConfig
    from dmhomo_tpu.train.dgm_trainer import DGMTrainer

    cfg = DGMTrainConfig(
        unet=UNetConfig(dim=args.dim, num_classes=args.num_classes, remat=args.remat),
        diffusion=DiffusionConfig(
            image_size=args.image_size,
            timesteps=args.timesteps,
            sampling_timesteps=args.s_step,
            objective="pred_x0",
            loss_type="l1",
        ),
        train_batch_size=args.batch_size,
        lr=args.lr,
        train_num_steps=args.steps,
        gradient_accumulate_every=args.accum,
        save_every=args.save_every,
        results_dir=args.results,
        seed=args.seed,
        bf16=not args.no_bf16,
    )
    trainer = DGMTrainer(cfg)
    trainer.init_state()
    if args.resume:
        trainer.load()

    if args.conditions:
        batches = cache_condition_batches(args.conditions, args.batch_size, args.seed)
    elif args.synthetic:
        batches = synthetic_condition_batches(
            args.synthetic, args.image_size, args.batch_size, args.num_classes, args.seed
        )
    else:
        parser.error("need --conditions or --synthetic")

    # milestone previews (the reference Trainer samples a grid every
    # save_and_sample_every, denoising_diffusion_pytorch.py:1867-1935):
    # a fixed condition batch is held out so successive previews are
    # comparable; photometric error is logged by save_preview
    on_milestone = None
    if not args.no_preview:
        pv_cond, pv_cls = next(batches)
        n_pv = min(16, len(pv_cond))
        pv_cond, pv_cls = pv_cond[:n_pv], pv_cls[:n_pv]

        def on_milestone(tr, step):
            if args.preview_every and step % args.preview_every:
                return
            tr.save_preview(pv_cond, pv_cls, f"{args.results}/previews/sample-{step}.png")

    trainer.train(
        batches, num_steps=args.steps, on_milestone=on_milestone,
        fuse_steps=args.fuse_steps,
    )
    trainer.save()


if __name__ == "__main__":
    main()
