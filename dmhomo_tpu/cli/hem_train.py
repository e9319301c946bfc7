"""HEM estimator training CLI (reference: accelerate launch HEM/train.py).

Reads reference-format params.json experiment dirs (--model-dir), trains on
per-sample npys from the DGM generation pipeline (--samples), evaluates on
the CAHomo test layout (--test-data) every train_num_steps, tracks the best
AVG.  Stage 2 = point --model-dir at a stage-2 params.json and --resume from
stage 1 (reference README flow), or use --stage2 with the defaults.

Smoke: python -m dmhomo_tpu.cli.hem_train --synthetic 64 --tiny --steps 10
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-dir", type=str, default=None, help="dir with params.json")
    parser.add_argument("--samples", type=str, default=None, help="per-sample npy dir")
    parser.add_argument("--test-data", type=str, default=None, help="CAHomo testset dir")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--stage2", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--ow", action="store_true",
                        help="with --resume: restore weights only (the "
                             "reference's -ow / --only_weights flow) — fresh "
                             "optimizer + LR staircase; the stage-2 schedule "
                             "uses this (README stage-2 step)")
    parser.add_argument("--restore-dir", type=str, default=None, help="ckpt root to resume from")
    parser.add_argument("--torch-ckpt", type=str, default=None, help="init from HEM .pth")
    parser.add_argument("--steps", type=int, default=0, help="override total steps")
    parser.add_argument("--tiny", action="store_true", help="tiny config for smoke tests")
    parser.add_argument(
        "--host-pipeline", action="store_true",
        help="build gray/flow batches on the host (the parity path) instead "
        "of the default device pipeline (raw uint8 + H to the chip)",
    )
    parser.add_argument("--fuse-steps", type=int, default=1,
                        help="optimizer steps fused per dispatch (lax.scan driver)")
    parser.add_argument("--attn", type=str, default=None,
                        choices=("auto", "xla", "pallas", "fused_block"),
                        help="window-attention impl (default: config 'auto' = "
                             "fused Pallas kernel on TPU, einsum on CPU)")
    parser.add_argument("--out", type=str, default="experiments/hem")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from dmhomo_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    import numpy as np

    from dmhomo_tpu.data import DataLoader, HEMTrainDataset, SyntheticHomoPairs
    from dmhomo_tpu.data.loader import cycle
    from dmhomo_tpu.losses import LossWeights
    from dmhomo_tpu.models import EstimatorConfig, SwinConfig
    from dmhomo_tpu.train.config import HEMTrainConfig, Params
    from dmhomo_tpu.train.hem_trainer import HEMTrainer
    from dmhomo_tpu.utils import get_logger

    logger = get_logger("hem_train")

    if args.tiny:
        swin = SwinConfig(
            crop_size=(32, 64), embed_dim=8, depths=(1, 1, 1), layer_depth=(3, 2, 1),
            num_heads=(2, 2, 4), window_size=4, mlp_ratio=2.0,
        )
        cfg = HEMTrainConfig(
            estimator=EstimatorConfig(crop_size=(32, 64), ori_size=(40, 72), swin=swin),
            loss=LossWeights(sup=1.0, nll=1.0) if args.stage2 else LossWeights(nll=1.0),
            train_batch_size=8,
            train_num_steps=max(args.steps, 1),
            model_dir=args.out,
        )
    elif args.model_dir:
        cfg = HEMTrainConfig.from_params(
            Params(os.path.join(args.model_dir, "params.json")), model_dir=args.out
        )
    elif args.stage2:
        cfg = HEMTrainConfig.stage2(model_dir=args.out)
    else:
        cfg = HEMTrainConfig(model_dir=args.out)
    if args.attn:
        import dataclasses

        cfg = dataclasses.replace(cfg, attn_impl=args.attn)

    # datasets
    crop, ori, rho = cfg.estimator.crop_size, cfg.estimator.ori_size, cfg.rho
    if args.samples:
        train_ds = HEMTrainDataset(
            args.samples, crop_size=crop, ori_size=ori, rho=rho,
            rng=np.random.default_rng(args.seed),
            device_pipeline=not args.host_pipeline,
        )
    elif args.synthetic:
        train_ds = SyntheticHomoPairs(
            n=args.synthetic, crop_size=crop, ori_size=ori, rho=min(rho, 3), seed=args.seed
        )
    else:
        parser.error("need --samples or --synthetic")

    train_dl = DataLoader(
        train_ds, batch_size=cfg.train_batch_size, num_workers=4, seed=args.seed
    )
    steps_per_epoch = max(len(train_dl), 1)

    eval_dl = None
    if args.test_data:
        from dmhomo_tpu.data import CAHomoTestDataset

        eval_dl = DataLoader(
            CAHomoTestDataset(args.test_data, crop_size=crop),
            batch_size=cfg.eval_batch_size, shuffle=False, drop_last=False,
        )

    trainer = HEMTrainer(cfg, steps_per_epoch=steps_per_epoch)
    trainer.init_state()
    if args.torch_ckpt:
        from dmhomo_tpu.models.import_torch import load_hem_checkpoint

        params, batch_stats, info = load_hem_checkpoint(args.torch_ckpt, cfg.estimator)
        trainer.load_params(params, batch_stats)
        logger.info(f"initialized from torch checkpoint {args.torch_ckpt}")
    if args.resume:
        trainer.load(root=args.restore_dir or cfg.model_dir, tag="latest",
                     weights_only=args.ow)

    total = args.steps or cfg.num_epochs * steps_per_epoch
    trainer.train_and_evaluate(
        cycle(train_dl), eval_loader=eval_dl, total_steps=total,
        fuse_steps=args.fuse_steps,
    )
    trainer.save(tag="latest")
    logger.info("done")


if __name__ == "__main__":
    main()
