"""Build the DGM condition cache from the CAHomo train layout.

The reference recomputes the 12-ch condition tensors (imgs, mask,
HSV-rendered homography flow, motion field) inside its DataLoader workers
every epoch (UnHomoTrainData, denoising_diffusion_pytorch.py:1045-1163) and
ships the result separately as DGM_Conditions.zip.  Here the cache is an
explicit one-shot build: a flat (N, S, S, 12) memmap + 5-way scene-class
ids derived from the CAHomo video prefixes (prefix2label, :1080-1091 -
which the reference defines but then hardcodes class 0).

Examples:
  python -m dmhomo_tpu.cli.make_conditions --trainset CAHomo/train \
      --pseudo-labels BasesHomo_small.npy --out conditions_cache
  python -m dmhomo_tpu.cli.make_conditions --synthetic 32 --out /tmp/cache
"""

from __future__ import annotations

import argparse


def synthetic_raw_samples(n: int, src_hw=(360, 640), seed: int = 0):
    """(img1, img2, mask, homo_f, pair_name) tuples for smoke runs."""
    import numpy as np

    rng = np.random.default_rng(seed)
    h, w = src_hw
    # video prefixes spanning all 5 scene classes (TRAIN_CATEGORIES tables)
    names = ["000004", "0000032", "0000071", "000001", "000005"]
    for i in range(n):
        d = rng.normal(0, 0.005, (3, 3))
        d[2, :2] *= 1e-4
        d[2, 2] = 0.0
        img1 = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        img2 = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        mask = (rng.random((h, w)) > 0.3).astype(np.uint8)
        name = f"{names[i % 5]}_{10000 + i}_{10002 + i}"
        yield img1, img2, mask, np.eye(3) + d, name


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--trainset", type=str, default=None,
                        help="CAHomo train root (video-prefix dirs + masks)")
    parser.add_argument("--pseudo-labels", type=str, default=None,
                        help="BasesHomo pseudo-homography dict npy")
    parser.add_argument("--masks-dir", type=str, default="HomoGAN_Bug_Masks")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--src-hw", type=str, default="360,640")
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from dmhomo_tpu.data.conditions import ConditionCache, iter_cahomo_train_samples
    from dmhomo_tpu.utils import get_logger

    logger = get_logger("make_conditions")
    src_hw = tuple(int(v) for v in args.src_hw.split(","))

    if args.synthetic:
        samples = synthetic_raw_samples(args.synthetic, src_hw, args.seed)
    elif args.trainset and args.pseudo_labels:
        samples = iter_cahomo_train_samples(
            args.trainset, args.pseudo_labels, masks_dir=args.masks_dir
        )
    else:
        parser.error("need --trainset + --pseudo-labels, or --synthetic N")

    if args.limit:
        import itertools

        samples = itertools.islice(samples, args.limit)

    cache = ConditionCache.build(
        args.out, samples, image_size=args.image_size, src_hw=src_hw
    )
    import numpy as np

    counts = np.bincount(cache.classes, minlength=5)
    logger.info(
        f"built {len(cache)} conditions -> {args.out} "
        f"(class counts RE/LT/LL/SF/LF: {counts.tolist()})"
    )


if __name__ == "__main__":
    main()
