"""Explode generation shards into per-sample npys
(reference: python DGM/generate_nyps_to_single_case.py).

Example:
  python -m dmhomo_tpu.cli.make_samples --shards 'traindata/exp/dataset/*.npy' \
      --out traindata/samples
"""

from __future__ import annotations

import argparse
import glob


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--shards", type=str, required=True, help="glob of shard npys")
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--start-index", type=int, default=0)
    parser.add_argument(
        "--warp-check", type=str, default=None, metavar="DIR",
        help="write a per-shard warp-consistency flip GIF of the first sample "
        "(the reference's unit_test/, generate_nyps_to_single_case.py:8-19)",
    )
    args = parser.parse_args(argv)

    import os

    import numpy as np

    from dmhomo_tpu.data.shards import explode_shards_to_samples, load_generation_shard
    from dmhomo_tpu.utils import get_logger

    logger = get_logger("make_samples")
    paths = sorted(glob.glob(args.shards))
    if not paths:
        raise SystemExit(f"no shards match {args.shards!r}")
    n = explode_shards_to_samples(paths, args.out, start_index=args.start_index)
    logger.info(
        f"exploded {len(paths)} shards -> {n - args.start_index} samples in {args.out}"
    )
    if args.warp_check:
        from dmhomo_tpu.utils.viz import warp_check_gif

        for sp in paths:
            batch = load_generation_shard(sp)[0]
            name = os.path.splitext(os.path.basename(sp))[0]
            gif = warp_check_gif(
                os.path.join(args.warp_check, f"{name}.gif"),
                batch["imgs"][0], np.asarray(batch["homos"][0]),
            )
            logger.info(f"warp check: {gif}")


if __name__ == "__main__":
    main()
