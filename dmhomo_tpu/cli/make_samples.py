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
    args = parser.parse_args(argv)

    from dmhomo_tpu.data.shards import explode_shards_to_samples
    from dmhomo_tpu.utils import get_logger

    paths = sorted(glob.glob(args.shards))
    if not paths:
        raise SystemExit(f"no shards match {args.shards!r}")
    n = explode_shards_to_samples(paths, args.out, start_index=args.start_index)
    get_logger("make_samples").info(
        f"exploded {len(paths)} shards -> {n - args.start_index} samples in {args.out}"
    )


if __name__ == "__main__":
    main()
