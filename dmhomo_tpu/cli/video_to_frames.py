"""Extract frames from CAHomo videos (reference: python video2img.py).

Frame ids are offset by +10000 like the reference (video2img.py:5-35).

Example:
  python -m dmhomo_tpu.cli.video_to_frames --videos 'CAHomo/*.mp4' --out frames/
"""

from __future__ import annotations

import argparse
import glob
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--videos", type=str, required=True, help="glob of video files")
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--offset", type=int, default=10000)
    args = parser.parse_args(argv)

    import cv2

    from dmhomo_tpu.utils import get_logger

    logger = get_logger("video_to_frames")
    for vid_path in sorted(glob.glob(args.videos)):
        name = os.path.splitext(os.path.basename(vid_path))[0]
        out_dir = os.path.join(args.out, name)
        os.makedirs(out_dir, exist_ok=True)
        cap = cv2.VideoCapture(vid_path)
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            cv2.imwrite(os.path.join(out_dir, f"{args.offset + i}.png"), frame)
            i += 1
        cap.release()
        logger.info(f"{name}: {i} frames")


if __name__ == "__main__":
    main()
