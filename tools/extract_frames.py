#!/usr/bin/env python
"""Extract frames from a video (twin of the reference's
utilities/get_frames_from_video scrubber, headless-first).

Usage:
  python tools/extract_frames.py clip.mp4 --every 15 --out frames/
  python tools/extract_frames.py clip.mp4 --frames 10 120 300 --out frames/
"""

from __future__ import annotations

import argparse
import pathlib
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("--out", default="frames")
    ap.add_argument("--every", type=int, default=None,
                    help="save every Nth frame")
    ap.add_argument("--frames", type=int, nargs="*", default=None,
                    help="explicit frame indices to save")
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    import cv2

    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        print(f"cannot open {args.video}", file=sys.stderr)
        return 1
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    wanted = set(args.frames) if args.frames else None
    if wanted is None and not args.every:
        # No selector would silently decode the whole clip and save zero
        # frames with exit 0; default to every frame instead.
        args.every = 1
    idx = saved = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        take = (wanted is not None and idx in wanted) or \
               (args.every and idx % args.every == 0)
        if take:
            cv2.imwrite(str(out / f"frame_{idx:06d}.png"), frame)
            saved += 1
            if args.limit and saved >= args.limit:
                break
        if wanted is not None and not args.every and saved == len(wanted):
            break  # all requested frames written; stop decoding to EOF
        idx += 1
    cap.release()
    print(f"saved {saved} frames to {out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
