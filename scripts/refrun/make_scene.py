"""Generate the shared head-to-head scene as a TIFF-container LLFF dir.

Both sides decode the SAME files: the reference via imageio.mimread
(ref dataloader.py:144) and this repo via data/video.py's imageio path.
Run on the CPU backend; no jax needed.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from videoloop3d_tpu.data import synthetic  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--views", type=int, default=10)
    ap.add_argument("--h", type=int, default=144)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--factor", type=int, default=1)
    ap.add_argument("--variant", default="basic",
                    choices=("basic", "rich"))
    args = ap.parse_args()

    scene = synthetic.make_scene(n_views=args.views, h=args.h, w=args.w,
                                 n_frames=args.frames, seed=args.seed,
                                 variant=args.variant)
    synthetic.write_llff_dir(scene, args.outdir, factor=args.factor,
                             container="tif")
    print(f"wrote {args.views} views {args.h}x{args.w}x{args.frames} "
          f"to {args.outdir}")


if __name__ == "__main__":
    main()
