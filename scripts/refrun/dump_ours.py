"""Dump this repo's rendered loops as view{v:02d}.npy (head-to-head).

    python scripts/refrun/dump_ours.py --config ours_s2.txt \
        --views 0,4,9 --out /tmp/refrun/pred_ours [--cpu]

Same output format as dump_renders.py (the reference side), so both go
through the evaluator's --pred_dir path and are scored by identical
metric code.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--views", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpu", action="store_true")
    opts, extra = ap.parse_known_args()

    if opts.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    from videoloop3d_tpu.config import parse_args_with_configs
    args = parse_args_with_configs(["--config", opts.config] + extra)
    if opts.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from videoloop3d_tpu.core import cameras
    from videoloop3d_tpu.data import llff
    from videoloop3d_tpu.data.video import to8b
    from videoloop3d_tpu.eval.evaluate import load_mpv_from_run
    from videoloop3d_tpu.train.stage2 import render_eval

    datadir = os.path.join(args.prefix, args.datadir.rstrip("/\\"))
    videos, _, scene = llff.load_mv_videos(
        basedir=datadir, factor=args.factor,
        bd_factor=(args.near_factor, args.far_factor), recenter=True)
    H, W = scene["hw"]
    poses, intrins = scene["poses"], scene["intrins"]

    ref_pose = cameras.average_pose(poses)[:, :4]
    ref_extrin = cameras.pose_to_extrinsic(ref_pose)
    model, params, _, ckpt_path = load_mpv_from_run(
        args, H, W, ref_extrin, intrins[0],
        float(scene["bds"].min()), float(scene["bds"].max()))
    print(f"[dump] loaded {ckpt_path}")

    extrins = cameras.pose_to_extrinsic(poses)
    os.makedirs(opts.out, exist_ok=True)
    for v in map(int, opts.views.split(",")):
        frames = render_eval(model, params, H, W, extrins[v:v + 1],
                             intrins[v:v + 1],
                             np.arange(model.frm_num), chunk=2)
        arr = to8b(frames)
        np.save(os.path.join(opts.out, f"view{v:02d}.npy"), arr)
        print(f"[dump] view {v}: {arr.shape} -> view{v:02d}.npy")


if __name__ == "__main__":
    main()
