"""Dump the reference model's rendered loops as view{v:02d}.npy arrays.

Run under the shim environment:

    python scripts/refrun/run_reference.py \
        /root/repo/scripts/refrun/dump_renders.py \
        --config <h2h_s2.txt> --views 0,4,9 --out /tmp/refrun/pred_ref

Loads the latest stage-2 checkpoint exactly like the reference's
scripts/script_render_video.py:107-120 (MPMeshVid + init_from_mpi), then
renders every training-camera view requested at every loop frame and
saves uint8 (F, H, W, 3) arrays — the input format of this repo's
evaluator ``--pred_dir`` mode, so both sides are scored by the identical
metric code.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import torch


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--views", required=True,
                    help="comma list of scene view indices to render")
    ap.add_argument("--out", required=True)
    opts, _ = ap.parse_known_args()

    from config_parser import config_parser
    from dataloader import load_mv_videos, poses_avg
    from utils import pose2extrin_np, to8b
    from MPV import MPMeshVid

    parser = config_parser()
    args = parser.parse_args(["--config", opts.config])

    datadir = os.path.join(args.prefix, args.datadir)
    expdir = os.path.join(args.prefix, args.expdir)
    expname = args.expname + args.expname_postfix
    videos, _, poses, intrins, bds, _, _ = load_mv_videos(
        basedir=datadir, factor=args.factor,
        bd_factor=(args.near_factor, args.far_factor), recenter=True)
    H, W = videos[0][0].shape[0:2]

    ref_pose = poses_avg(poses)[:, :4]
    ref_extrin = pose2extrin_np(ref_pose)
    nerf = MPMeshVid(args, H, W, ref_extrin, intrins[0],
                     bds.min(), bds.max())

    rundir = os.path.join(expdir, expname)
    ckpts = [os.path.join(rundir, f) for f in sorted(os.listdir(rundir))
             if "tar" in f]
    if not ckpts:
        raise SystemExit(f"no checkpoints under {rundir}")
    ckpt = torch.load(ckpts[-1])
    nerf.init_from_mpi(ckpt["network_state_dict"])
    nerf.eval()
    print(f"[dump] loaded {ckpts[-1]}")

    os.makedirs(opts.out, exist_ok=True)
    frames = np.arange(args.mpv_frm_num)
    with torch.no_grad():
        for v in map(int, opts.views.split(",")):
            extrin = torch.tensor(
                pose2extrin_np(poses[v:v + 1])).float()
            intrin = torch.tensor(intrins[v:v + 1]).float()
            out = []
            for t in frames:
                rgb, _ = nerf(H, W, extrin, intrin,
                              torch.tensor([t]).long())
                out.append(to8b(rgb.permute(0, 2, 3, 1).numpy()[0]))
            arr = np.stack(out)
            np.save(os.path.join(opts.out, f"view{v:02d}.npy"), arr)
            print(f"[dump] view {v}: {arr.shape} -> view{v:02d}.npy")


if __name__ == "__main__":
    main()
