"""Dump the reference STAGE-1 model's static renders as s1_view{v:02d}.npy.

Run under the shim environment (scripts/refrun/run_reference.py).  Loads
the stage-1 checkpoint like the reference's train_3d.py resume path
(MPMesh + init_from_mpi, /root/reference/train_3d.py:154-175) and
renders each requested training camera once (static MPI — no time
axis), for the stage-1 half of the head-to-head gap analysis.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import torch


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--views", required=True)
    ap.add_argument("--out", required=True)
    opts, _ = ap.parse_known_args()

    from config_parser import config_parser
    from dataloader import load_mv_videos, poses_avg
    from utils import pose2extrin_np, to8b
    from MPI import MPMesh

    parser = config_parser()
    args = parser.parse_args(["--config", opts.config])
    # the post-sparsify reference model has no loop-mask atlas and its
    # render asserts `not has_dyn` under learn_loop_mask (MPI.py:569);
    # we only need the rgb channels here
    args.learn_loop_mask = False

    datadir = os.path.join(args.prefix, args.datadir)
    expdir = os.path.join(args.prefix, args.expdir)
    expname = args.expname + args.expname_postfix
    videos, _, poses, intrins, bds, _, _ = load_mv_videos(
        basedir=datadir, factor=args.factor,
        bd_factor=(args.near_factor, args.far_factor), recenter=True)
    H, W = videos[0][0].shape[0:2]

    ref_pose = poses_avg(poses)[:, :4]
    ref_extrin = pose2extrin_np(ref_pose)
    nerf = MPMesh(args, H, W, ref_extrin, intrins[0],
                  bds.min(), bds.max())

    rundir = os.path.join(expdir, expname)
    ckpts = [os.path.join(rundir, f) for f in sorted(os.listdir(rundir))
             if "tar" in f]
    ckpt = torch.load(ckpts[-1])
    nerf.init_from_mpi(ckpt["network_state_dict"])
    nerf.eval()
    print(f"[dump] loaded {ckpts[-1]}")

    os.makedirs(opts.out, exist_ok=True)
    with torch.no_grad():
        for v in map(int, opts.views.split(",")):
            extrin = torch.tensor(pose2extrin_np(poses[v:v + 1])).float()
            intrin = torch.tensor(intrins[v:v + 1]).float()
            rgb, _ = nerf(H, W, extrin, intrin)
            arr = to8b(rgb.permute(0, 2, 3, 1).numpy()[0][..., :3])
            np.save(os.path.join(opts.out, f"s1_view{v:02d}.npy"), arr)
            print(f"[dump] s1 view {v}: {arr.shape}")


if __name__ == "__main__":
    main()
