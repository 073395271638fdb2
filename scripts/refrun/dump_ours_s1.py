"""Dump OUR stage-1 model's static renders as s1_view{v:02d}.npy, plus
the stage-1 training targets (vid2img images) as gt_view{v:02d}.npy —
the stage-1 half of the head-to-head gap analysis."""
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

    import jax.numpy as jnp
    from videoloop3d_tpu.core import cameras
    from videoloop3d_tpu.data import llff
    from videoloop3d_tpu.data.patches import ImagePatchDataset
    from videoloop3d_tpu.data.video import to8b
    from videoloop3d_tpu.models import checkpoint as ckpt_io
    from videoloop3d_tpu.models.mpmesh import MPMesh

    datadir = os.path.join(args.prefix, args.datadir.rstrip("/\\"))
    videos, _, scene = llff.load_mv_videos(
        basedir=datadir, factor=args.factor,
        bd_factor=(args.near_factor, args.far_factor), recenter=True)
    H, W = scene["hw"]
    poses, intrins = scene["poses"], scene["intrins"]
    bds = scene["bds"]

    ref_pose = cameras.average_pose(poses)[:, :4]
    ref_extrin = cameras.pose_to_extrinsic(ref_pose)
    model = MPMesh(args, H, W, ref_extrin, intrins.mean(0),
                   float(bds.min()), float(bds.max()))
    import dataclasses as _dc
    rundir = os.path.join(args.prefix, args.expdir, args.expname)
    # pin the SAME checkpoint stage 2 initializes from (epoch 98 — the
    # reference side's save rule never writes a later one), not the
    # lexicographically-latest (epoch 99)
    pinned = os.path.join(rundir, "ckpt_epoch_0098.npz")
    path = pinned if os.path.exists(pinned) \
        else ckpt_io.latest_checkpoint(rundir)
    loaded = ckpt_io.load_checkpoint(path)
    meta = loaded["meta"]
    model.geom = loaded["geom"]
    model.is_sparse = meta["is_sparse"]
    model.has_dyn = meta["has_dyn"]
    model.tile_map_static = loaded["tile_map_static"]
    model.tile_map_dyn = loaded["tile_map_dyn"]
    model.tile_hw = tuple(meta["tile_hw"]) if meta["tile_hw"] else None
    ex = meta.get("extra", {})
    reps = {k: ex[k] for k in ("rgb_mlp_type", "rgb_activate",
                               "alpha_activate") if k in ex}
    if reps:
        model.cfg = _dc.replace(model.cfg, **reps)
    params = {k: jnp.asarray(v) for k, v in loaded["params"].items()}
    print(f"[dump] loaded {path} (sparse={model.is_sparse})")

    dataset = ImagePatchDataset((H, W), videos,
                                (args.patch_h_size, args.patch_w_size),
                                (args.patch_h_stride, args.patch_w_stride),
                                poses, intrins, args.vid2img_mode)

    extrins = cameras.pose_to_extrinsic(poses)
    os.makedirs(opts.out, exist_ok=True)
    for v in map(int, opts.views.split(",")):
        rgbl, _ = model.render(params, H, W,
                               jnp.asarray(extrins[v:v + 1]),
                               jnp.asarray(intrins[v:v + 1]))
        rgb = np.asarray(rgbl[0])[..., :3]
        np.save(os.path.join(opts.out, f"s1_view{v:02d}.npy"), to8b(rgb))
        np.save(os.path.join(opts.out, f"gt_view{v:02d}.npy"),
                to8b(np.asarray(dataset.images[v])))
        print(f"[dump] s1 view {v}: {rgb.shape}")


if __name__ == "__main__":
    main()
