"""Offline renderer CLI (counterpart of reference
scripts/script_render_video.py): render the spiral path or a fixed view
over a selectable time range from the newest (or given) checkpoint.

    python -m videoloop3d_tpu.tools.render_video --config ... --config1 ...
        [--v r#|#|test] [--t 0:10 | 1,5,9] [--f N] [--type vid|seq]
"""
from __future__ import annotations

import os

import numpy as np

from videoloop3d_tpu.backend import apply_backend_from_args
from videoloop3d_tpu.config import build_parser, parse_args_with_configs
from videoloop3d_tpu.core import cameras
from videoloop3d_tpu.data import llff
from videoloop3d_tpu.data.video import to8b, write_image, write_video


def parse_time_selection(t_arg, render_t):
    """Parity: script_render_video.py:68-83 ('0:10', '1,5,9', mixes)."""
    if not t_arg:
        return render_t
    if ":" in t_arg:
        out = []
        for piece in t_arg.split(","):
            start, end = map(int, piece.split(":"))
            step = 1 if start <= end else -1
            out.append(np.arange(start, end, step))
        return np.concatenate(out)
    idx = list(map(int, t_arg.split(",")))
    return render_t[idx]


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--v", type=str, default="",
                        help="view: empty=spiral, r#=render pose #, "
                             "#=training pose #, test=first test view")
    parser.add_argument("--t", type=str, default="",
                        help="time: '#,#' frames or '#:#' ranges")
    parser.add_argument("--f", type=int, default=-1,
                        help="override render path frame count")
    parser.add_argument("--type", type=str, default="vid",
                        help="vid or seq")
    parser.add_argument("--render_scaling", type=float, default=1)
    args = parse_args_with_configs(argv, parser)
    apply_backend_from_args(args)
    from videoloop3d_tpu.eval.evaluate import load_mpv_from_run
    from videoloop3d_tpu.train.stage2 import render_eval

    datadir = os.path.join(args.prefix, args.datadir)
    render_frm = args.f if args.f > 0 \
        else (120 // args.mpv_frm_num + 1) * args.mpv_frm_num
    videos, fps, scene = llff.load_mv_videos(
        basedir=datadir, factor=args.factor,
        bd_factor=(args.near_factor, args.far_factor), recenter=True,
        render_frames=render_frm, render_scaling=args.render_scaling)
    H, W = scene["hw"]
    poses, intrins = scene["poses"], scene["intrins"]

    view_poses = scene["render_poses"].copy()
    view_intrins = scene["render_intrins"].copy()
    render_t = np.arange(len(view_poses)) % args.mpv_frm_num

    v_arg = args.v
    if v_arg == "test":
        v_arg = args.test_view_idx.split(",")[0]
    if v_arg:
        render_t = render_t[:args.mpv_frm_num]
        if v_arg.startswith("r"):
            v = int(v_arg[1:])
            view_poses[:] = view_poses[v:v + 1]
            view_intrins[:] = view_intrins[v:v + 1]
        else:
            v = int(v_arg)
            view_poses[:] = poses[v:v + 1]
            view_intrins[:] = intrins[v:v + 1]

    render_t = parse_time_selection(args.t, render_t)
    view_poses = view_poses[:len(render_t)]
    view_intrins = view_intrins[:len(render_t)]

    ref_pose = cameras.average_pose(poses)[:, :4]
    ref_extrin = cameras.pose_to_extrinsic(ref_pose)
    model, params, rundir, _ = load_mpv_from_run(
        args, H, W, ref_extrin, intrins[0],
        float(scene["bds"].min()), float(scene["bds"].max()))

    outdir = os.path.join(rundir, "renderonly")
    os.makedirs(outdir, exist_ok=True)
    extrins = cameras.pose_to_extrinsic(view_poses)
    frames = []
    if v_arg:
        # fixed view: every frame shares the pose — render the whole
        # time selection in chunks (one dispatch per chunk, not per
        # frame; the offline render is tunnel/dispatch-bound)
        out = render_eval(model, params, H, W, extrins[:1],
                          view_intrins[:1], render_t, chunk=10, u8=True)
        frames = [to8b(f) for f in out]
    else:
        for i in range(len(view_poses)):
            f = render_eval(model, params, H, W, extrins[i:i + 1],
                            view_intrins[i:i + 1], render_t[i:i + 1],
                            chunk=1, u8=True)
            frames.append(to8b(f[0]))
    out_type = args.type
    if len(frames) < 3:
        out_type += "seq"
    if "seq" in out_type:
        for i, frame in enumerate(frames):
            write_image(os.path.join(
                outdir, f"view{args.v}t{args.t}_{i:04d}.png"), frame)
    else:
        write_video(os.path.join(outdir, f"view{args.v}t{args.t}.mp4"),
                    np.stack(frames), fps=25)
    print(f"[render] wrote {len(frames)} frames to {outdir}")


if __name__ == "__main__":
    main()
