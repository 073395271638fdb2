"""Mesh/atlas export CLI (counterpart of reference
scripts/script_export_mesh.py): checkpoint -> geometry.obj + static.png +
dynamic/%04d.png + meta.json for the VideoLoopUI WebGL player.

    python -m videoloop3d_tpu.tools.export_mesh --config ... --config1 ...
        [--mesh_folder meshes] [--ckpt path]
"""
from __future__ import annotations

import os

import numpy as np

from videoloop3d_tpu.backend import apply_backend_from_args
from videoloop3d_tpu.config import build_parser, parse_args_with_configs
from videoloop3d_tpu.data import llff
from videoloop3d_tpu.export.mesh_export import export_mtv, scene_meta_from_llff
from videoloop3d_tpu.models import checkpoint as ckpt_io


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--mesh_folder", type=str, default="meshes")
    parser.add_argument("--ckpt", type=str, default="",
                        help="explicit checkpoint path (default: newest)")
    args = parse_args_with_configs(argv, parser)
    apply_backend_from_args(args)

    expname = args.expname + args.expname_postfix
    outdir = os.path.join(args.prefix, args.mesh_folder, expname)
    rundir = os.path.join(args.prefix, args.expdir, expname)
    ckpt_path = args.ckpt or ckpt_io.latest_checkpoint(rundir)
    if ckpt_path is None:
        raise FileNotFoundError(f"no checkpoints under {rundir}")
    print(f"[export] checkpoint {ckpt_path}")
    ckpt = ckpt_io.load_checkpoint(ckpt_path)
    meta = ckpt["meta"]
    assert meta["is_sparse"], "export requires a sparse (culled) MTV"

    datadir = os.path.join(args.prefix, args.datadir)
    scene = llff.load_llff_scene(
        datadir, args.factor, recenter=False,
        bd_factor=(args.near_factor, args.far_factor))
    scene_meta = scene_meta_from_llff(scene)
    scene_meta["fps"] = 25

    frm = meta.get("frm_num") or args.mpv_frm_num
    dyn = ckpt["params"]["atlas_dyn"]
    if dyn.ndim == 5:
        n_frames = dyn.shape[3]
        assert n_frames == frm, (
            f"unmatched frame count {n_frames} vs {frm}")

    export_mtv(outdir, ckpt["geom"], ckpt["params"],
               ckpt["tile_map_static"], ckpt["tile_map_dyn"], scene_meta,
               rgb_activate=meta.get("extra", {}).get("rgb_activate",
                                                      "sigmoid"),
               alpha_activate=meta.get("extra", {}).get("alpha_activate",
                                                        "sigmoid"))
    print(f"[export] wrote {outdir}")


if __name__ == "__main__":
    main()
