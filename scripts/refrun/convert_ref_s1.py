"""Convert a REFERENCE sparse stage-1 checkpoint (.tar) into THIS repo's
sparse stage-1 .npz schema — the cross-init control of the h2h gap
analysis (ROADMAP item 7c): train OUR stage 2 from the REFERENCE's
stage-1 state.  If the h2h quality gap vanishes under cross-init, the
gap lives in stage-1 quality; if it persists, in stage-2 loss dynamics.

Mapping (no reference code executed — the .tar is pure tensors):
  * the reference packs kept quads into near-square static/dynamic
    atlases in ORIGINAL quad order (ref MPI.py:289-442); each packed
    quad's top-left vertex id v0 = faces[2t, 0] decodes to
    (plane d, row r, col c) via the original grid layout
    verts_indice = arange(D * Hv * Wv).reshape(D, Hv, Wv)
    (ref MPI.py:74-77), and (r, c) IS the tile index in our per-plane
    tile map (both sides tile the vertex grid: Hv-1 x Wv-1 quads).
  * packed tile t occupies atlas rows (t // n_w) * imsz_h + [0, imsz_h)
    and cols (t %% n_w) * imsz_w (ref MPI.py:389-401); the residual
    padding tiles (duplicates of the last tile) are dropped.
  * plane order is matched BY DEPTH VALUE (the reference's planedepth
    vs our geom.depths), so a reversed plane axis cannot silently
    corrupt the map.
  * texel convention parity: the reference extracts each quad's texels
    over the INCLUSIVE uv span with imsz points (linspace(0, uvsz,
    imsz), MPI.py:304-307) exactly like our extract_tiles' inclusive
    tile span (models/sparsify.py:56-58), so when imsz == tile_hw the
    copy is texel-for-texel; otherwise we resize (align-corners).

Usage:
    python scripts/refrun/convert_ref_s1.py \
        --ref_ckpt /tmp/refrun/mpis/h2h_s1/epoch_0098.tar \
        --config scripts/refrun/configs/ours_s1.txt \
        --out /tmp/refrun/mpis_ours/h2h_s1_refinit/ckpt_epoch_0098.npz
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def _unpack_tiles(atlas, faces, grid_h, grid_w, Hv, Wv, depth_map):
    """atlas: (1, C, grid_h*imsz_h, grid_w*imsz_w); faces: (2n, 3).
    Returns (tiles (n, imsz_h, imsz_w, C), ours_flat_idx (n,)) where
    ours_flat_idx = d_ours * nth * ntw + r * ntw + c."""
    C = atlas.shape[1]
    full_h, full_w = atlas.shape[2], atlas.shape[3]
    imsz_h, imsz_w = full_h // grid_h, full_w // grid_w
    n = faces.shape[0] // 2
    v0 = faces[0::2, 0]                      # (n,) quad top-left vertex
    d_ref = v0 // (Hv * Wv)
    rem = v0 % (Hv * Wv)
    r, c = rem // Wv, rem % Wv
    d_ours = depth_map[d_ref]
    nth, ntw = Hv - 1, Wv - 1
    assert (r < nth).all() and (c < ntw).all()
    flat = d_ours * (nth * ntw) + r * ntw + c

    img = atlas[0].transpose(1, 2, 0)        # (H, W, C)
    img = img.reshape(grid_h, imsz_h, grid_w, imsz_w, C)
    img = img.transpose(0, 2, 1, 3, 4).reshape(grid_h * grid_w,
                                               imsz_h, imsz_w, C)
    tiles = img[:n]                          # drop residual padding
    return tiles.astype(np.float32), flat.astype(np.int64)


def _resize_tiles(tiles, th, tw):
    """ALIGN-CORNERS bilinear resize: both tilings sample the tile's
    INCLUSIVE span (ref linspace(0, uvsz, imsz), our (a/(th-1))*span),
    so corners map to corners — jax.image.resize's half-pixel centers
    would shift every texel."""
    if tiles.shape[1:3] == (th, tw):
        return tiles
    n, ih, iw, C = tiles.shape

    def interp1d(x, axis, n_out, n_in):
        pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        i0 = np.clip(np.floor(pos).astype(int), 0, n_in - 2)
        f = (pos - i0).astype(np.float32)
        a = np.take(x, i0, axis=axis)
        b = np.take(x, i0 + 1, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = n_out
        f = f.reshape(shape)
        return a * (1 - f) + b * f

    out = interp1d(tiles, 1, th, ih)
    out = interp1d(out, 2, tw, iw)
    return out.astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref_ckpt", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpu", action="store_true")
    opts = ap.parse_args()
    if opts.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import torch

    from videoloop3d_tpu.config import parse_args_with_configs
    from videoloop3d_tpu.core import cameras
    from videoloop3d_tpu.data import llff
    from videoloop3d_tpu.models import checkpoint as ckpt_io
    from videoloop3d_tpu.models.mpmesh import MPMesh
    if opts.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    args = parse_args_with_configs(["--config", opts.config])
    datadir = os.path.join(args.prefix, args.datadir.rstrip("/\\"))
    videos, _, scene = llff.load_mv_videos(
        basedir=datadir, factor=args.factor,
        bd_factor=(args.near_factor, args.far_factor), recenter=True)
    H, W = scene["hw"]
    poses, intrins, bds = scene["poses"], scene["intrins"], scene["bds"]
    ref_pose = cameras.average_pose(poses)[:, :4]
    ref_extrin = cameras.pose_to_extrinsic(ref_pose)
    model = MPMesh(args, H, W, ref_extrin, intrins.mean(0),
                   float(bds.min()), float(bds.max()))
    geom = model.geom
    Hv, Wv = args.mpi_h_verts, args.mpi_w_verts
    assert (geom.n_tiles_h, geom.n_tiles_w) == (Hv - 1, Wv - 1), (
        geom.n_tiles_h, geom.n_tiles_w, Hv, Wv)

    ckpt = torch.load(opts.ref_ckpt, map_location="cpu",
                      weights_only=False)
    sd = ckpt["network_state_dict"]
    assert sd["self.is_sparse"], "expected a post-sparsify reference ckpt"

    ref_depths = sd["planedepth"].numpy().astype(np.float64)
    ours_depths = np.asarray(geom.depths, np.float64)
    depth_map = np.array(
        [int(np.argmin(np.abs(ours_depths - d))) for d in ref_depths])
    assert len(set(depth_map.tolist())) == len(ref_depths), (
        "ambiguous plane depth matching", ref_depths, ours_depths)
    mismatch = np.abs(ours_depths[depth_map] - ref_depths).max()
    print(f"[convert] plane depth match: max |dz| = {mismatch:.2e} "
          f"(ref order {'reversed' if depth_map[0] != 0 else 'same'})")

    D, nth, ntw = geom.n_planes, geom.n_tiles_h, geom.n_tiles_w

    st_tiles, st_flat = _unpack_tiles(
        sd["atlas"].detach().numpy(), sd["faces"].numpy(),
        int(sd["self.atlas_grid_h"]), int(sd["self.atlas_grid_w"]),
        Hv, Wv, depth_map)
    dyn_tiles, dyn_flat = _unpack_tiles(
        sd["atlas_dyn"].detach().numpy(), sd["faces_dyn"].numpy(),
        int(sd["self.atlas_grid_dyn_h"]), int(sd["self.atlas_grid_dyn_w"]),
        Hv, Wv, depth_map)
    # Keep the REFERENCE's tile resolution as our tile_hw: our sampler
    # reads fu*(tw-1), the reference's rasterizer fu*(imsz-1) — with
    # tile_hw == imsz the copied texels are sampled IDENTICALLY (no
    # resize, no double-interpolation loss: a 12->13 align-corners
    # resize measured -4 dB PSNR on the checker background).
    th, tw = st_tiles.shape[1:3]
    assert dyn_tiles.shape[1:3] == (th, tw)
    print(f"[convert] {len(st_tiles)} static + {len(dyn_tiles)} dynamic "
          f"tiles at reference tile_hw {(th, tw)} "
          f"(ours default {geom.default_tile_texels()})")

    tm_s = np.full(D * nth * ntw, -1, np.int32)
    tm_s[st_flat] = np.arange(len(st_flat), dtype=np.int32)
    tm_d = np.full(D * nth * ntw, -1, np.int32)
    tm_d[dyn_flat] = np.arange(len(dyn_flat), dtype=np.int32)
    assert not np.any((tm_s >= 0) & (tm_d >= 0)), \
        "a tile is both static and dynamic"

    # Pixel-center convention correction (+0.5 texel, both axes):
    # pytorch3d's NDC places pixel i's center at (W-2i-1)/S, and the
    # reference's intrinsic normalization (MPI.py:459-470) therefore
    # samples intrinsic coordinate i+0.5 for pixel i, while this repo's
    # homography sweep samples integer centers.  Both are
    # self-consistent, but the reference's plane CONTENT lives +0.5
    # texel (in plane-intrinsic units, uniformly at every depth) from
    # ours.  Measured: an impulse texel renders 0.5 px down-right of
    # where our sweep reads it (diagonal 1-px roll aligns the full
    # render to 37 dB).  Shifting the converted geometry's plane
    # principal point by +0.5 relabels plane coordinates exactly — no
    # tile resampling, no seam loss.
    import dataclasses as _dc
    km = np.asarray(geom.ref_intrin_mpi, np.float64).copy()
    km[0, 2] += 0.5
    km[1, 2] += 0.5
    geom = _dc.replace(
        geom, ref_intrin_mpi=tuple(tuple(float(v) for v in row)
                                   for row in km))

    params = {"atlas": st_tiles, "atlas_dyn": dyn_tiles,
              "verts": np.asarray(model.init_params(0)["verts"])}
    ckpt_io.save_checkpoint(
        opts.out, geom=geom, params=params, stage="mpi", is_sparse=True,
        has_dyn=True,
        tile_map_static=tm_s.reshape(D, nth, ntw),
        tile_map_dyn=tm_d.reshape(D, nth, ntw),
        tile_hw=(th, tw),
        extra_meta={"rgb_mlp_type": "direct",
                    "converted_from": os.path.abspath(opts.ref_ckpt)})
    print(f"[convert] wrote {opts.out}")


if __name__ == "__main__":
    main()
