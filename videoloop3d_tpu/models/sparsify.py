"""Tile culling — the paper's sparsification of a dense MPI into packed
static/dynamic tile atlases.

Parity: reference MPI.py:289-442 (sparsify_faces).  Differences by design:
the reference repacks kept tiles into a 2D texture atlas with regenerated
UV islands; we keep them in a packed (N, tile_h, tile_w, C) array indexed
by per-plane int32 tile maps — the same data, laid out for XLA gathers
instead of UV rasterization.  A 2D atlas view is still produced at export
time (export/mesh_export.py) for the WebGL viewer.

Everything here is host-side numpy: culling happens once between training
phases (ref train_3d.py:282-285).
"""
from __future__ import annotations

import numpy as np
import scipy.ndimage as ndi

from videoloop3d_tpu.core.activations import ALPHA_INIT_VAL
from videoloop3d_tpu.models.geometry import MPIGeometry


def _np_bilinear_planes(tex, x, y):
    """tex (D,Ht,Wt,C); x,y (D,...) -> (D,...,C), clamped borders."""
    D, Ht, Wt, C = tex.shape
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    out = np.zeros(x.shape + (C,), np.float32)
    didx = np.arange(D).reshape((D,) + (1,) * (x.ndim - 1))
    for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
            xi = np.clip(x0 + dx, 0, Wt - 1)
            yi = np.clip(y0 + dy, 0, Ht - 1)
            out += tex[didx, yi, xi] * wx * wy
    return out


def extract_tiles(atlas, geom: MPIGeometry, tile_hw=None):
    """Resample every tile of every plane into a packed tile array.

    atlas: (D, Ht, Wt, C) numpy.  Returns (tiles (D*nth*ntw, th, tw, C),
    tile_map (D, nth, ntw) holding 0..N-1).
    """
    atlas = np.asarray(atlas)
    D = geom.n_planes
    nth, ntw = geom.n_tiles_h, geom.n_tiles_w
    if tile_hw is None:
        tile_hw = geom.default_tile_texels()
    th, tw = tile_hw
    sy, sx = geom.tile_span

    ii, jj = np.meshgrid(np.arange(nth), np.arange(ntw), indexing="ij")
    aa, bb = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
    # plane texel coords of each tile sample: (nth, ntw, th, tw)
    y = (ii[..., None, None] + aa[None, None] / (th - 1)) * sy
    x = (jj[..., None, None] + bb[None, None] / (tw - 1)) * sx
    y = np.broadcast_to(y[None], (D,) + y.shape)
    x = np.broadcast_to(x[None], (D,) + x.shape)
    tiles = _np_bilinear_planes(atlas, x, y)              # (D,nth,ntw,th,tw,C)
    tiles = tiles.reshape(D * nth * ntw, th, tw, atlas.shape[-1])
    tile_map = np.arange(D * nth * ntw, dtype=np.int32).reshape(D, nth, ntw)
    return tiles.astype(np.float32), tile_map


def _erode(x):
    """3x3 min filter with zero padding (ref utils.py:309-317)."""
    return ndi.minimum_filter(x, size=(1, 3, 3), mode="constant", cval=0.0)


def _dilate(x):
    return ndi.maximum_filter(x, size=(1, 3, 3), mode="constant", cval=0.0)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def tile_cull(params, geom: MPIGeometry, alpha_activate,
              erode_num=2, alpha_thresh=0.03, loop_thresh=0.5,
              rm_first_layers=0, tile_hw=None):
    """The tile-culling algorithm.

    Args:
      params: dict with 'atlas' (D,Ht,Wt,C) and optionally 'atlas_mask'
        (D,Ht,Wt,1) — host numpy or jax arrays.
      alpha_activate: callable raw->opacity (numpy-compatible).
      rm_first_layers: drop all tiles of the N NEAREST planes.  The
        reference zeroes its first quads (ref MPI.py:345-348,
        `sparsify_rmfirstlayer`), and its plane storage is near-first
        (MPI.py:57 flips far-first `make_depths`), so "first" there means
        nearest.  Our storage is far-first, hence the slice from the end.

    Returns dict with:
      static_tiles (Ns,th,tw,C), dyn_tiles (Nd,th,tw,C),
      tile_map_static / tile_map_dyn (D,nth,ntw) int32 (-1 = culled),
      keep_frac, dyn_frac.
    """
    atlas = np.asarray(params["atlas"], np.float32)
    D = geom.n_planes
    nth, ntw = geom.n_tiles_h, geom.n_tiles_w

    # opacity map; texels never touched by training keep their exact init
    # value and are forced transparent (ref MPI.py:322 sets them to -10)
    raw_alpha = atlas[..., -1].copy()
    raw_alpha[raw_alpha == ALPHA_INIT_VAL] = -10.0
    alpha = np.asarray(alpha_activate(raw_alpha), np.float32)

    if "atlas_mask" in params and params["atlas_mask"] is not None:
        raw_loop = np.asarray(params["atlas_mask"], np.float32)[..., 0].copy()
        raw_loop[raw_loop == ALPHA_INIT_VAL] = -10.0
        loop = _sigmoid(raw_loop)
    else:
        loop = np.zeros_like(alpha)

    for _ in range(erode_num):
        loop = _erode(loop)
    for _ in range(erode_num):
        loop = _dilate(loop)
    for _ in range(erode_num):
        alpha = _erode(alpha)
    for _ in range(erode_num + 2):
        alpha = _dilate(alpha)

    # per-tile max over the tile's texel rectangle
    sy, sx = geom.tile_span

    def tile_max(field):
        out = np.zeros((D, nth, ntw), np.float32)
        for i in range(nth):
            y0, y1 = int(np.floor(i * sy)), int(np.ceil((i + 1) * sy)) + 1
            for j in range(ntw):
                x0, x1 = int(np.floor(j * sx)), int(np.ceil((j + 1) * sx)) + 1
                out[:, i, j] = field[:, y0:y1, x0:x1].max(axis=(1, 2))
        return out

    keep = tile_max(alpha) > alpha_thresh
    if rm_first_layers > 0:
        keep[D - rm_first_layers:] = False
    is_dyn = (tile_max(loop) > loop_thresh) & keep
    is_static = keep & ~is_dyn

    tiles, _ = extract_tiles(atlas, geom, tile_hw)
    th, tw = tiles.shape[1:3]
    flat_static = is_static.reshape(-1)
    flat_dyn = is_dyn.reshape(-1)

    tile_map_static = np.full(D * nth * ntw, -1, np.int32)
    tile_map_static[flat_static] = np.arange(flat_static.sum())
    tile_map_dyn = np.full(D * nth * ntw, -1, np.int32)
    tile_map_dyn[flat_dyn] = np.arange(flat_dyn.sum())

    static_tiles = tiles[flat_static]
    dyn_tiles = tiles[flat_dyn]
    n_total = D * nth * ntw
    return {
        "static_tiles": static_tiles,
        "dyn_tiles": dyn_tiles,
        "tile_map_static": tile_map_static.reshape(D, nth, ntw),
        "tile_map_dyn": tile_map_dyn.reshape(D, nth, ntw),
        "tile_hw": (th, tw),
        "keep_frac": float(keep.sum()) / n_total,
        "dyn_frac": float(is_dyn.sum()) / max(int(keep.sum()), 1),
    }


def apply_tile_cull(model, params, alpha_activate, erode_num=2,
                    alpha_thresh=0.03, loop_thresh=0.5, rm_first_layers=0,
                    tile_hw=None):
    """Mutate an MPMesh into its sparse phase; returns new params dict."""
    import jax.numpy as jnp
    result = tile_cull(params, model.geom, alpha_activate, erode_num,
                       alpha_thresh, loop_thresh, rm_first_layers, tile_hw)
    model.is_sparse = True
    model.has_dyn = True
    model.tile_map_static = result["tile_map_static"]
    model.tile_map_dyn = result["tile_map_dyn"]
    model.tile_hw = result["tile_hw"]
    # loop mask is consumed by the culling decision and dropped
    # (ref MPI.py:441-442)
    new_params = {
        "atlas": jnp.asarray(result["static_tiles"]),
        "atlas_dyn": jnp.asarray(result["dyn_tiles"]),
    }
    if "verts" in params:
        new_params["verts"] = params["verts"]
    return new_params, result
