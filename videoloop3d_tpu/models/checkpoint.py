"""Checkpoint schemas: dense stage-1, sparse stage-1, stage-2 video.

Single-file ``.npz`` checkpoints carrying arrays + a JSON metadata blob
(geometry, phase flags, tile layout, training progress).  Mirrors the
information content of the reference's customized state_dicts
(MPI.py:207-221, MPV.py:290-304 embed atlas-layout scalars because
sparsification changes tensor shapes) plus the trainer bookkeeping
(train_3d.py:313-318, train_3dvid.py:296-306).
"""
from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from videoloop3d_tpu.models.geometry import MPIGeometry

SCHEMA_VERSION = 1


def _geom_meta(geom: MPIGeometry):
    return dataclasses.asdict(geom)


def geom_from_meta(meta) -> MPIGeometry:
    m = dict(meta)
    m["depths"] = tuple(m["depths"])
    m["ref_intrin_mpi"] = tuple(tuple(r) for r in m["ref_intrin_mpi"])
    m["ref_extrin"] = tuple(tuple(r) for r in m["ref_extrin"])
    return MPIGeometry(**m)


def save_checkpoint(path, *, geom, params, stage, is_sparse=False,
                    has_dyn=False, tile_map_static=None, tile_map_dyn=None,
                    tile_hw=None, frm_num=None, extra_meta=None):
    """params: dict of arrays (host or device)."""
    meta = {
        "schema": SCHEMA_VERSION,
        "stage": stage,                      # 'mpi' | 'mpv'
        "is_sparse": bool(is_sparse),
        "has_dyn": bool(has_dyn),
        "tile_hw": list(tile_hw) if tile_hw else None,
        "frm_num": frm_num,
        "geometry": _geom_meta(geom),
        "extra": extra_meta or {},
        "param_keys": sorted(params.keys()),
    }
    arrays = {f"param/{k}": np.asarray(v) for k, v in params.items()}
    if tile_map_static is not None:
        arrays["tile_map_static"] = np.asarray(tile_map_static)
    if tile_map_dyn is not None:
        arrays["tile_map_dyn"] = np.asarray(tile_map_dyn)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    os.replace(tmp, path)


def load_checkpoint(path):
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        params = {k: z[f"param/{k}"] for k in meta["param_keys"]}
        out = {"meta": meta, "params": params,
               "geom": geom_from_meta(meta["geometry"])}
        for k in ("tile_map_static", "tile_map_dyn"):
            out[k] = z[k] if k in z.files else None
    return out


def latest_checkpoint(dirpath, suffix=".npz"):
    """Newest (lexicographically last) checkpoint in a run directory —
    mirrors the reference's 'sorted, take last .tar' (ref
    script_render_video.py:108-111)."""
    if not os.path.isdir(dirpath):
        return None
    cands = sorted(f for f in os.listdir(dirpath)
                   if f.endswith(suffix) and "ckpt" in f)
    return os.path.join(dirpath, cands[-1]) if cands else None
