"""ctypes binding + lazy build of the C++ reference rasterizer.

The native counterpart of the reference's PyTorch3D `rasterize_meshes`
dependency (utils.py:20-70 SimpleRasterizer).  Pure host-side: used for
golden tests of the TPU plane-sweep renderer and as the fallback
rasterization path for perturbed-vertex geometry.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "csrc")
_LIB = None


def _build_lib():
    # Key the artifact on the source hash (git does not preserve mtimes,
    # so an mtime staleness check is nondeterministic across clones).
    src = os.path.join(_CSRC, "rasterizer.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_CSRC, f"librasterizer-{digest}.so")
    if not os.path.exists(out):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
            check=True)
    return out


def _get_lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_lib())
        lib.rasterize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.rasterize.restype = None
        _LIB = lib
    return _LIB


def rasterize(verts, faces, h, w, faces_per_pixel):
    """Rasterize triangles on the host.

    Args:
      verts: (N, 3) float32 — (x_pix, y_pix, z_view), pixel centers at
        integer coordinates.
      faces: (F, 3) int32.
      faces_per_pixel: K nearest faces kept per pixel.

    Returns (pix_to_face (h,w,K) int32 [-1 empty], zbuf (h,w,K) f32,
    bary (h,w,K,3) f32 perspective-corrected).
    """
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    K = int(faces_per_pixel)
    pix_to_face = np.full((h, w, K), -1, np.int32)
    zbuf = np.full((h, w, K), -1.0, np.float32)
    bary = np.zeros((h, w, K, 3), np.float32)
    lib = _get_lib()
    lib.rasterize(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(faces), h, w, K,
        pix_to_face.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        zbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bary.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return pix_to_face, zbuf, bary


def project_vertices(verts_ref, extrin, intrin):
    """Reference-space vertices -> screen-space (x_pix, y_pix, z_view)."""
    v = np.asarray(verts_ref, np.float64)
    R = np.asarray(extrin)[:3, :3]
    t = np.asarray(extrin)[:3, 3]
    pv = v @ R.T + t
    proj = pv @ np.asarray(intrin).T
    return np.stack([proj[:, 0] / pv[:, 2], proj[:, 1] / pv[:, 2],
                     pv[:, 2]], axis=-1).astype(np.float32)
