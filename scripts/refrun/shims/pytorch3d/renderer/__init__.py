"""rasterize_meshes / RasterizationSettings / TexturesUV shims.

`rasterize_meshes` reproduces the pytorch3d contract the reference
exercises (utils.py:51-70): verts in pytorch3d NDC (+X left, +Y up,
shorter image side spanning [-1, 1], z = view-space depth), K-deep
z-ascending fragments with perspective-corrected barycentrics, empty
slots pix_to_face = -1 / zbuf = -1.  Backed by this repo's C++
rasterizer, which takes pixel-space verts with integer pixel centers —
the NDC->pixel mapping below is the exact inverse of pytorch3d's
pixel->NDC convention for non-square images:

    x_pix = (W - 1 - S * x_ndc) / 2,   y_pix = (H - 1 - S * y_ndc) / 2,
    S = min(H, W).
"""
from __future__ import annotations

import sys

import numpy as np
import torch

from .mesh.rasterizer import Fragments  # noqa: F401


class RasterizationSettings:
    def __init__(self, image_size=256, blur_radius=0.0, faces_per_pixel=1,
                 bin_size=None, max_faces_per_bin=None,
                 perspective_correct=None, clip_barycentric_coords=None,
                 cull_backfaces=False, z_clip_value=None,
                 cull_to_frustum=False):
        self.image_size = image_size
        self.blur_radius = blur_radius
        self.faces_per_pixel = faces_per_pixel
        self.bin_size = bin_size
        self.max_faces_per_bin = max_faces_per_bin
        self.perspective_correct = perspective_correct
        self.clip_barycentric_coords = clip_barycentric_coords
        self.cull_backfaces = cull_backfaces
        self.z_clip_value = z_clip_value
        self.cull_to_frustum = cull_to_frustum


class _ImportOnly:
    """Symbols imported by the reference (MPI.py:11-19, MPV.py:14-21) but
    never called at runtime in the trainer paths."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            f"{type(self).__name__} shim is import-only")


class TexturesUV(_ImportOnly):
    pass


class Textures(_ImportOnly):
    pass


class FoVPerspectiveCameras(_ImportOnly):
    pass


class PerspectiveCameras(_ImportOnly):
    pass


def look_at_view_transform(*args, **kwargs):
    raise NotImplementedError("look_at_view_transform shim is import-only")


def _raster_cpp():
    # The repo package is importable because the harness prepends
    # /root/repo to sys.path before /root/reference.
    from videoloop3d_tpu.render import raster_cpp
    return raster_cpp


def rasterize_meshes(meshes, image_size=256, blur_radius=0.0,
                     faces_per_pixel=8, bin_size=None, max_faces_per_bin=None,
                     clip_barycentric_coords=False, perspective_correct=True,
                     cull_backfaces=False, z_clip_value=None,
                     cull_to_frustum=False):
    assert blur_radius == 0.0, "shim supports blur_radius=0 only"
    if isinstance(image_size, (tuple, list)):
        H, W = int(image_size[0]), int(image_size[1])
    else:
        H = W = int(image_size)
    S = min(H, W)
    K = int(faces_per_pixel)

    verts_b = meshes.verts
    faces_b = meshes.faces
    B = verts_b.shape[0]
    # The reference only ever builds B=1 Meshes (MPI.py:484-486 reshapes
    # to (1, -1, 3)); per-mesh (unpacked) face indices are therefore
    # identical to pytorch3d's packed indices.
    assert faces_b.shape[0] == B, "shim supports matched verts/faces batch"
    device = verts_b.device
    rc = _raster_cpp()

    p2f = torch.full((B, H, W, K), -1, dtype=torch.long)
    zbuf = torch.full((B, H, W, K), -1.0, dtype=torch.float32)
    bary = torch.full((B, H, W, K, 3), -1.0, dtype=torch.float32)
    dists = torch.full((B, H, W, K), -1.0, dtype=torch.float32)

    for b in range(B):
        v = verts_b[b].detach().cpu().numpy().astype(np.float64)
        f = faces_b[b].detach().cpu().numpy().astype(np.int32)
        vp = np.empty_like(v, dtype=np.float32)
        vp[:, 0] = (W - 1 - S * v[:, 0]) / 2.0
        vp[:, 1] = (H - 1 - S * v[:, 1]) / 2.0
        vp[:, 2] = v[:, 2]
        face_i, z_i, bary_i = rc.rasterize(vp, f, H, W, K)
        p2f[b] = torch.from_numpy(face_i.astype(np.int64))
        zbuf[b] = torch.from_numpy(z_i)
        bary[b] = torch.from_numpy(bary_i)

    return [p2f.to(device), zbuf.to(device), bary.to(device),
            dists.to(device)]
