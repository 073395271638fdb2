"""Static geometry of a Multi-plane Tile Video scene.

Replaces the reference's explicit vertex/face/UV buffers
(reference MPI.py:56-93) with an analytic description: D fronto-parallel
planes in the reference-camera frame, each carrying an (n_tiles_h x
n_tiles_w) tile grid over a virtual plane texture of mpi_h x mpi_w texels.
Dense phase: every plane is a full texture.  Sparse phase: kept tiles live
in packed arrays indexed through per-plane int32 tile maps.

Plane index 0 is the FARTHEST plane.  (The reference stores the OPPOSITE
order: MPI.py:57 flips `make_depths` to near-first and its rasterizer
z-sorts per pixel, so storage order never matters there.  Here storage
order IS compositing order, so it is pinned: index 0 = far, and every
composite weights plane i by prod_{j>i}(1 - a_j).)
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from videoloop3d_tpu.core import planes as plane_math
from videoloop3d_tpu.core import cameras


@dataclasses.dataclass(frozen=True)
class MPIGeometry:
    """Hashable static geometry (safe to close over in jitted functions)."""
    n_planes: int
    mpi_h: int                   # virtual plane texture height (texels)
    mpi_w: int
    n_tiles_h: int               # tile grid (mpi_*_verts - 1 in ref terms)
    n_tiles_w: int
    near: float
    far: float
    depths: Tuple[float, ...]    # far -> near, length n_planes
    ref_intrin_mpi: Tuple[Tuple[float, ...], ...]   # 3x3
    ref_extrin: Tuple[Tuple[float, ...], ...]       # 4x4

    # ---- constructors -----------------------------------------------------
    @staticmethod
    def create(args, H, W, ref_extrin, ref_intrin, near, far) -> "MPIGeometry":
        """Build from reference-style args (reference MPI.py:37-67)."""
        mpi_h = int(args.mpi_h_scale * H)
        mpi_w = int(args.mpi_w_scale * W)
        h_start = (mpi_h - H) // 2
        w_start = (mpi_w - W) // 2
        km = cameras.shift_intrinsic(np.asarray(ref_intrin, np.float64),
                                     -h_start, -w_start)
        depths = plane_math.make_depths(args.mpi_d, near, far)  # far first
        return MPIGeometry(
            n_planes=int(args.mpi_d),
            mpi_h=mpi_h, mpi_w=mpi_w,
            n_tiles_h=int(args.mpi_h_verts) - 1,
            n_tiles_w=int(args.mpi_w_verts) - 1,
            near=float(near), far=float(far),
            depths=tuple(float(d) for d in depths),
            ref_intrin_mpi=tuple(tuple(float(v) for v in row) for row in km),
            ref_extrin=tuple(tuple(float(v) for v in row)
                             for row in np.asarray(ref_extrin, np.float64)),
        )

    # ---- derived quantities ----------------------------------------------
    @property
    def tile_span(self):
        """Tile extent in virtual texel units (float, per axis)."""
        return ((self.mpi_h - 1) / self.n_tiles_h,
                (self.mpi_w - 1) / self.n_tiles_w)

    def default_tile_texels(self):
        """Texel resolution for packed tiles, ~1 texel per virtual texel
        (reference MPI.py:304-305 rounds the UV span the same way)."""
        sy, sx = self.tile_span
        return max(int(round(sy)) + 1, 2), max(int(round(sx)) + 1, 2)

    def scaled(self, mpi_h, mpi_w) -> "MPIGeometry":
        """Same planes, different virtual texture resolution (for `lod`).

        The intrinsic that maps plane space to texels rescales by the
        align-corners factor (new-1)/(old-1)."""
        fy = (mpi_h - 1) / (self.mpi_h - 1)
        fx = (mpi_w - 1) / (self.mpi_w - 1)
        km = np.asarray(self.ref_intrin_mpi, np.float64)
        km = cameras.scale_intrinsic(km, fy, fx)
        return dataclasses.replace(
            self, mpi_h=int(mpi_h), mpi_w=int(mpi_w),
            ref_intrin_mpi=tuple(tuple(float(v) for v in row) for row in km))

    def depths_np(self):
        return np.asarray(self.depths, np.float32)

    def ref_intrin_mpi_np(self):
        return np.asarray(self.ref_intrin_mpi, np.float32)

    def ref_extrin_np(self):
        return np.asarray(self.ref_extrin, np.float32)

    def vertex_grid(self):
        """Vertex positions for export/golden tests (ref utils_mpi.py:80)."""
        return plane_math.mpi_vertex_grid(
            self.mpi_h, self.mpi_w, self.ref_intrin_mpi_np(),
            self.n_tiles_h + 1, self.n_tiles_w + 1, self.depths_np())
