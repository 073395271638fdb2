"""Differentiable rendering through the (optimizable) vertex grids.

Parity: the reference renders through a pytorch3d rasterization of the
per-plane quad meshes and interpolates fixed per-vertex UVs with plain
screen-space barycentrics (MPI.py:452-536: project verts, rasterize
faces013/faces320, ``get_uvs`` sums ``bary * uvs``), so moving a vertex
slides atlas content across the screen and gradients reach the verts
through the barycentrics.

TPU-native formulation: no rasterizer loop, no dynamic shapes.  The
vertex grid starts as the exact regular grid on each plane, so a pixel's
containing quad under a perturbed grid is within a small neighborhood of
its containing quad under the FLAT grid (which the plane-sweep homography
gives in closed form).  Per pixel we therefore:

  1. get the flat-plane texel coords (existing homography sweep) and the
     implied quad cell;
  2. test the 3x3 neighboring quads (two triangles each, the reference's
     013/320 split) with 2-D barycentric containment against the
     projected PERTURBED vertex positions;
  3. select the best triangle (max of min-barycentric — robust at shared
     edges) and interpolate its fixed texel-space UVs.

The selection is discrete (gradients flow only through the selected
triangle's barycentrics — exactly like a rasterizer's hard visibility);
the result equals the reference's rasterization whenever every vertex
moves less than one quad extent, the regime of geometry refinement
(verts initialize flat; ``optimize_geo_start`` turns the path on late).
With unperturbed verts the coords reduce to the plane-sweep's (verified
in tests/test_geo_warp.py).

Plane ORDER is kept global (storage far -> near): per-pixel z-sorting
would only differ once plane surfaces cross, i.e. |dz| exceeding the
inter-plane gap — outside the refinement regime (the reference's z-buffer
handles it; we document the constraint instead of paying a per-pixel
sort on the TPU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from videoloop3d_tpu.render import renderer as R


def denormalize_verts(geom, verts, normalize):
    """Undo the per-plane depth normalization (ref MPI.py:445-449)."""
    if not normalize:
        return verts
    D = geom.n_planes
    depths = jnp.asarray(geom.depths_np())
    return (verts.reshape(D, -1) * depths[:, None]).reshape(verts.shape)


def vertex_crossing_report(geom, verts, normalize=False):
    """(max |dz|, half inter-plane gap) — the guard for the documented
    validity bound of the global far->near plane order (module
    docstring): two adjacent plane surfaces can cross once each may
    deviate by half the gap, where the reference's z-buffered rasterizer
    would start reordering fragments (MPI.py:452-475) and this module
    would not.  Host-side; trainers warn when max|dz| > half-gap."""
    import numpy as np
    v = np.asarray(denormalize_verts(geom, jnp.asarray(verts), normalize))
    D = geom.n_planes
    depths = geom.depths_np()
    vz = v.reshape(D, -1, 3)[..., 2]
    dz = float(np.abs(vz - depths[:, None]).max())
    half_gap = float(np.abs(np.diff(depths)).min()) / 2.0
    return dz, half_gap


def _bary(px, py, ax, ay, bx, by, cx, cy):
    """2-D barycentrics of (px,py) in triangle (a,b,c); sign-safe."""
    v0x, v0y = bx - ax, by - ay
    v1x, v1y = cx - ax, cy - ay
    v2x, v2y = px - ax, py - ay
    den = v0x * v1y - v1x * v0y
    den = jnp.where(jnp.abs(den) < 1e-12,
                    jnp.where(den < 0, -1e-12, 1e-12), den)
    b1 = (v2x * v1y - v1x * v2y) / den
    b2 = (v0x * v2y - v2x * v0y) / den
    return 1.0 - b1 - b2, b1, b2


def warp_coordinates_verts(geom, verts, extrins, intrins, h, w,
                           normalize=False):
    """Pixel -> texel warp through the vertex grids.

    verts: (D*Hv*Wv, 3) ref-camera-space positions (differentiable);
    extrins: (B, 4, 4) RELATIVE to the ref camera; returns WarpCoords
    with gradients flowing to `verts`.
    """
    D = geom.n_planes
    Hv, Wv = geom.n_tiles_h + 1, geom.n_tiles_w + 1
    verts = denormalize_verts(geom, verts, normalize)
    verts = verts.reshape(D, Hv, Wv, 3)
    B = extrins.shape[0]

    Rm = extrins[:, :3, :3]
    t = extrins[:, :3, 3]
    v_view = jnp.einsum("bij,dhwj->bdhwi", Rm, verts) \
        + t[:, None, None, None]
    pix = jnp.einsum("bij,bdhwj->bdhwi", intrins, v_view)
    vz = pix[..., 2]
    vz_safe = jnp.where(jnp.abs(vz) < 1e-6, 1e-6, vz)
    vpx = pix[..., 0] / vz_safe                       # (B, D, Hv, Wv)
    vpy = pix[..., 1] / vz_safe
    infront = v_view[..., 2] > 1e-6

    # fixed per-vertex UVs: the regular texel grid (ref uvs_voxel)
    uvx = jnp.linspace(0.0, geom.mpi_w - 1.0, Wv)
    uvy = jnp.linspace(0.0, geom.mpi_h - 1.0, Hv)

    # flat-grid quad guess from the closed-form sweep
    flat = R.warp_coordinates(geom, extrins, intrins, h, w)
    span_y = (geom.mpi_h - 1.0) / (Hv - 1)
    span_x = (geom.mpi_w - 1.0) / (Wv - 1)
    qi0 = jnp.clip(jnp.floor(flat.y / span_y).astype(jnp.int32), 0, Hv - 2)
    qj0 = jnp.clip(jnp.floor(flat.x / span_x).astype(jnp.int32), 0, Wv - 2)

    xs = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]

    def corner(arr, i, j):
        """Per-pixel gather of vertex-grid values: arr (B,D,Hv,Wv),
        i/j (B,D,h,w) -> (B,D,h,w)."""
        flat_idx = i * Wv + j
        a = arr.reshape(B, D, Hv * Wv)
        return jnp.take_along_axis(a, flat_idx.reshape(B, D, -1),
                                   axis=2).reshape(i.shape)

    best_score = jnp.full((B, D, h, w), -jnp.inf, jnp.float32)
    best_x = jnp.zeros((B, D, h, w), jnp.float32)
    best_y = jnp.zeros((B, D, h, w), jnp.float32)
    best_z = jnp.ones((B, D, h, w), jnp.float32)

    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            qi = jnp.clip(qi0 + di, 0, Hv - 2)
            qj = jnp.clip(qj0 + dj, 0, Wv - 2)
            # quad corners TL, TR, BR, BL (projected + uv + frontness)
            cs = [(qi, qj), (qi, qj + 1), (qi + 1, qj + 1), (qi + 1, qj)]
            cpx = [corner(vpx, i, j) for i, j in cs]
            cpy = [corner(vpy, i, j) for i, j in cs]
            cz = [corner(v_view[..., 2], i, j) for i, j in cs]
            cok = [corner(infront.astype(jnp.float32), i, j) for i, j
                   in cs]
            cux = [uvx[j] for _, j in cs]
            cuy = [uvy[i] for i, _ in cs]
            # triangles: 013 = TL,TR,BR and 320 = BR,BL,TL (ref split)
            for (a, b, c) in ((0, 1, 2), (2, 3, 0)):
                b0, b1, b2 = _bary(xs, ys, cpx[a], cpy[a], cpx[b],
                                   cpy[b], cpx[c], cpy[c])
                score = jnp.minimum(jnp.minimum(b0, b1), b2)
                front = cok[a] * cok[b] * cok[c]
                score = jnp.where(front > 0.5, score, -jnp.inf)
                upd = score > best_score
                ux = b0 * cux[a] + b1 * cux[b] + b2 * cux[c]
                uy = b0 * cuy[a] + b1 * cuy[b] + b2 * cuy[c]
                uz = b0 * cz[a] + b1 * cz[b] + b2 * cz[c]
                best_score = jnp.where(upd, score, best_score)
                best_x = jnp.where(upd, ux, best_x)
                best_y = jnp.where(upd, uy, best_y)
                best_z = jnp.where(upd, uz, best_z)

    # inside some triangle (tolerance for shared edges) and in front
    valid = (best_score > -1e-4) & (best_z > 1e-6)
    inside = (best_x >= 0) & (best_x <= geom.mpi_w - 1) & \
             (best_y >= 0) & (best_y <= geom.mpi_h - 1)
    valid = valid & inside
    return R.WarpCoords(best_x, best_y, best_z, valid)
