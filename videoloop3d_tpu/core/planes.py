"""MPI plane geometry: depth spacing and per-plane projective transforms.

TPU-first design note
---------------------
The reference renders its multi-plane tile geometry by rasterizing quads
with PyTorch3D's CUDA `rasterize_meshes` and interpolating UVs with
perspective-correct barycentrics (reference MPI.py:452-510).  For
fronto-parallel planes with an affine UV field that pipeline is
*mathematically identical* to warping every target pixel through a 3x3
plane-induced homography and gathering from the plane texture.  A
homography warp is a dense, static-shape gather -> ideal for XLA/TPU,
whereas K-deep rasterization + masked_scatter is ragged and
gather/scatter-hostile.  So the TPU renderer is a plane sweep built from
the transforms defined here.

Geometry recap (reference utils_mpi.py:80-89, MPI.py:57-67):
planes live in the *reference camera* space at depths `make_depths(...)`,
each plane covering the pixel rectangle of an enlarged reference image
(mpi_h x mpi_w) through a shifted reference intrinsic.
"""
from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp


def make_depths(num_planes, near, far):
    """Plane depths uniformly spaced in disparity, FAR FIRST (index 0 =
    farthest, descending in depth / ascending in disparity).

    Parity: utils_mpi.py:210-211 (make_depths).  The models store this
    order unchanged; see `MPIGeometry` (the reference flips to near-first
    but its per-pixel z-sorted rasterizer makes storage order moot there).
    """
    return np.reciprocal(np.linspace(1.0 / far, 1.0 / near, num_planes,
                                     dtype=np.float64)).astype(np.float32)


def plane_homographies(depths, ref_intrin_mpi, tar_extrin, tar_intrin):
    """3x3 transforms mapping target-view pixels onto plane-texture pixels.

    For plane depth z, a plane-texture pixel hp=(u,v,1) lifts to the point
    p_ref = z * Km^-1 hp in reference-camera space; with the relative
    extrinsic [R|t] = tar_extrin @ ref_extrin^-1 the target projection is

        z_view * ht = Kt (z R + t e3^T) Km^-1 hp  =: M hp .

    We return G = M^-1 (un-normalized), so for a target pixel ht:

        g = G ht,   plane pixel = (g.x / g.z, g.y / g.z),
        view-space depth z_view = 1 / g.z .

    (The identity z_view = 1/g.z holds because the third row of M maps hp
    to z_view and G M = I exactly — intrinsics have last row (0,0,1).)

    Args:
      depths: (D,) plane depths (in ref space).
      ref_intrin_mpi: (3,3) intrinsic mapping the plane rectangle to
        texture pixels (already shifted for the MPI over-scan).
      tar_extrin: (B,4,4) target extrinsics *relative to the ref camera*.
      tar_intrin: (B,3,3).

    Returns: (B, D, 3, 3) float32.
    """
    depths = jnp.asarray(depths, jnp.float32)
    Km = jnp.asarray(ref_intrin_mpi, jnp.float32)
    R = tar_extrin[:, :3, :3]
    t = tar_extrin[:, :3, 3]
    # Closed-form inverse for numerical robustness (a generic f32
    # 3x3 inverse of the composed matrix loses ~0.1px):
    #   M = Kt (z R + t e3^T) Km^-1
    #   M^-1 = Km (z R + t e3^T)^-1 Kt^-1
    # with R orthonormal (rigid extrinsics) and Sherman-Morrison for the
    # rank-1 translation term:  (zR + t e3^T)^-1 = B - B t e3^T B / (1 +
    # e3^T B t),  B = R^T / z.
    hi = jax.lax.Precision.HIGHEST
    Kt_inv = _intrinsic_inverse(tar_intrin)                    # (B, 3, 3)
    B_mat = jnp.swapaxes(R, -1, -2)[:, None] / depths[None, :, None, None]
    Bt = jnp.einsum("bdij,bj->bdi", B_mat, t, precision=hi)    # (B, D, 3)
    denom = 1.0 + Bt[..., 2]                                   # e3^T B t
    outer = Bt[..., :, None] * B_mat[..., 2, None, :]          # B t e3^T B
    A_inv = B_mat - outer / denom[..., None, None]
    G = jnp.einsum("ij,bdjk,bkl->bdil", Km, A_inv, Kt_inv, precision=hi)
    return G


def _intrinsic_inverse(K):
    """Analytic inverse of (..., 3, 3) intrinsics with last row (0,0,1)."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    s = K[..., 0, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    inv_fx, inv_fy = 1.0 / fx, 1.0 / fy
    row0 = jnp.stack([inv_fx, -s * inv_fx * inv_fy,
                      (s * cy * inv_fy - cx) * inv_fx], axis=-1)
    row1 = jnp.stack([zeros, inv_fy, -cy * inv_fy], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def warp_grid(G, h, w):
    """Apply inverse plane homographies to the target pixel grid.

    Args:
      G: (B, D, 3, 3) from `plane_homographies`.
      h, w: target viewport size.

    Returns (x, y, zview): each (B, D, h, w) float32 — plane-texture pixel
    coordinates and the view-space depth of the intersection (negative or
    infinite where the plane is behind the camera).
    """
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")          # (h, w)
    pix = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=0)  # (3, h, w)
    g = jnp.einsum("bdij,jhw->bdihw", G, pix)
    denom = g[:, :, 2]
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    x = g[:, :, 0] / safe
    y = g[:, :, 1] / safe
    zview = 1.0 / safe
    return x, y, zview


def mpi_vertex_grid(mpi_h, mpi_w, intrin, n_vert_h, n_vert_w, depths):
    """Vertex positions of the plane tile grids (for export / golden tests).

    Parity: utils_mpi.py:80-89 (gen_mpi_vertices).  Returns
    (D * n_vert_h * n_vert_w, 3) float32 in reference-camera space.
    """
    ys = np.linspace(0, mpi_h - 1, n_vert_h)
    xs = np.linspace(0, mpi_w - 1, n_vert_w)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    pix = np.stack([gx, gy], -1).reshape(-1, 2)           # (V, 2)
    depths = np.asarray(depths, np.float32)
    xy = (pix[None] - np.asarray(intrin)[None, None, :2, 2]) \
        * depths[:, None, None]
    xy = xy / np.asarray(intrin)[None, None, [0, 1], [0, 1]]
    z = np.broadcast_to(depths[:, None, None], xy[..., :1].shape)
    return np.concatenate([xy, z], axis=-1).reshape(-1, 3).astype(np.float32)
