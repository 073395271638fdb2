"""Gather-based adjoint for dense plane sampling (experimental).

The autodiff backward of the renderer's bilinear gather is an XLA
scatter-add of corner gradients into the atlas — measured at 0.6GB/s it
is 66% of the stage-1 step.  This module computes the SAME gradient with
gathers only ("splat = inverse-warp gather"): every atlas texel collects
the contributions of the <= window^2 pixels whose sample coordinate
lands within 1 texel of it.  The candidate pixels are found by mapping
the texel through the exact forward plane projection (texel -> target
pixel, the inverse of the sampling homography), and the weights are the
exact bilinear weights recomputed from the SAVED forward sample
coordinates — so the gradient is exact whenever the window covers all
contributors.

Coverage condition: contributors lie within sqrt(2)/sigma_min(J) pixels
of the texel's pixel-space preimage, where J is the pixel->texel warp
Jacobian.  For the shipped configs the warp scale is ~0.9-1.6
texels/pixel, so ``window=5`` is conservative.  The op treats geometry
as non-differentiable (zero cotangents for the transforms) — consistent
with the framework (vertex optimization is not wired, see PARITY.md).

Enabled by ``--fast_stage1_grad`` (off by default until soak-tested);
exactness is verified against autodiff in tests/test_adjoint.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from videoloop3d_tpu.render.sample import bilinear_planes


def forward_projection(depths, ref_intrin_mpi, tar_extrin, tar_intrin):
    """M: texel -> (z * target-pixel homog); the exact inverse of
    plane_homographies' G, built without any matrix inversion."""
    depths = jnp.asarray(depths, jnp.float32)
    Km_inv = _intrin_inv(jnp.asarray(ref_intrin_mpi, jnp.float32)[None])[0]
    R = tar_extrin[:, :3, :3]
    t = tar_extrin[:, :3, 3]
    e3 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    core = depths[None, :, None, None] * R[:, None] \
        + (t[:, :, None] * e3[None, None, :])[:, None]
    return jnp.einsum("bij,bdjk,kl->bdil", tar_intrin, core,
                      Km_inv, precision=jax.lax.Precision.HIGHEST)


def _intrin_inv(K):
    from videoloop3d_tpu.core.planes import _intrinsic_inverse
    return _intrinsic_inverse(K)


def _adjoint_atlas_grad(ct, x, y, M, atlas_hw, rect_hw, window):
    """Texel-major gradient assembly.

    ct: (B, D, h, w, C) output cotangent; x, y: (B, D, h, w) saved sample
    coords; M: (B, D, 3, 3) texel->pixel projection.
    Returns (D, Ht, Wt, C) atlas gradient.
    """
    B, D, h, w, C = ct.shape
    Ht, Wt = atlas_hw
    Rh, Rw = rect_hw

    def per_plane(ct_p, x_p, y_p, M_p):
        """One (view, plane): rect grad + its (y0, x0) start."""
        # footprint rect start from the saved coords (clamped)
        x0 = jnp.clip(jnp.floor(jnp.min(x_p)).astype(jnp.int32) - 1,
                      0, max(Wt - Rw, 0))
        y0 = jnp.clip(jnp.floor(jnp.min(y_p)).astype(jnp.int32) - 1,
                      0, max(Ht - Rh, 0))
        ty = y0 + jnp.arange(Rh)[:, None]                   # (Rh, 1)
        tx = x0 + jnp.arange(Rw)[None, :]                   # (1, Rw)
        txf = tx.astype(jnp.float32) + jnp.zeros((Rh, Rw), jnp.float32)
        tyf = ty.astype(jnp.float32) + jnp.zeros((Rh, Rw), jnp.float32)
        # texel -> pixel preimage via the exact forward projection
        denom = M_p[2, 0] * txf + M_p[2, 1] * tyf + M_p[2, 2]
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        px = (M_p[0, 0] * txf + M_p[0, 1] * tyf + M_p[0, 2]) / denom
        py = (M_p[1, 0] * txf + M_p[1, 1] * tyf + M_p[1, 2]) / denom
        pxi = jnp.floor(px).astype(jnp.int32)
        pyi = jnp.floor(py).astype(jnp.int32)

        grad = jnp.zeros((Rh, Rw, C), jnp.float32)
        half = (window - 1) // 2
        flat_x = x_p.reshape(-1)
        flat_y = y_p.reshape(-1)
        flat_ct = ct_p.reshape(-1, C)
        for dy in range(-half, window - half):
            for dx in range(-half, window - half):
                cx = pxi + dx
                cy = pyi + dy
                valid = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
                idx = jnp.clip(cy, 0, h - 1) * w + jnp.clip(cx, 0, w - 1)
                sx = jnp.take(flat_x, idx)
                sy = jnp.take(flat_y, idx)
                wgt = jnp.maximum(0.0, 1.0 - jnp.abs(sx - txf)) \
                    * jnp.maximum(0.0, 1.0 - jnp.abs(sy - tyf))
                wgt = jnp.where(valid, wgt, 0.0)
                grad = grad + wgt[..., None] * jnp.take(flat_ct, idx,
                                                        axis=0)
        return grad, y0, x0

    grads, y0s, x0s = jax.vmap(jax.vmap(per_plane))(ct, x, y, M)

    atlas_grad = jnp.zeros((D, Ht, Wt, C), jnp.float32)

    def add_one(carry, inp):
        g, y0, x0, d = inp
        upd = jax.lax.dynamic_slice(
            carry, (d, y0, x0, 0), (1, Rh, Rw, C))
        carry = jax.lax.dynamic_update_slice(
            carry, upd + g[None], (d, y0, x0, 0))
        return carry, 0

    flat_g = grads.reshape(B * D, Rh, Rw, C)
    flat_y0 = y0s.reshape(-1)
    flat_x0 = x0s.reshape(-1)
    flat_d = jnp.tile(jnp.arange(D, dtype=jnp.int32), B)
    atlas_grad, _ = jax.lax.scan(
        add_one, atlas_grad, (flat_g, flat_y0, flat_x0, flat_d))
    return atlas_grad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sample_dense_adjoint(atlas, x, y, M, rect_hw, window):
    """Like render.sample_dense but with the gather-based backward.

    atlas: (D, Ht, Wt, C); x, y: (B, D, h, w) sample coords (treated as
    non-differentiable); M: (B, D, 3, 3) texel->pixel projection.
    Returns (B, D, h, w, C).
    """
    B, D, h, w = x.shape
    vals, _ = jax.vmap(
        lambda xx, yy: bilinear_planes(atlas, xx, yy))(
            x.reshape(B, D, h * w), y.reshape(B, D, h * w))
    return vals.reshape(B, D, h, w, atlas.shape[-1])


def _fwd(atlas, x, y, M, rect_hw, window):
    out = sample_dense_adjoint(atlas, x, y, M, rect_hw, window)
    return out, (atlas.shape, x, y, M)


def _bwd(rect_hw, window, res, ct):
    atlas_shape, x, y, M = res
    g = _adjoint_atlas_grad(ct, x, y, M, atlas_shape[1:3], rect_hw, window)
    return (g, jnp.zeros_like(x), jnp.zeros_like(y), jnp.zeros_like(M))


sample_dense_adjoint.defvjp(_fwd, _bwd)


def rect_size_for(geom, h, w, image_hw, margin=1.4):
    """Static footprint-rect size: patch extent x nominal warp scale x a
    margin for view-dependent distortion."""
    sy = geom.mpi_h / image_hw[0]
    sx = geom.mpi_w / image_hw[1]
    rh = min(int(h * sy * margin) + 8, geom.mpi_h)
    rw = min(int(w * sx * margin) + 8, geom.mpi_w)
    return rh, rw
