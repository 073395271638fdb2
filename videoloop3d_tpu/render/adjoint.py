"""Scatter-free adjoints for the bilinear texture samplers.

The autodiff backward of the renderer's bilinear gather is an XLA
scatter-add of corner gradients into the atlas — measured at 0.6GB/s it
was 66% of the stage-1 step.  This module computes the SAME gradients
with gathers + MXU contractions only, in two flavors:

1. DENSE planes (stage-1 pre-cull): "splat = inverse-warp gather" —
   every atlas texel collects the contributions of the <= window^2
   pixels whose sample coordinate lands within 1 texel of it.  The
   candidate pixels are found by mapping the texel through the exact
   forward plane projection (texel -> target pixel, the inverse of the
   sampling homography), and the weights are the exact bilinear weights
   recomputed from the SAVED forward sample coordinates — exact
   whenever the window covers all contributors.
2. PACKED tiles (stage 2 + stage-1 post-cull): `make_tile_adjoint[...]`
   slices each packed tile's pixel window from the saved (k, u, v)
   residuals with row-batched gathers, masks by ownership (k == tile)
   and contracts exact separable bilinear weights on the MXU — the
   output IS the packed-tile gradient layout, zero scatters.  Optional
   compactions: `active_tile_bound` statically drops tiles whose
   projected footprint cannot reach the training patch, and
   render/compact.py's hit-compacted variant replays the compacted
   plane sweep.

Coverage condition: contributors lie within sqrt(2)/sigma_min(J) pixels
of the texel's pixel-space preimage, where J is the pixel->texel warp
Jacobian.  For the shipped configs the warp scale is ~0.9-1.6
texels/pixel, so ``window=5`` is conservative.  The op treats geometry
as non-differentiable (zero cotangents for the transforms) — when
vertex optimization is active (``--optimize_geo``, render/geo_warp.py)
the model takes the autodiff path instead (mpmesh.py gates
``use_adjoint`` on ``not self.optimize_geometry``).

Enabled by ``--fast_stage1_grad`` — ON in the shipped configs
(configs/mpi_base.txt) since the round-2 full-schedule soak; exactness
is verified against autodiff in tests/test_adjoint.py.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from videoloop3d_tpu.render.sample import bilinear_planes


def _resolve_prec(prec="highest"):
    """Contraction precision for the dense block paths.  "default" runs
    the MXU contractions with bf16 inputs + f32 accumulate (one pass) —
    ~1e-3 relative error on samples/grads, measured neutral on stage-1
    training quality (see configs: --s1_gemm_bf16).  "highest" is the
    exact 6-pass mode the adjoint exactness tests pin.  The
    VL3D_S1_PREC env var overrides for A/B benching."""
    p = os.environ.get("VL3D_S1_PREC", prec)
    return (jax.lax.Precision.DEFAULT if p == "default"
            else jax.lax.Precision.HIGHEST)


def _s1_map_batch(default=256):
    return int(os.environ.get("VL3D_S1_MAP_BATCH", default))


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


def _block_matmul_atlas_grad(ct, x, y, atlas_hw, block_hw, tb_hw,
                             prec="highest"):
    """Block-matmul gradient assembly (no gathers, no scatters).

    Tile the patch into static pixel blocks; per (view, plane, block):
      1. the block's texel bounding box (from masked min of the saved
         sample coords) positions a STATIC local texel grid (tb_hw);
      2. the bilinear weight of every (pixel, texel) pair in the block x
         local-grid outer product is computed densely on the VPU —
         w = (1-|sx-tx|)+ * (1-|sy-ty|)+ is exactly the sum of the 4
         corner weights;
      3. grad_block = w^T @ ct_block is an MXU matmul;
      4. blocks accumulate into the atlas gradient with
         dynamic-slice adds (a scan; blocks overlap only by the window
         margin).

    Exact iff the local grid covers the block's sample spread — tb_hw
    must be >= warp_scale * block extent + 4 (checked by the caller via
    a static margin; out-of-plane samples are excluded from the bbox and
    naturally receive zero weight).

    ct: (B, D, h, w, C); x, y: (B, D, h, w).
    Returns (D, Ht, Wt, C).
    """
    B, D, h, w, C = ct.shape
    Ht, Wt = atlas_hw
    bh, bw = block_hw
    tbh, tbw = tb_hw
    assert h % bh == 0 and w % bw == 0, (h, w, block_hw)
    nbh, nbw = h // bh, w // bw

    def blockify(a):
        # (B, D, h, w, ...) -> (B*D*nbh*nbw, bh*bw, ...)
        trail = a.shape[4:]
        a = a.reshape(B, D, nbh, bh, nbw, bw) if not trail else \
            a.reshape((B, D, nbh, bh, nbw, bw) + trail)
        a = jnp.moveaxis(a, 4, 3)          # (B, D, nbh, nbw, bh, bw, ...)
        return a.reshape((B * D * nbh * nbw, bh * bw) + trail)

    xs = blockify(x)
    ys = blockify(y)
    cts = blockify(ct)

    def per_block(sx, sy, ctb):
        valid = (sx > -1.0) & (sx < Wt) & (sy > -1.0) & (sy < Ht)
        big = jnp.float32(1e9)
        x0 = jnp.floor(jnp.min(jnp.where(valid, sx, big))).astype(jnp.int32)
        y0 = jnp.floor(jnp.min(jnp.where(valid, sy, big))).astype(jnp.int32)
        any_valid = jnp.any(valid)
        x0 = jnp.clip(jnp.where(any_valid, x0 - 1, 0), 0,
                      max(Wt - tbw, 0))
        y0 = jnp.clip(jnp.where(any_valid, y0 - 1, 0), 0,
                      max(Ht - tbh, 0))
        tx = (x0 + jnp.arange(tbw)).astype(jnp.float32)     # (tbw,)
        ty = (y0 + jnp.arange(tbh)).astype(jnp.float32)     # (tbh,)
        # separable per-axis weights; contract in two steps so the
        # (P, tbh, tbw) outer product is never materialized:
        #   grad[th, tw, c] = sum_p wy[p,th] * wx[p,tw] * ct[p,c]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, None] - tx[None]))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy[:, None] - ty[None]))
        wy = wy * jnp.where(any_valid, 1.0, 0.0)
        hi = _resolve_prec(prec)
        tmp = jnp.einsum("ph,pc->phc", wy, ctb, precision=hi)
        grad = jnp.einsum("pw,phc->hwc", wx, tmp, precision=hi)
        return grad, y0, x0

    grads, y0s, x0s = jax.lax.map(
        lambda t: per_block(*t), (xs, ys, cts),
        batch_size=_s1_map_batch())

    d_idx = jnp.broadcast_to(
        jnp.arange(D, dtype=jnp.int32)[None, :, None],
        (B, D, nbh * nbw)).reshape(-1)

    atlas_grad = jnp.zeros((D, Ht, Wt, C), jnp.float32)

    # unrolling several dynamic-slice adds per scan iteration trims the
    # per-iteration while-loop overhead (the adds stay sequential — they
    # may overlap — but the scan bookkeeping amortizes)
    NB = grads.shape[0]
    unroll = next(u for u in (8, 4, 2, 1) if NB % u == 0)

    def add_group(carry, inp):
        gs, y0g, x0g, dg = inp
        for i in range(unroll):
            upd = jax.lax.dynamic_slice(carry, (dg[i], y0g[i], x0g[i], 0),
                                        (1, tbh, tbw, C))
            carry = jax.lax.dynamic_update_slice(
                carry, upd + gs[i][None], (dg[i], y0g[i], x0g[i], 0))
        return carry, 0

    atlas_grad, _ = jax.lax.scan(
        add_group, atlas_grad,
        (grads.reshape((NB // unroll, unroll) + grads.shape[1:]),
         y0s.reshape(-1, unroll), x0s.reshape(-1, unroll),
         d_idx.reshape(-1, unroll)))
    return atlas_grad


def bwd_block_plan_for(geom, h, w, image_hw, block_hw=(45, 64),
                       margin=1.35):
    """Static block plan for the BACKWARD overlap-add.

    The backward's total matmul FLOPs scale with the texel-window area
    per pixel, but the serialized accumulation scan scales with the
    block COUNT and small matmuls waste the MXU — measured at production
    scale, (45, 64) pixel blocks beat the forward's (15, 32) plan 31 ms
    vs 42.5 ms (exact, same sums).  Returns (block_hw, tb_hw) like
    block_plan_for."""
    if os.environ.get("VL3D_S1_BWD_BLOCK"):
        # experiment knob: backward plan geometry, e.g. "90x64"
        a, b = os.environ["VL3D_S1_BWD_BLOCK"].split("x")
        block_hw = (int(a), int(b))
    return block_plan_for(geom, h, w, image_hw, block_hw=block_hw,
                          margin=margin)


def block_plan_for(geom, h, w, image_hw, block_hw=(16, 32), margin=1.35):
    """Static (block_hw, tb_hw) covering the warp spread.  The local
    texel grid must span scale*block + bilinear margin."""
    if block_hw == (16, 32) and os.environ.get("VL3D_S1_FWD_BLOCK"):
        # experiment knob: forward plan geometry, e.g. "45x64"
        a, b = os.environ["VL3D_S1_FWD_BLOCK"].split("x")
        block_hw = (int(a), int(b))
    sy = geom.mpi_h / image_hw[0] * margin
    sx = geom.mpi_w / image_hw[1] * margin
    bh = min(block_hw[0], h)
    bw = min(block_hw[1], w)
    # shrink blocks until they divide the patch
    while h % bh:
        bh -= 1
    while w % bw:
        bw -= 1
    tbh = min(int(bh * sy) + 6, geom.mpi_h)
    tbw = min(int(bw * sx) + 6, geom.mpi_w)
    return (bh, bw), (tbh, tbw)


def _block_matmul_sample(atlas, x, y, block_hw, tb_hw, prec="highest"):
    """Gather-free bilinear sampling: the exact TRANSPOSE of
    `_block_matmul_atlas_grad`.

    Per (view, plane, pixel block): dynamic-slice the block's texel
    window (positioned by the masked min of the sample coords, same rule
    as the backward), build the separable per-axis bilinear weights, and
    contract on the MXU:

        val[p, c] = sum_{th, tw} wy[p, th] * wx[p, tw] * win[th, tw, c]

    This reproduces `bilinear_planes`' corner-masked semantics exactly
    (texels outside the atlas are not in the window -> zero
    contribution; samples far outside get all-zero weights) under the
    same coverage condition as the backward: tb_hw must span the
    block's sample spread (block_plan_for's margin).

    The dense gather this replaces is descriptor-rate bound (~30M
    descriptors/s on v5e); the contraction form reads the atlas with a
    few thousand contiguous window slices and does the interpolation as
    MXU matmuls — measured 187 ms -> ~8 ms for the production stage-1
    sample.

    atlas: (D, Ht, Wt, C); x, y: (B, D, h, w).  Returns (B, D, h, w, C).
    """
    B, D, h, w = x.shape
    Ht, Wt, C = atlas.shape[1:]
    bh, bw = block_hw
    tbh, tbw = tb_hw
    assert h % bh == 0 and w % bw == 0, (h, w, block_hw)
    nbh, nbw = h // bh, w // bw

    def blockify(a):
        a = a.reshape(B, D, nbh, bh, nbw, bw)
        a = jnp.moveaxis(a, 4, 3)
        return a.reshape(B * D * nbh * nbw, bh * bw)

    xs = blockify(x)
    ys = blockify(y)
    d_idx = jnp.broadcast_to(
        jnp.arange(D, dtype=jnp.int32)[None, :, None],
        (B, D, nbh * nbw)).reshape(-1)

    def per_block(sx, sy, d):
        valid = (sx > -1.0) & (sx < Wt) & (sy > -1.0) & (sy < Ht)
        big = jnp.float32(1e9)
        x0 = jnp.floor(jnp.min(jnp.where(valid, sx, big))).astype(jnp.int32)
        y0 = jnp.floor(jnp.min(jnp.where(valid, sy, big))).astype(jnp.int32)
        any_valid = jnp.any(valid)
        x0 = jnp.clip(jnp.where(any_valid, x0 - 1, 0), 0,
                      max(Wt - tbw, 0))
        y0 = jnp.clip(jnp.where(any_valid, y0 - 1, 0), 0,
                      max(Ht - tbh, 0))
        win = jax.lax.dynamic_slice(atlas, (d, y0, x0, 0),
                                    (1, tbh, tbw, C))[0]
        tx = (x0 + jnp.arange(tbw)).astype(jnp.float32)
        ty = (y0 + jnp.arange(tbh)).astype(jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, None] - tx[None]))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy[:, None] - ty[None]))
        wy = wy * jnp.where(any_valid, 1.0, 0.0)
        hi = _resolve_prec(prec)
        tmp = jnp.einsum("pw,hwc->phc", wx, win, precision=hi)
        return jnp.einsum("ph,phc->pc", wy, tmp, precision=hi)

    vals = jax.lax.map(lambda t: per_block(*t), (xs, ys, d_idx),
                       batch_size=_s1_map_batch())  # (NB, bh*bw, C)
    vals = vals.reshape(B, D, nbh, nbw, bh, bw, C)
    vals = jnp.moveaxis(vals, 3, 4)                 # (B,D,nbh,bh,nbw,bw,C)
    return vals.reshape(B, D, h, w, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def sample_dense_blockadj(atlas, x, y, M, block_hw, tb_hw, grad_plan=None,
                          prec="highest"):
    """`sample_dense` computed gather-free (block-matmul forward) with
    the block-matmul backward.  `grad_plan` optionally gives the
    backward its own (block_hw, tb_hw) — larger blocks amortize the
    accumulation scan (bwd_block_plan_for); default: the forward's plan.
    `prec` picks the contraction precision (see _resolve_prec).
    M is unused in the forward; kept for interface symmetry."""
    return _block_matmul_sample(atlas, x, y, block_hw, tb_hw, prec)


def _badj_fwd(atlas, x, y, M, block_hw, tb_hw, grad_plan, prec):
    return sample_dense_blockadj(atlas, x, y, M, block_hw, tb_hw,
                                 grad_plan, prec), (atlas.shape, x, y, M)


def _badj_bwd(block_hw, tb_hw, grad_plan, prec, res, ct):
    atlas_shape, x, y, M = res
    bb, bt = grad_plan if grad_plan is not None else (block_hw, tb_hw)
    g = _block_matmul_atlas_grad(ct, x, y, atlas_shape[1:3], bb, bt, prec)
    return (g, jnp.zeros_like(x), jnp.zeros_like(y), jnp.zeros_like(M))


sample_dense_blockadj.defvjp(_badj_fwd, _badj_bwd)


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




# ---------------------------------------------------------------------------
# Stage-2: per-tile adjoint for packed (sparse MTV) tile textures
# ---------------------------------------------------------------------------
#
# The autodiff backward of bilinear_tiles / bilinear_tiles_tilemajor is a
# scatter-add of 4 corner cotangent rows per sample into the packed tile
# array (~500ms of the 1.56s stage-2 step).  The per-tile adjoint inverts
# the data flow: for every PACKED TILE, dynamic-slice the (static-size)
# pixel window that can sample it (found by projecting the tile's quad
# corners through the exact texel->pixel homography), keep the candidates
# whose saved packed index k equals this tile, and contract the exact
# bilinear weights (recomputed from the saved in-tile coords, including
# the forward's clamping) against the cotangent rows on the MXU.  The
# result IS the packed gradient layout — contiguous reads, zero scatters.
#
# Exactness requires the window to cover the tile's full pixel footprint;
# tile_window_for() sizes it from the warp scale with margin, and
# tests/test_adjoint.py checks the gradient against autodiff.

def tile_positions(tile_map):
    """Packed index -> (d, i, j) position array (host-side, static)."""
    import numpy as np
    tile_map = np.asarray(tile_map)
    d, i, j = np.nonzero(tile_map >= 0)
    order = tile_map[d, i, j]
    n = int(order.max()) + 1 if order.size else 0
    pos = np.zeros((n, 3), np.int32)
    pos[order] = np.stack([d, i, j], axis=1)
    return pos


def tile_window_for(geom, image_hw, margin=2.0):
    """Static pixel-window size covering one tile's image footprint."""
    sy, sx = geom.tile_span
    ext_y = sy * (image_hw[0] - 1) / max(geom.mpi_h - 1, 1)
    ext_x = sx * (image_hw[1] - 1) / max(geom.mpi_w - 1, 1)
    return int(max(ext_y, ext_x) * margin) + 4


def _tile_pixel_bbox(tile_pos, sy, sx, M):
    """Project every packed tile's quad corners; (N,) pixel bboxes.

    Returns (px_min, px_max, py_min, py_max, wild) — ``wild`` marks
    tiles whose corner depths change sign (crossing the camera plane),
    where the projected bbox is meaningless and any consumer must be
    conservative."""
    pos = jnp.asarray(tile_pos)
    d = pos[:, 0]
    cox = jnp.array([0.0, 1.0, 0.0, 1.0], jnp.float32) * sx
    coy = jnp.array([0.0, 0.0, 1.0, 1.0], jnp.float32) * sy
    qx = pos[:, 2].astype(jnp.float32)[:, None] * sx + cox[None]  # (N,4)
    qy = pos[:, 1].astype(jnp.float32)[:, None] * sy + coy[None]
    Md = M[d]                                                     # (N,3,3)
    den = (Md[:, 2, 0, None] * qx + Md[:, 2, 1, None] * qy
           + Md[:, 2, 2, None])
    wild = (jnp.min(den, axis=1) <= 1e-12) != (jnp.max(den, axis=1)
                                               <= 1e-12)
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    px = (Md[:, 0, 0, None] * qx + Md[:, 0, 1, None] * qy
          + Md[:, 0, 2, None]) / den
    py = (Md[:, 1, 0, None] * qx + Md[:, 1, 1, None] * qy
          + Md[:, 1, 2, None]) / den
    return (jnp.min(px, axis=1), jnp.max(px, axis=1),
            jnp.min(py, axis=1), jnp.max(py, axis=1), wild)


def active_tile_bound(geom, tile_map, extrins, intrins, ph, pw, origins,
                      jitter_px=0.55, margin=16):
    """Static bound on patch-active packed tiles (for ``active_t``).

    Counts, for every (training view, patch origin) pair, the tiles
    whose projected quad bbox reaches the patch rect — the SAME test
    ``_packed_tile_grad`` applies at train time (its patch-frame bbox is
    the full-frame bbox shifted by the origin, exactly), widened by the
    intrinsic-jitter amplitude — and returns the max plus a margin.

    extrins: (V, 4, 4); intrins: (V, 3, 3) at the level's full
    resolution; origins: (n, 2) of (w0, h0) patch starts (the dataset's
    fixed tiling).  Cheap: one projection of the packed tile corners
    per view.
    """
    import numpy as np

    tile_pos = tile_positions(tile_map)
    N = len(tile_pos)
    if N == 0:
        return 0
    sy, sx = geom.tile_span
    depths = jnp.asarray(geom.depths)
    ref_k = jnp.asarray(geom.ref_intrin_mpi)
    mx = 0
    for vi in range(len(extrins)):
        M = forward_projection(
            depths, ref_k, jnp.asarray(extrins[vi], jnp.float32)[None],
            jnp.asarray(intrins[vi], jnp.float32)[None])[0]
        px_min, px_max, py_min, py_max, wild = (
            np.asarray(a) for a in _tile_pixel_bbox(tile_pos, sy, sx, M))
        for w0, h0 in np.asarray(origins):
            act = (((px_max >= w0 - 2.0 - jitter_px)
                    & (px_min <= w0 + pw + 1.0 + jitter_px)
                    & (py_max >= h0 - 2.0 - jitter_px)
                    & (py_min <= h0 + ph + 1.0 + jitter_px)) | wild)
            mx = max(mx, int(act.sum()))
    return int(min(N, mx + margin))


def _window_plan(tile_pos, sy, sx, M, h, w, Wp, active_t):
    """Per-tile window origins (+ optional active-tile compaction).

    Shared by the dense and slot-compacted gradient bodies: projects
    every packed tile's quad to its pixel bbox, clamps the (Wp, Wp)
    window origin into the patch, and — when ``active_t`` bounds the
    patch-active tile count — stably compacts the loop to the active
    prefix (exact: inactive tiles own no pixel, their grads are zero).
    Returns (ids, py0s, px0s, n_loop)."""
    N = len(tile_pos)
    px_min, px_max, py_min, py_max, wild = _tile_pixel_bbox(
        tile_pos, sy, sx, M)
    px0s = jnp.clip(jnp.floor(px_min).astype(jnp.int32) - 1, 0, w - Wp)
    py0s = jnp.clip(jnp.floor(py_min).astype(jnp.int32) - 1, 0, h - Wp)
    ids = jnp.arange(N, dtype=jnp.int32)
    n_loop = N
    if active_t is not None and active_t < N:
        # a tile can own a pixel only if its projected bbox reaches the
        # patch (margin 2 px covers the -1 floor + bilinear halo); wild
        # tiles are kept conservatively.  Inactive tiles have mine == 0
        # everywhere, so dropping them is exact — active_tile_bound()
        # guarantees the bound with the same test + jitter margin.
        act = ((px_max >= -2.0) & (px_min <= w + 1.0)
               & (py_max >= -2.0) & (py_min <= h + 1.0)) | wild
        # stable compaction: active ids first, packed order preserved;
        # overflow beyond the bound pads with inactive ids (exact: they
        # contribute zero) rather than dropping grads
        order = jnp.argsort(jnp.logical_not(act), stable=True)
        ids = order[: int(active_t)].astype(jnp.int32)
        px0s = px0s[ids]
        py0s = py0s[ids]
        n_loop = int(active_t)
    return ids, py0s, px0s, n_loop


def _packed_tile_grad(tile_pos, sy, sx, window, tiles_shape, tiles_dtype,
                      k, u, v, M, ct, active_t=None):
    """The per-tile adjoint gradient body, full (D, h, w) layout.

    ct: (D, h, w, K) float32 cotangent rows.  Returns the packed
    ``tiles_shape`` gradient.  Shared by the plain and hit-compacted
    samplers (render/compact.py).

    active_t: optional static bound on the number of tiles whose pixel
    footprint intersects the (h, w) patch (active_tile_bound()).  When
    set, inactive tiles — which contribute exactly zero (no pixel's
    saved k equals them) — are compacted away and the per-tile loop
    runs at the bound instead of N (a training patch covers a fraction
    of the scene: ~21% of tiles at the production scale)."""
    import numpy as np

    hi = jax.lax.Precision.HIGHEST
    N = tiles_shape[0]
    th, tw = tiles_shape[1], tiles_shape[2]
    K = int(np.prod(tiles_shape[3:]))
    D, h, w = k.shape
    ct = ct.reshape(D, h, w, K).astype(jnp.float32)
    Wp = min(window, h, w)
    if N == 0:
        return jnp.zeros(tiles_shape, tiles_dtype)
    pos = jnp.asarray(tile_pos)
    gu = jnp.arange(tw, dtype=jnp.float32)
    gv = jnp.arange(th, dtype=jnp.float32)

    ids, py0s, px0s, n_loop = _window_plan(
        tile_pos, sy, sx, M, h, w, Wp, active_t)

    # Pack (k, u, v, ct) into ONE (D, h, w, 3+K) array so the window
    # extraction reads each operand together.  k fits f32 exactly (tile
    # counts << 2^24), so mine == (ks == idx) is unchanged and the
    # adjoint stays the exact transpose.
    packed = jnp.concatenate(
        [k.astype(jnp.float32)[..., None],
         u.astype(jnp.float32)[..., None],
         v.astype(jnp.float32)[..., None], ct], axis=-1)
    Cp = 3 + K
    # Window extraction strategy (measured on v5e, production scale):
    # a vmapped dynamic_slice lowers to a SERIALIZED while-over-tiles
    # (~8 us per tile — ~77 ms/step on the static atlas, the majority
    # of the adjoint's cost), and lax.gather with a full (Wp,Wp) block
    # per descriptor is just as slow.  lax.gather with a few ROWS per
    # descriptor keeps the gather engine on its fast path (contiguous
    # (ry, Wp, Cp) slices, N*Wp/ry descriptors): 69 -> 19 ms for the
    # same extraction.  ry = a small divisor of Wp.
    ry = next((r for r in (5, 4, 3, 2) if Wp % r == 0), 1)
    nb = Wp // ry
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2, 3))

    def per_tile(inp):
        idx, py0, px0 = inp
        d = pos[idx, 0]
        starts = jnp.stack(
            [jnp.full((nb,), d, jnp.int32),
             py0 + ry * jnp.arange(nb, dtype=jnp.int32),
             jnp.full((nb,), px0, jnp.int32),
             jnp.zeros((nb,), jnp.int32)], axis=-1)
        win = jax.lax.gather(packed, starts, dn, (1, ry, Wp, Cp),
                             mode=jax.lax.GatherScatterMode.CLIP)
        win = win.reshape(-1, Cp)
        ks = win[:, 0]
        us = win[:, 1]
        vs = win[:, 2]
        cs = win[:, 3:]
        mine = (ks == idx.astype(jnp.float32))
        uu = jnp.clip(us, 0.0, tw - 1.0)
        vv = jnp.clip(vs, 0.0, th - 1.0)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(uu[:, None] - gu[None]))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(vv[:, None] - gv[None]))
        wy = wy * mine[:, None]
        tmp = jnp.einsum("ph,pk->phk", wy, cs, precision=hi)
        return jnp.einsum("pw,phk->hwk", wx, tmp, precision=hi)

    g = jax.lax.map(per_tile, (ids, py0s, px0s),
                    batch_size=min(64, n_loop))
    if n_loop < N:
        full = jnp.zeros((N, th, tw, K), g.dtype)
        # ids are unique (a permutation slice) -> set, not add; inactive
        # pad rows write their (exactly zero) grads harmlessly
        g = full.at[ids].set(g)
    return g.reshape(tiles_shape).astype(tiles_dtype)


def make_tile_adjoint(tile_pos, spans, window, active_t=None):
    """Build a packed-tile sampler with the per-tile adjoint backward.

    tile_pos: (N, 3) host int array of packed-tile (d, i, j) positions;
    spans: (sy, sx) tile span in MPI texel units; window: static pixel
    window size.  Returns ``f(tiles, k, u, v, M) -> (values, hit)`` with
    the same forward semantics as bilinear_tiles (tiles 4-D) or
    bilinear_tiles_tilemajor (tiles 5-D):
      tiles: (N, th, tw, C) or (N, th, tw, F, C)
      k: (D, h, w) packed index per sample (-1 = miss)
      u, v: (D, h, w) in-tile texel coords (pre-clamping)
      M: (D, 3, 3) texel->pixel projection (forward_projection()[0]).
    Gradients flow to `tiles` only (geometry is non-differentiable,
    consistent with sample_dense_blockadj)."""
    import numpy as np

    from videoloop3d_tpu.render.sample import (bilinear_tiles,
                                               bilinear_tiles_tilemajor)

    tile_pos = np.asarray(tile_pos, np.int32)
    sy, sx = float(spans[0]), float(spans[1])

    @jax.custom_vjp
    def sample(tiles, k, u, v, M):
        if tiles.ndim == 5:
            return bilinear_tiles_tilemajor(tiles, k, u, v)
        return bilinear_tiles(tiles, k, u, v)

    def fwd(tiles, k, u, v, M):
        out = sample(tiles, k, u, v, M)
        dtok = jnp.zeros((), tiles.dtype)        # dtype token (residuals
        return out, (tiles.shape, dtok, k, u, v, M)  # must be JAX types)

    def bwd(res, cts):
        tiles_shape, dtok, k, u, v, M = res
        g = _packed_tile_grad(tile_pos, sy, sx, window, tiles_shape,
                              dtok.dtype, k, u, v, M,
                              cts[0].astype(jnp.float32),
                              active_t=active_t)
        f0 = jax.dtypes.float0
        zk = np.zeros(k.shape, f0)
        return (g, zk, jnp.zeros_like(u), jnp.zeros_like(v),
                jnp.zeros_like(M))

    sample.defvjp(fwd, bwd)
    return sample


def make_tile_adjoint_compacted(tile_pos, spans, window,
                               active_t=None):
    """Hit-compacted variant of `make_tile_adjoint`.

    Returns ``f(tiles, k_c, u_c, v_c, k, u, v, oh, M) -> (values, hit)``
    where the ``_c`` arrays are the (S, h, w) slot-compacted sample
    coords (render/compact.py:compact_sweep) and ``k, u, v`` the full
    (D, h, w) ones.  Forward gathers at slot volume (the whole point);
    the backward expands the slot cotangent to the plane layout with the
    saved one-hot (exact transpose of the selection) and reuses the
    full-layout per-tile gradient body — same windows, same weights,
    same result as the uncompacted sampler.

    MEASURED REJECTION (round 4, v5e): running the per-tile gradient
    body directly on the slot layout — windows gathered from a packed
    (S, h, w, 3+K) array, per-pixel 0/1 slot-select, no dense
    expansion — removes ~12 GB/step of expansion traffic on paper but
    measured 320-365 ms/step vs 236.7 for this expansion path (bench
    --fused, three extraction variants: slot-major multi-region slices,
    a slot-minor relayout, and per-slot row descriptors).  The windows
    cover ~Wp^2 pixels per tile vs ~th*tw texels, so slot-layout window
    reads cost S x Wp^2 rows/tile and their gather-output
    materialization in the lax.map exceeds everything the expansion
    saves.  Don't retry without shrinking the window read itself.
    """
    import numpy as np

    from videoloop3d_tpu.render.sample import (bilinear_tiles,
                                               bilinear_tiles_tilemajor)

    tile_pos = np.asarray(tile_pos, np.int32)
    sy, sx = float(spans[0]), float(spans[1])

    @jax.custom_vjp
    def sample(tiles, k_c, u_c, v_c, k, u, v, oh, M):
        if tiles.ndim == 5:
            return bilinear_tiles_tilemajor(tiles, k_c, u_c, v_c)
        return bilinear_tiles(tiles, k_c, u_c, v_c)

    def fwd(tiles, k_c, u_c, v_c, k, u, v, oh, M):
        out = sample(tiles, k_c, u_c, v_c, k, u, v, oh, M)
        dtok = jnp.zeros((), tiles.dtype)
        return out, (tiles.shape, dtok, k, u, v, oh, M)

    def bwd(res, cts):
        from videoloop3d_tpu.render.compact import expand_cotangent
        tiles_shape, dtok, k, u, v, oh, M = res
        ct_full = expand_cotangent(oh, cts[0].astype(jnp.float32))
        g = _packed_tile_grad(tile_pos, sy, sx, window, tiles_shape,
                              dtok.dtype, k, u, v, M, ct_full,
                              active_t=active_t)
        f0 = jax.dtypes.float0
        S = oh.shape[0]
        zk_c = np.zeros((S,) + k.shape[1:], f0)
        zk = np.zeros(k.shape, f0)
        zeros = jnp.zeros_like
        return (g, zk_c, zeros(u)[:S], zeros(v)[:S], zk, zeros(u),
                zeros(v), zeros(oh), zeros(M))

    sample.defvjp(fwd, bwd)
    return sample
