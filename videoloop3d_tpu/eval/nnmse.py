"""NNMSE metric: 3D-patch nearest-neighbor error between two videos.

The same machinery as the training loss used as a metric:
mean |NN(src->tar) - src| over macro blocks.  Also powers the Loop
Quality metric (NN error of the seam-straddling window vs ground truth).
Parity: reference evaluations/NNMSE.py:7-58 and
script_evaluate_ours.py:205-222.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from videoloop3d_tpu.losses import patch_nn as P


def compute_nnerr(src, tar, patch_size=7, stride=2, patcht_size=7,
                  stridet=2, macro_block=65):
    """src, tar: (3, F, H, W) float arrays.  Mean L1 between every source
    patch and its temporal NN target patch, averaged over macro blocks.
    ``compute_nnerr_pair`` returns (src->tar, tar->src) from one shared
    distance computation (the evaluator needs both directions).

    TPU note: on non-CPU backends the patches are extracted with the
    MXU-friendly flat (identity-kernel conv) form — the same path the
    training loss has soaked for hundreds of thousands of steps.  The
    reshape-chain ``extract_patches_3d`` program family reproducibly
    faults ("TPU worker process crashed") or hangs the axon TPU runtime
    at eval scale (patcht=7/stridet=1 on (3, 50, 280, 560) inputs,
    isolated standalone; the stridet=2 variant runs and CPU handles the
    failing variant in seconds) — a backend bug this formulation
    avoids.  The flat channel order (C, dt, dy, dx) permutes both X and
    Y identically, so distances and the selected-patch L1 are
    unchanged.
    """
    fwd, _ = _nnerr_impl(src, tar, patch_size, stride, patcht_size,
                         stridet, macro_block, pair=False)
    return fwd


def compute_nnerr_pair(src, tar, patch_size=7, stride=2, patcht_size=7,
                       stridet=2, macro_block=65):
    """(compute_nnerr(src, tar), compute_nnerr(tar, src)) sharing one
    per-frame distance computation: the backward temporal-patch distance
    matrix is exactly the transpose of the forward one, so both
    directions cost one GEMM (the evaluator's nnf/nnb columns)."""
    return _nnerr_impl(src, tar, patch_size, stride, patcht_size,
                       stridet, macro_block, pair=True)


def _nnerr_impl(src, tar, patch_size, stride, patcht_size, stridet,
                macro_block, pair):
    src = np.asarray(src, np.float32)
    tar = np.asarray(tar, np.float32)
    psz = (patcht_size, patch_size, patch_size)
    strides = (stridet, stride, stride)
    macro = P.fit_patch_size(macro_block, patch_size, stride)
    fh = P.fit_patch_size(src.shape[2], patch_size, stride)
    fw = P.fit_patch_size(src.shape[3], patch_size, stride)
    ft = P.fit_patch_size(src.shape[1], patcht_size, stridet)
    ftt = P.fit_patch_size(tar.shape[1], patcht_size, stridet)
    macro = min(macro, fh, fw)
    src = src[:, :ft, :fh, :fw]
    tar = tar[:, :ftt, :fh, :fw]
    hs = P._macro_starts(fh, macro, patch_size, stride)
    ws = P._macro_starts(fw, macro, patch_size, stride)
    # all macro blocks in ONE vmapped dispatch (a sequential
    # float()-per-block loop costs 10-60 min per full-scale eval); the
    # jitted fn is cached across calls so per-view invocations at the
    # same shapes reuse the executable
    fn = _block_err_fn(psz, strides, jax.default_backend() != "cpu",
                       pair)
    s_crops = jnp.asarray(np.stack(
        [src[..., h0:h0 + macro, w0:w0 + macro]
         for h0 in hs for w0 in ws]))
    t_crops = jnp.asarray(np.stack(
        [tar[..., h0:h0 + macro, w0:w0 + macro]
         for h0 in hs for w0 in ws]))
    errs = fn(s_crops, t_crops)
    if pair:
        return (float(np.mean(np.asarray(errs[0]))),
                float(np.mean(np.asarray(errs[1]))))
    return float(np.mean(np.asarray(errs))), None


_block_err_cache = {}


def _block_err_fn(psz, strides, use_flat, pair=False):
    """Per-macro-block NN error, TEMPORALLY DECOMPOSED.

    Temporal patches at stride ``st`` share all but ``st`` frames with
    their neighbors, so the (ntx, nty) temporal-patch distance matrix is
    a banded sum of ONE per-frame patch distance matrix:

        dist(i, j) = sum_k d1(i*st + k, j*st + k),  k in [0, pt)

    Computing d1 (F x F at per-frame patch dim) instead of the direct
    (ntx x nty at pt*fdim) matrix cuts the GEMM FLOPs 3-5x at the eval
    scales (F^2 vs ntx*nty*pt) and materializes pt-times less patch
    data.  Exact up to float summation order (argmin ties; value-tested
    against the direct form).  The selected-NN L1 is likewise averaged
    per frame: mean_k |Py[j*st+k] - Px[i*st+k]|.

    pair=True additionally returns the reverse-direction error from the
    same banded matrix (dist_bwd == dist_fwd^T)."""
    key = (psz, strides, use_flat, pair)
    if key in _block_err_cache:
        return _block_err_cache[key]

    (pt, ph, pw), (st, sh, sw) = psz, strides

    def block_err(s_crop, t_crop):
        fpsz, fstr = (1, ph, pw), (1, sh, sw)
        if use_flat:
            Px = P.extract_patches_flat(s_crop, fpsz, fstr)
            Py = P.extract_patches_flat(t_crop, fpsz, fstr)
        else:
            Px8 = P.extract_patches_3d(s_crop, fpsz, fstr)
            Px = Px8.reshape(Px8.shape[:3] + (-1,))
            Py8 = P.extract_patches_3d(t_crop, fpsz, fstr)
            Py = Py8.reshape(Py8.shape[:3] + (-1,))
        Fx, nh, nw, fdim = Px.shape
        Fy = Py.shape[0]
        ntx = (Fx - pt) // st + 1
        nty = (Fy - pt) // st + 1
        Xf = Px.reshape(Fx, nh * nw, fdim).transpose(1, 0, 2)
        Yf = Py.reshape(Fy, nh * nw, fdim).transpose(1, 0, 2)
        d1 = P._pairwise_sqdist(Xf, Yf)              # (ncol, Fx, Fy)
        dist = P.banded_temporal_dist(d1, pt, st, ntx, nty)
        def sel_err(d, A, B, na, nb):
            # mean_k |B[nn(a)*st+k] - A[a*st+k]| with nn = argmin rows
            nns = jnp.argmin(d, axis=2)              # (ncol, na)
            err = 0.0
            for k in range(pt):
                ak = jax.lax.slice(A, (0, k, 0),
                                   (A.shape[0], k + (na - 1) * st + 1,
                                    fdim), (1, st, 1))
                bk = jax.lax.slice(B, (0, k, 0),
                                   (B.shape[0], k + (nb - 1) * st + 1,
                                    fdim), (1, st, 1))
                sel = jnp.take_along_axis(bk, nns[..., None], axis=1)
                err = err + jnp.mean(jnp.abs(sel - ak))
            return err / pt

        fwd = sel_err(dist, Xf, Yf, ntx, nty)
        if not pair:
            return fwd
        bwd = sel_err(jnp.swapaxes(dist, 1, 2), Yf, Xf, nty, ntx)
        return fwd, bwd

    fn = jax.jit(jax.vmap(block_err))
    _block_err_cache[key] = fn
    return fn


def loop_quality(pred, gt, patch_size, stride, patcht_size, stridet,
                 macro_block=65):
    """NN error of the window straddling the loop seam against ground
    truth (ref script_evaluate_ours.py:216-220)."""
    pred = np.asarray(pred)
    seam = np.concatenate(
        [pred[:, -patcht_size + 1:], pred[:, :patcht_size - 1]], axis=1)
    return compute_nnerr(seam, gt, patch_size, stride, patcht_size,
                         stridet, macro_block)
