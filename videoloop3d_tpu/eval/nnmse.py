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
    fn = _block_err_fn(psz, strides, jax.default_backend() != "cpu")
    s_crops = jnp.asarray(np.stack(
        [src[..., h0:h0 + macro, w0:w0 + macro]
         for h0 in hs for w0 in ws]))
    t_crops = jnp.asarray(np.stack(
        [tar[..., h0:h0 + macro, w0:w0 + macro]
         for h0 in hs for w0 in ws]))
    errs = fn(s_crops, t_crops)
    return float(np.mean(np.asarray(errs)))


_block_err_cache = {}


def _block_err_fn(psz, strides, use_flat):
    key = (psz, strides, use_flat)
    if key in _block_err_cache:
        return _block_err_cache[key]

    def block_err(s_crop, t_crop):
        if use_flat:
            Xp = P.extract_patches_flat(s_crop, psz, strides)
            Yp = P.extract_patches_flat(t_crop, psz, strides)
            ntx, nh, nw, dim = Xp.shape
            nty = Yp.shape[0]
        else:
            Xp8 = P.extract_patches_3d(s_crop, psz, strides)
            Yp8 = P.extract_patches_3d(t_crop, psz, strides)
            ntx, nh, nw = Xp8.shape[:3]
            dim = int(np.prod(Xp8.shape[3:]))
            Xp = Xp8.reshape(ntx, nh, nw, dim)
            Yp = Yp8.reshape(Yp8.shape[0], nh, nw, dim)
            nty = Yp.shape[0]
        Xf = Xp.reshape(ntx, nh * nw, dim).transpose(1, 0, 2)
        Yf = Yp.reshape(nty, nh * nw, dim).transpose(1, 0, 2)
        nns = P.nn_indices(Xf, Yf, None)
        sel = jnp.take_along_axis(Yf, nns[..., None], axis=1)
        return jnp.mean(jnp.abs(sel - Xf))

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
