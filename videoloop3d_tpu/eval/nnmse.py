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


_cpu_dev = None


def _cpu():
    """The NN metrics are pinned to the CPU backend: the axon TPU
    runtime reproducibly faults ("TPU worker process crashed") or hangs
    on this program family at eval scale — isolated standalone with
    patcht=7/stridet=1 on (3, 50, 280, 560) inputs (the same math with
    stridet=2 runs, and CPU compiles + runs the failing variant in
    seconds).  The metric is a few hundred MFLOP per macro block, so
    CPU costs seconds per view while the workaround removes the one
    remaining eval-pass crash."""
    global _cpu_dev
    if _cpu_dev is None:
        _cpu_dev = jax.local_devices(backend="cpu")[0]
    return _cpu_dev


def compute_nnerr(src, tar, patch_size=7, stride=2, patcht_size=7,
                  stridet=2, macro_block=65):
    """src, tar: (3, F, H, W) float arrays.  Mean L1 between every source
    patch and its temporal NN target patch, averaged over macro blocks."""
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

    @jax.jit
    def block_err(s_crop, t_crop):
        Xp = P.extract_patches_3d(s_crop, psz, strides)
        Yp = P.extract_patches_3d(t_crop, psz, strides)
        ntx, nh, nw = Xp.shape[:3]
        nty = Yp.shape[0]
        dim = int(np.prod(Xp.shape[3:]))
        Xf = Xp.reshape(ntx, nh * nw, dim).transpose(1, 0, 2)
        Yf = Yp.reshape(nty, nh * nw, dim).transpose(1, 0, 2)
        nns = P.nn_indices(Xf, Yf, None)
        sel = jnp.take_along_axis(Yf, nns[..., None], axis=1)
        return jnp.mean(jnp.abs(sel - Xf))

    dev = _cpu()
    errs = []
    for h0 in hs:
        for w0 in ws:
            s_crop = jax.device_put(
                src[..., h0:h0 + macro, w0:w0 + macro], dev)
            t_crop = jax.device_put(
                tar[..., h0:h0 + macro, w0:w0 + macro], dev)
            errs.append(float(block_err(s_crop, t_crop)))
    return float(np.mean(errs))


def loop_quality(pred, gt, patch_size, stride, patcht_size, stridet,
                 macro_block=65):
    """NN error of the window straddling the loop seam against ground
    truth (ref script_evaluate_ours.py:216-220)."""
    pred = np.asarray(pred)
    seam = np.concatenate(
        [pred[:, -patcht_size + 1:], pred[:, :patcht_size - 1]], axis=1)
    return compute_nnerr(seam, gt, patch_size, stride, patcht_size,
                         stridet, macro_block)
