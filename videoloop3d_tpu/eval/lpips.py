"""LPIPS perceptual metric — pure-JAX AlexNet backbone + linear heads.

Parity: reference evaluations/lpips/ (vendored richzhang LPIPS with the
alex backbone).  The reference ships the 1x1 linear-head weights in-repo
and downloads the torchvision backbone; this environment has no network
egress, so weights must be supplied as a file:

* a converted ``.npz`` produced by `convert_torch_weights`, or
* if torch/torchvision caches exist locally they are converted on the
  fly.

Without weights the metric is unavailable and callers should skip it
(`LPIPS.available`).
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

# torchvision AlexNet feature config: (out_c, kernel, stride, pad)
_ALEX_CFG = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
             (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}          # maxpool after stages 0 and 1 (and before 2)
_FEATURE_SLICES = [2, 5, 8, 10, 12]   # torchvision features module indices

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def convert_torch_weights(alexnet_pth, lpips_pth, out_npz):
    """Convert torchvision alexnet state_dict + lpips linear heads into
    the .npz this module loads."""
    import torch
    alex = torch.load(alexnet_pth, map_location="cpu")
    if hasattr(alex, "state_dict"):
        alex = alex.state_dict()
    lin = torch.load(lpips_pth, map_location="cpu")
    out = {}
    conv_ids = [0, 3, 6, 8, 10]
    for i, cid in enumerate(conv_ids):
        out[f"conv{i}/w"] = alex[f"features.{cid}.weight"].numpy()
        out[f"conv{i}/b"] = alex[f"features.{cid}.bias"].numpy()
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in lin:
            key = f"lins.{i}.model.1.weight"
        out[f"lin{i}/w"] = lin[key].numpy()
    np.savez(out_npz, **out)
    return out_npz


class LPIPS:
    def __init__(self, weights_path=None):
        self.weights = None
        path = weights_path or os.environ.get("VL3D_LPIPS_WEIGHTS", "")
        if path and os.path.exists(path):
            z = np.load(path)
            self.weights = {k: jnp.asarray(z[k]) for k in z.files}
        self._fn = jax.jit(self._forward) if self.weights else None

    @property
    def available(self):
        return self.weights is not None

    def _features(self, x):
        """x: (B, 3, H, W) in [-1, 1] -> list of 5 feature maps."""
        x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) \
            / jnp.asarray(_SCALE)[None, :, None, None]
        feats = []
        h = x
        for i, (oc, k, s, p) in enumerate(_ALEX_CFG):
            w = self.weights[f"conv{i}/w"]
            b = self.weights[f"conv{i}/b"]
            h = jax.lax.conv_general_dilated(
                h, w, (s, s), [(p, p), (p, p)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            h = h + b[None, :, None, None]
            h = jax.nn.relu(h)
            feats.append(h)
            if i in _POOL_AFTER:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                    "VALID")
        return feats

    def _forward(self, a, b):
        fa = self._features(a)
        fb = self._features(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            # normalize_tensor eps OUTSIDE the sqrt (ref lpips.py:12-14)
            na = xa / (jnp.sqrt(jnp.sum(xa * xa, 1, keepdims=True))
                       + 1e-10)
            nb = xb / (jnp.sqrt(jnp.sum(xb * xb, 1, keepdims=True))
                       + 1e-10)
            diff = (na - nb) ** 2
            w = self.weights[f"lin{i}/w"]          # (1, C, 1, 1)
            proj = jnp.sum(diff * w[0][None], axis=1, keepdims=True)
            total = total + jnp.mean(proj, axis=(2, 3))
        return total[:, 0]

    def __call__(self, a, b):
        """a, b: (B, 3, H, W) in [-1, 1].  Returns (B,) distances."""
        if not self.available:
            raise RuntimeError(
                "LPIPS weights unavailable; set VL3D_LPIPS_WEIGHTS or use "
                "convert_torch_weights()")
        return np.asarray(self._fn(jnp.asarray(a), jnp.asarray(b)))


def compute_lpips(net: LPIPS, pred, gt):
    """Min-over-gt-frames LPIPS per predicted frame, averaged
    (ref evaluations/LPIPS.py:18-30).  pred/gt: (F, H, W, 3) in [0,255]."""
    p = np.moveaxis(pred, -1, 1) / 127.5 - 1
    g = np.moveaxis(gt, -1, 1) / 127.5 - 1
    scores = []
    for f in p:
        d = [float(net(f[None], gf[None])[0]) for gf in g]
        scores.append(min(d))
    return float(np.mean(scores))


def compute_lpips_slidewindow(net: LPIPS, pred, gt):
    """Best time-aligned window LPIPS (ref evaluations/LPIPS.py:33-51)."""
    if len(pred) > len(gt):
        pred, gt = gt, pred
    p = np.moveaxis(pred, -1, 1) / 127.5 - 1
    g = np.moveaxis(gt, -1, 1) / 127.5 - 1
    n = len(g) - len(p)
    if n <= 0:
        d = [float(net(pf[None], gf[None])[0]) for pf, gf in zip(p, g)]
        return float(np.mean(d))
    errs = []
    for i in range(n):
        d = [float(net(pf[None], gf[None])[0])
             for pf, gf in zip(p, g[i:i + len(p)])]
        errs.append(np.mean(d))
    return float(np.min(errs))
