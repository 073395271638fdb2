"""LPIPS perceptual metric — pure-JAX backbones + linear heads.

Parity: reference evaluations/lpips/ (vendored richzhang LPIPS).  All
three reference backbones are implemented (pretrained_networks.py:6-130,
lpips.py:158-181): ``alex`` (5 taps), ``vgg`` (vgg16, 5 taps), and
``squeeze`` (squeezenet1.1, 7 taps).  The reference ships the 1x1
linear-head weights in-repo and downloads the torchvision backbones;
this environment has no network egress, so weights must be supplied as
a file:

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

# torchvision VGG16: 13 k3/s1/p1 convs in 5 stages, 2x2 pool between
# stages, taps after each stage's last relu (pretrained_networks.py:108-117)
_VGG_STAGES = [[64, 64], [128, 128], [256, 256, 256],
               [512, 512, 512], [512, 512, 512]]
_VGG_CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]

# torchvision SqueezeNet1.1: conv0 k3/s2 + 8 fire modules; ceil-mode
# 3x2 maxpools before fires 0, 2 and 4; taps per
# pretrained_networks.py:18-31 (7 slices)
_SQUEEZE_FIRE_IDS = [3, 4, 6, 7, 9, 10, 11, 12]
_SQUEEZE_FIRES = [(16, 64), (16, 64), (32, 128), (32, 128),
                  (48, 192), (48, 192), (64, 256), (64, 256)]
_SQUEEZE_POOL_BEFORE_FIRE = {0, 2, 4}
_SQUEEZE_TAP_AFTER_FIRE = {1, 3, 4, 5, 6, 7}   # plus the conv0 tap

_CHNS = {"alex": [64, 192, 384, 256, 256],
         "vgg": [64, 128, 256, 512, 512],
         "squeeze": [64, 128, 256, 384, 384, 512, 512]}

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def convert_torch_weights(backbone_pth, lpips_pth, out_npz, net="alex"):
    """Convert a torchvision backbone state_dict (alexnet / vgg16 /
    squeezenet1_1, chosen by `net`) + lpips linear heads into the .npz
    this module loads."""
    import torch
    sd = torch.load(backbone_pth, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    lin = torch.load(lpips_pth, map_location="cpu")
    out = {"net": np.array(net)}
    if net == "alex":
        conv_ids = [0, 3, 6, 8, 10]
    elif net == "vgg":
        conv_ids = _VGG_CONV_IDS
    elif net == "squeeze":
        conv_ids = [0]
        for i, fid in enumerate(_SQUEEZE_FIRE_IDS):
            for part in ("squeeze", "expand1x1", "expand3x3"):
                out[f"fire{i}/{part}/w"] =                     sd[f"features.{fid}.{part}.weight"].numpy()
                out[f"fire{i}/{part}/b"] =                     sd[f"features.{fid}.{part}.bias"].numpy()
    else:
        raise ValueError(net)
    for i, cid in enumerate(conv_ids):
        out[f"conv{i}/w"] = sd[f"features.{cid}.weight"].numpy()
        out[f"conv{i}/b"] = sd[f"features.{cid}.bias"].numpy()
    for i in range(len(_CHNS[net])):
        key = f"lin{i}.model.1.weight"
        if key not in lin:
            key = f"lins.{i}.model.1.weight"
        out[f"lin{i}/w"] = lin[key].numpy()
    np.savez(out_npz, **out)
    return out_npz


class LPIPS:
    def __init__(self, weights_path=None):
        self.weights = None
        self.net = "alex"
        path = weights_path or os.environ.get("VL3D_LPIPS_WEIGHTS", "")
        if path and os.path.exists(path):
            z = np.load(path)
            self.weights = {k: jnp.asarray(z[k]) for k in z.files
                            if k != "net"}
            if "net" in z.files:
                self.net = str(z["net"])
        self._fn = jax.jit(self._forward) if self.weights else None

    @property
    def available(self):
        return self.weights is not None

    def _conv(self, h, i, stride=1, pad=0, prefix="conv"):
        w = self.weights[f"{prefix}{i}/w"]
        b = self.weights[f"{prefix}{i}/b"]
        h = jax.lax.conv_general_dilated(
            h, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return h + b[None, :, None, None]

    @staticmethod
    def _maxpool(h, k, s, ceil=False):
        if ceil:
            # torch ceil_mode: pad the tail so the last partial window
            # still counts (never starting in the padding)
            def tail(n):
                out = -(-(n - k) // s) + 1
                return max((out - 1) * s + k - n, 0)
            ph, pw = tail(h.shape[2]), tail(h.shape[3])
            h = jnp.pad(h, ((0, 0), (0, 0), (0, ph), (0, pw)),
                        constant_values=-jnp.inf)
        return jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID")

    def _features_alex(self, h):
        feats = []
        for i, (oc, k, s, p) in enumerate(_ALEX_CFG):
            h = jax.nn.relu(self._conv(h, i, s, p))
            feats.append(h)
            if i in _POOL_AFTER:
                h = self._maxpool(h, 3, 2)
        return feats

    def _features_vgg(self, h):
        feats = []
        ci = 0
        for si, stage in enumerate(_VGG_STAGES):
            if si > 0:
                h = self._maxpool(h, 2, 2)
            for _ in stage:
                h = jax.nn.relu(self._conv(h, ci, 1, 1))
                ci += 1
            feats.append(h)
        return feats

    def _features_squeeze(self, h):
        feats = []
        h = jax.nn.relu(self._conv(h, 0, stride=2, pad=0))
        feats.append(h)                                    # relu1
        for i in range(len(_SQUEEZE_FIRES)):
            if i in _SQUEEZE_POOL_BEFORE_FIRE:
                h = self._maxpool(h, 3, 2, ceil=True)
            # fire module: squeeze 1x1 -> relu -> expand 1x1 & 3x3(p1)
            sq = jax.lax.conv_general_dilated(
                h, self.weights[f"fire{i}/squeeze/w"], (1, 1),
                [(0, 0), (0, 0)],
                dimension_numbers=("NCHW", "OIHW", "NCHW")) \
                + self.weights[f"fire{i}/squeeze/b"][None, :, None, None]
            sq = jax.nn.relu(sq)
            e1 = jax.lax.conv_general_dilated(
                sq, self.weights[f"fire{i}/expand1x1/w"], (1, 1),
                [(0, 0), (0, 0)],
                dimension_numbers=("NCHW", "OIHW", "NCHW")) \
                + self.weights[f"fire{i}/expand1x1/b"][None, :, None,
                                                       None]
            e3 = jax.lax.conv_general_dilated(
                sq, self.weights[f"fire{i}/expand3x3/w"], (1, 1),
                [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW")) \
                + self.weights[f"fire{i}/expand3x3/b"][None, :, None,
                                                       None]
            h = jnp.concatenate([jax.nn.relu(e1), jax.nn.relu(e3)], 1)
            if i in _SQUEEZE_TAP_AFTER_FIRE:
                feats.append(h)
        return feats

    def _features(self, x):
        """x: (B, 3, H, W) in [-1, 1] -> per-slice feature maps."""
        x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) \
            / jnp.asarray(_SCALE)[None, :, None, None]
        return {"alex": self._features_alex,
                "vgg": self._features_vgg,
                "squeeze": self._features_squeeze}[self.net](x)

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
