"""Shimmed torchvision.transforms: Resize, InterpolationMode, GaussianBlur.

Matches torchvision tensor semantics for the calls the reference makes:
``Resize((h, w))`` (bilinear, antialias=False default for tensors, as in
the torchvision version the reference pins) and
``Resize((h, w), interpolation=InterpolationMode.BILINEAR, antialias=True)``.
"""
from __future__ import annotations

import enum

import torch
import torch.nn.functional as F


class InterpolationMode(str, enum.Enum):
    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"


_MODE = {
    InterpolationMode.NEAREST: "nearest",
    InterpolationMode.BILINEAR: "bilinear",
    InterpolationMode.BICUBIC: "bicubic",
}


class Resize:
    def __init__(self, size, interpolation=InterpolationMode.BILINEAR,
                 antialias=False, **_unused):
        self.size = tuple(size) if isinstance(size, (tuple, list)) else (size,)
        self.mode = _MODE.get(interpolation, "bilinear")
        self.antialias = bool(antialias)

    def __call__(self, img: torch.Tensor) -> torch.Tensor:
        assert img.dim() >= 3
        squeeze = img.dim() == 3
        x = img[None] if squeeze else img
        kwargs = {}
        if self.mode in ("bilinear", "bicubic"):
            kwargs = dict(align_corners=False, antialias=self.antialias)
        out = F.interpolate(x, size=self.size, mode=self.mode, **kwargs)
        return out[0] if squeeze else out


class GaussianBlur:
    """Deterministic sigma (cv2's ksize-derived default); the reference's
    only call path (`utils.py:295 gaussian`) has no runtime callers."""

    def __init__(self, kernel_size, sigma=None):
        self.k = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
        self.sigma = sigma if isinstance(sigma, (int, float)) else (
            0.3 * ((self.k - 1) * 0.5 - 1) + 0.8)

    def __call__(self, img: torch.Tensor) -> torch.Tensor:
        half = (self.k - 1) / 2.0
        coords = torch.arange(self.k, dtype=img.dtype, device=img.device) - half
        g = torch.exp(-(coords ** 2) / (2.0 * self.sigma ** 2))
        g = g / g.sum()
        win = (g[:, None] @ g[None, :])
        squeeze = img.dim() == 3
        x = img[None] if squeeze else img
        c = x.shape[1]
        win = win.expand(c, 1, self.k, self.k)
        out = F.conv2d(x, win, padding=self.k // 2, groups=c)
        return out[0] if squeeze else out
