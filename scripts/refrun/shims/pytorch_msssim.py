"""Minimal pytorch_msssim.ssim shim.

Only the call shape the reference uses
(`/root/reference/utils_vid.py:99`): ``ssim(X, Y, data_range=1,
size_average=False, win_size=3, win_sigma=1)`` over (N, C, H, W),
returning a per-sample (N,) tensor.  Standard SSIM with a gaussian
window; reimplemented from the SSIM definition, no package source used.
Unused by the shipped mse-distance configs; present for completeness.
"""
from __future__ import annotations

import torch
import torch.nn.functional as F


def _gaussian_win(win_size: int, sigma: float, device, dtype):
    half = (win_size - 1) / 2.0
    coords = torch.arange(win_size, device=device, dtype=dtype) - half
    g = torch.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return g[:, None] @ g[None, :]


def ssim(X: torch.Tensor, Y: torch.Tensor, data_range=255, size_average=True,
         win_size=11, win_sigma=1.5, K=(0.01, 0.03), **_unused):
    assert X.shape == Y.shape and X.dim() == 4
    n, c, h, w = X.shape
    win = _gaussian_win(win_size, win_sigma, X.device, X.dtype)
    win = win.expand(c, 1, win_size, win_size)
    k1, k2 = K
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = F.conv2d(X, win, groups=c)
    mu_y = F.conv2d(Y, win, groups=c)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_xx = F.conv2d(X * X, win, groups=c) - mu_xx
    sigma_yy = F.conv2d(Y * Y, win, groups=c) - mu_yy
    sigma_xy = F.conv2d(X * Y, win, groups=c) - mu_xy

    ssim_map = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_xx + mu_yy + c1) * (sigma_xx + sigma_yy + c2))
    if size_average:
        return ssim_map.mean()
    return ssim_map.reshape(n, -1).mean(-1)
