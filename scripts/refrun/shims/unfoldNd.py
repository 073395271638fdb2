"""Minimal unfoldNd shim (3-D unfold/fold) for the reference's loss code.

The reference's GPNN losses (`/root/reference/utils_vid.py:60-70,218,255`)
use the pure-python ``unfoldNd`` package as a generalized
``torch.nn.Unfold``/``Fold`` over (B, C, T, H, W) video tensors:

* ``UnfoldNd(kernel_size, stride)(x)`` -> (B, C*prod(k), L) with blocks
  ordered channel-major then kernel-position, L = t_out*h_out*w_out in
  row-major (t, h, w) order — identical to ``torch.nn.Unfold`` semantics
  lifted to 3-D;
* ``FoldNd(output_size, kernel_size, stride)`` is the transpose
  (overlap-add scatter).

Reimplemented from the torch.nn.Unfold contract; no unfoldNd source
consulted.  Only the 3-D, dilation=1, padding=0 cases the reference
exercises are supported.
"""
from __future__ import annotations

import torch
import torch.nn as nn


def _triple(v):
    if isinstance(v, (tuple, list)):
        assert len(v) == 3
        return tuple(int(x) for x in v)
    return (int(v),) * 3


class UnfoldNd(nn.Module):
    def __init__(self, kernel_size, dilation=1, padding=0, stride=1):
        super().__init__()
        assert _triple(dilation) == (1, 1, 1) and _triple(padding) == (0, 0, 0)
        self.kernel_size = _triple(kernel_size)
        self.stride = _triple(stride)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        b, c = x.shape[:2]
        (kt, kh, kw), (st, sh, sw) = self.kernel_size, self.stride
        blocks = x.unfold(2, kt, st).unfold(3, kh, sh).unfold(4, kw, sw)
        # (b, c, to, ho, wo, kt, kh, kw) -> (b, c, kt, kh, kw, to*ho*wo)
        blocks = blocks.permute(0, 1, 5, 6, 7, 2, 3, 4)
        return blocks.reshape(b, c * kt * kh * kw, -1)


class FoldNd(nn.Module):
    def __init__(self, output_size, kernel_size, dilation=1, padding=0,
                 stride=1):
        super().__init__()
        assert _triple(dilation) == (1, 1, 1) and _triple(padding) == (0, 0, 0)
        self.output_size = _triple(output_size)
        self.kernel_size = _triple(kernel_size)
        self.stride = _triple(stride)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        b = x.shape[0]
        (t, h, w) = self.output_size
        (kt, kh, kw), (st, sh, sw) = self.kernel_size, self.stride
        to = (t - kt) // st + 1
        ho = (h - kh) // sh + 1
        wo = (w - kw) // sw + 1
        c = x.shape[1] // (kt * kh * kw)
        blocks = x.reshape(b, c, kt, kh, kw, to, ho, wo)
        out = x.new_zeros(b, c, t, h, w)
        for it in range(kt):
            for ih in range(kh):
                for iw in range(kw):
                    out[:, :,
                        it:it + st * to:st,
                        ih:ih + sh * ho:sh,
                        iw:iw + sw * wo:sw] += blocks[:, :, it, ih, iw]
        return out
