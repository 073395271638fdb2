"""Geometry/appearance regularizers shared by stage 1 and stage 2.

Parity notes (reference MPI.py:602-650, MPV.py:511-551): the reference
computes these on a per-pixel fragment stack whose layer count may be
adaptively truncated, then multiplies by ``num_layers / mpi_d``; our dense
plane axis always has D layers, and because empty layers contribute zero
to every term the normalizations below are numerically identical.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def sparsity_loss(alpha, n_planes, eps=1e-6, plane_axis=-3):
    """L1/L2 ratio of per-pixel alpha stacks along the plane axis.
    (ref MPI.py:603-607)."""
    l1 = jnp.sum(jnp.abs(alpha), axis=plane_axis)
    l2 = jnp.clip(jnp.sqrt(jnp.sum(alpha * alpha, axis=plane_axis)),
                  eps, None)
    return jnp.mean(l1 / l2) / math.sqrt(n_planes)


def content_smooth_loss(x, h_axis=-3, w_axis=-2):
    """Mean |spatial gradient| of per-plane content over the given H/W
    axes (default layout (..., D, H, W, C)).  (ref MPI.py:609-623)."""
    dx = jnp.mean(jnp.abs(jnp.diff(x, axis=w_axis)))
    dy = jnp.mean(jnp.abs(jnp.diff(x, axis=h_axis)))
    return dx + dy


def depth_smooth_loss(disp, rgb=None, edge_scale=4.0):
    """Disparity smoothness, optionally edge-aware (ref MPI.py:625-637 uses
    the edge weight in stage 1; MPV.py:538-551 drops it in stage 2).

    disp: (B, H, W); rgb: (B, H, W, 3) or None.
    """
    gx = jnp.abs(disp[:, 1:, :-1] - disp[:, 1:, 1:])
    gy = jnp.abs(disp[:, :-1, 1:] - disp[:, 1:, 1:])
    grad = gx + gy
    if rgb is None:
        return jnp.mean(grad)
    ex = jnp.sum(jnp.abs(rgb[:, 1:, :-1] - rgb[:, 1:, 1:]), axis=-1)
    ey = jnp.sum(jnp.abs(rgb[:, :-1, 1:] - rgb[:, 1:, 1:]), axis=-1)
    weight = jnp.clip(1.0 - (ex + ey) * edge_scale, 0.0, None)
    return jnp.mean(grad * weight)


def density_loss(alpha_sum):
    """Push total per-pixel opacity toward 1 (ref MPI.py:647-650)."""
    return jnp.mean(jnp.abs(alpha_sum - 1.0))
