"""Bilinear texture gathers for the plane-sweep renderer.

These replace the reference's `torch.grid_sample` calls
(reference MPI.py:529, MPV.py:425) with explicit XLA gathers: 4 corner
gathers + lerp, align-corners semantics (coordinate i lands on texel i),
zeros outside the texture (matching ``padding_mode="zeros"``).
"""
from __future__ import annotations

import jax.numpy as jnp


def _corner_gather(flat_tex, idx, valid):
    """flat_tex: (..., HW, C); idx: (..., N) int32; valid: (..., N) bool."""
    g = jnp.take_along_axis(flat_tex, idx[..., None], axis=-2)
    return g * valid[..., None]


def bilinear_planes(tex, x, y):
    """Sample per-plane textures at continuous texel coordinates.

    Args:
      tex: (D, Ht, Wt, C) raw texels.
      x, y: (D, N) texel coordinates per plane (align-corners).

    Returns:
      values: (D, N, C); zero where the sample is outside [0,Wt-1]x[0,Ht-1].
      inside: (D, N) bool, True where the sample point itself is in bounds.
    """
    D, Ht, Wt, C = tex.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = tex.reshape(D, Ht * Wt, C)

    def corner(xi, yi):
        valid = (xi >= 0) & (xi < Wt) & (yi >= 0) & (yi < Ht)
        idx = jnp.clip(yi, 0, Ht - 1) * Wt + jnp.clip(xi, 0, Wt - 1)
        return _corner_gather(flat, idx, valid)

    v00 = corner(x0i, y0i)
    v01 = corner(x0i + 1, y0i)
    v10 = corner(x0i, y0i + 1)
    v11 = corner(x0i + 1, y0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    values = top * (1 - fy) + bot * fy
    inside = (x >= 0) & (x <= Wt - 1) & (y >= 0) & (y <= Ht - 1)
    return values, inside


def bilinear_tiles(tiles, tile_idx, u, v):
    """Sample packed tile textures.

    The sparse MTV stores kept tiles in a packed array; per sample we know
    which tile we are in (``tile_idx``, -1 when culled) and the continuous
    texel coordinate inside that tile.  Corner texels are clamped to the
    tile (tiles carry their own copy of shared edges, mirroring the packed
    atlas of reference MPI.py:386-423, where each tile's UV island is
    sampled independently).

    Args:
      tiles: (N, th, tw, C).
      tile_idx: (...,) int32 in [-1, N).
      u, v: (...,) texel coordinates inside the tile, nominally in
        [0, tw-1] / [0, th-1].

    Returns:
      values: (..., C), zero where tile_idx < 0.
      valid: (...,) bool (tile_idx >= 0).
    """
    N, th, tw, C = tiles.shape
    valid = tile_idx >= 0
    if N == 0:                       # fully-culled branch (static shape)
        return jnp.zeros(tile_idx.shape + (C,), tiles.dtype), valid
    k = jnp.maximum(tile_idx, 0)
    u = jnp.clip(u, 0.0, tw - 1.0)
    v = jnp.clip(v, 0.0, th - 1.0)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    u1i = jnp.minimum(u0i + 1, tw - 1)
    v1i = jnp.minimum(v0i + 1, th - 1)

    flat = tiles.reshape(N * th * tw, C)
    base = k * (th * tw)

    def corner(ui, vi):
        return jnp.take(flat, base + vi * tw + ui, axis=0)

    v00 = corner(u0i, v0i)
    v01 = corner(u1i, v0i)
    v10 = corner(u0i, v1i)
    v11 = corner(u1i, v1i)
    top = v00 * (1 - fu) + v01 * fu
    bot = v10 * (1 - fu) + v11 * fu
    values = top * (1 - fv) + bot * fv
    return values * valid[..., None], valid


def bilinear_tiles_tilemajor(tiles, tile_idx, u, v):
    """Sample tile-major frame-stacked tiles.

    Layout is the key TPU optimization of the renderer: the dynamic atlas
    is stored as (N, th, tw, F, C) so that one texel of one tile holds
    ALL frames contiguously.  A bilinear sample then gathers 4 rows of
    F*C contiguous floats (lane-aligned) instead of F*4 scattered
    4-float slices — ~5x faster end-to-end on v5e than the naive
    frame-major gather.

    Args:
      tiles: (N, th, tw, F, C).
      tile_idx: (...,) int32 in [-1, N); u, v: (...,) texel coords.

    Returns values (..., F, C) and valid (...,).
    """
    N, th, tw, F, C = tiles.shape
    valid = tile_idx >= 0
    if N == 0:
        return (jnp.zeros(tile_idx.shape + (F, C), tiles.dtype), valid)
    k = jnp.maximum(tile_idx, 0)
    u = jnp.clip(u, 0.0, tw - 1.0)
    v = jnp.clip(v, 0.0, th - 1.0)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None, None]
    fv = (v - v0)[..., None, None]
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    u1i = jnp.minimum(u0i + 1, tw - 1)
    v1i = jnp.minimum(v0i + 1, th - 1)

    flat = tiles.reshape(N * th * tw, F * C)
    base = k * (th * tw)

    def corner(ui, vi):
        g = jnp.take(flat, base + vi * tw + ui, axis=0)
        return g.reshape(u.shape + (F, C))

    v00 = corner(u0i, v0i)
    v01 = corner(u1i, v0i)
    v10 = corner(u0i, v1i)
    v11 = corner(u1i, v1i)
    top = v00 * (1 - fu) + v01 * fu
    bot = v10 * (1 - fu) + v11 * fu
    values = top * (1 - fv) + bot * fv
    return values * valid[..., None, None], valid


def bilinear_planes_tilemajor(tex, x, y):
    """Dense-phase analog of `bilinear_tiles_tilemajor`.

    tex: (D, Ht, Wt, F, C) frame-stacked plane textures; x, y: (D, ...)
    texel coords.  Returns ((D, ..., F, C) values, (D, ...) inside)."""
    D, Ht, Wt, F, C = tex.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None, None]
    fy = (y - y0)[..., None, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = tex.reshape(D, Ht * Wt, F * C)

    def corner(xi, yi):
        valid = (xi >= 0) & (xi < Wt) & (yi >= 0) & (yi < Ht)
        idx = jnp.clip(yi, 0, Ht - 1) * Wt + jnp.clip(xi, 0, Wt - 1)
        g = jnp.take_along_axis(flat, idx[..., None], axis=-2)
        g = g.reshape(x.shape + (F, C))
        return g * valid[..., None, None]

    v00 = corner(x0i, y0i)
    v01 = corner(x0i + 1, y0i)
    v10 = corner(x0i, y0i + 1)
    v11 = corner(x0i + 1, y0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    values = top * (1 - fy) + bot * fy
    inside = (x >= 0) & (x <= Wt - 1) & (y >= 0) & (y <= Ht - 1)
    return values, inside
