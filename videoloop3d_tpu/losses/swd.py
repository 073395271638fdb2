"""Sliced-Wasserstein 3D-patch loss.

Parity: reference utils_vid.py:145-203 (Patch3DSWDLoss): random conv3d
projections of (pt, p, p) patches, per-(projection, spatial-location)
temporal sort, L1 between sorted sequences.  Note: the reference passes
its conv strides in a (spatial, spatial, temporal) order that torch
interprets as (temporal, spatial, spatial) — we use the intended
(st, s, s) order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def swd_3d_loss(x, y, rng, *, patch_size=7, patcht_size=7, stride=1,
                stridet=1, num_proj=256, **_):
    """x, y: (C, T, H, W) in [0, 1]; rng: jax PRNG key."""
    x = x * 2 - 1
    y = y * 2 - 1
    C = x.shape[0]
    rand = jax.random.normal(
        rng, (num_proj, C, patcht_size, patch_size, patch_size))
    if num_proj > 1:
        rand = rand / jnp.std(rand, axis=0, keepdims=True)

    dn = jax.lax.conv_dimension_numbers(
        (1,) + x.shape, rand.shape, ("NCDHW", "OIDHW", "NCDHW"))

    def project(v):
        out = jax.lax.conv_general_dilated(
            v[None], rand, (stridet, stride, stride), "VALID",
            dimension_numbers=dn)
        _, P, cf, ch, cw = out.shape
        out = out.reshape(P, cf, ch * cw)
        return out.transpose(0, 2, 1).reshape(P * ch * cw, cf)

    projx = project(x)
    projy = project(y)
    projx, projy = _match_lengths(projx, projy, rng)
    projx = jnp.sort(projx, axis=1)
    projy = jnp.sort(projy, axis=1)
    return jnp.mean(jnp.abs(projx - projy))


def _match_lengths(a, b, rng):
    """Duplicate columns of the shorter projection matrix
    (ref utils_vid.py:29-49)."""
    if a.shape[1] == b.shape[1]:
        return a, b
    swapped = a.shape[1] < b.shape[1]
    if swapped:
        a, b = b, a
    reps = a.shape[1] // b.shape[1]
    b = jnp.concatenate([b] * reps, axis=1)
    deficit = a.shape[1] - b.shape[1]
    if deficit > 0:
        idx = jax.random.permutation(rng, b.shape[1])[:deficit]
        b = jnp.concatenate([b, b[:, idx]], axis=1)
    return (b, a) if swapped else (a, b)
