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


def mask_patch_columns(mask, patch_size, patcht_size, stride, stridet,
                       n_frames=None):
    """Host-side: which projection columns touch the mask.

    mask: numpy (T, H, W) (or (H, W) with n_frames, broadcast over
    time), nonzero = masked.  Returns a bool array over the (cf*ch*cw)
    patch grid laid out like `project`'s column order — STATIC data, so
    the duplication below keeps static shapes (the loop mask is a
    per-view constant).
    Parity: ref utils_vid.py:189-194 (any mask pixel inside the patch).
    """
    import numpy as np
    mask = np.asarray(mask) > 0
    if mask.ndim == 2:
        mask = np.broadcast_to(mask[None],
                               (n_frames or 1,) + mask.shape)
    T, H, W = mask.shape
    cf = (T - patcht_size) // stridet + 1 if T >= patcht_size else 1
    ch = (H - patch_size) // stride + 1
    cw = (W - patch_size) // stride + 1
    out = np.zeros((cf, ch, cw), bool)
    for f in range(cf):
        for i in range(ch):
            for j in range(cw):
                out[f, i, j] = mask[
                    f * stridet:f * stridet + patcht_size,
                    i * stride:i * stride + patch_size,
                    j * stride:j * stride + patch_size].any()
    # flattened in the conv output's (cf, ch, cw) patch order
    return out.reshape(cf * ch * cw)


def swd_3d_loss(x, y, rng, *, patch_size=7, patcht_size=7, stride=1,
                stridet=1, num_proj=256, mask=None,
                mask_patches_factor=1, **_):
    """x, y: (C, T, H, W) in [0, 1]; rng: jax PRNG key.

    mask (host numpy (T, H, W) or (H, W), optional): target patches
    touching it are duplicated `mask_patches_factor` times before the
    sort, biasing the matched distribution toward the masked region
    (ref utils_vid.py:189-194).  The mask must be host data (a per-view
    constant), keeping all shapes static.
    """
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
        return out.reshape(P, cf, ch * cw)

    rawx = project(x)
    rawy = project(y)
    if mask is not None:
        # mask-weighted duplication is only coherent in the reference's
        # patch-distribution (matmul) branch (utils_vid.py:186-194): the
        # sort runs over ALL 3-D patches per projection and the masked
        # target patches appear `factor` times in that distribution
        import numpy as np
        sel = mask_patch_columns(mask, patch_size, patcht_size, stride,
                                 stridet, n_frames=y.shape[1])
        ny = rawy.shape[1] * rawy.shape[2]
        assert sel.shape[0] == ny, (sel.shape, rawy.shape)
        order = np.concatenate(
            [np.nonzero(~sel)[0]]
            + [np.nonzero(sel)[0]] * mask_patches_factor)
        projy = rawy.reshape(num_proj, ny)[:, jnp.asarray(order)]
        projx = rawx.reshape(num_proj, -1)
    else:
        # default (conv) branch: per-(projection, spatial location)
        # temporal distributions
        projx = rawx.transpose(0, 2, 1).reshape(-1, rawx.shape[1])
        projy = rawy.transpose(0, 2, 1).reshape(-1, rawy.shape[1])
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
