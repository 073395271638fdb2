"""Alpha compositing of plane stacks.

Parity: reference utils_mpi.py:92-132 (overcompose / overcomposeNto0).
Layer axis is ordered FRONT (nearest) to BACK here; the models store
planes far-to-near (reference MPI.py:57 flips `make_depths`), so callers
reverse the plane axis before compositing.
"""
from __future__ import annotations

import jax.numpy as jnp


def composite_front_to_back(alpha, content):
    """Over-composite a stack of semi-transparent layers.

    Args:
      alpha: (..., L) opacity per layer, layer 0 nearest.
      content: (..., L, C).

    Returns:
      out: (..., C) composited content.
      blend_weight: (..., L) per-layer contribution
        w_i = a_i * prod_{j<i}(1 - a_j).
    """
    one_minus = 1.0 - alpha
    trans = jnp.cumprod(one_minus, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    w = alpha * trans
    out = jnp.sum(content * w[..., None], axis=-2)
    return out, w
