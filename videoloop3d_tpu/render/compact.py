"""Hit-compaction of the sparse plane sweep.

After tile culling only ~5-20% of (plane, pixel) samples land on a kept
tile (measured: mean 2.2 hits/pixel, max 10, of D=32 on the production
soak scene) — yet the renderer's gathers, decode and composite all run
at the full (D, h, w) volume, and the gathers are descriptor-rate bound
(~30M desc/s on v5e), so ~80% of the forward cost is misses.

This module compacts the plane axis per pixel down to a static bound S
(the max per-pixel hit count over the training views, plus a jitter
margin): slot s of a pixel holds its s-th-farthest hit plane, empty
slots hold k = -1.  Everything downstream (texel gathers, decode,
composite, regularizers) then runs at (S, h, w) — an exact
transformation because dropped entries contribute exact zeros to the
over-composite (alpha 0 => transmittance factor 1.0, weighted sums + 0).

This mirrors the REFERENCE's own layout: its rasterizer truncates the
per-pixel fragment list to the used layer count (utils.py:64-69) and the
stage-2 smooth regularizers run on that truncated (B, H, W, L, 4) stack
with an L/mpi_d renormalization (MPV.py:518, 524) — hit-compaction is
the same data layout, with L pinned static for XLA.

Order/overflow semantics: slots preserve far -> near plane order (the
composite is order-sensitive); if a pixel exceeds S hits (only possible
when the bound was computed with too little margin), the FARTHEST hits
are dropped — they sit behind S nearer layers, so the error is bounded
and graceful.

Selection is a one-hot einsum at HIGHEST precision (exact: every output
is 0 or a product with 1.0f), not a gather — per-element gathers would
re-pay the descriptor rate the compaction exists to avoid.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from videoloop3d_tpu.render import renderer as R


class CompactedSweep:
    """Per-slot compacted sample arrays, shapes (S, h, w).

    Attributes mirror the dense sweep's per-plane arrays; ``onehot`` is
    the (S, D, h*w) float32 slot-selection matrix (slot s, plane d) used
    to expand cotangents back to the plane layout in the adjoint
    backward.
    """

    __slots__ = ("k_s", "k_d", "fu", "fv", "valid", "zview", "onehot")

    def __init__(self, k_s, k_d, fu, fv, valid, zview, onehot):
        self.k_s = k_s
        self.k_d = k_d
        self.fu = fu
        self.fv = fv
        self.valid = valid
        self.zview = zview
        self.onehot = onehot


def compact_sweep(k_s, k_d, fu, fv, valid, zview, n_slots) -> CompactedSweep:
    """Compact (D, h, w) per-plane sample arrays to (S, h, w) slots.

    k_s, k_d: int32 packed tile indices (-1 = miss); fu, fv: normalized
    in-tile coords; valid: bool frustum mask; zview: view-space depth.
    Planes are stored far -> near (axis 0); slots keep that order.
    """
    D, h, w = k_s.shape
    S = int(n_slots)
    hit = (k_s >= 0) | (k_d >= 0)
    # hits at planes >= d (this one + nearer); for a hit plane d its
    # nearer-hit count is rnc[d] - 1, its slot is S-1 - (rnc[d]-1)
    rnc = jnp.cumsum(hit[::-1].astype(jnp.int32), axis=0)[::-1]
    sel = (rnc[None] == (S - jnp.arange(S, dtype=jnp.int32))
           [:, None, None, None]) & hit[None]          # (S, D, h, w)
    oh = sel.reshape(S, D, h * w).astype(jnp.float32)

    # exact one-hot selection: k shifted by +1 so empty slots (all-zero
    # rows) come back as -1 (0 would alias packed tile 0)
    ch = jnp.stack([
        fu.astype(jnp.float32),
        fv.astype(jnp.float32),
        (k_s + 1).astype(jnp.float32),
        (k_d + 1).astype(jnp.float32),
        valid.astype(jnp.float32),
        zview.astype(jnp.float32),
    ], axis=-1).reshape(D, h * w, 6)
    out = jnp.einsum("sdp,dpc->spc", oh, ch,
                     precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(S, h, w, 6)
    k_s_c = jnp.round(out[..., 2]).astype(jnp.int32) - 1
    k_d_c = jnp.round(out[..., 3]).astype(jnp.int32) - 1
    return CompactedSweep(k_s_c, k_d_c, out[..., 0], out[..., 1],
                          out[..., 4] > 0.5, out[..., 5], oh)


def expand_cotangent(oh, ct):
    """(S, h, w, ...) slot cotangents -> (D, h, w, ...) plane layout.

    oh: (S, D, P) one-hot; exact transpose of the selection (each plane
    row of each pixel receives its slot's cotangent or zero).
    """
    S, D, P = oh.shape
    trail = ct.shape[3:]
    K = int(np.prod(trail)) if trail else 1
    ctf = ct.reshape(S, P, K).astype(jnp.float32)
    full = jnp.einsum("sdp,spk->dpk", oh, ctf,
                      precision=jax.lax.Precision.HIGHEST)
    return full.reshape((D,) + ct.shape[1:3] + trail)


def slot_bound(geom, tile_map_static, tile_map_dyn, extrins, intrins,
               h, w, jitter_px=0.55, margin=2):
    """Static per-pixel hit bound S for a set of views at (h, w).

    Evaluates the hit test at the pixel grid AND at four corners
    jittered by ``jitter_px`` (covering the trainer's +-0.5 px intrinsic
    noise: a jittered sample can cross a tile boundary and hit a tile
    the un-jittered grid misses), ORs them, and returns
    ``min(D, max_hits + margin)``.

    extrins: (V, 4, 4); intrins: (V, 3, 3) at the (h, w) resolution
    (un-shifted — patches are integer crops of this grid).  Cheap: one
    warp + tile lookup per view; call once per pyramid level.
    """
    tm_s = np.asarray(tile_map_static)
    tm_d = np.asarray(tile_map_dyn)
    D = geom.n_planes

    @jax.jit
    def view_max(extrin, intrin):
        hits = None
        for dy, dx in ((0.0, 0.0), (-jitter_px, -jitter_px),
                       (-jitter_px, jitter_px), (jitter_px, -jitter_px),
                       (jitter_px, jitter_px)):
            K = intrin.at[0, 2].add(dx).at[1, 2].add(dy)
            coords = R.warp_coordinates(geom, extrin[None], K[None], h, w)
            k_s, k_d, _, _ = R.tile_lookup2(geom, tm_s, tm_d, coords)
            hv = ((k_s[0] >= 0) | (k_d[0] >= 0)) & coords.valid[0]
            hits = hv if hits is None else (hits | hv)
        return jnp.max(jnp.sum(hits.astype(jnp.int32), axis=0))

    mx = 0
    for vi in range(len(extrins)):
        mx = max(mx, int(view_max(jnp.asarray(extrins[vi], jnp.float32),
                                  jnp.asarray(intrins[vi], jnp.float32))))
    return int(min(D, mx + margin))
