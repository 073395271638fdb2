"""3D-patch nearest-neighbor (GPNN-style) looping losses — the paper's core.

TPU-first design
----------------
The reference (utils_vid.py:60-434) unfolds the video into
(pt, p, p) spatio-temporal patches with `unfoldNd`, runs a chunked
nearest-neighbor search, and folds NN patches back with a transposed
convolution.  Three observations drive this implementation:

1. The NN search is *per spatial location over temporal patches only*
   (utils_vid.py:213-216 reshapes to B = h*w batches of d = n_t
   candidates) — so the distance computation is a batch of small GEMMs,
   a perfect MXU workload expressed as one einsum.
2. Fold (overlap-add) is separable across the three axes: fold_w then
   fold_h then fold_t, each a handful of strided adds — p+p+pt strided
   updates instead of a transposed conv or a giant scatter.
3. The fold weight (count of patches covering each voxel) is an analytic
   outer product of three 1-D profiles — never folded at runtime.

Everything is static-shape given (T, H, W, patch cfg), so the whole loss
jits into one XLA program.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# robust loss (ref utils_vid.py:10-26)
# ---------------------------------------------------------------------------

def robust_lossfun(x, rou, scale, epsilon=1e-6):
    """General robust penalty rho(x); `rou` in {'mse','abs'} or a float
    (the Barron-style family the reference uses, incl. its *(scale*10)
    quirk for general rou)."""
    if rou == "mse":
        return x ** 2
    if rou == "abs":
        return jnp.abs(x)
    rou = float(rou)
    z = (x / scale) ** 2
    if rou == 0:
        return jnp.log1p(z * 0.5)
    if rou == 2:
        return 0.5 * z
    b = abs(rou - 2) + epsilon
    d = rou + epsilon if rou >= 0 else rou - epsilon
    loss = (b / d) * (jnp.power(z / b + 1.0, 0.5 * d) - 1.0)
    return loss * (scale * 10)


# ---------------------------------------------------------------------------
# patch extraction / fold
# ---------------------------------------------------------------------------

def n_patches(size, p, s):
    return (size - p) // s + 1


def fit_patch_size(size, p, s):
    """Largest size' <= size with (size' - p) % s == 0
    (ref utils_vid.py:308-318 fit_patch)."""
    return (size - p) // s * s + p


def extract_patches_3d(x, psz, strides):
    """x: (C, T, H, W) -> (n_t, n_h, n_w, C, pt, p, p)."""
    C, T, H, W = x.shape
    (pt, ph, pw), (st, sh, sw) = psz, strides
    nt, nh, nw = n_patches(T, pt, st), n_patches(H, ph, sh), \
        n_patches(W, pw, sw)
    idx_t = (np.arange(nt)[:, None] * st + np.arange(pt)).reshape(-1)
    idx_h = (np.arange(nh)[:, None] * sh + np.arange(ph)).reshape(-1)
    idx_w = (np.arange(nw)[:, None] * sw + np.arange(pw)).reshape(-1)
    out = x[:, idx_t][:, :, idx_h][:, :, :, idx_w]
    out = out.reshape(C, nt, pt, nh, ph, nw, pw)
    return jnp.transpose(out, (1, 3, 5, 0, 2, 4, 6))


def _fold_axis(v, length, stride):
    """v: (..., n, p) -> (..., length) overlap-add with out[i*s + dp] +=
    v[i, dp]."""
    n, p = v.shape[-2], v.shape[-1]
    out = jnp.zeros(v.shape[:-2] + (length,), v.dtype)
    span = (n - 1) * stride + 1
    for dp in range(p):
        out = out.at[..., dp:dp + span:stride].add(v[..., :, dp])
    return out


def fold_patches_3d(patches, out_shape, strides):
    """Inverse of extract (overlap-add).  patches:
    (n_t, n_h, n_w, C, pt, p, p) -> (C, T, H, W)."""
    T, H, W = out_shape
    st, sh, sw = strides
    v = jnp.transpose(patches, (3, 0, 4, 1, 5, 2, 6))
    # (C, n_t, pt, n_h, ph, n_w, pw): fold w, then h, then t
    v = jnp.moveaxis(v, (5, 6), (-2, -1))
    v = _fold_axis(v, W, sw)                      # (C,nt,pt,nh,ph,W)
    v = jnp.moveaxis(v, (3, 4), (-2, -1))         # (C,nt,pt,W,nh,ph)
    v = _fold_axis(v, H, sh)                      # (C,nt,pt,W,H)
    v = jnp.moveaxis(v, (1, 2), (-2, -1))         # (C,W,H,nt,pt)
    v = _fold_axis(v, T, st)                      # (C,W,H,T)
    return jnp.transpose(v, (0, 3, 2, 1))


# Identity-kernel convs cost dim^2 MACs per output position — fine for
# small patches, quadratic pain at 11x11 (dim 1089: the round-5 refview
# profile showed the fold conv_transpose alone at 84 ms/step).  Above
# this flat-dim threshold the separable banded-matmul path below wins
# (~dim*(pt+ph+pw) MACs); below it the fused conv is cheaper than the
# extra transposes.
_MATMUL_PATCH_DIM = 512


def _band_matrix(n, p, s, length):
    """(n*p, length) 0/1 fold matrix: patch i, in-patch offset d
    contributes to output position i*s + d.  Its transpose extracts."""
    M = np.zeros((n * p, length), np.float32)
    for i in range(n):
        M[i * p:(i + 1) * p, i * s:i * s + p] += np.eye(p)
    return M


def _bandmm(x, M, out_dtype=None):
    """x: (..., k) @ M (k, o) -> (..., o), exactly.

    bf16 inputs ride the native MXU pass with f32 accumulation (exact:
    M is 0/1 so every product is a bf16 value); f32 inputs need HIGHEST
    or the TPU default truncates them to bf16 mid-flight.  out_dtype
    overrides the f32 accumulator ONLY where that is exact (extraction:
    one nonzero per output row, so a bf16 result is the input value).
    """
    if x.dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            x, jnp.asarray(M, jnp.bfloat16),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=out_dtype or jnp.float32)
    return jnp.einsum("...k,ko->...o", x, jnp.asarray(M, x.dtype),
                      precision=jax.lax.Precision.HIGHEST)


def extract_patches_matmul(x, psz, strides):
    """`extract_patches_flat` as three per-axis banded matmuls.

    Each axis unfold is (..., L) @ B^T where B is the 0/1 band matrix —
    pure MXU selection, ~dim*(pt+p+p) MACs per position instead of the
    identity conv's dim^2.  Flat channel order (C, dt, dy, dx) matches
    the conv path bit-for-bit (tests/test_patch_nn.py).  bf16 inputs
    stay bf16 (selection is exact per element) — the NN search is under
    stop_gradient, so the fat patch tensors never need f32 bytes.
    """
    (pt, ph, pw), (st, sh, sw) = psz, strides
    C, T, H, W = x.shape
    dt = x.dtype if x.dtype == jnp.bfloat16 else None
    nt, nh, nw = n_patches(T, pt, st), n_patches(H, ph, sh), \
        n_patches(W, pw, sw)
    y = x.transpose(0, 2, 3, 1)                       # (C, H, W, T)
    y = _bandmm(y, _band_matrix(nt, pt, st, T).T, dt)  # (C, H, W, nt*pt)
    y = y.reshape(C, H, W, nt, pt).transpose(3, 0, 4, 2, 1) \
        .reshape(nt, C, pt, W, H)
    y = _bandmm(y, _band_matrix(nh, ph, sh, H).T, dt)  # (nt,C,pt,W,nh*ph)
    y = y.reshape(nt, C, pt, W, nh, ph).transpose(0, 4, 1, 2, 5, 3) \
        .reshape(nt, nh, C, pt, ph, W)
    y = _bandmm(y, _band_matrix(nw, pw, sw, W).T, dt)  # (...,nw*pw)
    y = y.reshape(nt, nh, C, pt, ph, nw, pw).transpose(0, 1, 5, 2, 3, 4, 6)
    return y.reshape(nt, nh, nw, C * pt * ph * pw)


def fold_patches_matmul(patches, n_channels, psz, strides):
    """`fold_patches_flat` as three per-axis banded matmuls (overlap-add
    = (..., n*p) @ B per axis)."""
    (pt, ph, pw), (st, sh, sw) = psz, strides
    ntx, nh, nw, _ = patches.shape
    C = n_channels
    T = (ntx - 1) * st + pt
    H = (nh - 1) * sh + ph
    W = (nw - 1) * sw + pw
    y = patches.reshape(ntx, nh, nw, C, pt, ph, pw) \
        .transpose(0, 1, 3, 4, 5, 2, 6).reshape(ntx, nh, C, pt, ph,
                                                nw * pw)
    y = _bandmm(y, _band_matrix(nw, pw, sw, W))       # (ntx,nh,C,pt,ph,W)
    y = y.transpose(0, 2, 3, 5, 1, 4).reshape(ntx, C, pt, W, nh * ph)
    y = _bandmm(y, _band_matrix(nh, ph, sh, H))       # (ntx,C,pt,W,H)
    y = y.transpose(1, 3, 4, 0, 2).reshape(C, W, H, ntx * pt)
    y = _bandmm(y, _band_matrix(ntx, pt, st, T))      # (C,W,H,T)
    return y.transpose(0, 3, 2, 1)


def extract_patches_flat(x, psz, strides, via="auto"):
    """x: (C, T, H, W) -> (n_t, n_h, n_w, C*pt*p*p) via XLA's patch
    extraction (lowered to an identity-kernel conv), or per-axis banded
    matmuls when the flat patch dim is large (see _MATMUL_PATCH_DIM).

    TPU note: the reshape-based `extract_patches_3d` materializes 7/8-D
    tensors whose tiny minor dims (the patch extents) pick up (8,128)
    layout padding — up to ~7x memory expansion for 11x11 patches.  The
    flat form keeps the patch dim fused (always >= 128) so layouts stay
    dense, and the heavy lifting runs on the MXU.
    """
    (pt, ph, pw), (st, sh, sw) = psz, strides
    dim = x.shape[0] * pt * ph * pw
    if via == "matmul" or (via == "auto" and dim >= _MATMUL_PATCH_DIM
                           and jax.default_backend() != "cpu"):
        return extract_patches_matmul(x, psz, strides)
    out = jax.lax.conv_general_dilated_patches(
        x[None], filter_shape=(pt, ph, pw),
        window_strides=(st, sh, sw), padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    # out: (1, C*pt*ph*pw, nt, nh, nw), channels ordered (C, dt, dy, dx)
    return jnp.transpose(out[0], (1, 2, 3, 0))


def fold_patches_flat(patches, n_channels, psz, strides, via="auto"):
    """Inverse overlap-add of `extract_patches_flat` via an
    identity-kernel transposed conv (an MXU matmul per output window —
    the TPU-friendly formulation of N-D fold), or per-axis banded
    matmuls when the flat patch dim is large.

    patches: (n_t, n_h, n_w, C*pt*p*p) -> (C, T, H, W).
    """
    (pt, ph, pw), (st, sh, sw) = psz, strides
    C = n_channels
    dim = C * pt * ph * pw
    if via == "matmul" or (via == "auto" and dim >= _MATMUL_PATCH_DIM
                           and jax.default_backend() != "cpu"):
        return fold_patches_matmul(patches, C, psz, strides)
    # kernel (pt, ph, pw, dim, C): scatter flat channel (c, dt, dy, dx)
    # back to channel c at offset (dt, dy, dx); conv_transpose applies
    # the kernel spatially mirrored, hence the (p-1-d) index flip
    kern = np.zeros((pt, ph, pw, dim, C), np.float32)
    for c in range(C):
        for dt in range(pt):
            for dy in range(ph):
                for dx in range(pw):
                    flat = ((c * pt + (pt - 1 - dt)) * ph
                            + (ph - 1 - dy)) * pw + (pw - 1 - dx)
                    kern[dt, dy, dx, flat, c] = 1.0
    out = jax.lax.conv_transpose(
        patches[None], jnp.asarray(kern, patches.dtype),
        strides=(st, sh, sw), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    return jnp.transpose(out[0], (3, 0, 1, 2))


def _fold_profile_1d(length, p, s):
    n = n_patches(length, p, s)
    prof = np.zeros(length, np.float32)
    for i in range(n):
        prof[i * s:i * s + p] += 1.0
    return prof


def fold_weight(out_shape, psz, strides):
    """Analytic fold-of-ones: outer product of per-axis coverage counts."""
    T, H, W = out_shape
    (pt, ph, pw), (st, sh, sw) = psz, strides
    wt = _fold_profile_1d(T, pt, st)
    wh = _fold_profile_1d(H, ph, sh)
    ww = _fold_profile_1d(W, pw, sw)
    return wt[:, None, None] * wh[None, :, None] * ww[None, None, :]


# ---------------------------------------------------------------------------
# temporal NN search (ref utils_vid.py:72-142)
# ---------------------------------------------------------------------------

def _pairwise_sqdist(X, Y):
    """X: (B, n, d); Y: (B, m, d) -> (B, n, m) f32, normalized by d.

    bf16 inputs are exact: bf16 x bf16 products are representable in
    the f32 accumulator (the native MXU mode), so the distances equal
    the f32-upcast computation bit-for-bit up to reduction order.
    """
    hi = jax.lax.Precision.HIGHEST
    f32 = jnp.float32
    xx = jnp.einsum("bnd,bnd->bn", X, X, precision=hi,
                    preferred_element_type=f32)[..., :, None]
    yy = jnp.einsum("bmd,bmd->bm", Y, Y, precision=hi,
                    preferred_element_type=f32)[..., None, :]
    xy = jnp.einsum("bnd,bmd->bnm", X, Y, precision=hi,
                    preferred_element_type=f32)
    return (xx + yy - 2.0 * xy) / X.shape[-1]


def _pairwise_ssim_dist(X, Y):
    """Global-statistics SSIM similarity between all patch pairs.

    Counterpart of the reference's 'ssim' patch distance
    (utils_vid.py:89-106, win 3 on tiny patches ~ whole-patch
    statistics).  X: (B, n, d); Y: (B, m, d); returns (B, n, m) where
    LOWER = more similar (we negate SSIM so argmin semantics match the
    mse distance; the reference feeds raw SSIM to argmin, which selects
    the most DISsimilar patch — an apparent bug in an unused path we do
    not reproduce).
    """
    C1 = 0.01 ** 2
    C2 = 0.03 ** 2
    d = X.shape[-1]
    mx = jnp.mean(X, axis=-1)
    my = jnp.mean(Y, axis=-1)
    vx = jnp.var(X, axis=-1)
    vy = jnp.var(Y, axis=-1)
    hi = jax.lax.Precision.HIGHEST
    xy = jnp.einsum("bnd,bmd->bnm", X, Y, precision=hi) / d
    cov = xy - mx[..., :, None] * my[..., None, :]
    num = (2 * mx[..., :, None] * my[..., None, :] + C1) * (2 * cov + C2)
    den = ((mx ** 2)[..., :, None] + (my ** 2)[..., None, :] + C1) \
        * (vx[..., :, None] + vy[..., None, :] + C2)
    return 1.0 - num / den


DIST_FNS = {"mse": _pairwise_sqdist, "ssim": _pairwise_ssim_dist}


def nn_indices(X, Y, alpha=None, dist_fn="mse"):
    """Per-batch nearest neighbor of each X row among Y rows, with the
    optional completeness normalization: distances are divided column-wise
    by (alpha + min_i dist(i, j)) so rarely-used targets become cheaper
    (the paper's alpha term; ref utils_vid.py:122-142)."""
    return nn_indices_from_dist(DIST_FNS[dist_fn](X, Y), alpha)


def nn_indices_from_dist(dist, alpha=None):
    """`nn_indices` on a precomputed (B, n, m) distance matrix."""
    if alpha is not None:
        col_min = jnp.min(dist, axis=1, keepdims=True)
        dist = dist / (alpha + col_min)
    return jnp.argmin(dist, axis=2)


def banded_temporal_dist(d1, pt, st, ntx, nty):
    """Temporal-patch distances as a banded sum of per-frame distances:
    dist(i, j) = sum_k d1(i*st + k, j*st + k), k in [0, pt).  d1:
    (B, Fx, Fy) per-frame patch distances.  Shared by the training-loss
    decomposition below and the eval NN metrics (eval/nnmse.py)."""
    return sum(
        jax.lax.slice(d1, (0, k, k),
                      (d1.shape[0], k + (ntx - 1) * st + 1,
                       k + (nty - 1) * st + 1), (1, st, st))
        for k in range(pt))


def _nn_retarget_temporal(x, y, psz, strides, alpha):
    """`nn_retarget`, temporally decomposed (see eval/nnmse.py for the
    derivation): temporal patches at stride st share all but st frames,
    so the (ntx, nty) patch distance matrix is a banded sum of ONE
    per-frame patch distance matrix — F^2 vs ntx*nty*pt GEMM FLOPs and
    pt-times less patch materialization (the layout-padding relief
    matters most for the 11x11 ref-view config).  The banded sum is
    divided by pt so the alpha completeness normalization sees the same
    scale as the direct form.  mse distance only."""
    C = x.shape[0]
    (pt, p, p2), (st, s, s2) = psz, strides
    if jax.default_backend() != "cpu":
        Px = extract_patches_flat(x, (1, p, p2), (1, s, s2))
        Py = extract_patches_flat(y, (1, p, p2), (1, s, s2))
    else:          # identity-kernel convs are slow on the CPU backend
        Px8 = extract_patches_3d(x, (1, p, p2), (1, s, s2))
        Px = Px8.reshape(Px8.shape[:3] + (-1,))
        Py8 = extract_patches_3d(y, (1, p, p2), (1, s, s2))
        Py = Py8.reshape(Py8.shape[:3] + (-1,))
    Fx, nh, nw, fdim = Px.shape
    Fy = Py.shape[0]
    ntx = (Fx - pt) // st + 1
    nty = (Fy - pt) // st + 1
    Xf = Px.reshape(Fx, nh * nw, fdim).transpose(1, 0, 2)
    Yf = Py.reshape(Fy, nh * nw, fdim).transpose(1, 0, 2)
    d1 = _pairwise_sqdist(Xf, Yf)                  # (ncol, Fx, Fy)
    dist = banded_temporal_dist(d1, pt, st, ntx, nty) / pt
    nns = nn_indices_from_dist(dist, alpha)        # (ncol, ntx)
    sel_frames = []
    for k in range(pt):
        yk = jax.lax.slice(Yf, (0, k, 0),
                           (Yf.shape[0], k + (nty - 1) * st + 1, fdim),
                           (1, st, 1))
        sk = jnp.take_along_axis(yk, nns[..., None], axis=1)
        sel_frames.append(sk.reshape(nh * nw, ntx, C, p, p2))
    # flat channel order is (C, dt, dy, dx): stack dt AFTER C
    sel = jnp.stack(sel_frames, axis=3)            # (ncol, ntx, C, pt, p, p2)
    sel = sel.reshape(nh * nw, ntx, C * pt * p * p2)
    sel = sel.transpose(1, 0, 2).reshape(ntx, nh, nw, -1)
    return fold_patches_flat(sel, C, psz, strides)


def nn_retarget(x, y, psz, strides, alpha=None, dist_fn="mse",
                fast_nn_dist=False):
    """Build the retargeted pseudo-ground-truth: for every 3D patch of x,
    its temporal NN patch of y (same spatial location), folded back.

    x: (C, Tx, H, W); y: (C, Ty, H, W)  (H, W already patch-fitted).
    Returns (y2x_sum (C,Tx,H,W), used with `fold_weight`).
    Parity: utils_vid.py:206-229 (FindNNpatchAndMerge).

    fast_nn_dist (--fast_nn_dist): temporally-decomposed NN search —
    exact up to float summation order (argmin ties may resolve
    differently).
    """
    C = x.shape[0]
    # backend dispatch: the conv-based flat path avoids catastrophic TPU
    # layout padding (minor dims = patch extents) and runs on the MXU,
    # but identity-kernel convs are slow on the CPU backend.
    use_flat = jax.default_backend() != "cpu"
    if fast_nn_dist and dist_fn == "mse" and psz[0] > 1:
        return _nn_retarget_temporal(x, y, psz, strides, alpha)
    if use_flat:
        Xp = extract_patches_flat(x, psz, strides)  # (ntx, nh, nw, dim)
        Yp = extract_patches_flat(y, psz, strides)
        ntx, nh, nw, dim = Xp.shape
        nty = Yp.shape[0]
    else:
        Xp8 = extract_patches_3d(x, psz, strides)
        Yp8 = extract_patches_3d(y, psz, strides)
        ntx, nh, nw = Xp8.shape[:3]
        nty = Yp8.shape[0]
        dim = int(np.prod(Xp8.shape[3:]))
        Xp = Xp8.reshape(ntx, nh, nw, dim)
        Yp = Yp8.reshape(nty, nh, nw, dim)
    Xf = Xp.reshape(ntx, nh * nw, dim).transpose(1, 0, 2)
    Yf = Yp.reshape(nty, nh * nw, dim).transpose(1, 0, 2)
    nns = nn_indices(Xf, Yf, alpha, dist_fn)       # (B, ntx)
    sel = jnp.take_along_axis(Yf, nns[..., None], axis=1)  # (B, ntx, dim)
    sel = sel.transpose(1, 0, 2).reshape(ntx, nh, nw, dim)
    if use_flat:
        return fold_patches_flat(sel, C, psz, strides)
    return fold_patches_3d(
        sel.reshape((ntx, nh, nw) + Xp8.shape[3:]), x.shape[1:], strides)


# ---------------------------------------------------------------------------
# macro-block (low-memory) retarget (ref utils_vid.py:289-349)
# ---------------------------------------------------------------------------

def _macro_starts(size, macro, p, s):
    """Crop starts.  The reference lets the last block be ragged
    (truncated); we clamp the last start to (size - macro) instead so all
    crops share one static shape — same coverage, slightly more overlap."""
    stride = macro - p + s
    starts = list(range(0, size - macro + stride, stride))
    starts = [min(st, size - macro) for st in starts]
    return sorted(set(starts))


@functools.lru_cache(maxsize=64)
def _lm_plan(shape_x_t, shape_y_t, h, w, psz, strides, macro):
    """Static planning: fitted sizes, crop starts, total fold weight."""
    (pt, p, _), (st, s, _) = psz, strides
    macro = fit_patch_size(macro, p, s)
    fit_h = fit_patch_size(h, p, s)
    fit_w = fit_patch_size(w, p, s)
    fit_tx = fit_patch_size(shape_x_t, pt, st)
    macro = min(macro, fit_h, fit_w)
    hs = _macro_starts(fit_h, macro, p, s)
    ws = _macro_starts(fit_w, macro, p, s)
    weight = np.zeros((fit_tx, fit_h, fit_w), np.float32)
    w_crop = fold_weight((fit_tx, macro, macro), psz, strides)
    for h0 in hs:
        for w0 in ws:
            weight[:, h0:h0 + macro, w0:w0 + macro] += w_crop
    weight = np.clip(weight, 1e-10, None)
    return macro, fit_tx, fit_h, fit_w, tuple(hs), tuple(ws), weight


def gpnn_lowmem_retarget(x, y, patch_size=7, patcht_size=7, stride=2,
                         stridet=2, alpha=None, macro_block=64,
                         dist_fn="mse", fast_nn_dist=False):
    """Macro-block NN retarget.  x: (C, Tx, H, W) render (loop-padded);
    y: (C, Ty, H, W) ground truth.  Returns y2x (C, fit_tx, fit_h, fit_w)
    already weight-normalized, and the fitted sizes."""
    psz = (patcht_size, patch_size, patch_size)
    strides = (stridet, stride, stride)
    C, Tx, H, W = x.shape
    macro, fit_tx, fit_h, fit_w, hs, ws, weight_np = _lm_plan(
        Tx, y.shape[1], H, W, psz, strides, macro_block)
    fit_ty = fit_patch_size(y.shape[1], patcht_size, stridet)
    x = x[:, :fit_tx, :fit_h, :fit_w]
    y = y[:, :fit_ty, :fit_h, :fit_w]

    x_crops = jnp.stack([x[..., h0:h0 + macro, w0:w0 + macro]
                         for h0 in hs for w0 in ws])
    y_crops = jnp.stack([y[..., h0:h0 + macro, w0:w0 + macro]
                         for h0 in hs for w0 in ws])

    # chunk the crop fan-out by the ACTUAL patch-tensor footprint, not
    # the patch size: lax.map serializes in chunks, and the fixed
    # chunk=2 this replaced left the production 11x11 ref-view config
    # running ~12 sequential dispatches of tiny GEMMs — 500 ms/step of
    # pure serialization at <25% HBM and 0.12% MFU (round-4 profile).
    # ~6 patch-tensor-sized f32 buffers are live per crop pair
    # (Xp/Yp, their Xf/Yf transposes, sel, fold).  The two production
    # configs want OPPOSITE budgets (v5e sweeps at production scale):
    # the 3x3 other-view config runs next to an HBM-edge render step
    # and pages above ~1.5 GB of concurrent loss temps (chunk ~12
    # @ 1.2 GB -> 249 ms, all 15 crops @ 1.9 GB -> 294), while the
    # 11x11 ref-view config is utilization-bound — few, wide GEMMs —
    # and wants every crop in flight (budget 1.5e9 -> 643 ms,
    # 4e9 -> 453, 8e9 -> 441).  The flat patch GEMM width `dim_c`
    # separates them: wide-patch configs (dim >= 512) get an 8 GB
    # budget, narrow ones 1.2 GB (VL3D_LM_CHUNK_BUDGET overrides).
    nt_c = n_patches(fit_tx, patcht_size, stridet)
    nhw_c = n_patches(macro, patch_size, stride)
    dim_c = C * patcht_size * patch_size * patch_size
    per_crop = 6 * nt_c * nhw_c * nhw_c * dim_c * 4
    default_budget = 8e9 if dim_c >= 512 else 1.2e9
    budget_env = os.environ.get("VL3D_LM_CHUNK_BUDGET")
    budget = float(budget_env) if budget_env else default_budget
    # Floor the DEFAULT at 4 concurrent crops (the latency sweet spot in
    # the budget sweep above), but let an explicit VL3D_LM_CHUNK_BUDGET
    # drive chunk all the way down to 1 — the escape hatch for
    # HBM-edge configs must be able to actually shrink memory.
    floor = 1 if budget_env else 4
    chunk = max(1, min(len(x_crops),
                       max(floor, int(budget / max(per_crop, 1)))))
    y2x_crops = jax.lax.map(
        lambda xy: nn_retarget(xy[0], xy[1], psz, strides, alpha,
                               dist_fn, fast_nn_dist),
        (x_crops, y_crops), batch_size=chunk)       # (Nc, C, fit_tx, mb, mb)

    y2x = jnp.zeros((C, fit_tx, fit_h, fit_w), y2x_crops.dtype)
    ci = 0
    for h0 in hs:
        for w0 in ws:
            y2x = y2x.at[..., h0:h0 + macro, w0:w0 + macro] \
                .add(y2x_crops[ci])
            ci += 1
    y2x = y2x / jnp.asarray(weight_np)[None]
    return y2x, (fit_tx, fit_h, fit_w)


# ---------------------------------------------------------------------------
# public loss functions (registry parity: ref MPV.py:131-138)
# ---------------------------------------------------------------------------

def _norm_alpha(alpha):
    """alpha > 100 means 'disabled' (ref utils_vid.py:208)."""
    if alpha is None or alpha > 100:
        return None
    return alpha


def _nn_cast(xs, ys, nn_bf16):
    """Cast the stop-gradient NN inputs to bf16 when requested — the
    search, selection, and fold never carry gradients, so the fat patch
    tensors can live in half the bytes (distances still accumulate f32
    on the MXU; the folded target is f32)."""
    if nn_bf16:
        return xs.astype(jnp.bfloat16), ys.astype(jnp.bfloat16)
    return xs, ys


def gpnn_lowmem_loss(x, y, *, patch_size=7, patcht_size=7, stride=2,
                     stridet=2, alpha=1e10, rou=0, scaling=0.2,
                     macro_block=64, dist_fn="mse", fast_nn_dist=False,
                     nn_bf16=False, **_):
    """'gpnn_lm': the default stage-2 looping loss.  x: (C, Tx, H, W)
    render (grad flows); y: (C, Ty, H, W) GT video.  The NN/fold target is
    computed under stop_gradient — gradients only flow through
    robust(x - y2x) (ref utils_vid.py:322-348 runs NN under no_grad)."""
    xs, ys = _nn_cast(jax.lax.stop_gradient(x), jax.lax.stop_gradient(y),
                      nn_bf16)
    y2x, (ft, fh, fw) = gpnn_lowmem_retarget(
        xs, ys,
        patch_size=patch_size, patcht_size=patcht_size, stride=stride,
        stridet=stridet, alpha=_norm_alpha(alpha), macro_block=macro_block,
        dist_fn=dist_fn, fast_nn_dist=fast_nn_dist)
    diff = x[:, :ft, :fh, :fw] - y2x
    return jnp.mean(robust_lossfun(diff, rou, scaling))


def gpnn_direct_loss(x, y, *, patch_size=7, patcht_size=7, stride=1,
                     stridet=1, alpha=1e10, rou=0, scaling=0.2,
                     dist_fn="mse", fast_nn_dist=False, nn_bf16=False,
                     **_):
    """'gpnn': whole-patch NN without macro blocks
    (ref utils_vid.py:265-287)."""
    psz = (patcht_size, patch_size, patch_size)
    strides = (stridet, stride, stride)
    fh = fit_patch_size(x.shape[2], patch_size, stride)
    fw = fit_patch_size(x.shape[3], patch_size, stride)
    ft = fit_patch_size(x.shape[1], patcht_size, stridet)
    fty = fit_patch_size(y.shape[1], patcht_size, stridet)
    xs = jax.lax.stop_gradient(x)[:, :ft, :fh, :fw]
    ys = jax.lax.stop_gradient(y)[:, :fty, :fh, :fw]
    xs, ys = _nn_cast(xs, ys, nn_bf16)
    y2x = nn_retarget(xs, ys, psz, strides, _norm_alpha(alpha), dist_fn,
                      fast_nn_dist)
    weight = jnp.asarray(
        np.clip(fold_weight((ft, fh, fw), psz, strides), 1e-10, None))
    y2x = y2x / weight[None]
    diff = x[:, :ft, :fh, :fw] - y2x
    return jnp.mean(robust_lossfun(diff, rou, scaling))


@functools.lru_cache(maxsize=64)
def _down_plan(Tx, Ty, H, W, psz, strides, macro, f):
    """Static planning for gpnn_down: fitted sizes at the downsampled
    scale, macro-crop starts at both scales, full-res fold weight+mask."""
    (pt, p, _), (st, s, _) = psz, strides
    assert p >= s, "gpnn_down needs patch_size >= stride"
    hd, wd = H // f, W // f
    fhd = fit_patch_size(hd, p, s)
    fwd = fit_patch_size(wd, p, s)
    ftx = fit_patch_size(Tx, pt, st)
    fty = fit_patch_size(Ty, pt, st)
    fh, fw = fhd * f, fwd * f
    macro = fit_patch_size(min(macro, fhd, fwd), p, s)
    hs = _macro_starts(fhd, macro, p, s)
    ws = _macro_starts(fwd, macro, p, s)
    nL = n_patches(macro, p, s)                  # low-res patches per axis
    span = (nL * f - 1) * s + p                  # full-res crop extent
    off = (p * (f - 1)) // 2                     # center patches on parents
    hs_full = tuple(min(h0 * f + off, fh - span) for h0 in hs)
    ws_full = tuple(min(w0 * f + off, fw - span) for w0 in ws)
    w_crop = fold_weight((ftx, span, span), psz, (st, s, s))
    weight = np.zeros((ftx, fh, fw), np.float32)
    for h0 in hs_full:
        for w0 in ws_full:
            weight[:, h0:h0 + span, w0:w0 + span] += w_crop
    mask = (weight > 0).astype(np.float32)
    return (fhd, fwd, ftx, fty, fh, fw, macro, tuple(hs), tuple(ws),
            nL, span, hs_full, ws_full, np.clip(weight, 1e-10, None), mask)


def gpnn_downsample_loss(x, y, *, patch_size=7, patcht_size=7, stride=2,
                         stridet=2, alpha=1e10, rou=0, scaling=0.2,
                         macro_block=64, factor=1, dist_fn="mse",
                         fast_nn_dist=False, nn_bf16=False, **_):
    """'gpnn_down': NN indices found on a bilinearly-downsampled video,
    ``repeat_interleave``-upsampled to the full-res patch grid, then used
    to gather SAME-SIZE full-res patches which are folded back (ref
    utils_vid.py:352-434 Patch3DGPNNLowMemDownSampleLoss +
    FindDownSampleNNAndMerge:244-263).  With factor <= 1 it reduces to
    gpnn_lm (the reference class is only coherent for factor 2).

    Index-upsampling scheme (ref utils_vid.py:245-248): each full-res
    patch at grid position i (stride `stride`, offset (p*(f-1))//2 so
    patches center on their low-res parents, ref :404-405 for f=2)
    inherits the temporal NN of low-res patch i // factor.

    Deliberate deviations from the reference text, which crashes when run
    (its full-res re-gather reshapes an n_full-patch grid by the low-res
    patch count, utils_vid.py:250-253, and its start arithmetic hardcodes
    factor 2): the full-res grid is sized so every full-res patch has a
    parent (n_full = n_low*factor exactly), and voxels never covered by a
    folded patch are excluded from the loss instead of dividing 0/0.
    """
    if factor <= 1:
        return gpnn_lowmem_loss(
            x, y, patch_size=patch_size, patcht_size=patcht_size,
            stride=stride, stridet=stridet, alpha=alpha, rou=rou,
            scaling=scaling, macro_block=macro_block, dist_fn=dist_fn,
            fast_nn_dist=fast_nn_dist, nn_bf16=nn_bf16)
    f = int(factor)
    p, pt, s, st = patch_size, patcht_size, stride, stridet
    psz = (pt, p, p)
    strides = (st, s, s)
    C, Tx, H, W = x.shape
    (fhd, fwd, ftx, fty, fh, fw, macro, hs, ws, nL, span, hs_full,
     ws_full, weight_np, mask_np) = _down_plan(
        Tx, y.shape[1], H, W, psz, strides, macro_block, f)
    alpha = _norm_alpha(alpha)

    xs = jax.lax.stop_gradient(x)[:, :ftx, :fh, :fw]
    ys = jax.lax.stop_gradient(y)[:, :fty, :fh, :fw]
    xs, ys = _nn_cast(xs, ys, nn_bf16)
    x_down = jax.image.resize(xs, (C, ftx, fhd, fwd), "linear")
    y_down = jax.image.resize(ys, (C, fty, fhd, fwd), "linear")

    xd_crops = jnp.stack([x_down[..., h0:h0 + macro, w0:w0 + macro]
                          for h0 in hs for w0 in ws])
    yd_crops = jnp.stack([y_down[..., h0:h0 + macro, w0:w0 + macro]
                          for h0 in hs for w0 in ws])
    yf_crops = jnp.stack([ys[..., h0:h0 + span, w0:w0 + span]
                          for h0 in hs_full for w0 in ws_full])

    def crop_retarget(args_):
        xd, yd, yf = args_
        # low-res temporal NN per spatial column
        Xp = extract_patches_3d(xd, psz, strides)
        Yp = extract_patches_3d(yd, psz, strides)
        ntx = Xp.shape[0]
        nty = Yp.shape[0]
        dim = int(np.prod(Xp.shape[3:]))
        nns = nn_indices(
            Xp.reshape(ntx, nL * nL, dim).transpose(1, 0, 2),
            Yp.reshape(nty, nL * nL, dim).transpose(1, 0, 2),
            alpha, dist_fn)                               # (nL*nL, ntx)
        # repeat_interleave over both spatial axes (ref :245-248)
        nns_up = nns.reshape(nL, nL, ntx)
        nns_up = jnp.repeat(jnp.repeat(nns_up, f, axis=0), f, axis=1)
        nF = nL * f
        nns_up = nns_up.reshape(nF * nF, ntx)
        # gather full-res patches of y at the upsampled index grid
        Yfp = extract_patches_3d(yf, psz, strides)        # (nty,nF,nF,...)
        dimF = int(np.prod(Yfp.shape[3:]))
        Yff = Yfp.reshape(nty, nF * nF, dimF).transpose(1, 0, 2)
        sel = jnp.take_along_axis(Yff, nns_up[..., None], axis=1)
        sel = sel.transpose(1, 0, 2).reshape((ntx, nF, nF) + Yfp.shape[3:])
        return fold_patches_3d(sel, (ftx, span, span), strides)

    chunk = max(1, min(len(xd_crops), 8 if p <= 7 else 2))
    y2x_crops = jax.lax.map(crop_retarget, (xd_crops, yd_crops, yf_crops),
                            batch_size=chunk)

    y2x = jnp.zeros((C, ftx, fh, fw), x.dtype)
    ci = 0
    for h0 in hs_full:
        for w0 in ws_full:
            y2x = y2x.at[..., h0:h0 + span, w0:w0 + span].add(
                y2x_crops[ci])
            ci += 1
    y2x = y2x / jnp.asarray(weight_np)[None]
    mask = jnp.asarray(mask_np)[None]
    diff = (x[:, :ftx, :fh, :fw] - y2x) * mask   # robust(0) == 0 outside
    return jnp.sum(robust_lossfun(diff, rou, scaling)) \
        / (jnp.sum(mask) * C)


def video_mse_loss(x, y, **_):
    """'mse' (ref utils_vid.py:437-440)."""
    f = min(x.shape[1], y.shape[1])
    return jnp.mean((x[:, :f] - y[:, :f]) ** 2)


def video_avg_loss(x, y, **_):
    """'avg': match temporal means (ref utils_vid.py:443-445)."""
    return jnp.mean((jnp.mean(x, axis=1) - jnp.mean(y, axis=1)) ** 2)
