"""Fused decode + static/dyn select + over-composite + regularizers.

The unfused stage-2 render materializes every (S, h, w, F[, C]) stage —
decoded rgb/alpha stacks, the select, the reverse-cumprod transmittance,
blend weights — and autodiff saves them as residuals, so at production
scale (S=12-15, 180x320 patch, 50 frames) the step moves several GB of
pure intermediates per direction and sits HBM-bound (round-3 profile:
decode bwd ~15 ms, composite bwd ~9 ms, smooth-reg bwd ~10 ms, plus the
matching forward passes).

This module computes the whole chain as ONE custom-vjp function whose
only residuals are the (bf16) gathered texel values and the hit masks —
nothing S-shaped is saved.  The backward recomputes decode/composite
in-register (unrolled over the static slot axis so XLA fuses it) and
emits texel-value cotangents directly, using a division-free reverse
sweep of the sequential composite:

    forward  (near -> far):  T_in[i] = prod_{j>i}(1 - a_j)
    backward (far -> near):  da_i = T_in[i] * (g_i - dT)
                             dT  <- a_i * g_i + (1 - a_i) * dT

where g_i = <rgb_i, g_out> + g_alpha_sum + dinv_i * g_disp.  Exactness
is tested against jax.grad of the unfused path (tests/test_fused.py).

Scope: the shipped stage-2 config (rgb_mlp_type=direct, sigmoid rgb and
alpha activations); the model falls back to the unfused path otherwise.
Non-diff contract: the VJP returns a ZERO cotangent for ``dinv`` even
though ``disp`` depends on it — dinv derives from camera geometry, never
from parameters, and the call site (models/mpv.py) wraps it in
stop_gradient to make that explicit.  A future learnable-depth caller
must extend ``_fused_bwd`` with the true per-slot cotangent
(sum over F of g_disp * bw) before removing that stop_gradient.
Parity: the math is the reference's MPV.py:425-475 composite +
MPV.py:511-551 regularizers, reassociated (sequential product instead of
a scan tree), so rendered values match to float-reassociation level.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FusedCfg:
    n_planes: int                 # sparsity normalization (mpi_d)
    use_sparsity: bool
    use_rgb_smooth: bool
    use_a_smooth: bool
    want_disp: bool
    sp_eps: float = 1e-4


def _zero_ct(x):
    """Cotangent for a non-differentiable (bool/int) primal."""
    return np.zeros(x.shape, jax.dtypes.float0)


def _decode_slot(vals_s, m_s, vals_d, hit_d, m_d, s):
    """Per-slot decoded (rgb, alpha) with the static/dyn select.

    Returns rgb (h, w, F, 3), alpha (h, w, F) and the pre-mask sigmoids
    needed by the backward.  Mirrors mpv.MPMeshVid.render's decode +
    where(hit_d, ...) select exactly.
    """
    va_d = vals_d[s].astype(jnp.float32)               # (h, w, F, C)
    va_s = vals_s[s].astype(jnp.float32)               # (h, w, C)
    sig_d = jax.nn.sigmoid(va_d)
    sig_s = jax.nn.sigmoid(va_s)
    md = m_d[s][..., None]                             # (h, w, 1)
    ms = m_s[s][..., None]
    rgb_d = sig_d[..., :3] * md[..., None]             # (h, w, F, 3)
    a_d = jnp.where(m_d[s][..., None], sig_d[..., 3], 0.0)
    rgb_s = sig_s[..., :3] * ms                        # (h, w, 3)
    a_s = jnp.where(m_s[s], sig_s[..., 3], 0.0)        # (h, w)
    hd = hit_d[s][..., None]                           # (h, w, 1)
    rgb = jnp.where(hd[..., None], rgb_d, rgb_s[..., None, :])
    alpha = jnp.where(hd, a_d, a_s[..., None])         # (h, w, F)
    return rgb, alpha, sig_d, sig_s


def _smooth_sums(x, h_axis, w_axis):
    dx = jnp.sum(jnp.abs(jnp.diff(x, axis=w_axis)))
    dy = jnp.sum(jnp.abs(jnp.diff(x, axis=h_axis)))
    return dx, dy


def _smooth_grad(x, g_dx, g_dy, h_axis, w_axis):
    """d/dx of sum|diff_w(x)| * g_dx + sum|diff_h(x)| * g_dy."""
    sx = jnp.sign(jnp.diff(x, axis=w_axis))
    sy = jnp.sign(jnp.diff(x, axis=h_axis))

    def spread(s, axis):
        pad_lo = [(0, 0)] * x.ndim
        pad_lo[axis] = (1, 0)
        pad_hi = [(0, 0)] * x.ndim
        pad_hi[axis] = (0, 1)
        return jnp.pad(s, pad_lo) - jnp.pad(s, pad_hi)

    return g_dx * spread(sx, w_axis % x.ndim) \
        + g_dy * spread(sy, h_axis % x.ndim)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_composite(cfg: FusedCfg, vals_s, m_s, vals_d, hit_d, m_d, dinv):
    """(out (h,w,F,3), alpha_sum (h,w,F), disp (h,w,F), regs dict).

    vals_s: (S, h, w, C) texels; vals_d: (S, h, w, F, C);
    m_s / hit_d / m_d: (S, h, w) bool; dinv: (S, h, w) f32 (per-slot
    masked reciprocal depth; only read when cfg.want_disp).
    """
    out, _ = _fused_fwd(cfg, vals_s, m_s, vals_d, hit_d, m_d, dinv)
    return out


def _fused_fwd(cfg, vals_s, m_s, vals_d, hit_d, m_d, dinv):
    S, h, w, F, C = vals_d.shape
    assert C == 4 and vals_s.shape == (S, h, w, C), (vals_d.shape,
                                                     vals_s.shape)
    f32 = jnp.float32
    T = jnp.ones((h, w, F), f32)
    out = jnp.zeros((h, w, F, 3), f32)
    asum = jnp.zeros((h, w, F), f32)
    disp = jnp.zeros((h, w, F), f32)
    sp_l1 = jnp.zeros((h, w, F), f32)
    sp_l2sq = jnp.zeros((h, w, F), f32)
    rs_dx = rs_dy = as_dx = as_dy = jnp.zeros((), f32)

    # composite near -> far (storage is far-first: slot S-1 is nearest)
    for s in range(S - 1, -1, -1):
        rgb, alpha, _, _ = _decode_slot(vals_s, m_s, vals_d, hit_d, m_d, s)
        bw = alpha * T
        out = out + rgb * bw[..., None]
        asum = asum + bw
        if cfg.want_disp:
            disp = disp + dinv[s][..., None] * bw
        T = T * (1.0 - alpha)
        if cfg.use_sparsity:
            sp_l1 = sp_l1 + jnp.abs(alpha)
            sp_l2sq = sp_l2sq + alpha * alpha
        if cfg.use_rgb_smooth:
            dx, dy = _smooth_sums(rgb, h_axis=0, w_axis=1)
            rs_dx, rs_dy = rs_dx + dx, rs_dy + dy
        if cfg.use_a_smooth:
            dx, dy = _smooth_sums(alpha, h_axis=0, w_axis=1)
            as_dx, as_dy = as_dx + dx, as_dy + dy

    regs = {}
    if cfg.use_sparsity:
        l2 = jnp.clip(jnp.sqrt(sp_l2sq), cfg.sp_eps, None)
        regs["sparsity"] = jnp.mean(sp_l1 / l2) / math.sqrt(cfg.n_planes)
    if cfg.use_rgb_smooth:
        # same value as content_smooth_loss on the stacked (S,h,w,F,3)
        # array: mean over the diff arrays
        regs["rgb_smooth"] = rs_dx / (S * h * (w - 1) * F * 3) \
            + rs_dy / (S * (h - 1) * w * F * 3)
    if cfg.use_a_smooth:
        regs["a_smooth"] = as_dx / (S * h * (w - 1) * F) \
            + as_dy / (S * (h - 1) * w * F)
    disp_out = disp if cfg.want_disp else None
    return ((out, asum, disp_out, regs),
            (vals_s, m_s, vals_d, hit_d, m_d, dinv))


def _fused_bwd(cfg, res, cts):
    vals_s, m_s, vals_d, hit_d, m_d, dinv = res
    g_out, g_asum, g_disp, g_regs = cts
    S, h, w, F, C = vals_d.shape
    f32 = jnp.float32
    g_sp = g_regs.get("sparsity", jnp.zeros((), f32)) if cfg.use_sparsity \
        else jnp.zeros((), f32)
    g_rs_dx = g_rs_dy = g_as_dx = g_as_dy = jnp.zeros((), f32)
    if cfg.use_rgb_smooth:
        g_rs = g_regs["rgb_smooth"]
        g_rs_dx = g_rs / (S * h * (w - 1) * F * 3)
        g_rs_dy = g_rs / (S * (h - 1) * w * F * 3)
    if cfg.use_a_smooth:
        g_as = g_regs["a_smooth"]
        g_as_dx = g_as / (S * h * (w - 1) * F)
        g_as_dy = g_as / (S * (h - 1) * w * F)

    # sweep A (near -> far): recompute decode + per-slot incoming
    # transmittance; cache per-slot tensors (fused by XLA, the slot axis
    # is a static unroll)
    rgbs, alphas, sig_ds, sig_ss = [None] * S, [None] * S, [None] * S, \
        [None] * S
    T_in = [None] * S
    T = jnp.ones((h, w, F), f32)
    sp_l1 = jnp.zeros((h, w, F), f32)
    sp_l2sq = jnp.zeros((h, w, F), f32)
    for s in range(S - 1, -1, -1):
        rgb, alpha, sig_d, sig_s = _decode_slot(
            vals_s, m_s, vals_d, hit_d, m_d, s)
        rgbs[s], alphas[s], sig_ds[s], sig_ss[s] = rgb, alpha, sig_d, sig_s
        T_in[s] = T
        T = T * (1.0 - alpha)
        if cfg.use_sparsity:
            sp_l1 = sp_l1 + jnp.abs(alpha)
            sp_l2sq = sp_l2sq + alpha * alpha

    sp_a_coef = sp_b_coef = None
    if cfg.use_sparsity:
        # d/da_i of mean(l1/clip(sqrt(l2sq), eps))/sqrt(D):
        #   sign(a_i)/l2c - (l2 >= eps) * l1 * a_i / (l2c^2 * l2)
        npix = h * w * F
        l2 = jnp.sqrt(sp_l2sq)
        l2c = jnp.clip(l2, cfg.sp_eps, None)
        scale = g_sp / (npix * math.sqrt(cfg.n_planes))
        sp_a_coef = scale / l2c                       # * sign(a_i)
        sp_b_coef = jnp.where(
            l2 >= cfg.sp_eps,
            scale * sp_l1 / (l2c * l2c * jnp.maximum(l2, cfg.sp_eps)),
            0.0)                                      # * a_i

    # sweep B (far -> near): division-free composite cotangents
    d_vals_s = [None] * S
    d_vals_d = [None] * S
    dT = jnp.zeros((h, w, F), f32)
    for s in range(S):
        rgb, alpha = rgbs[s], alphas[s]
        g_i = jnp.sum(rgb * g_out, axis=-1) + g_asum
        if cfg.want_disp:
            g_i = g_i + dinv[s][..., None] * g_disp
        bw = alpha * T_in[s]
        da = T_in[s] * (g_i - dT)
        dT = alpha * g_i + (1.0 - alpha) * dT
        d_rgb = bw[..., None] * g_out                 # (h, w, F, 3)
        if cfg.use_sparsity:
            da = da + sp_a_coef * jnp.sign(alpha) - sp_b_coef * alpha
        if cfg.use_rgb_smooth:
            d_rgb = d_rgb + _smooth_grad(rgb, g_rs_dx, g_rs_dy,
                                         h_axis=0, w_axis=1)
        if cfg.use_a_smooth:
            da = da + _smooth_grad(alpha, g_as_dx, g_as_dy,
                                   h_axis=0, w_axis=1)

        # undo the static/dyn select, then the masks + sigmoids
        hd = hit_d[s][..., None]                       # (h, w, 1)
        da_d = jnp.where(hd, da, 0.0)
        da_s = jnp.sum(jnp.where(hd, 0.0, da), axis=-1)        # (h, w)
        d_rgb_d = jnp.where(hd[..., None], d_rgb, 0.0)
        d_rgb_s = jnp.sum(jnp.where(hd[..., None], 0.0, d_rgb), axis=-2)

        sig_d, sig_s = sig_ds[s], sig_ss[s]
        md = m_d[s][..., None]                         # (h, w, 1)
        ms = m_s[s][..., None]
        dva_d = jnp.concatenate([
            d_rgb_d * md[..., None]
            * (sig_d[..., :3] * (1.0 - sig_d[..., :3])),
            (jnp.where(m_d[s][..., None], da_d, 0.0)
             * sig_d[..., 3] * (1.0 - sig_d[..., 3]))[..., None],
        ], axis=-1)
        dva_s = jnp.concatenate([
            d_rgb_s * ms * (sig_s[..., :3] * (1.0 - sig_s[..., :3])),
            (jnp.where(m_s[s], da_s, 0.0)
             * sig_s[..., 3] * (1.0 - sig_s[..., 3]))[..., None],
        ], axis=-1)
        d_vals_d[s] = dva_d
        d_vals_s[s] = dva_s

    return (jnp.stack(d_vals_s).astype(vals_s.dtype), _zero_ct(m_s),
            jnp.stack(d_vals_d).astype(vals_d.dtype), _zero_ct(hit_d),
            _zero_ct(m_d), jnp.zeros_like(dinv))


fused_composite.defvjp(_fused_fwd, _fused_bwd)
