"""Stage-1 fused decode + composite + loop-mask composite + regularizers.

The stage-2 analog (render/fused.py) took the stage-2 step 260 -> 237 ms
by collapsing the decode/select/composite/regularizer chain into one
custom-vjp.  The stage-1 step has the same disease at smaller scale: the
round-4 profile split (ROADMAP.md item 6) shows ~21 of 57 ms in
decode/composite/regularizer fwd+bwd, almost all of it the BACKWARD
autodiff graph (reverse-cumprod transmittance cotangents, the L1/L2
sparsity quotient rule, |diff| smoothness temps) — the forward is ~2 ms.

This module computes decode (direct/sigmoid) + over-composite +
loop-mask composite (DETACHED alpha, ref MPI.py:578) + the sparsity /
rgb-smooth / a-smooth / l-smooth regularizers (ref MPI.py:602-650) as
ONE custom-vjp whose backward is two hand-written sweeps over the plane
axis (static Python unroll, fused by XLA):

    sweep A (near -> far): recompute decode + per-plane incoming
        transmittance T_in[i] = prod_{j nearer}(1 - a_j)
    sweep B (far -> near): division-free composite cotangents
        da_i = T_in[i] * (g_i - dT);  dT <- a_i * g_i + (1 - a_i) * dT

Residuals are the raw sampled features (exactly what autodiff would
save for the sigmoid backward anyway) — no blend-weight / transmittance
/ decoded-stack residuals at all.  Gradients match jax.grad of the
unfused path to f32 roundoff (tests/test_fused_s1.py).

Scope: the shipped stage-1 config (rgb_mlp_type=direct, sigmoid rgb and
alpha activations); models/mpmesh.py falls back to the unfused path
otherwise.  Non-diff contract: like the stage-2 module, the VJP returns
a ZERO cotangent for ``dinv`` (per-plane masked normalized disparity) —
it derives from camera geometry, and the call site stop_gradients it.

Layout: planes stored FAR -> NEAR on axis 1 (slot D-1 nearest), same as
render/renderer.py:composite_planes; all outputs match it to float
reassociation.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from videoloop3d_tpu.render.fused import _smooth_grad, _smooth_sums, \
    _zero_ct


@dataclass(frozen=True)
class FusedS1Cfg:
    n_planes: int
    use_sparsity: bool
    use_rgb_smooth: bool
    use_a_smooth: bool
    use_l_smooth: bool
    use_loop: bool                # mask_feats is real, composite a label
    want_disp: bool
    sp_eps: float = 1e-6


def _decode_plane(feats, valid, s):
    """Per-plane decoded (rgb (B,h,w,3), alpha (B,h,w)) + the sigmoid
    needed by the backward.  Mirrors MPMesh._decode for the direct /
    sigmoid config exactly: rgb = sigmoid(:3) * valid,
    alpha = where(valid, sigmoid(3), 0)."""
    va = feats[:, s].astype(jnp.float32)               # (B, h, w, 4)
    sig = jax.nn.sigmoid(va)
    v = valid[:, s]                                    # (B, h, w)
    rgb = sig[..., :3] * v[..., None]
    alpha = jnp.where(v, sig[..., 3], 0.0)
    return rgb, alpha, sig


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_composite_s1(cfg: FusedS1Cfg, feats, valid, mask_feats, dinv):
    """(out (B,h,w,3), alpha_sum (B,h,w), disp (B,h,w)|None,
    label (B,h,w,1)|None, regs dict of scalars).

    feats: (B, D, h, w, 4) raw atlas samples; valid: (B, D, h, w) bool;
    mask_feats: (B, D, h, w) raw loop-mask samples (only read when
    cfg.use_loop — pass a (1,1,1,1) dummy otherwise); dinv: (B, D, h, w)
    f32 per-plane masked normalized disparity (only read when
    cfg.want_disp — dummy otherwise).
    """
    out, _ = _fused_s1_fwd(cfg, feats, valid, mask_feats, dinv)
    return out


def _fused_s1_fwd(cfg, feats, valid, mask_feats, dinv):
    B, D, h, w, C = feats.shape
    assert C == 4, feats.shape
    f32 = jnp.float32
    T = jnp.ones((B, h, w), f32)
    out = jnp.zeros((B, h, w, 3), f32)
    asum = jnp.zeros((B, h, w), f32)
    disp = jnp.zeros((B, h, w), f32)
    label = jnp.zeros((B, h, w), f32)
    sp_l1 = jnp.zeros((B, h, w), f32)
    sp_l2sq = jnp.zeros((B, h, w), f32)
    rs_dx = rs_dy = as_dx = as_dy = ls_dx = ls_dy = jnp.zeros((), f32)

    # composite near -> far (storage far-first: slot D-1 is nearest)
    for s in range(D - 1, -1, -1):
        rgb, alpha, _ = _decode_plane(feats, valid, s)
        bw = alpha * T
        out = out + rgb * bw[..., None]
        asum = asum + bw
        if cfg.want_disp:
            disp = disp + dinv[:, s] * bw
        if cfg.use_loop:
            lp = jnp.where(valid[:, s],
                           jax.nn.sigmoid(mask_feats[:, s]), 0.0)
            # loop-mask composite uses DETACHED alpha (ref MPI.py:578)
            # — same bw VALUE, gradient blocked by construction here
            label = label + lp * bw
            if cfg.use_l_smooth:
                dx, dy = _smooth_sums(lp, h_axis=1, w_axis=2)
                ls_dx, ls_dy = ls_dx + dx, ls_dy + dy
        T = T * (1.0 - alpha)
        if cfg.use_sparsity:
            sp_l1 = sp_l1 + jnp.abs(alpha)
            sp_l2sq = sp_l2sq + alpha * alpha
        if cfg.use_rgb_smooth:
            dx, dy = _smooth_sums(rgb, h_axis=1, w_axis=2)
            rs_dx, rs_dy = rs_dx + dx, rs_dy + dy
        if cfg.use_a_smooth:
            dx, dy = _smooth_sums(alpha, h_axis=1, w_axis=2)
            as_dx, as_dy = as_dx + dx, as_dy + dy

    regs = {}
    if cfg.use_sparsity:
        l2 = jnp.clip(jnp.sqrt(sp_l2sq), cfg.sp_eps, None)
        regs["sparsity"] = jnp.mean(sp_l1 / l2) / math.sqrt(cfg.n_planes)
    if cfg.use_rgb_smooth:
        regs["rgb_smooth"] = rs_dx / (B * D * h * (w - 1) * 3) \
            + rs_dy / (B * D * (h - 1) * w * 3)
    if cfg.use_a_smooth:
        regs["a_smooth"] = as_dx / (B * D * h * (w - 1)) \
            + as_dy / (B * D * (h - 1) * w)
    if cfg.use_loop and cfg.use_l_smooth:
        regs["l_smooth"] = ls_dx / (B * D * h * (w - 1)) \
            + ls_dy / (B * D * (h - 1) * w)
    disp_out = disp if cfg.want_disp else None
    label_out = label[..., None] if cfg.use_loop else None
    return ((out, asum, disp_out, label_out, regs),
            (feats, valid, mask_feats, dinv))


def _fused_s1_bwd(cfg, res, cts):
    feats, valid, mask_feats, dinv = res
    g_out, g_asum, g_disp, g_label, g_regs = cts
    B, D, h, w, C = feats.shape
    f32 = jnp.float32
    zero = jnp.zeros((), f32)
    g_sp = g_regs.get("sparsity", zero) if cfg.use_sparsity else zero
    g_rs_dx = g_rs_dy = g_as_dx = g_as_dy = g_ls_dx = g_ls_dy = zero
    if cfg.use_rgb_smooth:
        g_rs = g_regs["rgb_smooth"]
        g_rs_dx = g_rs / (B * D * h * (w - 1) * 3)
        g_rs_dy = g_rs / (B * D * (h - 1) * w * 3)
    if cfg.use_a_smooth:
        g_as = g_regs["a_smooth"]
        g_as_dx = g_as / (B * D * h * (w - 1))
        g_as_dy = g_as / (B * D * (h - 1) * w)
    if cfg.use_loop and cfg.use_l_smooth:
        g_ls = g_regs["l_smooth"]
        g_ls_dx = g_ls / (B * D * h * (w - 1))
        g_ls_dy = g_ls / (B * D * (h - 1) * w)
    g_lab = g_label[..., 0] if cfg.use_loop else None

    # sweep A (near -> far): recompute decode + incoming transmittance
    rgbs, alphas, sigs = [None] * D, [None] * D, [None] * D
    T_in = [None] * D
    T = jnp.ones((B, h, w), f32)
    sp_l1 = jnp.zeros((B, h, w), f32)
    sp_l2sq = jnp.zeros((B, h, w), f32)
    for s in range(D - 1, -1, -1):
        rgb, alpha, sig = _decode_plane(feats, valid, s)
        rgbs[s], alphas[s], sigs[s] = rgb, alpha, sig
        T_in[s] = T
        T = T * (1.0 - alpha)
        if cfg.use_sparsity:
            sp_l1 = sp_l1 + jnp.abs(alpha)
            sp_l2sq = sp_l2sq + alpha * alpha

    sp_a_coef = sp_b_coef = None
    if cfg.use_sparsity:
        npix = B * h * w
        l2 = jnp.sqrt(sp_l2sq)
        l2c = jnp.clip(l2, cfg.sp_eps, None)
        scale = g_sp / (npix * math.sqrt(cfg.n_planes))
        sp_a_coef = scale / l2c                       # * sign(a_i)
        sp_b_coef = jnp.where(
            l2 >= cfg.sp_eps,
            scale * sp_l1 / (l2c * l2c * jnp.maximum(l2, cfg.sp_eps)),
            0.0)                                      # * a_i

    # sweep B (far -> near): division-free composite cotangents
    d_feats = [None] * D
    d_mask = [None] * D if cfg.use_loop else None
    dT = jnp.zeros((B, h, w), f32)
    for s in range(D):
        rgb, alpha, sig = rgbs[s], alphas[s], sigs[s]
        v = valid[:, s]
        g_i = jnp.sum(rgb * g_out, axis=-1) + g_asum
        if cfg.want_disp:
            g_i = g_i + dinv[:, s] * g_disp
        bw = alpha * T_in[s]
        da = T_in[s] * (g_i - dT)
        dT = alpha * g_i + (1.0 - alpha) * dT
        d_rgb = bw[..., None] * g_out                  # (B, h, w, 3)
        if cfg.use_sparsity:
            da = da + sp_a_coef * jnp.sign(alpha) - sp_b_coef * alpha
        if cfg.use_rgb_smooth:
            d_rgb = d_rgb + _smooth_grad(rgb, g_rs_dx, g_rs_dy,
                                         h_axis=1, w_axis=2)
        if cfg.use_a_smooth:
            da = da + _smooth_grad(alpha, g_as_dx, g_as_dy,
                                   h_axis=1, w_axis=2)

        d_feats[s] = jnp.concatenate([
            d_rgb * v[..., None] * (sig[..., :3] * (1.0 - sig[..., :3])),
            (jnp.where(v, da, 0.0)
             * sig[..., 3] * (1.0 - sig[..., 3]))[..., None],
        ], axis=-1)

        if cfg.use_loop:
            # label composite: detached alpha => only the mask logits
            # receive gradient (via lp * bw + l_smooth)
            lsig = jax.nn.sigmoid(mask_feats[:, s])
            d_lp = g_lab * bw
            if cfg.use_l_smooth:
                lp = jnp.where(v, lsig, 0.0)
                d_lp = d_lp + _smooth_grad(lp, g_ls_dx, g_ls_dy,
                                           h_axis=1, w_axis=2)
            d_mask[s] = jnp.where(v, d_lp, 0.0) * lsig * (1.0 - lsig)

    d_feats = jnp.stack(d_feats, axis=1).astype(feats.dtype)
    if cfg.use_loop:
        d_mask_out = jnp.stack(d_mask, axis=1).astype(mask_feats.dtype)
    else:
        d_mask_out = jnp.zeros_like(mask_feats)
    return (d_feats, _zero_ct(valid), d_mask_out, jnp.zeros_like(dinv))


fused_composite_s1.defvjp(_fused_s1_fwd, _fused_s1_bwd)
