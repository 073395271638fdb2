"""Frame-parallel (sequence-parallel) stage-2 training step.

The video time axis is the "sequence" of this model family (SURVEY §5):
per-frame rendering is embarrassingly parallel and the GPNN looping loss
couples frames only within a temporal patch window (patcht frames).  We
therefore shard the dynamic tile stack and the rendered frames over the
``fp`` mesh axis and cover the coupling with two ring collectives:

1. *halo exchange*: each device fetches the next device's first
   (patcht-1) rendered frames so its temporal NN query patches are
   complete — the ring wrap (last device <- device 0) is exactly the
   loop-closure padding of reference MPV.py:490-492;
2. *fold spill*: the overlap-add of retargeted patches spills (patcht-1)
   frames past each shard boundary; slabs ride the ring forward and are
   added to the next shard's head — the wrap slab becomes the pad-frame
   loss terms owned by device 0.

No gradient flows through either collective (the NN/fold target is
stop_gradient, matching the reference's no_grad block,
utils_vid.py:322-348); only loss/metric psums and replicated-parameter
gradient psums cross chips.

The swd loss is also covered (sharded_swd): same halo ring (but
gradient-carrying — every temporal patch gets gradient in swd) + an
all_gather of the projected columns, exact because the per-location
temporal sort is order-free.  mse/avg are trivially cheap and run
dp-only (fp_supports).

Constraints: stridet == 1 (every shipped config) and
frm_num % fp_size == 0 with frm_num/fp >= patcht-1.
"""
from __future__ import annotations


import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from videoloop3d_tpu.losses import patch_nn as pnl
from videoloop3d_tpu.train import common, optimizer as opt_lib


def _spatial_plan(h, w, p, s, macro):
    """Macro-crop starts + summed spatial fold weight (host, static).

    macro=None means one crop covering the full fitted rectangle — the
    'gpnn' (direct, macro-block-free) degeneration, so a 'gpnn' config
    under fp sharding gets the same patch tiling/normalization as the
    single-device gpnn_direct_loss path.
    """
    fh = pnl.fit_patch_size(h, p, s)
    fw = pnl.fit_patch_size(w, p, s)
    if macro is None:
        mh, mw = fh, fw
    else:
        macro = pnl.fit_patch_size(macro, p, s)
        mh = mw = min(macro, fh, fw)
    hs = pnl._macro_starts(fh, mh, p, s)
    ws = pnl._macro_starts(fw, mw, p, s)
    prof_h = pnl._fold_profile_1d(mh, p, s)
    prof_w = pnl._fold_profile_1d(mw, p, s)
    weight = np.zeros((fh, fw), np.float32)
    for h0 in hs:
        for w0 in ws:
            weight[h0:h0 + mh, w0:w0 + mw] += np.outer(prof_h, prof_w)
    return (mh, mw), fh, fw, tuple(hs), tuple(ws), \
        np.clip(weight, 1e-10, None)


def sharded_gpnn_lowmem(x_scaled, y, *, patch_size, patcht_size, stride,
                        alpha, rou, scaling, macro_block, fp_size,
                        frm_num):
    """Frame-sharded gpnn_lm loss inside a shard_map worker.

    x_scaled: (3, Fl, h, w) local rendered frames (gain applied, grads
    flow); y: (3, Ty, h, w) replicated ground truth.
    Returns the GLOBAL mean robust loss (psum'd over 'fp').
    """
    C, Fl, H, W = x_scaled.shape
    pt = patcht_size
    pad = pt - 1
    S = fp_size
    assert Fl * S == frm_num and Fl >= pad
    psz = (pt, patch_size, patch_size)
    strides = (1, stride, stride)
    (mh, mw), fh, fw, hs, ws, sw_np = _spatial_plan(
        H, W, patch_size, stride, macro_block)
    y = y[:, :, :fh, :fw]
    x_fit = x_scaled[:, :, :fh, :fw]

    idx = jax.lax.axis_index("fp")
    is_first = (idx == 0)

    xs = jax.lax.stop_gradient(x_fit)
    # halo: next device's first (pt-1) frames; ring wrap = loop pad
    if pad > 0:
        perm = [((j + 1) % S, j) for j in range(S)]
        halo = jax.lax.ppermute(xs[:, :pad], "fp", perm)
        x_ext = jnp.concatenate([xs, halo], axis=1)    # (3, Fl+pad, fh, fw)
    else:
        x_ext = xs
    ys = jax.lax.stop_gradient(y)

    use_flat = jax.default_backend() != "cpu"

    def crop_retarget(xc, yc):
        """One macro crop: local temporal NN + fold (numerator only)."""
        if use_flat:
            Xp = pnl.extract_patches_flat(xc, psz, strides)
            Yp = pnl.extract_patches_flat(yc, psz, strides)
            ntx, nh, nw, dim = Xp.shape
        else:
            Xp8 = pnl.extract_patches_3d(xc, psz, strides)
            Yp8 = pnl.extract_patches_3d(yc, psz, strides)
            ntx, nh, nw = Xp8.shape[:3]
            dim = int(np.prod(Xp8.shape[3:]))
            Xp = Xp8.reshape(ntx, nh, nw, dim)
            Yp = Yp8.reshape(Yp8.shape[0], nh, nw, dim)
        nty = Yp.shape[0]
        Xf = Xp.reshape(ntx, nh * nw, dim).transpose(1, 0, 2)
        Yf = Yp.reshape(nty, nh * nw, dim).transpose(1, 0, 2)
        dist = pnl._pairwise_sqdist(Xf, Yf)             # (B, Fl, nty)
        if alpha is not None:
            col_min = jnp.min(dist, axis=1, keepdims=True)
            col_min = jax.lax.pmin(col_min, "fp")       # global min over X
            dist = dist / (alpha + col_min)
        nns = jnp.argmin(dist, axis=2)
        sel = jnp.take_along_axis(Yf, nns[..., None], axis=1)
        sel = sel.transpose(1, 0, 2).reshape(ntx, nh, nw, dim)
        if use_flat:
            return pnl.fold_patches_flat(sel, C, psz, strides)
        return pnl.fold_patches_3d(
            sel.reshape((ntx, nh, nw) + Xp8.shape[3:]),
            (Fl + pad, xc.shape[2], xc.shape[3]), strides)

    x_crops = jnp.stack([x_ext[..., h0:h0 + mh, w0:w0 + mw]
                         for h0 in hs for w0 in ws])
    y_crops = jnp.stack([ys[..., h0:h0 + mh, w0:w0 + mw]
                         for h0 in hs for w0 in ws])
    y2x_crops = jax.vmap(crop_retarget)(x_crops, y_crops)

    canvas = jnp.zeros((C, Fl + pad, fh, fw), x_scaled.dtype)
    ci = 0
    for h0 in hs:
        for w0 in ws:
            canvas = canvas.at[..., h0:h0 + mh, w0:w0 + mw].add(
                y2x_crops[ci])
            ci += 1

    # fold spill: tail slab rides the ring forward
    if pad > 0:
        perm_fwd = [(j, (j + 1) % S) for j in range(S)]
        recv = jax.lax.ppermute(canvas[:, Fl:], "fp", perm_fwd)
        head_add = jnp.where(is_first, 0.0, 1.0) * recv
        canvas = canvas.at[:, :pad].add(head_add)
    else:
        recv = None

    # temporal fold weights (stridet == 1): interior frames are covered
    # by pt patches; global head ramps 1..pt; pad frames ramp pt-1..1
    li = jnp.arange(Fl)
    wt_local = jnp.where(is_first, jnp.minimum(li + 1, pt),
                         jnp.full_like(li, pt)).astype(jnp.float32)
    sw = jnp.asarray(sw_np)
    y2x_local = canvas[:, :Fl] / (wt_local[None, :, None, None]
                                  * sw[None, None])
    n_terms = C * (S * Fl + pad) * fh * fw
    local_sum = jnp.sum(pnl.robust_lossfun(x_fit - y2x_local, rou, scaling))

    if pad > 0:
        wt_pad = jnp.arange(pad, 0, -1).astype(jnp.float32)
        y2x_pad = recv / (wt_pad[None, :, None, None] * sw[None, None])
        pad_sum = jnp.sum(pnl.robust_lossfun(x_fit[:, :pad] - y2x_pad,
                                             rou, scaling))
        local_sum = local_sum + jnp.where(is_first, pad_sum, 0.0)

    return jax.lax.psum(local_sum, "fp") / n_terms


def sharded_swd(x_scaled, y, rng, *, patch_size, patcht_size, stride,
                stridet, num_proj, fp_size, frm_num):
    """Frame-sharded sliced-Wasserstein loss inside a shard_map worker.

    Exact equivalence with losses.swd.swd_3d_loss (default branch): the
    random projections are local convs over this shard's frames plus a
    (patcht-1)-frame ring halo (the wrap IS the loop pad, same ring as
    the gpnn halo), and because the per-location temporal SORT is
    order-free, an all_gather of the projected columns over 'fp'
    reconstructs the global distribution exactly.  Unlike the gpnn
    halo, gradients DO flow through the ppermute (every temporal patch
    gets gradient in the single-device loss, including ones straddling
    shard boundaries) — ppermute/all_gather differentiate correctly
    under shard_map.  x_scaled: (3, Fl, h, w) local frames (grads
    flow); y: (3, Ty, h, w) replicated; rng replicated (same
    projections on every shard).
    """
    assert stridet == 1
    C, Fl, H, W = x_scaled.shape
    pt = patcht_size
    pad = pt - 1
    S = fp_size
    assert Fl * S == frm_num and Fl >= max(pad, 1)

    x = x_scaled * 2 - 1
    y = y * 2 - 1
    if pad > 0:
        # gradient-carrying halo: next shard's first pad frames; ring
        # wrap (shard S-1 <- shard 0) = the loop-closure pad
        perm = [((j + 1) % S, j) for j in range(S)]
        halo = jax.lax.ppermute(x[:, :pad], "fp", perm)
        x = jnp.concatenate([x, halo], axis=1)         # (3, Fl+pad, h, w)

    rand = jax.random.normal(
        rng, (num_proj, C, pt, patch_size, patch_size))
    if num_proj > 1:
        rand = rand / jnp.std(rand, axis=0, keepdims=True)
    dn = jax.lax.conv_dimension_numbers(
        (1,) + x.shape, rand.shape, ("NCDHW", "OIDHW", "NCDHW"))

    def project(v):
        out = jax.lax.conv_general_dilated(
            v[None], rand, (stridet, stride, stride), "VALID",
            dimension_numbers=dn)
        _, Pn, cf, ch, cw = out.shape
        return out.reshape(Pn, cf, ch * cw)

    px = project(x)                                     # (P, Fl, chw)
    # global temporal distribution: gather shards' cf columns (sort is
    # order-invariant, so shard-major concat order is irrelevant)
    gx = jax.lax.all_gather(px, "fp", axis=0)           # (S, P, Fl, chw)
    Pn, chw = px.shape[0], px.shape[2]
    projx = gx.transpose(1, 0, 2, 3).reshape(Pn, S * Fl, chw)
    projy = project(y)                                  # (P, cfy, chw)

    from videoloop3d_tpu.losses.swd import _match_lengths
    projx = projx.transpose(0, 2, 1).reshape(-1, projx.shape[1])
    projy = projy.transpose(0, 2, 1).reshape(-1, projy.shape[1])
    projx, projy = _match_lengths(projx, projy, rng)
    projx = jnp.sort(projx, axis=1)
    projy = jnp.sort(projy, axis=1)
    return jnp.mean(jnp.abs(projx - projy))


def fp_supports(losscfg, isloop=True):
    """(ok, reason-if-not) — whether the fp (frame-sharded) step covers
    this loss config.  The trainer warns and falls back to dp when not."""
    if not isloop:
        return False, "fp sharding's ring-halo wrap IS the loop pad; " \
                      "non-loop (--mpv_isloop off) configs run dp-only"
    name = losscfg.get("loss_name")
    if name == "swd":
        if losscfg.get("stridet", 1) != 1:
            return False, "fp swd requires stridet == 1"
        return True, ""
    if name not in ("gpnn_lm", "gpnn"):
        return False, "fp sharding implements the gpnn_lm/gpnn + swd " \
                      "losses (mse/avg are trivially cheap dp-only; " \
                      "gpnn_down's pre-NN temporal downsample couples " \
                      "frames across shard boundaries beyond the " \
                      "patcht-1 ring halo, so it stays dp-only)"
    if losscfg.get("stridet", 1) != 1:
        return False, "fp sharding requires stridet == 1"
    if losscfg.get("dist_fn", "mse") != "mse":
        return False, "fp sharding implements the mse patch distance"
    return True, ""


def make_fp_stage2_step(model, args, ph, pw, losscfg, mesh,
                        param_keys=("atlas", "atlas_dyn", "verts")):
    """Stage-2 step sharded over ('dp', 'fp'): patch batch over dp,
    frames over fp.  atlas_dyn is sharded on its frame axis; static
    tiles/verts are replicated with gradient psum."""
    S = mesh.shape["fp"]
    Fl = model.frm_num // S
    assert Fl * S == model.frm_num, "frm_num must divide by fp size"

    opt_init, opt_update = opt_lib.make_optimizer(args.optimizer, eps=6e-8)
    group_fn = opt_lib.make_group_fn(args.optimize_verts_gain)
    cfg = dict(losscfg)
    loss_name = cfg.pop("loss_name")
    ok, why = fp_supports(losscfg, isloop=model.isloop)
    assert ok, why
    if loss_name == "gpnn":
        # macro-block-free direct variant == one full-rectangle crop
        cfg["macro_block"] = None
    loss_gain = float(cfg.pop("loss_gain", 1.0))
    alpha = pnl._norm_alpha(cfg["alpha"])
    pt = cfg["patcht_size"]

    # shadow model with local frame count for the per-shard render
    import copy
    local_model = copy.copy(model)
    local_model.frm_num = Fl

    dyn_spec = P(None, None, None, "fp", None)
    param_spec = {k: (dyn_spec if k == "atlas_dyn" else P())
                  for k in param_keys}
    opt_spec = {"m": param_spec, "v": param_spec, "step": P()} \
        if args.optimizer == "adam" else \
        {"momentum": param_spec, "step": P()}
    def worker(params, opt_state, batch, lr, weights, rng):
        if "video" in batch:
            vid = batch["video"][0]
        else:
            from videoloop3d_tpu.train.stage2 import device_crop
            vid = device_crop(batch["videos"], batch["view"][0],
                              batch["h0"][0], batch["w0"][0], ph, pw)
        local = {"extrin": batch["extrin"], "intrin": batch["intrin"],
                 "video": vid}
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))

        render_remat = jax.checkpoint(
            lambda p_, e_, i_: local_model.render(p_, ph, pw, e_, i_,
                                                  None, training=True,
                                                  rng=rng))

        def loss_fn(p):
            rgb, variables = render_remat(p, local["extrin"],
                                          local["intrin"])
            x = jnp.transpose(rgb, (3, 0, 1, 2))        # (3, Fl, h, w)
            if args.scale_invariant:
                res_avg = jnp.mean(local["video"], axis=0)
                rgb_avg = jax.lax.pmean(
                    jnp.mean(jax.lax.stop_gradient(rgb), axis=0), "fp")
                gain = common.scale_invariant_gain(res_avg, rgb_avg)
                x = x * gain
            y = jnp.transpose(local["video"], (3, 0, 1, 2))
            if loss_name == "swd":
                main = sharded_swd(
                    x, y, rng, patch_size=cfg["patch_size"],
                    patcht_size=pt, stride=cfg["stride"],
                    stridet=cfg["stridet"],
                    num_proj=cfg.get("num_proj", 256),
                    fp_size=S, frm_num=model.frm_num) * loss_gain
            else:
                main = sharded_gpnn_lowmem(
                    x, y, patch_size=cfg["patch_size"], patcht_size=pt,
                    stride=cfg["stride"], alpha=alpha, rou=cfg["rou"],
                    scaling=cfg["scaling"],
                    macro_block=cfg["macro_block"],
                    fp_size=S, frm_num=model.frm_num) * loss_gain
            # jax.grad runs INSIDE shard_map and both losses all_gather
            # the grad-carrying frames; the gather's transpose
            # (psum_scatter) sums the S identical per-shard cotangents,
            # scaling the main term's gradient by fp_size while the
            # pmean'd extras stay 1x (measured: exactly S x the
            # single-device gradient).  Descale the cotangent — value
            # unchanged — so the fp step optimizes the single-device
            # objective exactly (tests/test_fp_sharding.py::
            # test_fp_worker_grad_matches_single_device).
            main = main / S + jax.lax.stop_gradient(main - main / S)

            extra = local_model.training_extras(variables, loss_gain)
            extra = {k: jax.lax.pmean(v, "fp") for k, v in extra.items()}
            total = main
            metrics = {"swd": main}
            for k, v in extra.items():
                metrics[k] = v
                total = total + weights[k] * v
            metrics["loss"] = total
            return total, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
        # replicated params accumulate over frames -> psum over fp;
        # the dyn shard's grads are local by construction
        for k in grads:
            if k != "atlas_dyn":
                grads[k] = jax.lax.psum(grads[k], "fp")
        if "wt" in batch:
            # weight-0 = padding row of a partial dp batch (exact
            # per-epoch item accounting, see stage2.batched_items)
            w = batch["wt"][0]
            denom = jax.lax.psum(w, "dp")
            grads = jax.tree.map(
                lambda g: jax.lax.psum(g * w, "dp") / denom, grads)
            metrics = jax.tree.map(
                lambda m: jax.lax.psum(m * w, "dp") / denom,
                jax.lax.pmean(metrics, "fp"))
        else:
            grads = jax.lax.pmean(grads, "dp")
            metrics = jax.lax.pmean(metrics, ("dp", "fp"))
        lr_tree = opt_lib.build_lr_tree(params, lr, group_fn)
        new_params, new_opt = opt_update(params, grads, opt_state, lr_tree)
        return new_params, new_opt, metrics

    from videoloop3d_tpu.parallel.dp_step import BATCH_KEY_SPECS

    def mapped(params, opt_state, batch, lr, weights, rng):
        bspec = {k: BATCH_KEY_SPECS[k] for k in batch}
        return shard_map(
            worker, mesh=mesh,
            in_specs=(param_spec, opt_spec, bspec, P(), P(), P()),
            out_specs=(param_spec, opt_spec, P()),
            check_vma=False)(params, opt_state, batch, lr, weights, rng)

    # Memory note: the production-scale step is near the 16GB HBM edge;
    # overflow on the axon runtime manifests as silent host paging
    # (steps degrade 1.3s -> 17-50s) or ResourceExhausted.  Two levers
    # keep it comfortably inside: buffer donation (params/opt updated in
    # place) and rematerializing the render in the backward pass (see
    # make_patch_loss_fn).
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, lr, weights, rng):
        return mapped(params, opt_state, batch, lr, weights, rng)

    return step, opt_init
