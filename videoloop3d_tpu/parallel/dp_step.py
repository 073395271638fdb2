"""Data-parallel training steps (patch batch over the 'dp' axis).

Each dp row owns a slice of the patch batch; parameters are replicated;
per-patch gradients are psum-averaged over ICI before a replicated Adam
update — real DP for BOTH stages, unlike the reference's inert
single-GPU `nn.DataParallel` (train_3d.py:158, train_3dvid.py:151).
"""
from __future__ import annotations


import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from videoloop3d_tpu.train import optimizer as opt_lib
from videoloop3d_tpu.train.stage2 import make_patch_loss_fn, device_crop

# sharding of every supported batch key: camera params + patch origins
# ride 'dp'; the per-level device-resident uint8 video stack (see
# stage2.device_crop) is replicated.  'videos_sharded' is the
# per-process-data-loading variant: axis 0 is the dp row, each row
# holding ITS OWN PROCESS's view subset (so non-addressable shards need
# no host data; 'view' then carries process-LOCAL indices).  'wt' is a
# per-row validity weight (0 = filler row, e.g. a process that owns no
# view of this batch's loss config) applied to the gradient psum.
BATCH_KEY_SPECS = {"extrin": P("dp"), "intrin": P("dp"),
                   "video": P("dp"), "videos": P(),
                   "videos_sharded": P("dp"), "wt": P("dp"),
                   "view": P("dp"), "h0": P("dp"), "w0": P("dp")}

# stage-1 batches: run-resident image/mask stacks replicated, everything
# else sharded over dp.  '*_sharded' / 'wt' mirror the stage-2 keys:
# per-process image stacks over dp rows + weight-0 filler rows for
# --shard_views (see train/stage1.py)
STAGE1_BATCH_KEY_SPECS = {"extrin": P("dp"), "intrin": P("dp"),
                          "rgb": P("dp"), "loopmask": P("dp"),
                          "images": P(), "masks": P(),
                          "images_sharded": P("dp"),
                          "masks_sharded": P("dp"), "wt": P("dp"),
                          "view": P("dp"), "h0": P("dp"), "w0": P("dp")}


def make_dp_stage1_step(model, args, ph, pw, mesh):
    """dp-sharded stage-1 step (SURVEY §2.3 "shard ... the patch batch";
    ref wraps stage 1 in DataParallel at train_3d.py:158).

    Batch arrays carry a leading axis of mesh.shape['dp'] *
    max(patch_batch, 1): each dp row takes its patch_batch-sized slice
    (the existing in-shard vmap semantics), grads/metrics are
    pmean-averaged — exactly the single-device batch mean, so dp=N with
    patch_batch=1 is numerically the single-device patch_batch=N step
    (tests/test_parallel.py).  Returns (step, opt_init, weight_keys).
    """
    from videoloop3d_tpu.train.stage1 import (
        STAGE1_WEIGHT_KEYS, make_stage1_loss_fn, resolve_image_batch)
    opt_init, opt_update = opt_lib.make_optimizer(args.optimizer, eps=1e-8)
    group_fn = opt_lib.make_group_fn(args.optimize_verts_gain)
    loss_fn = make_stage1_loss_fn(model, args, ph, pw)

    def sharded_step(params, opt_state, batch, lr, weights, rng):
        b = batch
        if "images_sharded" in b:
            # per-process stacks: this row's shard holds its process's
            # views; batch["view"] carries process-local indices
            b = dict(b)
            b["images"] = b.pop("images_sharded")[0]
            b["masks"] = b.pop("masks_sharded")[0]
        local = resolve_image_batch(b, ph, pw)
        if "wt" in local:
            # drop wt from the loss inputs WITHOUT mutating `batch`
            # (resolve_image_batch passes pre-resolved batches through,
            # so a pop here used to delete batch["wt"] and silently
            # skip the weight-masked psum below)
            local = {k: v for k, v in local.items() if k != "wt"}
        my_rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        grads, metrics = jax.grad(
            lambda p: loss_fn(p, local, weights, my_rng),
            has_aux=True)(params)
        if "wt" in batch:
            w = batch["wt"][0]
            denom = jax.lax.psum(w, "dp")
            grads = jax.tree.map(
                lambda g: jax.lax.psum(g * w, "dp") / denom, grads)
            metrics = jax.tree.map(
                lambda m: jax.lax.psum(m * w, "dp") / denom, metrics)
        else:
            grads = jax.lax.pmean(grads, "dp")
            metrics = jax.lax.pmean(metrics, "dp")
        lr_tree = opt_lib.build_lr_tree(params, lr, group_fn)
        new_params, new_opt = opt_update(params, grads, opt_state, lr_tree)
        return new_params, new_opt, metrics

    def mapped(params, opt_state, batch, lr, weights, rng):
        bspec = {k: STAGE1_BATCH_KEY_SPECS[k] for k in batch}
        return shard_map(
            sharded_step, mesh=mesh,
            in_specs=(P(), P(), bspec, P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False)(params, opt_state, batch, lr, weights, rng)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, lr, weights, rng):
        return mapped(params, opt_state, batch, lr, weights, rng)

    return step, opt_init, STAGE1_WEIGHT_KEYS


def make_dp_stage2_step(model, args, ph, pw, losscfg, mesh):
    """Returns (step, opt_init).  Batch arrays carry a leading axis of
    size mesh.shape['dp'] and are sharded over 'dp'; params/opt state are
    replicated."""
    opt_init, opt_update = opt_lib.make_optimizer(args.optimizer, eps=6e-8)
    group_fn = opt_lib.make_group_fn(args.optimize_verts_gain)
    loss_fn = make_patch_loss_fn(model, args, ph, pw, losscfg)

    def sharded_step(params, opt_state, batch, lr, weights, rng):
        # per-device slices keep a leading axis of 1: extrin/intrin stay
        # (1,3/4,..) = the single-view shape render expects; the video
        # drops it ((F, ph, pw, 3) per patch).
        if "video" in batch:
            vid = batch["video"][0]
        elif "videos_sharded" in batch:
            # per-process stacks: this row's shard holds its process's
            # views; batch["view"] carries process-local indices
            vid = device_crop(batch["videos_sharded"][0],
                              batch["view"][0], batch["h0"][0],
                              batch["w0"][0], ph, pw)
        else:
            vid = device_crop(batch["videos"], batch["view"][0],
                              batch["h0"][0], batch["w0"][0], ph, pw)
        local = {"extrin": batch["extrin"],
                 "intrin": batch["intrin"],
                 "video": vid}
        my_rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        grads, metrics = jax.grad(
            lambda p: loss_fn(p, local, weights, my_rng),
            has_aux=True)(params)
        if "wt" in batch:
            w = batch["wt"][0]
            denom = jax.lax.psum(w, "dp")
            grads = jax.tree.map(
                lambda g: jax.lax.psum(g * w, "dp") / denom, grads)
            metrics = jax.tree.map(
                lambda m: jax.lax.psum(m * w, "dp") / denom, metrics)
        else:
            grads = jax.lax.pmean(grads, "dp")
            metrics = jax.lax.pmean(metrics, "dp")
        lr_tree = opt_lib.build_lr_tree(params, lr, group_fn)
        new_params, new_opt = opt_update(params, grads, opt_state, lr_tree)
        return new_params, new_opt, metrics

    def mapped(params, opt_state, batch, lr, weights, rng):
        bspec = {k: BATCH_KEY_SPECS[k] for k in batch}
        return shard_map(
            sharded_step, mesh=mesh,
            in_specs=(P(), P(), bspec, P(), P(), P()),
            out_specs=(P(), P(), P()),
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
