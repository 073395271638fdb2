"""Stage-2 training: optimize the looping Multi-plane Tile Video.

Parity: reference train_3dvid.py:69-344.  Host loop owns the resolution
pyramid (lod + fresh optimizer + fresh dataset per level), per-view loss
configs (reference views get the big-patch/high-gain config), adaptive
learning rate (divided by dataset length), checkpoints and previews; the
jitted step renders all frames of a patch, builds the GPNN retarget
target under stop_gradient, and applies robust loss + regularizers.
"""
from __future__ import annotations

import os

import functools

import jax
import jax.numpy as jnp
import numpy as np

from videoloop3d_tpu.core import cameras
from videoloop3d_tpu.data import llff
from videoloop3d_tpu.data.patches import VideoPatchDataset
from videoloop3d_tpu.data.video import to8b, write_video
from videoloop3d_tpu.losses import patch_nn as pnl
from videoloop3d_tpu.losses.swd import swd_3d_loss
from videoloop3d_tpu.models import checkpoint as ckpt_io
from videoloop3d_tpu.models.mpv import MPMeshVid
from videoloop3d_tpu.train import common, optimizer as opt_lib

LOSS_FNS = {
    "gpnn": pnl.gpnn_direct_loss,
    "gpnn_lm": pnl.gpnn_lowmem_loss,
    "gpnn_down": pnl.gpnn_downsample_loss,
    "mse": pnl.video_mse_loss,
    "avg": pnl.video_avg_loss,
}


def loss_config_from_args(args, ref=False):
    """The two per-view loss configs (ref train_3dvid.py:160-192)."""
    sfx = "_ref" if ref else ""
    cfg = {
        "loss_name": getattr(args, f"loss_name{sfx}"),
        "patch_size": getattr(args, f"swd_patch_size{sfx}"),
        "patcht_size": getattr(args, f"swd_patcht_size{sfx}"),
        "stride": getattr(args, f"swd_stride{sfx}"),
        "stridet": getattr(args, f"swd_stridet{sfx}"),
        "alpha": getattr(args, f"swd_alpha{sfx}"),
        "rou": getattr(args, f"swd_rou{sfx}"),
        "scaling": getattr(args, f"swd_scaling{sfx}"),
        "dist_fn": getattr(args, f"swd_dist_fn{sfx}"),
        "macro_block": args.swd_macro_block,
        "factor": getattr(args, f"swd_factor{sfx}"),
        "loss_gain": args.swd_loss_gain_ref if ref else 1.0,
        "num_proj": args.swd_num_proj,
        "fast_nn_dist": bool(getattr(args, "fast_nn_dist", False)),
    }
    ovr = getattr(args, "fast_nn_dist_ref" if ref else "fast_nn_dist_other",
                  "")
    if ovr:
        cfg["fast_nn_dist"] = (ovr == "on")
    # bf16 NN search/target (the fat patch tensors live under
    # stop_gradient): defaults to following --fp16 — bf16 texels mean
    # the render is already bf16-valued, so quantizing the NN target
    # adds nothing below the representable resolution; the all-f32
    # escape hatch (no --fp16) stays f32 end to end.
    nn_ovr = getattr(args, "nn_bf16", "")
    cfg["nn_bf16"] = ((nn_ovr == "on") if nn_ovr
                      else bool(getattr(args, "fp16", False)))
    return cfg


def pyramid_schedule(args, H, W):
    """(factor, (h, w), num_epoch) per level (ref train_3dvid.py:103-120)."""
    if args.pyr_minimal_dim < 0:
        stages = ([int(s) for s in args.pyr_stage.split(",")]
                  if args.pyr_stage else [])
        stages = np.array([0] + stages + [args.N_iters])
        epochs = (stages[1:] - stages[:-1]).tolist()
        factors = [args.pyr_factor ** i
                   for i in reversed(range(len(epochs)))]
    else:
        num = int(np.log(args.pyr_minimal_dim / min(H, W))
                  / np.log(args.pyr_factor)) + 1
        factors = [args.pyr_factor ** i for i in reversed(range(num))]
        epochs = [args.pyr_num_epoch] * num
    hw = [(int(H * f), int(W * f)) for f in factors]
    return list(zip(factors, hw, epochs))


def device_crop(videos, view, h0, w0, ph, pw):
    """Crop one training patch ON DEVICE from the level's resident
    uint8 video stack.

    Why: every host->device upload permanently pins its size in the
    axon client's host memory (measured 34.6 MB/step at production
    scale -> an OOM-killed soak).  Uploading the (V, F, H, W, 3) uint8
    stack once per pyramid level and slicing per step cuts the per-step
    upload to the ~KB camera parameters.

    videos: (V, F, H, W, 3) uint8 or pre-scaled float32 (device);
    view/h0/w0: int32 scalars.  Returns (F, ph, pw, 3) float32 in
    [0, 1].

    Dtype note: the uint8 dynamic-slice faults the TPU worker ("kernel
    fault") at some coarse-pyramid shapes (repro: (9,50,151,270,3) u8
    crashes, same shapes in f32 or host-cropped pass; (..,540,960,..)
    u8 ran two full levels clean).  The trainer therefore uploads
    coarse levels as f32 and keeps u8 only for the large levels where
    it is both proven and needed for HBM.
    """
    v = jax.lax.dynamic_index_in_dim(videos, view, axis=0,
                                     keepdims=False)
    F = v.shape[0]
    crop = jax.lax.dynamic_slice(
        v, (jnp.zeros((), jnp.int32), h0, w0, jnp.zeros((), jnp.int32)),
        (F, ph, pw, 3))
    if crop.dtype == jnp.uint8:
        return crop.astype(jnp.float32) / 255.0
    return crop.astype(jnp.float32)


def resolve_video(batch, ph, pw, idx=0):
    """Materialize batch["video"] from the device-resident stack unless
    the caller provided it directly (tests/bench pass crops)."""
    if "video" in batch:
        return batch
    out = {"extrin": batch["extrin"], "intrin": batch["intrin"],
           "video": device_crop(batch["videos"], batch["view"][idx],
                                batch["h0"][idx], batch["w0"][idx],
                                ph, pw)}
    return out


def make_patch_loss_fn(model: MPMeshVid, args, ph, pw, losscfg):
    """(params, batch, weights, rng) -> (total_loss, metrics) for ONE
    patch.  Shared by the single-device step and the sharded steps in
    videoloop3d_tpu.parallel."""
    cfg = dict(losscfg)
    loss_name = cfg.pop("loss_name")
    loss_gain = float(cfg.pop("loss_gain", 1.0))
    num_proj = cfg.pop("num_proj", 256)
    pad_frames = (cfg["patcht_size"] - 1) if model.isloop else 0
    ts = None      # train on all frames; None skips the frame gather

    # remat: recompute the render in the backward pass instead of
    # storing its activations (the (D,h,w,F) stacks dominate HBM);
    # --no_render_remat trades HBM for the recompute time (viable at
    # the production scale only with --fast_stage2_grad, whose
    # custom-vjp samplers save small residuals instead of activations)
    def _render(p, extrin, intrin, rng):
        return model.render(p, ph, pw, extrin, intrin, ts,
                            training=True, rng=rng)

    if not getattr(args, "no_render_remat", False):
        _render = jax.checkpoint(_render)

    def loss_fn(p, batch, weights, rng):
        rgb, variables = _render(p, batch["extrin"], batch["intrin"], rng)
        x = jnp.transpose(rgb, (3, 0, 1, 2))          # (3, F, h, w)
        if pad_frames > 0:                            # loop closure pad
            x = jnp.concatenate([x, x[:, :pad_frames]], axis=1)
        if args.scale_invariant:
            res_avg = jnp.mean(batch["video"], axis=0)    # (h, w, 3)
            rgb_avg = jnp.mean(jax.lax.stop_gradient(rgb), axis=0)
            gain = common.scale_invariant_gain(res_avg, rgb_avg)
            x = x * gain
        y = jnp.transpose(batch["video"], (3, 0, 1, 2))

        if loss_name == "swd":
            main = swd_3d_loss(x, y, rng, num_proj=num_proj, **cfg)
        else:
            main = LOSS_FNS[loss_name](x, y, **cfg)
        main = main * loss_gain

        extra = model.training_extras(variables, loss_gain)
        total = main
        metrics = {"swd": main}
        for k, v in extra.items():
            metrics[k] = v
            total = total + weights[k] * v
        metrics["loss"] = total
        return total, metrics

    return loss_fn


def make_stage2_step(model: MPMeshVid, args, ph, pw, losscfg):
    """Jitted step, specialized per (patch size, loss config, model
    shapes)."""
    opt_init, opt_update = opt_lib.make_optimizer(args.optimizer, eps=6e-8)
    group_fn = opt_lib.make_group_fn(args.optimize_verts_gain)
    loss_fn = make_patch_loss_fn(model, args, ph, pw, losscfg)

    # Memory note: the production-scale step is near the 16GB HBM edge;
    # overflow on the axon runtime manifests as silent host paging
    # (steps degrade 1.3s -> 17-50s) or ResourceExhausted.  Two levers
    # keep it comfortably inside: buffer donation (params/opt updated in
    # place) and rematerializing the render in the backward pass (see
    # make_patch_loss_fn).
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, lr, weights, rng):
        batch = resolve_video(batch, ph, pw)
        grads, metrics = jax.grad(
            lambda p: loss_fn(p, batch, weights, rng), has_aux=True)(params)
        lr_tree = opt_lib.build_lr_tree(params, lr, group_fn)
        new_params, new_opt = opt_update(params, grads, opt_state, lr_tree)
        return new_params, new_opt, metrics

    return step, opt_init


_eval_fwd_cache = {}


def _eval_fwd(model, h, w, u8=False):
    """Jitted eval render, cached so per-frame preview loops don't pay a
    re-trace/compile per call.  Keyed on the model identity plus every
    shape-determining attribute that `lod` / culling can change (the
    model ref is kept in the value so ids can't be recycled).

    u8=True quantizes ON DEVICE (same multiply+truncate as
    data/video.py:to8b, IEEE-identical bytes) so preview/offline-render
    frames fetch 4x fewer bytes over the axon tunnel; the evaluator
    keeps f32 (metrics are computed on float renders, ref
    script_evaluate_ours.py:119-131)."""
    key = (id(model), model.geom, getattr(model, "frm_num", None),
           model.tile_hw, model.is_sparse, h, w, u8)
    hit = _eval_fwd_cache.get(key)
    if hit is None:
        def fn(p, e, i, ts):
            rgb = model.render(p, h, w, e, i, ts, training=False)[0]
            if u8:
                rgb = (255.0 * jnp.clip(rgb, 0.0, 1.0)).astype(jnp.uint8)
            return rgb

        fn = jax.jit(fn)
        _eval_fwd_cache[key] = (model, fn)
        return fn
    return hit[1]


def render_eval(model, params, h, w, extrin, intrin, ts_list, chunk=2,
                u8=False):
    """Chunked full-frame eval render (ref script_evaluate_ours.py:119)."""
    fwd = _eval_fwd(model, h, w, u8=u8)
    frames = []
    ts_list = np.asarray(ts_list)
    for i in range(0, len(ts_list), chunk):
        sel = ts_list[i:i + chunk]
        pad = chunk - len(sel)
        sel_p = np.concatenate([sel, np.repeat(sel[-1:], pad)]) if pad \
            else sel
        out = fwd(params, jnp.asarray(extrin), jnp.asarray(intrin),
                  jnp.asarray(sel_p))
        frames.append(np.asarray(out[:len(sel)]))
    return np.concatenate(frames)


def save_stage2_checkpoint(path, model, params, pyr_i, epoch,
                           epoch_total, iter_total, factor, hw):
    ckpt_io.save_checkpoint(
        path, geom=model.geom, params=params, stage="mpv",
        is_sparse=model.is_sparse, has_dyn=True,
        tile_map_static=model.tile_map_static,
        tile_map_dyn=model.tile_map_dyn, tile_hw=model.tile_hw,
        frm_num=model.frm_num,
        extra_meta={"epoch_i": epoch, "pyr_i": pyr_i,
                    "epoch_total_step": epoch_total,
                    "iter_total_step": iter_total,
                    "train_factor": factor, "hw": list(hw),
                    "base_tile_hw": list(model.base_tile_hw)
                    if model.base_tile_hw else None,
                    "base_mpi_hw": [model.base_geom.mpi_h,
                                    model.base_geom.mpi_w],
                    "rgb_mlp_type": model.cfg.rgb_mlp_type,
                    "rgb_activate": model.cfg.rgb_activate,
                    "alpha_activate": model.cfg.alpha_activate})


def train(args, progress_cb=None):
    """Full stage-2 loop.  Returns (model, params, rundir)."""
    expname = args.expname + args.expname_postfix
    datadir = os.path.join(args.prefix, args.datadir)
    expdir = os.path.join(args.prefix, args.expdir)
    rundir = os.path.join(expdir, expname)

    # multi-host per-process data loading: decide view ownership BEFORE
    # decoding so each process reads only its dp rows' views
    shard_views = bool(getattr(args, "shard_views", False))
    owner = None
    load_views = None
    if shard_views:
        from videoloop3d_tpu.parallel import distributed as dist
        V_all = llff.count_views(datadir, args.factor)
        tv = [int(t) for t in args.test_view_idx.split(",")] \
            if args.test_view_idx else []
        tr = sorted(set(range(V_all)) - set(tv))
        refs = [int(i) for i in args.loss_ref_idx.split(",")] \
            if args.loss_ref_idx else []
        owner = dist.partition_views(tr, refs, jax.process_count())
        load_views = {v for v, p in owner.items()
                      if p == jax.process_index()}
        print(f"[stage2] --shard_views: this process decodes views "
              f"{sorted(load_views)} of {sorted(tr)}")

    videos, fps, scene = llff.load_mv_videos(
        basedir=datadir, factor=args.factor,
        bd_factor=(args.near_factor, args.far_factor), recenter=True,
        load_views=load_views)
    H, W = scene["hw"]
    poses, intrins, bds = scene["poses"], scene["intrins"], scene["bds"]
    V = len(videos)

    # test-view holdout (ref train_3dvid.py:89-96)
    test_view = [int(t) for t in args.test_view_idx.split(",")] \
        if args.test_view_idx else []
    train_view = sorted(set(range(V)) - set(test_view))
    videos = [videos[i] for i in train_view]
    poses = poses[train_view]
    intrins = intrins[train_view]
    # positional ownership (dataset indexing is by train_view position)
    owner_pos = None if owner is None else \
        {pos: owner[v] for pos, v in enumerate(train_view)}

    ref_pose = cameras.average_pose(poses)[:, :4]
    ref_extrin = cameras.pose_to_extrinsic(ref_pose)
    ref_intrin = intrins[0]
    near, far = float(bds.min()), float(bds.max())

    logger = common.MetricsLogger(rundir)
    common.snapshot_run(expdir, expname, args)

    model = MPMeshVid(args, H, W, ref_extrin, ref_intrin, near, far)
    resume_at = None
    latest = None if args.disable_auto_resume \
        else ckpt_io.latest_checkpoint(rundir)
    if latest is not None:
        ckpt = ckpt_io.load_checkpoint(latest)
        if ckpt["meta"]["stage"] == "mpv":
            params = model.restore_checkpoint(ckpt)
            ex = ckpt["meta"].get("extra", {})
            resume_at = (int(ex.get("pyr_i", 0)),
                         int(ex.get("epoch_i", -1)) + 1,
                         int(ex.get("epoch_total_step", 0)) + 1,
                         int(ex.get("iter_total_step", 0)))
            print(f"[stage2] auto-resuming from {latest} at level "
                  f"{resume_at[0]} epoch {resume_at[1]}")
        else:
            latest = None
    if latest is None:
        if args.init_from:
            ckpt = ckpt_io.load_checkpoint(os.path.join(args.prefix,
                                                        args.init_from))
            params = model.init_from_stage1(ckpt)
        else:
            params = model.init_params(args.seed)

    # per-view loss configs (ref train_3dvid.py:160-192)
    cfg_other = loss_config_from_args(args, ref=False)
    cfg_ref = loss_config_from_args(args, ref=True)
    ref_idxs = [int(i) for i in args.loss_ref_idx.split(",")] \
        if args.loss_ref_idx else []
    loss_cfgs_all = [cfg_ref if v in ref_idxs else cfg_other
                     for v in range(V)]
    loss_cfgs = [loss_cfgs_all[i] for i in train_view]

    weight_keys = ("sparsity", "rgb_smooth", "a_smooth", "d_smooth",
                   "density")
    weights = {k: jnp.asarray(common.extra_loss_weights(args, [k])[k],
                              jnp.float32) for k in weight_keys}

    np_rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    schedule = pyramid_schedule(args, H, W)
    print("[stage2] pyramid:", [(f"{f:.3f}", hw, n)
                                for f, hw, n in schedule])

    # device mesh: dp over training patches x fp over the frame axis
    # (single-device path when only one chip is visible)
    n_dev = len(jax.devices()) if args.mesh_devices == 0 \
        else min(args.mesh_devices, len(jax.devices()))
    mesh = None
    multiproc = jax.process_count() > 1
    if shard_views and args.mesh_fp > 1:
        raise ValueError("--shard_views currently supports dp-only "
                         "meshes (the sharded video stack is laid out "
                         "over 'dp' rows); drop --mesh_fp")
    if shard_views and getattr(args, "host_crops", False):
        raise ValueError("--shard_views is incompatible with "
                         "--host_crops (host crops need every view's "
                         "pixels on every process)")
    if n_dev > 1:
        from videoloop3d_tpu.parallel.distributed import make_global_mesh
        min_fl = max(c["patcht_size"] for c in loss_cfgs) - 1
        n_fp = args.mesh_fp
        if shard_views:
            n_fp = 1
        elif n_fp <= 0:
            local = n_dev // jax.process_count()
            n_fp = 1
            for cand in range(local, 0, -1):
                if (local % cand == 0 and model.frm_num % cand == 0
                        and model.frm_num // cand >= max(min_fl, 1)):
                    n_fp = cand
                    break
        mesh = make_global_mesh(n_dp=n_dev // n_fp, n_fp=n_fp)
        print(f"[stage2] mesh: dp={n_dev // n_fp} x fp={n_fp}"
              + (f" over {jax.process_count()} processes" if multiproc
                 else ""))

    def build_step(item_cfg, ph, pw):
        if mesh is None:
            return make_stage2_step(model, args, ph, pw, item_cfg) \
                + (1,)
        from videoloop3d_tpu.parallel.dp_step import make_dp_stage2_step
        from videoloop3d_tpu.parallel.fp_step import (fp_supports,
                                                      make_fp_stage2_step)
        n_dp = mesh.shape["dp"]
        if mesh.shape["fp"] > 1:
            ok, why = fp_supports(item_cfg, isloop=model.isloop)
            if ok:
                step, init = make_fp_stage2_step(model, args, ph, pw,
                                                 item_cfg, mesh)
                return step, init, n_dp
            print(f"[stage2] WARNING: --mesh_fp={mesh.shape['fp']} "
                  f"ignored for loss config "
                  f"'{item_cfg['loss_name']}' ({why}); falling back to "
                  f"dp-only over this config's patches")
        step, init = make_dp_stage2_step(model, args, ph, pw,
                                         item_cfg, mesh)
        return step, init, n_dp

    def _dp_serial(n_patches):
        """True when this level should feed one patch per optimizer
        step even on a dp mesh (see --dp_serial_below)."""
        return (mesh is not None and mesh.shape["dp"] > 1
                and 0 < n_patches < int(
                    getattr(args, "dp_serial_below", 0) or 0))

    def batched_items(dataset):
        """Group the shuffled epoch into same-losscfg batches of the dp
        size (padding by repetition), then interleave the groups in
        shuffled order (matching the reference's global patch shuffle).
        Returns (cfg_key, items, weights) triples; weights is None
        except under --shard_views (see _batched_items_sharded).
        Levels below --dp_serial_below patches feed serially (B=1
        semantics) instead — see _dp_serial."""
        if shard_views and mesh is not None:
            return _batched_items_sharded(dataset)
        groups = {}
        for item in dataset.iter_epoch(np_rng, shuffle=True):
            k = repr(sorted(item["losscfg"].items()))
            groups.setdefault(k, []).append(item)
        batches = []
        if _dp_serial(sum(len(v) for v in groups.values())):
            # B=1 feeding on the dp mesh: one real patch per optimizer
            # step, the other rows weight-0 copies (zero gradient via
            # the masked psum).  Small levels have so few patches that
            # batching n_dp of them collapses the Adam step count and
            # the trajectory leaves the single-device noise band (the
            # round-2 dp4 level-0 blow-up); serial feeding restores the
            # reference's batch-1 regime exactly, and costs nothing
            # where it applies (small levels are cheap).
            for k, items in groups.items():
                bs = step_cache[k][2]
                for it in items:
                    wts = (np.asarray([1.0] + [0.0] * (bs - 1),
                                      np.float32) if bs > 1 else None)
                    batches.append((k, [it] * bs, wts))
            np_rng.shuffle(batches)
            return batches
        for k, items in groups.items():
            bs = step_cache[k][2]
            for i in range(0, len(items), bs):
                chunk = items[i:i + bs]
                wts = None
                if len(chunk) < bs:
                    # weight-0 padding: a repeated item would otherwise
                    # over-train small loss-config groups per epoch
                    # (coarse pyramid levels have few patches; the bias
                    # showed up as dp4 convergence deviation).  Exact:
                    # the step's masked psum divides by the real count.
                    wts = np.asarray([1.0] * len(chunk)
                                     + [0.0] * (bs - len(chunk)),
                                     np.float32)
                    while len(chunk) < bs:
                        chunk.append(chunk[-1])
                batches.append((k, chunk, wts))
        np_rng.shuffle(batches)
        return batches

    def _batched_items_sharded(dataset):
        """--shard_views batching: dp rows are process-major, and each
        row may only train views its PROCESS owns (the sharded video
        stack holds only those).  Every process runs this identically
        (the schedule is pure metadata; only pixel access is local).
        Rows that run out of items for a config get weight-0 filler
        (local data, zero gradient via the masked psum in dp_step) —
        every patch is trained exactly once per epoch."""
        nproc = jax.process_count()
        n_dp = mesh.shape["dp"]
        rows_pp = n_dp // nproc
        groups = {}
        for item in dataset.iter_epoch(np_rng, shuffle=True):
            k = repr(sorted(item["losscfg"].items()))
            groups.setdefault(k, []).append(item)
        # a guaranteed-local filler item per process (any config)
        filler = [None] * nproc
        for items in groups.values():
            for it in items:
                p = owner_pos[it["view"]]
                if filler[p] is None:
                    filler[p] = it
        assert all(f is not None for f in filler), (
            "--shard_views needs every process to own >= 1 trained view "
            "(fillers must be process-local); reduce the process count "
            "or add views")
        batches = []
        if _dp_serial(sum(len(v) for v in groups.values())):
            # serial (B=1) feeding under --shard_views: the real patch
            # sits in its owner process's first row, every other row is
            # that row's process-local weight-0 filler
            for k, items in groups.items():
                bs = step_cache[k][2]
                for it in items:
                    p_own = owner_pos[it["view"]]
                    slots, wts = [], []
                    for p in range(nproc):
                        for j in range(rows_pp):
                            if p == p_own and j == 0:
                                slots.append(it)
                                wts.append(1.0)
                            else:
                                slots.append(filler[p])
                                wts.append(0.0)
                    batches.append((k, slots,
                                    np.asarray(wts, np.float32)))
            np_rng.shuffle(batches)
            return batches
        for k, items in groups.items():
            per_proc = [[] for _ in range(nproc)]
            for it in items:
                per_proc[owner_pos[it["view"]]].append(it)
            n_b = max(-(-len(q) // rows_pp) for q in per_proc if q)
            for b in range(n_b):
                slots, wts = [], []
                for p in range(nproc):
                    q = per_proc[p] or [filler[p]]
                    real = per_proc[p]
                    for j in range(rows_pp):
                        i = b * rows_pp + j
                        if real and i < len(real):
                            slots.append(real[i])
                            wts.append(1.0)
                        else:
                            slots.append(q[i % len(q)])
                            wts.append(0.0)
                batches.append((k, slots, np.asarray(wts, np.float32)))
        np_rng.shuffle(batches)
        return batches

    prof = common.Profiler(args, rundir)
    shutdown = common.graceful_shutdown()
    watchdog = common.HangWatchdog(
        getattr(args, "hang_timeout", 0.0), "stage2")
    stopping = False
    epoch_total = 0
    iter_total = 0
    start_level, start_epoch = (max(int(args.pyr_init_level), 0), 0)
    if resume_at is not None:
        start_level, start_epoch, epoch_total, iter_total = resume_at
    metrics = {}
    for pyr_i, (factor, hw, num_epoch) in enumerate(schedule):
        if pyr_i < start_level:
            continue
        params = model.lod(params, factor)
        dataset = VideoPatchDataset(
            hw, videos, (args.patch_h_size, args.patch_w_size),
            (args.patch_h_stride, args.patch_w_stride), poses, intrins,
            loss_cfgs)
        ph, pw = dataset.patch_size
        # hit-compaction bound for this level: patches are integer crops
        # of the (padded) level pixel grid, so the per-view full-grid
        # max (with the intrinsic-jitter margin baked into slot_bound)
        # bounds every training patch
        model.compact_slots = None
        if getattr(args, "compact_hits", False) and model.is_sparse:
            from videoloop3d_tpu.render.compact import slot_bound
            S = slot_bound(
                model.geom, model.tile_map_static, model.tile_map_dyn,
                cameras.pose_to_extrinsic(dataset.poses),
                dataset.intrins,
                dataset.h + dataset.pad[0], dataset.w + dataset.pad[1])
            if S < model.geom.n_planes:
                model.compact_slots = S
            print(f"[stage2] l{pyr_i} hit-compaction: "
                  f"S={S} of D={model.geom.n_planes}"
                  + ("" if model.compact_slots else " (no win; off)"))
        # --compact_tiles / --blocked_lookup bounds: the dataset's
        # patch-origin tiling is fixed per level, so static bounds over
        # all (view, origin) pairs cover every training step
        common.set_sparse_fastpath_bounds(
            model, args, cameras.pose_to_extrinsic(dataset.poses),
            dataset.intrins, ph, pw, dataset.origins,
            f"[stage2] l{pyr_i}", args.fast_stage2_grad)
        # the level's padded videos live on device ONCE; per-step
        # batches carry only (view, origin) and the step crops on device
        # (each host->device upload pins host memory on axon, see
        # device_crop).  Coarse levels upload as f32 (the u8 slice
        # kernel faults at some coarse shapes - device_crop docstring);
        # large levels stay u8 for HBM.
        local_index = None
        if shard_views and mesh is not None:
            # per-process stacks, sharded over dp rows: each device
            # holds only ITS process's views (HBM and host memory both
            # scale 1/nproc); 'view' batch indices become process-local
            from videoloop3d_tpu.parallel.distributed import \
                build_sharded_video_stack
            videos_dev, local_index = build_sharded_video_stack(
                mesh, owner_pos, list(range(len(train_view))),
                dataset.videos)
        else:
            _stack = np.stack(dataset.videos)
            if _stack.size * 4 <= 1.1e9:
                _stack = _stack.astype(np.float32) / 255.0
            if mesh is not None:
                # place ONCE per level as a global (replicated) array on
                # the full mesh — a plain jnp.asarray would be a
                # process-local single-device array that the first
                # sharded step rejects in multi-host runs (commit_batch
                # passes jax.Arrays through)
                from jax.sharding import PartitionSpec as P
                from videoloop3d_tpu.parallel.distributed import \
                    commit_batch
                videos_dev = commit_batch(mesh, {"videos": P()},
                                          {"videos": _stack})["videos"]
            else:
                videos_dev = jnp.asarray(_stack)
        # one jitted step per distinct loss config (<= 2)
        step_cache = {}
        for item_cfg in loss_cfgs:
            k = repr(sorted(item_cfg.items()))
            if k not in step_cache:
                step_cache[k] = build_step(item_cfg, ph, pw)
        opt_state = next(iter(step_cache.values()))[1](params)
        # level setup (lod resize, slot bounds, video upload) counts as
        # watchdog progress — the remaining untracked gap before the
        # first tick is the cold per-level step compile, which
        # --hang_timeout is sized for
        watchdog.tick()

        for epoch in range(num_epoch):
            if pyr_i == start_level and epoch < start_epoch:
                continue
            batches = batched_items(dataset)
            for cfg_key, items, wts in batches:
                lr = opt_lib.lr_schedule(epoch, args.lrate,
                                         decay_steps_k=args.lrate_decay)
                if args.lrate_adaptive:
                    # the reference's adaptive LR (train_3dvid.py:283-287,
                    # README:149) keeps the per-EPOCH update budget
                    # constant by dividing by the optimizer-step count.
                    # Under dp each step consumes n_dp patches, so the
                    # divisor is the number of batches, not of patches —
                    # dividing by len(dataset) made a dp=4 run take 4x
                    # fewer updates at the same per-step lr and
                    # under-train every level (round-2 trajectory study's
                    # level-0 deviation).  Single-device (batch size 1)
                    # the two divisors coincide.
                    lr = lr / len(batches)
                exts, intrs, views, h0s, w0s = [], [], [], [], []
                for item in items:
                    intrin = item["intrin"]
                    if args.add_intrin_noise:
                        intrin = common.jitter_intrinsic(intrin, np_rng)
                    exts.append(cameras.pose_to_extrinsic(item["pose"]))
                    intrs.append(intrin)
                    views.append(item["view"])
                    w0, h0 = item["wh_start"]
                    h0s.append(h0)
                    w0s.append(w0)
                step_fn, _, bs = step_cache[cfg_key]
                if getattr(args, "host_crops", False):
                    vids = [dataset.videos[v][
                        :, y0:y0 + ph, x0:x0 + pw].astype(np.float32)
                        / 255.0 for v, y0, x0 in zip(views, h0s, w0s)]
                    batch = {
                        "extrin": np.stack(exts).astype(np.float32),
                        "intrin": np.stack(intrs).astype(np.float32),
                        "video": np.stack(vids) if mesh is not None
                        else vids[0],
                    }
                elif local_index is not None:
                    batch = {
                        "extrin": np.stack(exts).astype(np.float32),
                        "intrin": np.stack(intrs).astype(np.float32),
                        "videos_sharded": videos_dev,
                        "view": np.asarray([local_index[v] for v in views],
                                           np.int32),
                        "h0": np.asarray(h0s, np.int32),
                        "w0": np.asarray(w0s, np.int32),
                        "wt": np.asarray(wts, np.float32),
                    }
                else:
                    batch = {
                        "extrin": np.stack(exts).astype(np.float32),
                        "intrin": np.stack(intrs).astype(np.float32),
                        "videos": videos_dev,
                        "view": np.asarray(views, np.int32),
                        "h0": np.asarray(h0s, np.int32),
                        "w0": np.asarray(w0s, np.int32),
                    }
                if mesh is not None and "wt" not in batch:
                    # ALWAYS carry wt under a mesh (ones for full
                    # batches): batches with and without the key have
                    # different pytree structures and would force a
                    # second full compile of the jitted step at the
                    # first partial batch (weighted psum with ones
                    # == pmean, exactly)
                    batch["wt"] = (np.asarray(wts, np.float32)
                                   if wts is not None
                                   else np.ones(len(views), np.float32))
                if mesh is None:
                    batch = {k: jnp.asarray(v) for k, v in batch.items()}
                else:
                    # multi-host: every process built the same global
                    # batch (same seeded dataset); commit local shards
                    from jax.sharding import PartitionSpec as P
                    from videoloop3d_tpu.parallel.dp_step import \
                        BATCH_KEY_SPECS
                    from videoloop3d_tpu.parallel.distributed import \
                        commit_batch
                    batch = commit_batch(
                        mesh, {k: BATCH_KEY_SPECS[k] for k in batch},
                        batch)
                key, sub = jax.random.split(key)
                prof.step(iter_total)
                params, opt_state, metrics = step_fn(
                    params, opt_state, batch, jnp.asarray(lr, jnp.float32),
                    weights, sub)
                # per-step device sync: on the tunneled axon runtime,
                # long async chains both stall the scheduler AND pin the
                # host staging buffer of every in-flight batch (~40 MB
                # each at production scale — an unsynced full run leaks
                # to an OOM kill).  ~25 ms against a 550 ms step.
                _ = float(metrics["loss"])
                del batch
                prof.tick()
                watchdog.tick()
                if (iter_total + 1) % args.i_img == 0:
                    for k, v in metrics.items():
                        logger.scalar(f"stage2/{k}", float(v), iter_total)
                    logger.scalar("stage2/lr", lr, iter_total)
                iter_total += 1
                # graceful shutdown, single-process: stop mid-epoch
                # (multi-process steps are collective; those coordinate
                # at the epoch boundary below)
                if shutdown.requested and jax.process_count() == 1:
                    interrupted = True
                    break
            else:
                interrupted = False

            if metrics:
                print(f"[stage2] l{pyr_i} epoch {epoch} "
                      f"loss={float(metrics['loss']):.4f} "
                      f"swd={float(metrics['swd']):.4f} "
                      f"({prof.steps_per_sec():.2f} it/s)")
            if progress_cb is not None:
                progress_cb(pyr_i, epoch, metrics)

            # graceful shutdown: coordinated across processes once per
            # epoch (any_process_flag is collective — a SIGTERM delivered
            # to one process stops all)
            from videoloop3d_tpu.parallel import distributed as dist
            stopping = interrupted or dist.any_process_flag(
                shutdown.requested)
            if stopping:
                # mid-epoch interrupt -> epoch-1 metadata so the
                # deterministic auto-resume re-runs the partial epoch;
                # at epoch 0 the previous level's end-of-level
                # checkpoint (or the stage-1 init) is the resume point
                ce = epoch - 1 if interrupted else epoch
                cet = epoch_total - 1 if interrupted else epoch_total
                if ce >= 0:
                    params_host = dist.gather_for_host(params)
                    if dist.is_primary():
                        save_stage2_checkpoint(
                            os.path.join(
                                rundir,
                                f"ckpt_l{pyr_i}_epoch_{ce:04d}.npz"),
                            model, params_host, pyr_i, ce, cet,
                            iter_total, factor, hw)
                print(f"[stage2] graceful shutdown at l{pyr_i} epoch "
                      f"{epoch}: checkpointed epoch {ce}; rerun to "
                      f"resume")
                break

            if (epoch_total + 1) % args.i_weights == 0 \
                    or (pyr_i == len(schedule) - 1
                        and epoch == num_epoch - 1):
                # multi-host: gather is COLLECTIVE (all processes join);
                # only the primary writes the file
                from videoloop3d_tpu.parallel import distributed as dist
                params_host = dist.gather_for_host(params)
                if dist.is_primary():
                    save_stage2_checkpoint(
                        os.path.join(
                            rundir,
                            f"ckpt_l{pyr_i}_epoch_{epoch:04d}.npz"),
                        model, params_host, pyr_i, epoch, epoch_total,
                        iter_total, factor, hw)
                watchdog.tick()       # gather + write are progress

            # previews are a file artifact; in multi-host jobs the eval
            # render is not sharded, so they are single-process-only
            if (epoch_total + 1) % args.i_video == 0 \
                    and jax.process_count() == 1:
                r_ext = cameras.pose_to_extrinsic(scene["render_poses"])
                frames = []
                for ri in range(min(len(r_ext), 2 * model.frm_num)):
                    f = render_eval(model, params, H, W,
                                    r_ext[ri:ri + 1],
                                    scene["render_intrins"][ri:ri + 1],
                                    [ri % model.frm_num], chunk=1,
                                    u8=True)
                    frames.append(f[0])
                write_video(os.path.join(
                    rundir, f"l{pyr_i}_{epoch:04d}_rgb.mp4"),
                    to8b(np.stack(frames)), fps=fps)
                from videoloop3d_tpu.export.mesh_export import (
                    save_mesh_preview, full_tile_map)
                if model.is_sparse:
                    save_mesh_preview(
                        model.geom, model.tile_map_static,
                        model.tile_map_dyn,
                        os.path.join(rundir, f"mesh_l{pyr_i}_{epoch:04d}"))
                else:
                    save_mesh_preview(
                        model.geom, None, full_tile_map(model.geom),
                        os.path.join(rundir, f"mesh_l{pyr_i}_{epoch:04d}"))
                watchdog.tick()   # previews render many frames; progress
            epoch_total += 1
        if stopping:
            break

    watchdog.stop()
    prof.close()
    logger.close()
    return model, params, rundir
