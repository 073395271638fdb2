"""Stage-1 training: fit the static MPI + learned 3D loop mask.

Parity: reference train_3d.py:98-363.  Structure: a jitted train step
(forward + BCE loop loss + scale-invariant MSE + weighted regularizers +
Adam) re-specialized when the model changes shape (tile culling), driven
by a host loop that owns data, schedules, events and artifacts.
"""
from __future__ import annotations

import os

import functools

import jax
import jax.numpy as jnp
import numpy as np

from videoloop3d_tpu.core import cameras
from videoloop3d_tpu.core.activations import ACTIVATIONS
from videoloop3d_tpu.data import llff
from videoloop3d_tpu.data.patches import ImagePatchDataset
from videoloop3d_tpu.data.video import to8b, write_video, write_image
from videoloop3d_tpu.models import checkpoint as ckpt_io
from videoloop3d_tpu.models.mpmesh import MPMesh, convert_direct_to_sh
from videoloop3d_tpu.models.sparsify import apply_tile_cull
from videoloop3d_tpu.train import common, optimizer as opt_lib


def _device_crop_image(images, masks, view, h0, w0, ph, pw):
    """Crop one (rgb, loopmask) patch on device from the run-resident
    image stacks (each host->device upload pins host memory on the axon
    client — see stage2.device_crop)."""
    img = jax.lax.dynamic_index_in_dim(images, view, axis=0,
                                       keepdims=False)
    msk = jax.lax.dynamic_index_in_dim(masks, view, axis=0,
                                       keepdims=False)
    z = jnp.zeros((), jnp.int32)
    rgb = jax.lax.dynamic_slice(img, (h0, w0, z), (ph, pw, 3))
    lm = jax.lax.dynamic_slice(msk, (h0, w0), (ph, pw))
    return rgb, lm


STAGE1_WEIGHT_KEYS = ("sparsity", "rgb_smooth", "a_smooth", "d_smooth",
                      "l_smooth", "density")


def resolve_image_batch(batch, h, w):
    """Materialize rgb/loopmask crops from the run-resident device
    stacks unless the caller provided them directly (tests/bench)."""
    if "rgb" in batch:
        return batch
    rgbs, lms = jax.vmap(
        lambda v, y0, x0: _device_crop_image(
            batch["images"], batch["masks"], v, y0, x0, h, w))(
        batch["view"], batch["h0"], batch["w0"])
    return {"extrin": batch["extrin"], "intrin": batch["intrin"],
            "rgb": rgbs, "loopmask": lms}


def make_stage1_loss_fn(model: MPMesh, args, h, w):
    """(params, batch{extrin,intrin,rgb,loopmask}, weights, rng) ->
    (total_loss, metrics) for a batch of B patches (loss is the batch
    mean, so dp-sharding B devices x pmean is exactly equivalent).
    Shared by the single-device step and parallel.dp_step."""
    learn_loop = model.cfg.learn_loop_mask and not model.is_sparse

    def loss_fn(p, batch, weights, rng):
        rgbl, extra = model.forward(
            p, h, w, batch["extrin"], batch["intrin"],
            training=True, rng=rng)
        if learn_loop:
            loop = jnp.clip(rgbl[..., 3], 0.001, 0.999)
            gt_loop = batch["loopmask"]
            entropy = gt_loop * jnp.log(loop) \
                + (1 - gt_loop) * jnp.log(1 - loop)
            loop_loss = -jnp.mean(entropy)
            rgb = rgbl[..., :3]
        else:
            loop_loss = 0.0
            rgb = rgbl[..., :3]

        if args.scale_invariant:
            gain = common.scale_invariant_gain(
                batch["rgb"], jax.lax.stop_gradient(rgb))
            rgb = rgb * gain
        img_loss = common.mse(rgb, batch["rgb"])

        total = img_loss + loop_loss
        metrics = {"mse": img_loss, "loop_bce": loop_loss}
        for k, v in extra.items():
            metrics[k] = v
            total = total + weights[k] * v
        metrics["loss"] = total
        metrics["psnr"] = common.mse_to_psnr(img_loss)
        return total, metrics

    return loss_fn


def make_train_step(model: MPMesh, args, h, w):
    """Build the jitted stage-1 step for patches of size (h, w)."""
    opt_init, opt_update = opt_lib.make_optimizer(args.optimizer, eps=1e-8)
    group_fn = opt_lib.make_group_fn(args.optimize_verts_gain)
    loss_fn = make_stage1_loss_fn(model, args, h, w)

    # Memory note: the production-scale step is near the 16GB HBM edge;
    # overflow on the axon runtime manifests as silent host paging
    # (steps degrade 1.3s -> 17-50s) or ResourceExhausted.  Two levers
    # keep it comfortably inside: buffer donation (params/opt updated in
    # place) and rematerializing the render in the backward pass (see
    # make_patch_loss_fn).
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, lr, weights, rng):
        batch = resolve_image_batch(batch, h, w)
        grads, metrics = jax.grad(
            lambda p: loss_fn(p, batch, weights, rng),
            has_aux=True)(params)
        lr_tree = opt_lib.build_lr_tree(params, lr, group_fn)
        new_params, new_opt = opt_update(params, grads, opt_state, lr_tree)
        return new_params, new_opt, metrics

    return step, opt_init, STAGE1_WEIGHT_KEYS


_preview_fwd_cache = {}


def _preview_fwd(model, h, w):
    """Jitted eval render, cached so repeated preview epochs don't pay a
    re-trace/compile per call (keyed on every shape-determining model
    attribute; the model ref is kept so ids can't be recycled).

    Quantizes to uint8 ON DEVICE (same multiply+truncate as
    data/video.py:to8b, IEEE-identical bytes) so each spiral frame
    fetches 4x fewer bytes over the axon tunnel — the previews were
    fetch-bound, not render-bound."""
    key = (id(model), model.geom, model.is_sparse, model.tile_hw,
           model.cfg.rgb_mlp_type, h, w)
    hit = _preview_fwd_cache.get(key)
    if hit is None:
        def fn(p, e, i):
            rgbl = model.forward(p, h, w, e, i, training=False)[0]
            return (255.0 * jnp.clip(rgbl, 0.0, 1.0)).astype(jnp.uint8)

        fn = jax.jit(fn)
        _preview_fwd_cache[key] = (model, fn)
        return fn
    return hit[1]


def render_preview(model, params, h, w, render_extrins, render_intrins,
                   chunk=8):
    """Render the spiral path (eval mode, full frames)."""
    fwd = _preview_fwd(model, h, w)
    frames = []
    for i in range(len(render_extrins)):
        rgbl = fwd(params, jnp.asarray(render_extrins[i:i + 1]),
                   jnp.asarray(render_intrins[i:i + 1]))
        frames.append(np.asarray(rgbl[0]))
    return np.stack(frames)


def save_texture_preview(model, params, path_prefix):
    """Activated atlas dump (ref MPI.py:242-260 save_texture): dense
    planes tiled into one image, or the packed static/dynamic tiles."""
    rgb_act = ACTIVATIONS[model.cfg.rgb_activate]
    a_act = ACTIVATIONS[model.cfg.alpha_activate]

    def activate(t):
        rgb = np.asarray(rgb_act(jnp.asarray(t[..., :3])))
        alpha = np.asarray(a_act(jnp.asarray(t[..., -1:])))
        return np.concatenate([rgb, alpha], -1)

    if not model.is_sparse:
        atlas = activate(np.asarray(params["atlas"]))
        d, hh, ww, c = atlas.shape
        grid = int(np.ceil(np.sqrt(d)))
        canvas = np.zeros((grid * hh, grid * ww, c), np.float32)
        for i in range(d):
            r, col = divmod(i, grid)
            canvas[r * hh:(r + 1) * hh, col * ww:(col + 1) * ww] = atlas[i]
        write_image(path_prefix + ".png", to8b(canvas))
    else:
        for key, name in (("atlas", "_static"), ("atlas_dyn", "_dyn")):
            tiles = np.asarray(params[key])
            if len(tiles) == 0:
                continue
            act = activate(tiles)
            n, th, tw, c = act.shape
            grid = int(np.ceil(np.sqrt(n)))
            canvas = np.zeros((grid * th, grid * tw, c), np.float32)
            for i in range(n):
                r, col = divmod(i, grid)
                canvas[r * th:(r + 1) * th, col * tw:(col + 1) * tw] = act[i]
            write_image(path_prefix + name + ".png", to8b(canvas))


def save_loopmask_preview(model, params, path_prefix):
    """Loop-mask atlas dump (ref MPI.py:262-271)."""
    if "atlas_mask" not in params:
        return
    a_act = ACTIVATIONS[model.cfg.alpha_activate]
    alpha = np.asarray(a_act(jnp.asarray(params["atlas"][..., -1:])))
    loop = np.asarray(jax.nn.sigmoid(jnp.asarray(params["atlas_mask"])))
    rgba = np.concatenate([1 - loop, loop, np.zeros_like(loop), alpha], -1)
    d, hh, ww, _ = rgba.shape
    grid = int(np.ceil(np.sqrt(d)))
    canvas = np.zeros((grid * hh, grid * ww, 4), np.float32)
    for i in range(d):
        r, col = divmod(i, grid)
        canvas[r * hh:(r + 1) * hh, col * ww:(col + 1) * ww] = rgba[i]
    write_image(path_prefix + ".png", to8b(canvas))


def save_stage1_checkpoint(path, model, params, epoch):
    ckpt_io.save_checkpoint(
        path, geom=model.geom, params=params, stage="mpi",
        is_sparse=model.is_sparse, has_dyn=model.has_dyn,
        tile_map_static=model.tile_map_static,
        tile_map_dyn=model.tile_map_dyn, tile_hw=model.tile_hw,
        extra_meta={"epoch_i": epoch,
                    "rgb_mlp_type": model.cfg.rgb_mlp_type,
                    "rgb_activate": model.cfg.rgb_activate,
                    "alpha_activate": model.cfg.alpha_activate})


def train(args, progress_cb=None):
    """Full stage-1 loop.  Returns (model, params, expdir)."""
    expname = args.expname + args.expname_postfix
    datadir = os.path.join(args.prefix, args.datadir)
    expdir = os.path.join(args.prefix, args.expdir)
    rundir = os.path.join(expdir, expname)

    # multi-host per-process data loading (mirrors train/stage2.py):
    # decide view ownership BEFORE decoding so each process reads only
    # its dp rows' views (stage 1 has one loss config, so ownership is a
    # plain round-robin over all views)
    shard_views = bool(getattr(args, "shard_views", False))
    owner = None
    load_views = None
    if shard_views:
        from videoloop3d_tpu.parallel import distributed as dist0
        if max(int(getattr(args, "patch_batch", 1)), 1) > 1:
            raise ValueError("--shard_views with stage-1 --patch_batch>1 "
                             "is not supported (per-row weight masking "
                             "is one patch per dp row)")
        V_all = llff.count_views(datadir, args.factor)
        owner = dist0.partition_views(list(range(V_all)), [],
                                      jax.process_count())
        load_views = {v for v, p in owner.items()
                      if p == jax.process_index()}
        print(f"[stage1] --shard_views: this process decodes views "
              f"{sorted(load_views)} of {V_all}")

    videos, fps, scene = llff.load_mv_videos(
        basedir=datadir, factor=args.factor,
        bd_factor=(args.near_factor, args.far_factor), recenter=True,
        load_views=load_views)
    H, W = scene["hw"]
    poses, intrins, bds = scene["poses"], scene["intrins"], scene["bds"]

    ref_pose = cameras.average_pose(poses)[:, :4]
    ref_extrin = cameras.pose_to_extrinsic(ref_pose)
    ref_intrin = intrins.mean(0)
    near, far = float(bds.min()), float(bds.max())

    logger = common.MetricsLogger(rundir)
    common.snapshot_run(expdir, expname, args)

    model = MPMesh(args, H, W, ref_extrin, ref_intrin, near, far)
    params = model.init_params(args.seed)

    def load_into_model(path):
        import dataclasses as _dc
        loaded = ckpt_io.load_checkpoint(path)
        meta = loaded["meta"]
        model.geom = loaded["geom"]
        model.is_sparse = meta["is_sparse"]
        model.has_dyn = meta["has_dyn"]
        model.tile_map_static = loaded["tile_map_static"]
        model.tile_map_dyn = loaded["tile_map_dyn"]
        model.tile_hw = tuple(meta["tile_hw"]) if meta["tile_hw"] else None
        # restore decoder type/activations the checkpoint was saved with
        # (they can differ from args after a direct2sh conversion)
        ex = meta.get("extra", {})
        reps = {k: ex[k] for k in ("rgb_mlp_type", "rgb_activate",
                                   "alpha_activate") if k in ex}
        if reps:
            model.cfg = _dc.replace(model.cfg, **reps)
        new_params = {k: jnp.asarray(v) for k, v in loaded["params"].items()}
        return new_params, meta

    start_epoch = 0
    if args.init_from:
        params, _ = load_into_model(os.path.join(args.prefix,
                                                 args.init_from))
    elif not args.disable_auto_resume:
        latest = ckpt_io.latest_checkpoint(rundir)
        if latest:
            params, meta = load_into_model(latest)
            start_epoch = int(meta["extra"].get("epoch_i", -1)) + 1
            print(f"[stage1] auto-resuming from {latest} "
                  f"at epoch {start_epoch}")

    # vid2img/loop-mask disk cache: shared across runs and resumes of
    # the same scene (keyed by view/resolution/mode + content checksum);
    # disable with VL3D_DATA_CACHE=off
    cache_env = os.environ.get("VL3D_DATA_CACHE", "")
    data_cache = None if cache_env.lower() in ("off", "0") else (
        cache_env or os.path.join(args.prefix, args.expdir,
                                  ".data_cache",
                                  os.path.basename(
                                      args.datadir.rstrip("/\\"))))
    dataset = ImagePatchDataset(
        (H, W), videos, (args.patch_h_size, args.patch_w_size),
        (args.patch_h_stride, args.patch_w_stride), poses, intrins,
        args.vid2img_mode, cache_dir=data_cache)

    def set_sparse_bounds():
        """Post-cull --compact_tiles / --blocked_lookup bounds
        (common.set_sparse_fastpath_bounds; NOTE dataset.patch_size,
        not args patch size — PatchSampler clamps to the full image on
        small scenes)."""
        common.set_sparse_fastpath_bounds(
            model, args, cameras.pose_to_extrinsic(dataset.poses),
            dataset.intrins, dataset.patch_size[0],
            dataset.patch_size[1], dataset.origins, "[stage1]",
            args.fast_stage1_grad)

    if model.is_sparse:
        set_sparse_bounds()

    from videoloop3d_tpu.parallel import distributed as dist

    # per-view image/loopmask visualisation dumps (ref train_3d.py:265-272)
    if dist.is_primary():
        for vi, (img, mask) in enumerate(zip(dataset.images,
                                             dataset.masks)):
            if img is None:        # foreign view under --shard_views
                continue
            p = os.path.join(rundir, f"imgvis_{args.vid2img_mode}")
            os.makedirs(p, exist_ok=True)
            write_image(os.path.join(p, f"{vi:04d}.png"), to8b(img))
            p = os.path.join(rundir, "loopvis")
            os.makedirs(p, exist_ok=True)
            write_image(os.path.join(p, f"{vi:04d}.png"), to8b(mask))

    ph, pw = dataset.patch_size

    # device mesh: dp over the patch batch (SURVEY §2.3; stage 1 has no
    # frame axis, so the mesh is dp-only).  Single-device when only one
    # chip is visible.
    n_dev = len(jax.devices()) if args.mesh_devices == 0 \
        else min(args.mesh_devices, len(jax.devices()))
    mesh = None
    if n_dev > 1:
        mesh = dist.make_global_mesh(n_dp=n_dev, n_fp=1)
        print(f"[stage1] mesh: dp={n_dev}"
              + (f" over {jax.process_count()} processes"
                 if jax.process_count() > 1 else ""))

    # run-resident image/mask stacks (uploaded once; steps crop on
    # device — uploads pin host memory on the axon client).  Under a
    # mesh they are placed as global replicated arrays (a process-local
    # jnp.asarray would fail the first sharded step in multi-host runs).
    local_index = None
    if shard_views and mesh is not None:
        # per-process stacks sharded over dp rows: each device holds
        # only ITS process's views; 'view' batch indices become
        # process-local (same scheme as stage-2's video stacks)
        images_dev, local_index = dist.build_sharded_video_stack(
            mesh, owner, list(range(len(dataset.images))),
            dataset.images)
        masks_dev, _ = dist.build_sharded_video_stack(
            mesh, owner, list(range(len(dataset.masks))), dataset.masks)
    elif mesh is not None:
        from jax.sharding import PartitionSpec as P
        placed = dist.commit_batch(
            mesh, {"images": P(), "masks": P()},
            {"images": np.stack(dataset.images),
             "masks": np.stack(dataset.masks)})
        images_dev, masks_dev = placed["images"], placed["masks"]
    else:
        images_dev = jnp.asarray(np.stack(dataset.images))
        masks_dev = jnp.asarray(np.stack(dataset.masks))

    def build_step():
        if mesh is None:
            return make_train_step(model, args, ph, pw)
        from videoloop3d_tpu.parallel.dp_step import make_dp_stage1_step
        return make_dp_stage1_step(model, args, ph, pw, mesh)

    def replicate_params(tree):
        """Multi-host: (re-)place a host/process-local param tree as
        global replicated arrays (events like tile culling rebuild
        params host-side)."""
        if mesh is None or jax.process_count() == 1:
            return tree
        from jax.sharding import PartitionSpec as P
        host = jax.tree.map(np.asarray, tree)
        return dist.commit_batch(mesh, jax.tree.map(lambda _: P(), host),
                                 host)

    params = replicate_params(params)
    step_fn, opt_init, weight_keys = build_step()
    opt_state = opt_init(params)

    weights_base = common.extra_loss_weights(args, weight_keys)
    np_rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)

    prof = common.Profiler(args, rundir)
    shutdown = common.graceful_shutdown()
    watchdog = common.HangWatchdog(
        getattr(args, "hang_timeout", 0.0), "stage1")
    total_step = start_epoch * len(dataset)
    metrics = {}
    bsz = max(int(getattr(args, "patch_batch", 1)), 1)
    if mesh is not None:
        # each dp row takes a patch_batch-sized slice of the global batch
        bsz *= mesh.shape["dp"]
    # leftover partial batch carries ACROSS epochs (so every patch of
    # every epoch is trained on exactly once; with bsz == 1 this is the
    # reference's 1-patch-per-step semantics).  Tested by
    # tests/test_stage1.py::test_patch_batch_epoch_accounting.
    pending = []
    for epoch in range(args.N_iters):
        if epoch < start_epoch:
            continue
        if epoch == args.sparsify_epoch and not model.is_sparse:
            params, cull_info = apply_tile_cull(
                model, params, ACTIVATIONS[model.cfg.alpha_activate],
                erode_num=args.sparsify_erode,
                alpha_thresh=args.sparsify_alpha_thresh,
                rm_first_layers=args.sparsify_rmfirstlayer)
            print(f"[stage1] tile culling: keep {cull_info['keep_frac']:.1%}"
                  f" of tiles, {cull_info['dyn_frac']:.1%} dynamic")
            set_sparse_bounds()
            params = replicate_params(params)
            step_fn, opt_init, weight_keys = build_step()
            opt_state = opt_init(params)

        # direct -> SH conversion event (ref train_3d.py:287-290):
        # widen the atlas to SH coefficients, then rebuild the step
        # (atlas channel count changed) and the optimizer state
        if epoch == args.direct2sh_epoch \
                and model.cfg.rgb_mlp_type == "direct":
            print("[stage1] converting direct atlas to rgb_sh")
            params = replicate_params(convert_direct_to_sh(model, params))
            step_fn, opt_init, weight_keys = build_step()
            opt_state = opt_init(params)

        # vertex-geometry optimization event (ref MPI.py:152-156 gates on
        # step >= optimize_geo_start): re-specialize the step so the
        # render goes through the differentiable vertex warp — in BOTH
        # phases (sparse: the warped coords feed the packed-tile lookup,
        # tests/test_geo_warp.py::test_sparse_phase_vertex_recovery)
        if (not model.optimize_geometry
                and epoch >= args.optimize_geo_start):
            print("[stage1] enabling vertex-geometry optimization")
            model.optimize_geometry = True
            step_fn, opt_init, weight_keys = build_step()

        # vertex-crossing guard: the warp keeps the global far->near
        # plane order, valid while every vertex stays within half the
        # inter-plane gap (geo_warp.py docstring; the reference's
        # z-buffer would reorder, we warn instead of paying a per-pixel
        # depth sort)
        if model.optimize_geometry and (epoch + 1) % args.i_weights == 0:
            from videoloop3d_tpu.render.geo_warp import \
                vertex_crossing_report
            dz, half_gap = vertex_crossing_report(
                model.geom, params["verts"], args.normalize_verts)
            if dz > half_gap:
                print(f"[stage1] WARNING: vertex depth deviation "
                      f"{dz:.4f} exceeds half the inter-plane gap "
                      f"{half_gap:.4f}; plane surfaces may cross and "
                      f"the global composite order becomes invalid "
                      f"(render/geo_warp.py validity bound)")

        # density-weight quadratic ramp (ref train_3d.py:292-293)
        pct = np.clip(epoch / (args.density_loss_epoch + 1), 0, 1)
        weights = dict(weights_base)
        weights["density"] = float(pct * pct * weights_base["density"])
        weights_dev = {k: jnp.asarray(v, jnp.float32)
                       for k, v in weights.items()}

        if shard_views and mesh is not None:
            # dp rows are process-major; each row may only train views
            # its PROCESS owns (its image-stack shard holds only those).
            # Rows that run out of items get weight-0 filler (zero
            # gradient via the masked psum in dp_step) — every patch is
            # trained exactly once per epoch, like stage-2's
            # _batched_items_sharded.
            nproc = jax.process_count()
            rows_pp = mesh.shape["dp"] // nproc
            queues = [[] for _ in range(nproc)]
            for item in dataset.iter_epoch(np_rng, shuffle=True):
                queues[owner[item["view"]]].append(item)
            assert all(queues), (
                "--shard_views needs every process to own >= 1 view "
                "(fillers must be process-local); reduce the process "
                "count or add views")
            n_b = max(-(-len(q) // rows_pp) for q in queues)
            feed = []
            for b in range(n_b):
                chunk, wts = [], []
                for p in range(nproc):
                    rows = queues[p][b * rows_pp:(b + 1) * rows_pp]
                    for r in range(rows_pp):
                        if r < len(rows):
                            chunk.append(rows[r])
                            wts.append(1.0)
                        else:
                            chunk.append(queues[p][0])
                            wts.append(0.0)
                feed.append((chunk, np.asarray(wts, np.float32)))
        else:
            feed = []
            for item in dataset.iter_epoch(np_rng, shuffle=True):
                pending.append(item)
                if len(pending) >= bsz:
                    feed.append((pending, None))
                    pending = []
        for chunk, wts in feed:
            lr = opt_lib.lr_schedule(total_step, args.lrate,
                                     decay_steps_k=args.lrate_decay)
            exts, intrs, views, h0s, w0s = [], [], [], [], []
            for it in chunk:
                intrin = it["intrin"]
                if args.add_intrin_noise:
                    intrin = common.jitter_intrinsic(intrin, np_rng)
                exts.append(cameras.pose_to_extrinsic(it["pose"]))
                intrs.append(intrin)
                views.append(it["view"] if local_index is None
                             else local_index[it["view"]])
                w0, h0 = it["wh_start"]
                h0s.append(h0)
                w0s.append(w0)
            batch = {
                "extrin": np.stack(exts).astype(np.float32),
                "intrin": np.stack(intrs).astype(np.float32),
                "view": np.asarray(views, np.int32),
                "h0": np.asarray(h0s, np.int32),
                "w0": np.asarray(w0s, np.int32),
            }
            if local_index is not None:
                batch["images_sharded"] = images_dev
                batch["masks_sharded"] = masks_dev
                if wts is not None:
                    batch["wt"] = wts
            else:
                batch["images"] = images_dev
                batch["masks"] = masks_dev
            if mesh is None:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            else:
                # multi-host: every process built the same global batch
                # (same seeded dataset); commit local shards
                from videoloop3d_tpu.parallel.dp_step import \
                    STAGE1_BATCH_KEY_SPECS
                batch = dist.commit_batch(
                    mesh, {k: STAGE1_BATCH_KEY_SPECS[k] for k in batch},
                    batch)
            key, sub = jax.random.split(key)
            prof.step(total_step)
            params, opt_state, metrics = step_fn(
                params, opt_state, batch, jnp.asarray(lr, jnp.float32),
                weights_dev, sub)
            # bounded-frequency device sync: long async chains on the
            # tunneled axon runtime pin every in-flight batch's host
            # staging buffer (stage 2 leaked to an OOM kill this way).
            # Stage-1 batches are ~1 MB, so 1-in-8 bounds the pin at a
            # few MB for ~3 ms/step of sync cost.
            if total_step % 8 == 0:
                _ = float(metrics["loss"])
            prof.tick()
            watchdog.tick()
            if total_step % args.i_img == 0:
                for k, v in metrics.items():
                    logger.scalar(f"stage1/{k}", float(v), total_step)
                logger.scalar("stage1/lr", lr, total_step)
            total_step += 1
            # graceful shutdown, single-process: stop mid-epoch (under a
            # multi-process mesh the steps are collective, so stopping
            # alone would wedge the peers — those coordinate at the
            # epoch boundary below)
            if shutdown.requested and jax.process_count() == 1:
                interrupted = True
                break
        else:
            interrupted = False

        if metrics and (epoch % max(args.i_print // 10, 1) == 0):
            print(f"[stage1] epoch {epoch} loss={float(metrics['loss']):.4f}"
                  f" psnr={float(metrics['psnr']):.2f}"
                  f" ({prof.steps_per_sec():.2f} it/s)")
        if progress_cb is not None:
            progress_cb(epoch, metrics)

        # graceful shutdown: coordinated across processes once per epoch
        # (any_process_flag is collective — every process reaches this
        # point, so a SIGTERM delivered to one process stops all)
        stop = interrupted or dist.any_process_flag(shutdown.requested)
        if stop:
            # a mid-epoch interrupt saves with epoch-1 metadata so the
            # deterministic auto-resume re-runs the partial epoch
            completed = epoch - 1 if interrupted else epoch
            if completed >= 0:
                params_host = dist.gather_for_host(params)
                if dist.is_primary():
                    save_stage1_checkpoint(
                        os.path.join(rundir,
                                     f"ckpt_epoch_{completed:04d}.npz"),
                        model, params_host, completed)
            print(f"[stage1] graceful shutdown at epoch {epoch}: "
                  f"checkpointed epoch {completed}; rerun to resume")
            break

        if (epoch + 1) % args.i_weights == 0 or epoch == args.N_iters - 1:
            # multi-host: gather is COLLECTIVE (all processes join);
            # only the primary writes the file
            params_host = dist.gather_for_host(params)
            if dist.is_primary():
                save_stage1_checkpoint(
                    os.path.join(rundir, f"ckpt_epoch_{epoch:04d}.npz"),
                    model, params_host, epoch)
            # epoch-boundary work (gather + write) counts as progress —
            # without a tick the watchdog would misread a slow save +
            # preview + next re-specialization compile as a hang
            watchdog.tick()

        if (epoch + 1) % args.i_video == 0 and jax.process_count() == 1:
            frames = render_preview(model, params, H, W,
                                    cameras.pose_to_extrinsic(
                                        scene["render_poses"]),
                                    scene["render_intrins"])
            rgb = frames[..., :3]
            write_video(os.path.join(rundir, f"epoch_{epoch:04d}_rgb.mp4"),
                        to8b(rgb), fps=25)
            if frames.shape[-1] == 4:
                lm = frames[..., 3]
                lm = np.stack([np.zeros_like(lm), lm, np.zeros_like(lm)], -1)
                write_video(os.path.join(
                    rundir, f"epoch_{epoch:04d}_loopable.mp4"),
                    to8b(lm), fps=25)
            save_texture_preview(model, params,
                                 os.path.join(rundir,
                                              f"texture_epoch_{epoch:04d}"))
            from videoloop3d_tpu.export.mesh_export import (
                save_mesh_preview, full_tile_map)
            if model.is_sparse:
                save_mesh_preview(model.geom, model.tile_map_static,
                                  model.tile_map_dyn,
                                  os.path.join(
                                      rundir, f"mesh_epoch_{epoch:04d}"))
            else:
                save_mesh_preview(model.geom, full_tile_map(model.geom),
                                  None,
                                  os.path.join(
                                      rundir, f"mesh_epoch_{epoch:04d}"))
            save_loopmask_preview(model, params,
                                  os.path.join(
                                      rundir,
                                      f"loopable_epoch_{epoch:04d}"))
            watchdog.tick()      # previews render many frames; progress

    watchdog.stop()
    prof.close()
    logger.close()
    return model, params, rundir
