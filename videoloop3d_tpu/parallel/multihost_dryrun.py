"""Worker for the 2-process CPU multi-host dryrun.

Each process runs this module with a distinct --process_id; together
they form one jax.distributed job (gloo collectives on CPU) and execute
ONE step of the REAL dp-sharded stage-2 training step on a global
('dp', 'fp') mesh whose dp axis spans the two processes — the same
code path a real multi-host TPU job takes (see parallel/distributed.py).

Run via __graft_entry__.dryrun_multichip (which spawns both processes)
or by hand:

    python -m videoloop3d_tpu.parallel.multihost_dryrun \
        --process_id 0 --num_processes 2 --port 29531 &
    python -m videoloop3d_tpu.parallel.multihost_dryrun \
        --process_id 1 --num_processes 2 --port 29531
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--port", type=int, default=29531)
    ap.add_argument("--local_devices", type=int, default=2)
    ap.add_argument("--mode",
                    choices=["step", "shard_views", "stage1_sv",
                             "sigterm_stop"],
                    default="step")
    ap.add_argument("--sv_views", type=int, default=4,
                    help="scene view count for the shard_views modes "
                         "(uneven partitions when not divisible by "
                         "num_processes)")
    opts = ap.parse_args(argv)

    # CPU platform + virtual local devices, BEFORE backend init
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
                    f"{opts.local_devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from videoloop3d_tpu.parallel import distributed as dist
    dist.init_distributed(
        coordinator_address=f"localhost:{opts.port}",
        num_processes=opts.num_processes, process_id=opts.process_id)

    if opts.mode == "shard_views":
        return run_shard_views(opts)
    if opts.mode == "stage1_sv":
        return run_stage1_shard_views(opts)
    if opts.mode == "sigterm_stop":
        return run_sigterm_stop(opts)

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    assert jax.process_count() == opts.num_processes
    n_dev = jax.device_count()

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, repo_root)
    import __graft_entry__ as ge
    import numpy as np

    from videoloop3d_tpu.parallel.dp_step import make_dp_stage2_step

    scene, args, model, params, (h, w) = ge._tiny_setup(frm=4)
    mesh = dist.make_global_mesh(n_dp=n_dev, n_fp=1)
    assert mesh.devices.shape == (n_dev, 1)

    losscfg = {"loss_name": "gpnn_lm", "patch_size": 3, "patcht_size": 3,
               "stride": 2, "stridet": 1, "alpha": 10000, "rou": "-2",
               "scaling": 0.1, "macro_block": 17, "factor": 1,
               "loss_gain": 1.0, "dist_fn": "mse", "num_proj": 32}
    step, opt_init = make_dp_stage2_step(model, args, h, w, losscfg, mesh)

    ext = np.stack([np.linalg.inv(np.concatenate(
        [scene["poses"][i % 2], np.array([[0, 0, 0, 1.0]], np.float32)]))
        for i in range(n_dev)]).astype(np.float32)
    intr = np.stack([scene["intrins"][i % 2]
                     for i in range(n_dev)]).astype(np.float32)
    vids = np.stack([scene["videos"][i % 2]
                     for i in range(n_dev)]).astype(np.float32)

    # every process builds the same global values; commit_* places them
    rep = lambda tree: dist.commit_batch(         # noqa: E731
        mesh, jax.tree.map(lambda _: P(), tree), tree)
    params = rep({k: np.asarray(v) for k, v in params.items()})
    opt_state = opt_init(params)
    batch = dist.commit_batch(
        mesh, {"extrin": P("dp"), "intrin": P("dp"), "video": P("dp")},
        {"extrin": ext, "intrin": intr, "video": vids})
    weights = rep({k: np.asarray(0.1, np.float32)
                   for k in ("sparsity", "rgb_smooth", "a_smooth",
                             "d_smooth", "density")})
    lr = rep({"lr": np.asarray(0.1, np.float32)})["lr"]
    rng = rep({"k": np.asarray(jax.random.PRNGKey(0))})["k"]

    shapes = {k: v.shape for k, v in params.items()}
    params2, opt_state, metrics = step(params, opt_state, batch, lr,
                                       weights, rng)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    # checkpoint path: collective host gather, then primary-only write
    host = dist.gather_for_host(params2)
    for k, v in host.items():
        v = np.asarray(v)
        assert v.shape == shapes[k], (k, v.shape, shapes[k])
        assert np.isfinite(v).all(), k
    assert dist.is_primary() == (opts.process_id == 0)
    # the dp pmean must agree across processes: print on both, the
    # launcher compares
    print(f"MULTIHOST_OK process={opts.process_id} "
          f"procs={jax.process_count()} devices={n_dev} "
          f"loss={loss:.6f}", flush=True)


def run_shard_views(opts):
    """Phase 3 of the multichip dryrun: the REAL stage-2 trainer with
    --shard_views across N coordinated processes.  Asserts this process
    decoded ONLY the views `partition_views` assigns it (disjoint host
    data — the launcher cross-checks the processes' decode sets are
    pairwise disjoint and complete).  With --sv_views not divisible by
    --num_processes this exercises UNEVEN partitions (e.g. 10 views / 4
    processes), plus the per-epoch OR'd stop-flag collective and the
    primary-only checkpoint gather (i_weights=1 forces a save)."""
    import tempfile

    import jax
    import numpy as np

    from videoloop3d_tpu.config import parse_args_with_configs
    from videoloop3d_tpu.data import synthetic, video as video_io
    from videoloop3d_tpu.parallel.distributed import partition_views
    from videoloop3d_tpu.train import stage2

    n_views = opts.sv_views
    # per-process scene dir with IDENTICAL content (same seed)
    scene_dir = os.path.join(
        tempfile.gettempdir(),
        f"sv_dryrun_v{n_views}_p{jax.process_index()}", "scene")
    if not os.path.exists(os.path.join(scene_dir, "poses_bounds.npy")):
        scene = synthetic.make_scene(n_views=n_views, h=24, w=32,
                                     n_frames=4, seed=0)
        synthetic.write_llff_dir(scene, scene_dir, factor=1)

    decoded = []
    orig_read = video_io.read_video

    def counting_read(path):
        arr = orig_read(path)
        decoded.append((os.path.basename(path), arr.nbytes))
        return arr

    video_io.read_video = counting_read
    root = os.path.dirname(scene_dir)
    argv = ["--datadir", scene_dir, "--expdir", os.path.join(root, "mpv"),
            "--expname", "sv", "--factor", "1",
            "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
            "--mpi_h_verts", "5", "--mpi_w_verts", "7",
            "--mpi_d", "4", "--atlas_grid_h", "2",
            "--mpv_frm_num", "4", "--mpv_isloop",
            "--patch_h_size", "24", "--patch_w_size", "32",
            "--patch_h_stride", "16", "--patch_w_stride", "24",
            "--lrate", "0.2", "--lrate_adaptive",
            "--pyr_minimal_dim", "20", "--pyr_num_epoch", "1",
            "--loss_name", "gpnn_lm",
            "--swd_patch_size", "3", "--swd_patcht_size", "3",
            "--swd_stride", "2", "--swd_stridet", "1",
            # both loss configs in play: views 0,1 are reference views,
            # so the round-robin partition gives EACH process one ref +
            # one other view (exercises the per-class split)
            "--loss_ref_idx", "0,1", "--loss_name_ref", "gpnn_lm",
            "--swd_patch_size_ref", "3", "--swd_patcht_size_ref", "3",
            "--swd_stride_ref", "2", "--swd_stridet_ref", "1",
            "--swd_loss_gain_ref", "2.0",
            "--swd_macro_block", "17", "--swd_num_proj", "16",
            "--scale_invariant", "--init_std", "0.02",
            "--i_weights", "1", "--i_video", "1000", "--i_img", "100",
            "--i_print", "1000", "--seed", "1",
            "--shard_views", "--disable_auto_resume"]
    losses = []
    stage2.train(parse_args_with_configs(argv),
                 progress_cb=lambda li, ep, m: losses.append(
                     float(m["loss"])))

    # disjointness: exactly the views partition_views assigns were
    # decoded (uneven counts when nproc does not divide n_views)
    nproc = jax.process_count()
    owner = partition_views(list(range(n_views)), {0, 1}, nproc)
    expected = sorted(v for v, p in owner.items()
                      if p == jax.process_index())
    my_views = sorted(int(os.path.splitext(n)[0]) for n, _ in decoded)
    assert my_views == expected, (my_views, expected)
    host_bytes = sum(b for _, b in decoded)
    assert losses and np.isfinite(losses[-1])
    # primary-only checkpoint write (gather_for_host ran on everyone)
    rundir = os.path.join(root, "mpv", "sv")
    wrote_ckpt = any(f.endswith(".npz") for f in os.listdir(rundir)) \
        if os.path.isdir(rundir) else False
    print(f"MULTIHOST_SV_OK process={jax.process_index()} "
          f"views={','.join(map(str, my_views))} "
          f"host_bytes={host_bytes} ckpt={int(wrote_ckpt)} "
          f"loss={losses[-1]:.6f}", flush=True)


def run_stage1_shard_views(opts):
    """The REAL stage-1 trainer with --shard_views across 2 coordinated
    processes: per-process video decode (vid2img + loop mask computed
    only for owned views), image stacks sharded over dp rows, weight-0
    filler rows for uneven patch counts.  The launcher cross-checks
    disjoint decode sets and equal losses."""
    import tempfile

    import jax
    import numpy as np

    from videoloop3d_tpu.config import parse_args_with_configs
    from videoloop3d_tpu.data import synthetic, video as video_io
    from videoloop3d_tpu.train import stage1

    scene_dir = os.path.join(tempfile.gettempdir(),
                             f"s1sv_dryrun_p{jax.process_index()}", "scene")
    if not os.path.exists(os.path.join(scene_dir, "poses_bounds.npy")):
        scene = synthetic.make_scene(n_views=4, h=24, w=32, n_frames=4,
                                     seed=0)
        synthetic.write_llff_dir(scene, scene_dir, factor=1)

    decoded = []
    orig_read = video_io.read_video

    def counting_read(path):
        arr = orig_read(path)
        decoded.append((os.path.basename(path), arr.nbytes))
        return arr

    video_io.read_video = counting_read
    root = os.path.dirname(scene_dir)
    argv = ["--datadir", scene_dir, "--expdir", os.path.join(root, "mpi"),
            "--expname", "s1sv", "--factor", "1",
            "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
            "--mpi_h_verts", "5", "--mpi_w_verts", "7",
            "--mpi_d", "4", "--atlas_grid_h", "2",
            "--patch_h_size", "24", "--patch_w_size", "32",
            "--patch_h_stride", "16", "--patch_w_stride", "24",
            "--lrate", "0.1", "--N_iters", "2",
            "--scale_invariant", "--learn_loop_mask",
            "--i_weights", "1000", "--i_video", "1000", "--i_img", "100",
            "--i_print", "1000", "--seed", "1",
            "--shard_views", "--disable_auto_resume"]
    losses = []
    stage1.train(parse_args_with_configs(argv),
                 progress_cb=lambda e, m: losses.append(float(m["loss"])))

    n_views = 4
    nproc = jax.process_count()
    assert len(decoded) == n_views // nproc, decoded
    my_views = sorted(int(os.path.splitext(n)[0]) for n, _ in decoded)
    host_bytes = sum(b for _, b in decoded)
    assert losses and np.isfinite(losses[-1])
    print(f"MULTIHOST_S1SV_OK process={jax.process_index()} "
          f"views={','.join(map(str, my_views))} "
          f"host_bytes={host_bytes} loss={losses[-1]:.6f}", flush=True)


def run_sigterm_stop(opts):
    """Coordinated graceful-stop fault injection: the REAL stage-1
    trainer on a 2-process dp mesh with an effectively unbounded epoch
    count.  The launcher SIGTERMs ONLY this job's process 1 once both
    processes print epoch progress; the once-per-epoch
    ``any_process_flag`` OR must then stop BOTH processes at the same
    epoch boundary, and the PRIMARY (process 0 — the one that was NOT
    signaled) must write the shutdown checkpoint."""
    import tempfile

    import jax
    import numpy as np

    from videoloop3d_tpu.config import parse_args_with_configs
    from videoloop3d_tpu.data import synthetic
    from videoloop3d_tpu.train import common, stage1

    scene_dir = os.path.join(tempfile.gettempdir(),
                             f"st_dryrun_p{jax.process_index()}", "scene")
    if not os.path.exists(os.path.join(scene_dir, "poses_bounds.npy")):
        scene = synthetic.make_scene(n_views=3, h=24, w=32, n_frames=4,
                                     seed=0)
        synthetic.write_llff_dir(scene, scene_dir, factor=1)

    root = os.path.dirname(scene_dir)
    expdir = os.path.join(root, "mpi")
    rundir = os.path.join(expdir, "st")
    if os.path.isdir(rundir):          # stale ckpts from a prior run
        for f in os.listdir(rundir):
            if f.startswith("ckpt_"):
                os.remove(os.path.join(rundir, f))
    argv = ["--datadir", scene_dir, "--expdir", expdir,
            "--expname", "st", "--factor", "1",
            "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
            "--mpi_h_verts", "5", "--mpi_w_verts", "7",
            "--mpi_d", "4", "--atlas_grid_h", "2",
            "--patch_h_size", "24", "--patch_w_size", "32",
            "--patch_h_stride", "16", "--patch_w_stride", "24",
            "--lrate", "0.1", "--N_iters", "100000",
            "--scale_invariant",
            "--i_weights", "1000000", "--i_video", "1000000",
            "--i_img", "10000", "--i_print", "1000000", "--seed", "1",
            "--disable_auto_resume"]
    seen = []

    def cb(epoch, metrics):
        seen.append(epoch)
        if epoch % 5 == 0:
            print(f"STOP_DRYRUN_EPOCH process={jax.process_index()} "
                  f"epoch={epoch}", flush=True)

    stage1.train(parse_args_with_configs(argv), progress_cb=cb)
    sd = common.graceful_shutdown()
    ckpts = sorted(f for f in os.listdir(os.path.join(expdir, "st"))
                   if f.startswith("ckpt_"))
    print(f"MULTIHOST_STOP_OK process={jax.process_index()} "
          f"signaled={int(sd.requested)} stopped_epoch={seen[-1]} "
          f"ckpts={len(ckpts)} is_primary={int(jax.process_index() == 0)}",
          flush=True)


if __name__ == "__main__":
    main()
