"""Failure handling (SURVEY §5: the reference has none — a crash loses
up to i_weights epochs and a wedged process hangs forever).

Covers: graceful SIGTERM -> checkpoint-and-exit (unit, in-process
trainer wiring for both stages, and a real signal against the CLI in a
subprocess), the hang watchdog, and the multi-process stop-flag
reduction."""
import os
import re
import signal
import subprocess
import sys
import threading
import time

from videoloop3d_tpu.config import parse_args_with_configs
from videoloop3d_tpu.data import synthetic
from videoloop3d_tpu.train import common, stage1, stage2


def _write_scene(tmp_path):
    scene = synthetic.make_scene(n_views=3, h=24, w=32, n_frames=6, seed=0)
    scene_dir = str(tmp_path / "scene")
    synthetic.write_llff_dir(scene, scene_dir, factor=1)
    return scene_dir


def _stage1_args(tmp_path, scene_dir, **over):
    argv = [
        "--datadir", scene_dir, "--expdir", str(tmp_path / "exp"),
        "--expname", "ft", "--factor", "1",
        "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
        "--mpi_h_verts", "5", "--mpi_w_verts", "7",
        "--mpi_d", "4", "--atlas_grid_h", "2",
        "--patch_h_size", "24", "--patch_w_size", "32",
        "--patch_h_stride", "16", "--patch_w_stride", "24",
        "--lrate", "0.1", "--N_iters", "6",
        "--i_weights", "1000", "--i_video", "1000",
        "--i_img", "100", "--i_print", "1000",
        "--scale_invariant", "--seed", "1", "--mesh_devices", "1",
    ]
    for k, v in over.items():
        argv += [f"--{k}"] if v is None else [f"--{k}", str(v)]
    return parse_args_with_configs(argv)


def test_hang_watchdog_fires_after_timeout_and_ticks_hold_it_off():
    fired = []
    wd = common.HangWatchdog(0.8, "test",
                             action=lambda idle: fired.append(idle))
    try:
        for _ in range(5):                   # ticks keep it quiet
            time.sleep(0.25)
            wd.tick()
        assert not fired
        deadline = time.time() + 10.0        # silence trips it
        while not fired and time.time() < deadline:
            time.sleep(0.1)
        assert fired and fired[0] > 0.8
    finally:
        wd.stop()


def test_hang_watchdog_disabled_by_default():
    wd = common.HangWatchdog(0.0, "test",
                             action=lambda idle: (_ for _ in ()).throw(
                                 AssertionError("must not fire")))
    assert wd._thread is None
    wd.stop()


def test_graceful_shutdown_flag_on_real_sigterm():
    sd = common.GracefulShutdown()
    try:
        assert not sd.requested
        os.kill(os.getpid(), signal.SIGTERM)
        deadline = time.time() + 5.0
        while not sd.requested and time.time() < deadline:
            time.sleep(0.05)
        assert sd.requested
    finally:
        sd.restore()


def test_graceful_shutdown_skips_install_off_main_thread():
    out = {}

    def worker():
        out["sd"] = common.GracefulShutdown()

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert not out["sd"]._installed and not out["sd"].requested


def test_any_process_flag_single_process():
    from videoloop3d_tpu.parallel.distributed import any_process_flag
    assert any_process_flag(True) is True
    assert any_process_flag(False) is False


def test_stage1_graceful_stop_checkpoints_and_resumes(tmp_path):
    """Stop request at epoch 1 -> checkpoint + early return; a rerun
    auto-resumes at epoch 2 and completes the schedule."""
    scene_dir = _write_scene(tmp_path)
    args = _stage1_args(tmp_path, scene_dir)
    sd = common.graceful_shutdown()
    seen = []

    def cb(epoch, metrics):
        seen.append(epoch)
        if epoch == 1:
            sd.requested = True

    try:
        model, params, rundir = stage1.train(args, progress_cb=cb)
        assert seen == [0, 1]                    # stopped early
        assert os.path.exists(os.path.join(rundir,
                                           "ckpt_epoch_0001.npz"))
        sd.requested = False
        seen2 = []
        stage1.train(args, progress_cb=lambda e, m: seen2.append(e))
        assert seen2 == [2, 3, 4, 5]             # resumed, completed
        assert os.path.exists(os.path.join(rundir,
                                           "ckpt_epoch_0005.npz"))
    finally:
        sd.requested = False


def test_stage2_graceful_stop_checkpoints_and_resumes(tmp_path):
    """Same contract for the stage-2 pyramid loop (dense scratch run)."""
    from tests.test_stage2 import _stage2_args
    scene_dir = _write_scene(tmp_path)
    args = _stage2_args(tmp_path, scene_dir, mesh_devices="1")
    sd = common.graceful_shutdown()
    seen = []

    def cb(pyr_i, epoch, metrics):
        seen.append((pyr_i, epoch))
        if (pyr_i, epoch) == (0, 0):
            sd.requested = True

    try:
        model, params, rundir = stage2.train(args, progress_cb=cb)
        assert seen == [(0, 0)]
        assert os.path.exists(os.path.join(rundir,
                                           "ckpt_l0_epoch_0000.npz"))
        sd.requested = False
        seen2 = []
        stage2.train(args,
                     progress_cb=lambda p, e, m: seen2.append((p, e)))
        assert seen2 and seen2[0] == (0, 1)      # resumed mid-level
        assert seen2[-1][1] == 1                 # last level completed
    finally:
        sd.requested = False


def test_cli_sigterm_checkpoints_exits_75_and_resumes(tmp_path):
    """Fault injection against the real CLI: SIGTERM mid-run must exit
    75 (EX_TEMPFAIL) leaving a checkpoint; the rerun auto-resumes."""
    scene_dir = _write_scene(tmp_path)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = [
        sys.executable, "-m", "videoloop3d_tpu.tools.train_3d",
        "--gpu_num", "0", "--mesh_devices", "1",
        "--datadir", scene_dir, "--expdir", str(tmp_path / "exp"),
        "--expname", "ftcli", "--factor", "1",
        "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
        "--mpi_h_verts", "5", "--mpi_w_verts", "7",
        "--mpi_d", "4", "--atlas_grid_h", "2",
        "--patch_h_size", "24", "--patch_w_size", "32",
        "--patch_h_stride", "16", "--patch_w_stride", "24",
        "--lrate", "0.1", "--i_weights", "1000", "--i_video", "1000",
        "--i_img", "100", "--i_print", "10",     # epoch line every epoch
        "--scale_invariant", "--seed", "1",
    ]
    p = subprocess.Popen(base + ["--N_iters", "200"], cwd=root,
                         stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    lines, evt = [], threading.Event()

    def reader():
        for line in p.stdout:
            lines.append(line)
            if re.search(r"\[stage1\] epoch 2 ", line):
                evt.set()
        p.stdout.close()

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        assert evt.wait(timeout=300), "".join(lines[-40:])
        p.send_signal(signal.SIGTERM)
        rc = p.wait(timeout=180)
    finally:
        if p.poll() is None:
            p.kill()
            p.wait()
    t.join(timeout=30)
    out = "".join(lines)
    assert rc == 75, (rc, out[-2000:])
    assert "graceful shutdown" in out, out[-2000:]
    rundir = str(tmp_path / "exp" / "ftcli")
    ckpts = [f for f in os.listdir(rundir) if f.startswith("ckpt_")]
    assert ckpts, os.listdir(rundir)

    out2 = subprocess.run(base + ["--N_iters", "8"], cwd=root,
                          capture_output=True, text=True, timeout=600)
    assert out2.returncode == 0, out2.stdout[-2000:] + out2.stderr[-500:]
    assert "auto-resuming" in out2.stdout, out2.stdout[-2000:]


def test_multihost_sigterm_stops_both_processes():
    """Coordinated multi-host graceful stop: SIGTERM delivered to ONLY
    process 1 of a 2-process dp-mesh stage-1 job must stop BOTH
    processes at the same epoch boundary (the per-epoch
    any_process_flag OR), and the PRIMARY — process 0, which was never
    signaled — must write the shutdown checkpoint."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    if "XLA_FLAGS" in env:
        env["XLA_FLAGS"] = re.sub(
            r"--xla_force_host_platform_device_count=\d+", "",
            env["XLA_FLAGS"]).strip()
        if not env["XLA_FLAGS"]:
            del env["XLA_FLAGS"]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, "-m",
         "videoloop3d_tpu.parallel.multihost_dryrun",
         "--process_id", str(i), "--num_processes", "2",
         "--port", "29539", "--mode", "sigterm_stop"],
        cwd=root, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    lines = [[], []]
    evts = [threading.Event(), threading.Event()]

    def reader(i):
        for line in procs[i].stdout:
            lines[i].append(line)
            if "STOP_DRYRUN_EPOCH" in line:
                evts[i].set()
        procs[i].stdout.close()

    threads = [threading.Thread(target=reader, args=(i,), daemon=True)
               for i in range(2)]
    for t in threads:
        t.start()
    try:
        # wait until both processes are demonstrably in the epoch loop
        assert evts[0].wait(timeout=300), "".join(lines[0][-30:])
        assert evts[1].wait(timeout=300), "".join(lines[1][-30:])
        procs[1].send_signal(signal.SIGTERM)     # only process 1
        rcs = [p.wait(timeout=240) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for t in threads:
        t.join(timeout=30)
    outs = ["".join(ln) for ln in lines]
    oks = []
    for i, out in enumerate(outs):
        assert rcs[i] == 0, (i, rcs[i], out[-2000:])
        m = re.search(r"MULTIHOST_STOP_OK process=%d signaled=(\d) "
                      r"stopped_epoch=(\d+) ckpts=(\d+)" % i, out)
        assert m, (i, out[-2000:])
        oks.append(tuple(int(g) for g in m.groups()))
    # only process 1 saw the signal; both stopped at the same epoch;
    # the unsignaled primary wrote the checkpoint, the peer did not
    assert oks[0][0] == 0 and oks[1][0] == 1, oks
    assert oks[0][1] == oks[1][1], oks
    assert oks[0][2] == 1 and oks[1][2] == 0, oks
