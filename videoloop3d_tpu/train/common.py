"""Shared trainer utilities: run snapshots, logging, scale-invariant
gain, and the failure-handling primitives (graceful shutdown + hang
watchdog; SURVEY §5 — the reference has no failure story and a crash
loses up to i_weights epochs).
"""
from __future__ import annotations

import json
import os
import shutil
import signal
import threading
import time

import jax.numpy as jnp
import numpy as np

from videoloop3d_tpu.config import args_to_string


def mse(x, y):
    return jnp.mean((x - y) ** 2)


def mse_to_psnr(v):
    return -10.0 * jnp.log(v) / jnp.log(jnp.asarray(10.0))


def scale_invariant_gain(gt_mean, render_mean):
    """Global gain aligning render brightness to GT, damped toward 1.
    Parity: ref train_3d.py:216-219 / MPV.py:499-504."""
    scale = jnp.exp(jnp.mean(jnp.log((gt_mean + 0.01) / (render_mean + 0.01))))
    return (scale + 3.0) / 4.0


def snapshot_run(expdir, expname, args):
    """Persist args + config files for reproducibility
    (ref train_3d.py:133-150; source copies are replaced by recording the
    package version + git state, since the framework is an installed
    package rather than loose scripts)."""
    run_dir = os.path.join(expdir, expname, f"source_{int(time.time())}")
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "args.txt"), "w") as f:
        f.write(args_to_string(args))
    for attr, name in (("config", "config.txt"), ("config1", "config1.txt")):
        path = getattr(args, attr, "")
        if path and os.path.exists(path):
            shutil.copyfile(path, os.path.join(run_dir, name))
    import videoloop3d_tpu
    with open(os.path.join(run_dir, "version.json"), "w") as f:
        json.dump({"videoloop3d_tpu": videoloop3d_tpu.__version__}, f)
    return run_dir


class MetricsLogger:
    """TensorBoard (tensorboardX) if available, always a JSONL file."""

    def __init__(self, logdir):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter
            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def scalar(self, tag, value, step):
        value = float(value)
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": value, "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def extra_loss_weights(args, extras_keys):
    """Reflection over <name>_loss_weight flags (ref train_3d.py:224-228)."""
    out = {}
    for k in extras_keys:
        out[k] = float(getattr(args, f"{k}_loss_weight", 0.0))
    return out


class Profiler:
    """jax.profiler trace capture over a step window + step timing.

    The reference has no tracing at all (SURVEY §5); this provides
    ``--profile_steps start:stop`` traces viewable in TensorBoard and a
    rolling steps/sec figure for the logs.
    """

    def __init__(self, args, rundir):
        self.window = None
        if getattr(args, "profile_steps", ""):
            a, b = args.profile_steps.split(":")
            self.window = (int(a), int(b))
            self.outdir = getattr(args, "profile_dir", "") or \
                os.path.join(rundir, "profile")
        self._active = False
        self._times = []
        self._last = None

    def step(self, step_idx):
        if self.window is None:
            return
        import jax
        if step_idx == self.window[0] and not self._active:
            os.makedirs(self.outdir, exist_ok=True)
            jax.profiler.start_trace(self.outdir)
            self._active = True
        elif step_idx >= self.window[1] and self._active:
            jax.profiler.stop_trace()
            self._active = False
            print(f"[profile] trace written to {self.outdir}")

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > 100:
                self._times.pop(0)
        self._last = now

    def steps_per_sec(self):
        if not self._times:
            return 0.0
        return 1.0 / (sum(self._times) / len(self._times))

    def close(self):
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False


class GracefulShutdown:
    """SIGTERM -> checkpoint-and-exit at the next safe point.

    The handler only sets a flag; the trainers poll it after each
    optimizer step (single-process) and, coordinated via
    ``distributed.any_process_flag``, at every epoch boundary
    (multi-host — a mid-epoch break would desync the collective steps).
    On stop the trainer writes a checkpoint whose epoch metadata makes
    the deterministic auto-resume re-run the interrupted epoch, so a
    preemption loses at most the partial epoch's step order, never
    i_weights epochs of work (the reference's crash cost,
    ref train_3d.py:312).  Prefer SIGTERM over SIGKILL on the axon
    runtime anyway: a SIGKILLed TPU process wedges the chip claim.

    Handler installation is skipped off the main thread (tests drive
    trainers from worker threads; ``signal.signal`` would raise).
    """

    def __init__(self, install=True):
        self.requested = False
        self._prev = None
        self._installed = False
        if install:
            try:
                self._prev = signal.signal(signal.SIGTERM, self._handler)
                self._installed = True
            except ValueError:     # not the main thread
                pass

    def _handler(self, signum, frame):
        self.requested = True
        # os.write, not print(): the signal can interrupt the main
        # thread while IT holds the stdout buffer lock, and a buffered
        # write here would raise "reentrant call inside BufferedWriter"
        # into the interrupted code — killing the trainer with exit 1
        # instead of the graceful path this handler exists to provide
        os.write(2, b"[shutdown] SIGTERM received - checkpointing and "
                    b"exiting at the next safe point\n")

    def restore(self):
        if self._installed:
            signal.signal(signal.SIGTERM, self._prev or signal.SIG_DFL)
            self._installed = False


_SHUTDOWN = None


def graceful_shutdown() -> GracefulShutdown:
    """Process-wide GracefulShutdown singleton (handlers installed on
    first use; tools check ``.requested`` after train() to exit 75 =
    EX_TEMPFAIL so schedulers / run_all.sh treat the run as resumable
    rather than finished)."""
    global _SHUTDOWN
    if _SHUTDOWN is None:
        _SHUTDOWN = GracefulShutdown()
    return _SHUTDOWN


class HangWatchdog:
    """Turns a silent hang into a fast, visible failure.

    Failure detection for the multi-host path (SURVEY §5): when a peer
    process dies, the survivors block forever inside the next collective
    — no exception, no progress, the job just wedges (the same syndrome
    as a wedged axon device claim).  A daemon thread checks the step
    heartbeat; ``timeout_s`` seconds without a ``tick()`` prints a
    diagnosis and hard-exits the process with code 42 so the scheduler
    restarts it, and the deterministic auto-resume continues from the
    latest checkpoint.

    The timeout must cover the worst single gap between ticks — i.e. a
    cold per-level step compile (~70 s on the v5e for the production
    stage-1 step, ~12 compiles across the stage-2 pyramid), so shipped
    configs use 600 s.  0 disables (the default).

    Armed for the trainer's whole run; if the trainer RAISES, the
    daemon thread keeps watching until process exit (fine for the CLIs,
    which exit on exception — the only place the shipped configs arm
    it).  Library callers that catch trainer exceptions and keep the
    process alive should keep hang_timeout at 0 or call ``stop()``.
    """

    EXIT_CODE = 42

    def __init__(self, timeout_s, context="", action=None):
        self.timeout_s = float(timeout_s or 0)
        self.context = context
        self._action = action or self._default_action
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread = None
        if self.timeout_s > 0:
            self._thread = threading.Thread(
                target=self._run, name=f"hang-watchdog-{context}",
                daemon=True)
            self._thread.start()

    def tick(self):
        self._last = time.monotonic()

    def _run(self):
        poll = min(5.0, self.timeout_s / 4)
        while not self._stop.wait(poll):
            idle = time.monotonic() - self._last
            if idle > self.timeout_s:
                self._action(idle)
                return

    def _default_action(self, idle):
        import sys
        print(f"[watchdog] {self.context}: no step progress for "
              f"{idle:.0f}s (> --hang_timeout {self.timeout_s:.0f}s); "
              f"assuming a wedged collective/device and exiting "
              f"{self.EXIT_CODE} for a restart + auto-resume",
              file=sys.stderr, flush=True)
        os._exit(self.EXIT_CODE)

    def stop(self):
        self._stop.set()


def jitter_intrinsic(intrin, rng: np.random.Generator):
    """+-0.5px principal-point jitter, host-side
    (ref train_3d.py:194-197, anti-tiling)."""
    out = np.array(intrin, copy=True)
    out[..., :2, 2] += rng.random(2) - 0.5
    return out


def set_sparse_fastpath_bounds(model, args, exts, intrins, ph, pw,
                               origins, tag, fast_grad_on):
    """Shared --compact_tiles / --blocked_lookup bound setup for a
    sparse model (one copy for both trainers and the bench — the four
    call sites had already started to drift).

    ph, pw MUST be the dataset's EFFECTIVE patch size
    (dataset.patch_size — PatchSampler clamps to the full image for
    small scenes), exts/intrins/origins the dataset's full view set.
    Sets model.active_tiles and model.lookup_spans (None = off) and
    prints one status line per bound.
    """
    uv = 1.0 if getattr(args, "add_uv_noise", False) else 0.0
    model.active_tiles = None
    if (getattr(args, "compact_tiles", False) and model.is_sparse
            and fast_grad_on and uv == 0.0):
        # uv noise moves samples across tile borders BEFORE the lookup;
        # the projected-bbox activity test does not model it, so the
        # compaction stays off under --add_uv_noise (exactness first)
        from videoloop3d_tpu.render.adjoint import active_tile_bound
        bounds = []
        for tm in (model.tile_map_static, model.tile_map_dyn):
            n_tiles = int(np.asarray(tm >= 0).sum())
            t = active_tile_bound(model.geom, tm, exts, intrins,
                                  ph, pw, origins)
            bounds.append(t if t < n_tiles else None)
        if any(b is not None for b in bounds):
            model.active_tiles = tuple(bounds)
        print(f"{tag} tile-compaction: active <= "
              f"{bounds[0]}/{bounds[1]} tiles"
              + ("" if model.active_tiles else " (no win; off)"))
    model.lookup_spans = None
    if getattr(args, "blocked_lookup", False) and model.is_sparse:
        from videoloop3d_tpu.render.renderer import lookup_span_bound
        spans = lookup_span_bound(model.geom, exts, intrins, ph, pw,
                                  origins, uv_noise=uv)
        nth, ntw = model.geom.n_tiles_h, model.geom.n_tiles_w
        if spans[0] * spans[1] < nth * ntw:
            model.lookup_spans = spans
        print(f"{tag} blocked lookup: spans "
              f"{spans[0]}x{spans[1]} of {nth}x{ntw} tiles"
              + ("" if model.lookup_spans else " (no win; off)"))
