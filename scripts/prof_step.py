"""Profile a stage-2 step config on the TPU and print the device-op
breakdown (top ops by self time + busy-vs-wall serialization gap).

VERDICT r4 item 3: the ref-view 11x11 step (416 ms) saturates NOTHING
(HBM 62%, descriptors 41%, MFU 2%) — every other program here pins a
resource, so that one is serialization/latency-bound.  This script
finds WHERE: it traces N steps with jax.profiler, parses the xplane
with jax.profiler.ProfileData, aggregates TensorCore op self-times,
and reports the idle fraction of the device timeline.

    python scripts/prof_step.py [--refview] [--iters 3] [--quick]
    python scripts/prof_step.py --refview --budget 4e9   # chunk sweep
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_trace(logdir):
    """Aggregate device-plane events: (total_busy_ns, wall_ns, by_op)."""
    from jax.profiler import ProfileData
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {logdir}"
    data = ProfileData.from_file(sorted(paths)[-1])
    dev_planes = [p for p in data.planes
                  if "TPU" in p.name or "Device" in p.name]
    agg = collections.Counter()
    tmin, tmax = None, None
    intervals = []
    for plane in dev_planes:
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns
                if dur <= 0:
                    continue
                agg[name] += dur
                t0 = ev.start_ns
                intervals.append((t0, t0 + dur))
                tmin = t0 if tmin is None else min(tmin, t0)
                tmax = t0 + dur if tmax is None else max(tmax, t0 + dur)
    # busy time = union of intervals (events can overlap across lines)
    intervals.sort()
    busy = 0
    cur_s, cur_e = None, None
    for s, e in intervals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        busy += cur_e - cur_s
    wall = (tmax - tmin) if tmin is not None else 0
    return busy, wall, agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refview", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--budget", default=None,
                    help="VL3D_LM_CHUNK_BUDGET override")
    ap.add_argument("--macro", type=int, default=None,
                    help="override swd_macro_block")
    ap.add_argument("--logdir", default="/tmp/prof_step")
    ap.add_argument("--top", type=int, default=25)
    opts = ap.parse_args()
    if opts.budget:
        os.environ["VL3D_LM_CHUNK_BUDGET"] = str(float(opts.budget))

    import jax
    import jax.numpy as jnp

    import bench
    from videoloop3d_tpu.train.stage2 import make_stage2_step

    model, args, params, batch, losscfg, (ph, pw), info = \
        bench.build_bench_setup(quick=opts.quick, fast_grad=True,
                                no_remat=True)
    # the shipped fast-path wiring, same as bench.py's default flags
    model.gather_dtype = jnp.bfloat16
    from videoloop3d_tpu.render.compact import slot_bound
    S = slot_bound(model.geom, model.tile_map_static,
                   model.tile_map_dyn, np.asarray(batch["extrin"]),
                   np.asarray(batch["intrin"]), ph, pw)
    if S < model.geom.n_planes:
        model.compact_slots = S
    from videoloop3d_tpu.train.common import set_sparse_fastpath_bounds
    args.compact_tiles = True
    args.blocked_lookup = True
    set_sparse_fastpath_bounds(
        model, args, np.asarray(batch["extrin"]),
        np.asarray(batch["intrin"]), ph, pw, [(0, 0)], "[prof]", True)
    import dataclasses
    args.fused_render = True
    model.cfg = dataclasses.replace(model.cfg, fused_render=True)
    if opts.refview:
        losscfg = dict(losscfg, patch_size=11, patcht_size=3, stride=4,
                       stridet=1, alpha=0, loss_gain=3.5)
    if opts.macro:
        losscfg = dict(losscfg, macro_block=opts.macro)

    weights = {k: jnp.asarray(0.2, jnp.float32)
               for k in ("sparsity", "rgb_smooth", "a_smooth", "d_smooth",
                         "density")}
    rng = jax.random.PRNGKey(0)
    lr = jnp.asarray(0.01, jnp.float32)
    step, opt_init = make_stage2_step(model, args, ph, pw, losscfg)
    opt_state = opt_init(params)
    for _ in range(3):
        params, opt_state, m = step(params, opt_state, batch, lr,
                                    weights, rng)
        _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(opts.iters):
        params, opt_state, m = step(params, opt_state, batch, lr,
                                    weights, rng)
        _ = float(m["loss"])
    step_ms = (time.perf_counter() - t0) / opts.iters * 1000

    os.makedirs(opts.logdir, exist_ok=True)
    with jax.profiler.trace(opts.logdir):
        for _ in range(opts.iters):
            params, opt_state, m = step(params, opt_state, batch, lr,
                                        weights, rng)
            _ = float(m["loss"])

    busy, wall, agg = parse_trace(opts.logdir)
    n = opts.iters
    print(f"\nstep {step_ms:.1f} ms | device busy "
          f"{busy / 1e6 / n:.1f} ms/step, span {wall / 1e6 / n:.1f} "
          f"ms/step, idle {(1 - busy / max(wall, 1)) * 100:.1f}%")
    print(f"{'op':<72} {'ms/step':>8} {'%busy':>6}")
    for name, ns in agg.most_common(opts.top):
        print(f"{name[:72]:<72} {ns / 1e6 / n:8.2f} "
              f"{100 * ns / max(busy, 1):6.1f}")


if __name__ == "__main__":
    main()
