"""Benchmark: stage-1 + stage-2 training steps at the reference's
production scale.

Measures one full optimization iteration (render all frames of a training
patch + GPNN looping loss + regularizers + Adam) on the hot
configuration: 640x360 scene, 180x320 patch, 32 planes, 50-frame loop,
sparse MTV with ~20% tiles kept, 'other-view' loss config
(patch 3x3x3, stride 2, stridet 1, macro block 65) — the config used for
~90% of reference stage-2 iterations.

Baseline derivation (BASELINE.md: stage 2 takes 3-6 h/scene on an RTX
3090): the shipped schedule is 6 pyramid levels x 50 epochs; for a
10-view 640x360 scene that is ~10,000 iterations of which ~4,500 run at
the finest level, accounting for ~half the pixel-weighted cost ->
1.2-2.4 s per finest-level iteration; we use the midpoint 1800 ms.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "ms", "vs_baseline": ...,
   "stage1_step_ms": ..., "stage1_vs_baseline": ...}
(vs_baseline > 1 means faster than the reference.)  The headline
metric/value stays the stage-2 step; the stage-1 step (measured in a
subprocess first — the TPU chip is exclusive) rides along as extra keys.

Stage-1 baseline derivation (BASELINE.md: 10-15 min full 140-epoch
schedule on an RTX 3090 at 640x360): 140 epochs x ~90 patches (9 per
view x ~10 views) = 12,600 steps in 600-900 s -> 48-71 ms/step; we use
the midpoint 60 ms.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_STEP_MS = 1800.0
BASELINE_STAGE1_STEP_MS = 60.0

# v5e single-chip peaks (public spec: 197 TFLOP/s bf16, 394 TOP/s int8,
# 819 GB/s HBM).  f32 matmuls run on the MXU at ~1/4 the bf16 rate.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BPS = 819e9
# measured gather-engine ceiling on this workload class (see CLAUDE.md
# perf ledger: the packed bilinear gathers are DESCRIPTOR-rate bound at
# ~30M descriptors/s, not byte-bound)
MEASURED_DESC_PER_S = 30e6


def xla_cost_analysis(compiled):
    """flops / bytes accessed from the compiled executable, when the
    backend exposes them (returns {} otherwise)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return dict(ca) if ca else {}
    except Exception:
        return {}


def hw_utilization(compiled, step_ms, info, model, batch):
    """Hardware-grounded accounting of one stage-2 step: FLOPs and HBM
    bytes from XLA's own cost model (% of v5e peak), plus the analytic
    gather-descriptor count (the measured bottleneck resource).

    Descriptor count: the tile-major sampler issues one gather
    descriptor per (pixel, plane) bilinear corner-pair row — quad-packed
    rows for the dynamic atlas (F*C contiguous texels per tile row) and
    pair-packed for the static atlas; backward re-issues the forward's
    descriptors once more on the scatter-free adjoint path.
    """
    out = {}
    ca = xla_cost_analysis(compiled)
    t_s = step_ms / 1000.0
    if "flops" in ca:
        flops = float(ca["flops"])
        out["step_gflops"] = round(flops / 1e9, 1)
        out["mfu_pct"] = round(100 * flops / t_s / V5E_PEAK_BF16_FLOPS, 2)
    if "bytes accessed" in ca:
        bts = float(ca["bytes accessed"])
        out["step_gbytes"] = round(bts / 1e9, 2)
        out["hbm_gbps"] = round(bts / 1e9 / t_s, 1)
        out["hbm_util_pct"] = round(100 * bts / t_s / V5E_PEAK_HBM_BPS, 2)

    # analytic descriptor count for the packed sparse samplers:
    # per sampled (layer, pixel): 1 static corner gather (quad-packed
    # 2x2 row) + 2 dynamic (u-paired F*C rows).  Under --compact_hits
    # the texel gathers run at the compacted slot volume; the tile-map
    # lookup is 1 paired descriptor per (plane, pixel) at FULL plane
    # volume, or 1 block per (plane, row) with --blocked_lookup.  The
    # adjoint backward's row-gather window extraction adds
    # ~tiles * window/ry descriptors (small); we count the forward
    # texel gathers twice as a conservative stand-in.
    ph, pw = info["patch"]
    D = info["planes"]
    layers = info.get("slots") or D
    samples = layers * ph * pw
    lookup = D * ph if info.get("lookup_spans") else D * ph * pw
    desc_fwd = samples * 3 + lookup
    desc = desc_fwd + samples * 3             # + adjoint backward
    out["gather_desc_per_step"] = int(desc)
    out["desc_per_s"] = round(desc / t_s / 1e6, 1)   # Mdesc/s
    out["desc_rate_vs_ceiling_pct"] = round(
        100 * (desc / t_s) / MEASURED_DESC_PER_S, 1)
    return out


def run_stage1_bench(iters):
    """Stage-1 production-scale step time (called with --stage1-internal
    in a fresh subprocess so the chip is free for stage 2 afterwards)."""
    import time as _t

    import jax
    import jax.numpy as jnp
    from videoloop3d_tpu.config import parse_args_with_configs
    from videoloop3d_tpu.models.mpmesh import MPMesh
    from videoloop3d_tpu.train import stage1

    H, W = 360, 640
    argv = ["--mpi_h_scale", "1.6", "--mpi_w_scale", "1.6",
            "--mpi_h_verts", "36", "--mpi_w_verts", "64",
            "--mpi_d", "32", "--atlas_grid_h", "4",
            "--patch_h_size", "180", "--patch_w_size", "320",
            "--scale_invariant", "--add_intrin_noise", "--learn_loop_mask",
            "--fast_stage1_grad",
            "--sparsity_loss_weight", "0.004",
            "--rgb_smooth_loss_weight", "0.2",
            "--a_smooth_loss_weight", "0.5",
            "--density_loss_weight", "0.02", "--density_loss_epoch", "60",
            "--lrate", "0.05"]
    # stage-1 fused decode/composite/reg custom-vjp (render/fused_s1.py);
    # ON by default like the shipped config, VL3D_STAGE1_FUSED=0 to A/B
    if os.environ.get("VL3D_STAGE1_FUSED", "1") != "0":
        argv.append("--fused_render")
    # bf16-input block contractions + wide forward blocks (56 -> 40 ms
    # measured); ON like the shipped config, VL3D_S1_FAST_GEMM=0 to A/B
    if os.environ.get("VL3D_S1_FAST_GEMM", "1") != "0":
        argv += ["--s1_gemm_bf16", "--s1_fwd_block", "45x64"]
    args = parse_args_with_configs(argv)
    ref_extrin = np.eye(4, dtype=np.float32)
    focal = 0.9 * W
    ref_intrin = np.array([[focal, 0, W / 2], [0, focal, H / 2],
                           [0, 0, 1]], np.float32)
    model = MPMesh(args, H, W, ref_extrin, ref_intrin, 2.0, 10.0)
    params = model.init_params(1)
    ph, pw = 180, 320
    step_fn, opt_init, wk = stage1.make_train_step(model, args, ph, pw)
    opt_state = opt_init(params)
    weights = {k: jnp.asarray(0.1, jnp.float32) for k in wk}
    rngk = jax.random.PRNGKey(0)
    ext = np.eye(4, dtype=np.float32)[None]
    ext[:, 0, 3] = 0.05
    pi = ref_intrin.copy()
    pi[0, 2] -= (W - pw) / 2
    pi[1, 2] -= (H - ph) / 2
    rng = np.random.default_rng(0)
    batch = {"extrin": jnp.asarray(ext), "intrin": jnp.asarray(pi[None]),
             "rgb": jnp.asarray(rng.random((1, ph, pw, 3),
                                           dtype=np.float32)),
             "loopmask": jnp.asarray(rng.random((1, ph, pw),
                                                dtype=np.float32))}
    lr = jnp.asarray(0.01, jnp.float32)
    for _ in range(4):                      # compile + donation warmups
        params, opt_state, m = step_fn(params, opt_state, batch, lr,
                                       weights, rngk)
        _ = float(m["loss"])
    n = max(iters, 10)
    t0 = _t.perf_counter()
    for i in range(n):                      # trainer-cadence sync (1-in-5)
        params, opt_state, m = step_fn(params, opt_state, batch, lr,
                                       weights, rngk)
        if (i + 1) % 5 == 0:
            _ = float(m["loss"])
    _ = float(m["loss"])
    step_ms = (_t.perf_counter() - t0) / n * 1000
    out = {"stage1_step_ms": round(step_ms, 2)}
    if os.environ.get("VL3D_STAGE1_SPLIT"):
        # fwd / fwd+bwd decomposition (extra compiles)
        from videoloop3d_tpu.train.stage1 import make_stage1_loss_fn
        loss_fn = make_stage1_loss_fn(model, args, ph, pw)
        fwd = jax.jit(lambda p: loss_fn(p, batch, weights, rngk)[0])
        fwd_bwd = jax.jit(lambda p: jax.grad(
            lambda q: loss_fn(q, batch, weights, rngk)[0])(p))

        def timeit(fn):
            o = fn(params)
            _ = float(jax.tree.leaves(o)[0].ravel()[0])
            ts = []
            for _i in range(iters):
                t1 = _t.perf_counter()
                o = fn(params)
                _ = float(jax.tree.leaves(o)[0].ravel()[0])
                ts.append(_t.perf_counter() - t1)
            return round(float(np.median(ts)) * 1000, 1)

        out["stage1_fwd_ms"] = timeit(fwd)
        out["stage1_fwd_bwd_ms"] = timeit(fwd_bwd)
    print(json.dumps(out))


def build_bench_setup(quick=False, fast_grad=False, no_remat=False,
                      bf16=True):
    import jax.numpy as jnp
    from videoloop3d_tpu.config import parse_args_with_configs
    from videoloop3d_tpu.models.mpv import MPMeshVid

    if quick:
        H, W, F, D = 90, 160, 12, 8
        verts_h, verts_w = 10, 17
        ph, pw = 48, 80
    else:
        H, W, F, D = 360, 640, 50, 32
        verts_h, verts_w = 36, 64
        ph, pw = 180, 320

    argv = ["--mpi_h_scale", "1.1", "--mpi_w_scale", "1.1",
            "--mpi_h_verts", str(verts_h), "--mpi_w_verts", str(verts_w),
            "--mpi_d", str(D), "--atlas_grid_h", "4" if not quick else "2",
            "--mpv_frm_num", str(F), "--mpv_isloop",
            "--scale_invariant", "--add_intrin_noise",
            "--lrate", "0.5", "--lrate_decay", "100", "--lrate_adaptive",
            "--rgb_smooth_loss_weight", "0.2",
            "--a_smooth_loss_weight", "0.2"]
    if fast_grad:
        argv.append("--fast_stage2_grad")
    if no_remat:
        argv.append("--no_render_remat")
    args = parse_args_with_configs(argv)

    ref_extrin = np.eye(4, dtype=np.float32)
    focal = 0.9 * W
    ref_intrin = np.array([[focal, 0, W / 2], [0, focal, H / 2],
                           [0, 0, 1]], np.float32)
    near, far = 2.0, 10.0
    model = MPMeshVid(args, H, W, ref_extrin, ref_intrin, near, far)

    # synthesize a realistically sparse MTV: ~20% tiles kept, 30%
    # dynamic.  Kept tiles concentrate in a band around a smooth
    # per-column surface depth (like real alpha culling: the production
    # soak keeps 6% of tiles at max 10 hit planes/pixel) plus iid
    # stragglers — same kept fraction as the round-1/2 iid maps (the
    # non-compacted step cost depends only on the counts), but with a
    # production-like per-pixel hit profile for --compact.
    rng = np.random.default_rng(0)
    g = model.geom
    nth, ntw = g.n_tiles_h, g.n_tiles_w
    n_total = g.n_planes * nth * ntw
    ii, jj = np.meshgrid(np.arange(nth), np.arange(ntw), indexing="ij")
    depth0 = (g.n_planes / 2
              + (g.n_planes / 3) * np.sin(ii / max(nth - 1, 1) * 3.0)
              * np.cos(jj / max(ntw - 1, 1) * 2.2))
    depth1 = (g.n_planes * 0.75
              + (g.n_planes / 5) * np.cos(ii / max(nth - 1, 1) * 1.7
                                          + jj / max(ntw - 1, 1) * 2.9))
    plane = np.arange(g.n_planes)[:, None, None]
    band = (np.abs(plane - depth0[None]) <= g.n_planes / 16.0) \
        | (np.abs(plane - depth1[None]) <= g.n_planes / 32.0)
    frac_band = band.mean()
    p_extra = max(0.20 - frac_band, 0.0) / max(1e-9, 1.0 - frac_band)
    keep = (band | (rng.random(band.shape) < p_extra)).reshape(-1)
    dyn = keep & (rng.random(n_total) < 0.30)
    static = keep & ~dyn
    th, tw = g.default_tile_texels()
    tm_s = np.full(n_total, -1, np.int32)
    tm_s[static] = np.arange(static.sum())
    tm_d = np.full(n_total, -1, np.int32)
    tm_d[dyn] = np.arange(dyn.sum())
    model.is_sparse = True
    model.tile_map_static = tm_s.reshape(g.n_planes, nth, ntw)
    model.tile_map_dyn = tm_d.reshape(g.n_planes, nth, ntw)
    model.tile_hw = (th, tw)
    model.base_tile_hw = (th, tw)

    params = {
        "atlas": jnp.asarray(
            rng.random((int(static.sum()), th, tw, 4), dtype=np.float32)),
        "atlas_dyn": jnp.asarray(
            rng.random((int(dyn.sum()), th, tw, F, 4), dtype=np.float32)),
    }

    losscfg = {"loss_name": "gpnn_lm", "patch_size": 3, "patcht_size": 3,
               "stride": 2, "stridet": 1, "alpha": 10000, "rou": "-2",
               "scaling": 0.1, "macro_block": 65, "factor": 1,
               "loss_gain": 1.0, "dist_fn": "mse", "num_proj": 256,
               "nn_bf16": bool(bf16)}

    ext = np.eye(4, dtype=np.float32)
    ext[0, 3] = 0.1
    patch_intrin = ref_intrin.copy()
    patch_intrin[0, 2] -= (W - pw) / 2
    patch_intrin[1, 2] -= (H - ph) / 2
    video = rng.random((F, ph, pw, 3), dtype=np.float32)
    batch = {"extrin": jnp.asarray(ext)[None],
             "intrin": jnp.asarray(patch_intrin)[None],
             "video": jnp.asarray(video)}
    info = {"tiles_static": int(static.sum()), "tiles_dyn": int(dyn.sum()),
            "tile_hw": (th, tw), "patch": (ph, pw), "frames": F,
            "planes": D}
    return model, args, params, batch, losscfg, (ph, pw), info


def measure_split(model, args, params, batch, losscfg, ph, pw, iters=5):
    """fwd / fwd+bwd / optimizer decomposition of the stage-2 step
    (the ledger's breakdown, machine-measured on the current code)."""
    import jax
    import jax.numpy as jnp
    from videoloop3d_tpu.train.stage2 import (make_patch_loss_fn,
                                              make_stage2_step)

    weights = {k: jnp.asarray(0.2, jnp.float32)
               for k in ("sparsity", "rgb_smooth", "a_smooth", "d_smooth",
                         "density")}
    rng = jax.random.PRNGKey(0)
    loss_fn = make_patch_loss_fn(model, args, ph, pw, losscfg)

    def timeit(fn, *a):
        o = fn(*a)
        _ = float(jax.tree.leaves(o)[0].ravel()[0])
        ts = []
        for _i in range(iters):
            t0 = time.perf_counter()
            o = fn(*a)
            _ = float(jax.tree.leaves(o)[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1000

    render_fwd = jax.jit(lambda p: model.render(
        p, ph, pw, batch["extrin"], batch["intrin"], None,
        training=True)[0])
    render_grad = jax.jit(lambda p, ct: jax.vjp(
        lambda q: model.render(q, ph, pw, batch["extrin"],
                               batch["intrin"], None,
                               training=True)[0], p)[1](ct))
    loss_fwd = jax.jit(lambda p: loss_fn(p, batch, weights, rng)[0])
    loss_grad = jax.jit(lambda p: jax.grad(
        lambda q: loss_fn(q, batch, weights, rng)[0])(p))
    split = {
        "render_fwd_ms": round(timeit(render_fwd, params), 1),
        "loss_fwd_ms": round(timeit(loss_fwd, params), 1),
        "fwd_bwd_ms": round(timeit(loss_grad, params), 1),
    }
    split["bwd_only_ms"] = round(split["fwd_bwd_ms"]
                                 - split["loss_fwd_ms"], 1)
    split["loss_nn_ms"] = round(split["loss_fwd_ms"]
                                - split["render_fwd_ms"], 1)
    try:
        ct0 = render_fwd(params)
        split["render_fwd_bwd_ms"] = round(timeit(render_grad, params,
                                                  ct0), 1)
    except Exception:
        pass
    # per-subprogram byte inventory (VERDICT r4 item 4): XLA's own
    # 'bytes accessed' per compiled piece, so the 90%-HBM step's
    # traffic is attributable (render fwd vs render fwd+bwd vs NN loss)
    try:
        ct = render_fwd(params)
        inv = {}
        for name, low in (
                ("render_fwd", render_fwd.lower(params)),
                ("render_fwd_bwd", render_grad.lower(params, ct)),
                ("loss_fwd", loss_fwd.lower(params)),
                ("full_fwd_bwd", loss_grad.lower(params))):
            ca = xla_cost_analysis(low.compile())
            if "bytes accessed" in ca:
                inv[name] = round(float(ca["bytes accessed"]) / 1e9, 2)
        if inv:
            split["gbytes"] = inv
    except Exception as e:  # inventory is best-effort diagnostics
        split["gbytes_error"] = str(e)[:120]
    return split


def _probe_backend_or_exit(timeout_s=360.0):
    """Fail fast when the TPU backend is unreachable.

    The axon relay tunnel can die (orchestrator pipe closure — see
    CLAUDE.md gotchas); ``jax.devices()`` then hangs FOREVER, which
    would hang the driver's round-end bench run with no diagnosis.
    Probe in a SUBPROCESS (the chip is exclusive: probing in this
    process would hold a claim across the stage-1 subprocess
    measurement and corrupt it) with a timeout past the ~3-5 min
    self-heal of a wedged claim; on failure, print a one-line JSON with
    an ``error`` field (so the bench record says WHY there is no
    number) and exit 3."""
    import subprocess
    err = None
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "assert float(jnp.ones(8).sum()) == 8.0"],
            capture_output=True, text=True, timeout=timeout_s)
        if r.returncode != 0:
            err = f"probe rc={r.returncode}: {r.stderr[-300:]}"
    except subprocess.TimeoutExpired:
        err = (f"TPU backend unresponsive for {timeout_s:.0f}s (axon "
               f"relay down / chip claim wedged) - no measurement "
               f"possible")
    if err is not None:
        print(json.dumps({
            "metric": "stage2_step_time", "value": None, "unit": "ms",
            "vs_baseline": None, "error": err}), flush=True)
        sys.exit(3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="bench the bf16 gather path, ON like the "
                         "shipped configs (since round 2; --no-bf16 "
                         "for the f32 path)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--fast_grad", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="bench with --fast_stage2_grad (per-tile "
                         "adjoint backward), ON like the shipped "
                         "configs; --no-fast_grad for the scatter path")
    ap.add_argument("--compact", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="bench with --compact_hits (hit-compacted "
                         "sparse sweep), ON like the shipped configs; "
                         "--no-compact for the dense sweep")
    ap.add_argument("--compact_tiles", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="bench with --compact_tiles (patch-active tile "
                         "bound on the adjoint backward), ON like the "
                         "shipped configs; --no-compact_tiles for the "
                         "full per-tile loop")
    ap.add_argument("--blocked_lookup",
                    action=argparse.BooleanOptionalAction, default=True,
                    help="bench with the blocked tile-map lookup "
                         "(one block fetch per (plane, scanline); "
                         "exact — renderer.tile_lookup2_blocked), ON "
                         "like the shipped configs; --no-blocked_lookup "
                         "for per-pixel element gathers")
    ap.add_argument("--fused", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="bench with --fused_render (fused decode+"
                         "composite+regularizer custom-vjp, "
                         "render/fused.py), ON like the shipped "
                         "configs; --no-fused for the unfused chain")
    ap.add_argument("--fast_nn_dist",
                    action=argparse.BooleanOptionalAction, default=False,
                    help="bench with the temporally-decomposed NN "
                         "search in the GPNN loss (exact up to argmin "
                         "ties — losses/patch_nn.py)")
    ap.add_argument("--no_remat", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="bench with --no_render_remat (keep render "
                         "activations; needs fast_grad to fit HBM), "
                         "ON like the shipped configs")
    ap.add_argument("--stage1", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="also measure the stage-1 step (subprocess) and "
                         "merge it into the JSON line")
    ap.add_argument("--hw", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="hardware-utilization accounting (XLA cost "
                         "model FLOPs/bytes as %% of v5e peak + gather "
                         "descriptor rate) in the JSON line")
    ap.add_argument("--split", action="store_true",
                    help="also measure the fwd / fwd+bwd / loss "
                         "decomposition of the step (extra compiles)")
    ap.add_argument("--refview", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="also measure the ref-view 11x11 loss config "
                         "(the most expensive shipped program; its own "
                         "jit specialization) and report it as "
                         "refview_step_ms + refview_hw; skipped with "
                         "--quick")
    ap.add_argument("--refview-fast-nn", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="temporally-decomposed NN search for the "
                         "ref-view measurement (candidate fix for the "
                         "latency-bound 11x11 step at 62%% HBM, where "
                         "the bytes-for-FLOPs trade should flip; "
                         "default follows the shipped config)")
    ap.add_argument("--stage1-internal", action="store_true",
                    help=argparse.SUPPRESS)
    opts = ap.parse_args()

    if opts.stage1_internal:
        run_stage1_bench(opts.iters)
        return

    if not opts.cpu:
        _probe_backend_or_exit()

    stage1_ms = None
    if opts.stage1 and not opts.quick and not opts.cpu:
        # measure stage 1 in its own process BEFORE this one touches the
        # (exclusive) TPU chip
        import subprocess
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--stage1-internal", "--iters", str(max(opts.iters, 10))],
                capture_output=True, text=True, timeout=900)
            for line in r.stdout.splitlines():
                try:
                    stage1_ms = json.loads(line)["stage1_step_ms"]
                    break
                except (ValueError, KeyError):
                    continue
            if stage1_ms is None and opts.verbose:
                print("stage-1 bench failed:", r.stdout[-500:],
                      r.stderr[-500:], file=sys.stderr)
        except subprocess.TimeoutExpired:
            print("stage-1 bench timed out; continuing with stage-2",
                  file=sys.stderr)

    if opts.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if opts.cpu:
        jax.config.update("jax_platforms", "cpu")
    from videoloop3d_tpu.backend import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    from videoloop3d_tpu.train.stage2 import make_stage2_step

    model, args, params, batch, losscfg, (ph, pw), info = \
        build_bench_setup(opts.quick, fast_grad=opts.fast_grad,
                          no_remat=opts.no_remat, bf16=opts.bf16)
    if opts.bf16:
        model.gather_dtype = jnp.bfloat16
    if opts.compact:
        from videoloop3d_tpu.render.compact import slot_bound
        S = slot_bound(model.geom, model.tile_map_static,
                       model.tile_map_dyn, np.asarray(batch["extrin"]),
                       np.asarray(batch["intrin"]), ph, pw)
        if S < model.geom.n_planes:
            model.compact_slots = S
        info["slots"] = model.compact_slots
    if opts.compact_tiles or opts.blocked_lookup:
        from videoloop3d_tpu.train.common import set_sparse_fastpath_bounds
        args.compact_tiles = opts.compact_tiles
        args.blocked_lookup = opts.blocked_lookup
        set_sparse_fastpath_bounds(
            model, args, np.asarray(batch["extrin"]),
            np.asarray(batch["intrin"]), ph, pw, [(0, 0)], "[bench]",
            opts.fast_grad)
        info["active_tiles"] = model.active_tiles
        info["lookup_spans"] = model.lookup_spans
    if opts.fast_nn_dist:
        losscfg["fast_nn_dist"] = True
    if opts.fused:
        import dataclasses
        args.fused_render = True
        model.cfg = dataclasses.replace(model.cfg, fused_render=True)
    if opts.verbose:
        print("setup:", info, file=sys.stderr)
        print("devices:", jax.devices(), file=sys.stderr)

    step, opt_init = make_stage2_step(model, args, ph, pw, losscfg)
    opt_state = opt_init(params)
    weights = {k: jnp.asarray(0.2, jnp.float32)
               for k in ("sparsity", "rgb_smooth", "a_smooth", "d_smooth",
                         "density")}
    rng = jax.random.PRNGKey(0)

    # compile + warmup
    t0 = time.perf_counter()
    params, opt_state, m = step(params, opt_state, batch,
                                jnp.asarray(0.01), weights, rng)
    _ = float(m["loss"])
    compile_s = time.perf_counter() - t0
    # several warmups: the donation-aliased executable variant only
    # engages once outputs start feeding back as (donated) inputs
    for _ in range(3):
        params, opt_state, m = step(params, opt_state, batch,
                                    jnp.asarray(0.01), weights, rng)
        _ = float(m["loss"])

    # per-step latency with a real host sync each iteration
    # (block_until_ready alone is unreliable on the tunneled axon
    # platform, and long async chains of donated steps stall its
    # scheduler — fetching the loss each step is both what the trainer's
    # logging cadence does and what measures honestly here)
    lr = jnp.asarray(0.01, jnp.float32)
    times = []
    for i in range(opts.iters):
        t0 = time.perf_counter()
        params, opt_state, m = step(params, opt_state, batch, lr,
                                    weights, rng)
        _ = float(m["loss"])              # device->host sync on real data
        times.append(time.perf_counter() - t0)
    step_ms = float(np.median(times)) * 1000
    if opts.verbose:
        print(f"compile {compile_s:.1f}s, per-step "
              f"{[round(t, 2) for t in times]}", file=sys.stderr)

    metric = "stage2_step_time_quick" if opts.quick else "stage2_step_time"
    if not opts.bf16:
        metric += "_f32"
    vs = BASELINE_STEP_MS / step_ms if not opts.quick else float("nan")
    out = {"metric": metric, "value": round(step_ms, 2), "unit": "ms",
           "vs_baseline": round(vs, 3) if vs == vs else None}
    if stage1_ms is not None:
        out["stage1_step_ms"] = stage1_ms
        out["stage1_vs_baseline"] = round(
            BASELINE_STAGE1_STEP_MS / stage1_ms, 3)
    if opts.hw:
        try:
            lowered = step.lower(params, opt_state, batch, lr, weights,
                                 rng)
            out["hw"] = hw_utilization(lowered.compile(), step_ms, info,
                                       model, batch)
        except Exception as e:                      # never break the line
            out["hw"] = {"error": str(e)[:160]}
    if opts.split:
        try:
            out["split"] = measure_split(model, args, params, batch,
                                         losscfg, ph, pw,
                                         iters=opts.iters)
        except Exception as e:
            out["split"] = {"error": str(e)[:160]}
    if opts.refview and not opts.quick:
        # the ref-view 11x11x3 gpnn_lm config (VERDICT r3 item 4): the
        # single most expensive shipped program — production runs it on
        # the two loss_ref_idx views (ref mpv_base.txt swd_*_ref keys)
        try:
            losscfg_ref = dict(losscfg, patch_size=11, patcht_size=3,
                               stride=4, stridet=1, alpha=0,
                               loss_gain=3.5,
                               fast_nn_dist=bool(opts.refview_fast_nn))
            step_r, opt_init_r = make_stage2_step(model, args, ph, pw,
                                                  losscfg_ref)
            opt_state_r = opt_init_r(params)
            for _ in range(2):
                params, opt_state_r, m = step_r(params, opt_state_r,
                                                batch, lr, weights, rng)
                _ = float(m["loss"])
            times_r = []
            for _ in range(opts.iters):
                t0 = time.perf_counter()
                params, opt_state_r, m = step_r(params, opt_state_r,
                                                batch, lr, weights, rng)
                _ = float(m["loss"])
                times_r.append(time.perf_counter() - t0)
            ref_ms = float(np.median(times_r)) * 1000
            out["refview_step_ms"] = round(ref_ms, 2)
            if opts.hw:
                lowered_r = step_r.lower(params, opt_state_r, batch, lr,
                                         weights, rng)
                out["refview_hw"] = hw_utilization(
                    lowered_r.compile(), ref_ms, info, model, batch)
        except Exception as e:
            out["refview_step_ms"] = None
            out["refview_error"] = str(e)[:160]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
