"""Profile the production-scale stage-1 step on TPU: device-op
breakdown of the donated train step (same config as bench.py's
--stage1-internal), to attribute the 56 ms (VERDICT r4 item 2).

    python scripts/prof_stage1.py [--iters 10] [--top 25] [--no-fused]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--no-fused", action="store_true")
    ap.add_argument("--logdir", default="/tmp/prof_s1")
    opts = ap.parse_args()

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
    if not opts.no_fused:
        argv.append("--fused_render")
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
    for _ in range(4):
        params, opt_state, m = step_fn(params, opt_state, batch, lr,
                                       weights, rngk)
        _ = float(m["loss"])

    import shutil
    shutil.rmtree(opts.logdir, ignore_errors=True)
    n = opts.iters
    jax.profiler.start_trace(opts.logdir)
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, m = step_fn(params, opt_state, batch, lr,
                                       weights, rngk)
    _ = float(m["loss"])
    wall = (time.perf_counter() - t0) / n * 1000
    jax.profiler.stop_trace()

    from prof_step import parse_trace
    busy, span, agg = parse_trace(opts.logdir)
    print(f"\nstep {wall:.1f} ms | device busy {busy/1e6/n:.1f} ms/step, "
          f"span {span/1e6/n:.1f} ms/step, "
          f"idle {100*(1-busy/max(span,1)):.1f}%")
    print(f"{'op':<74} {'ms/step':>8} {'%busy':>6}")
    for name, ns in agg.most_common(opts.top):
        print(f"{name[:74]:<74} {ns/1e6/n:8.2f} {100*ns/busy:6.1f}")


if __name__ == "__main__":
    main()
