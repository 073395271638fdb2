"""Stage-2 convergence-trajectory parity study (VERDICT item 1, CPU
half): the same synthetic scene trained single-device, dp-sharded,
fp-sharded, and with the bf16 gather path, plus a seed-jittered control
run that defines the noise band.  Writes EVIDENCE_trajectories.md.

Run on the CPU backend (safe while the TPU soaks):
    python scripts/trajectory_parity.py
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4"
                           ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from videoloop3d_tpu.config import parse_args_with_configs  # noqa: E402
from videoloop3d_tpu.data import synthetic  # noqa: E402
from videoloop3d_tpu.train import stage1, stage2  # noqa: E402

ROOT = "/tmp/traj_parity"


def ensure_stage1():
    scene_dir = os.path.join(ROOT, "scene")
    ckpt = os.path.join(ROOT, "mpis/base/ckpt_epoch_0011.npz")
    if os.path.exists(ckpt):
        return scene_dir, ckpt
    scene = synthetic.make_scene(n_views=4, h=48, w=64, n_frames=8, seed=0)
    synthetic.write_llff_dir(scene, scene_dir, factor=1)
    argv = ["--datadir", scene_dir, "--expdir", os.path.join(ROOT, "mpis"),
            "--expname", "base", "--factor", "1",
            "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
            "--mpi_h_verts", "5", "--mpi_w_verts", "9",
            "--mpi_d", "4", "--atlas_grid_h", "2",
            "--patch_h_size", "48", "--patch_w_size", "64",
            "--patch_h_stride", "32", "--patch_w_stride", "48",
            "--lrate", "0.1", "--lrate_decay", "100",
            "--N_iters", "12", "--i_weights", "12", "--i_video", "1000",
            "--i_img", "50", "--i_print", "1000",
            "--scale_invariant", "--learn_loop_mask", "--fast_stage1_grad",
            "--sparsify_epoch", "9", "--sparsify_alpha_thresh", "0.02",
            "--sparsity_loss_weight", "0.004",
            "--rgb_smooth_loss_weight", "0.2",
            "--a_smooth_loss_weight", "0.5",
            "--density_loss_weight", "0.02", "--density_loss_epoch", "6",
            "--seed", "2", "--mesh_devices", "1"]
    stage1.train(parse_args_with_configs(argv))
    assert os.path.exists(ckpt), os.listdir(os.path.dirname(ckpt))
    return scene_dir, ckpt


def run_stage2(name, scene_dir, ckpt, extra):
    import shutil
    shutil.rmtree(os.path.join(ROOT, "mpvs", name), ignore_errors=True)
    argv = ["--datadir", scene_dir, "--expdir", os.path.join(ROOT, "mpvs"),
            "--expname", name, "--factor", "1",
            "--init_from", os.path.relpath(ckpt, ""),
            "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
            "--mpi_h_verts", "5", "--mpi_w_verts", "9",
            "--mpi_d", "4", "--atlas_grid_h", "2",
            "--mpv_frm_num", "8", "--mpv_isloop",
            "--patch_h_size", "48", "--patch_w_size", "64",
            "--patch_h_stride", "32", "--patch_w_stride", "48",
            "--lrate", "0.5", "--lrate_decay", "100", "--lrate_adaptive",
            "--pyr_minimal_dim", "24", "--pyr_num_epoch", "12",
            "--pyr_factor", "0.75", "--scale_invariant",
            "--init_std", "0.02",
            "--loss_name", "gpnn_lm", "--loss_name_ref", "gpnn_lm",
            "--swd_macro_block", "33",
            "--swd_loss_gain_ref", "3.5",
            "--swd_patch_size_ref", "5", "--swd_patcht_size_ref", "3",
            "--swd_stride_ref", "2", "--swd_stridet_ref", "1",
            "--swd_alpha_ref", "10000", "--swd_rou_ref", "-2",
            "--swd_scaling_ref", "0.1",
            "--swd_patch_size", "3", "--swd_patcht_size", "3",
            "--swd_stride", "2", "--swd_stridet", "1",
            "--swd_alpha", "10000", "--swd_rou", "-2",
            "--swd_scaling", "0.1",
            "--loss_ref_idx", "0",
            "--rgb_smooth_loss_weight", "0.2",
            "--a_smooth_loss_weight", "0.2",
            "--i_img", "100", "--i_print", "1000",
            "--i_weights", "1000", "--i_video", "1000",
            "--fast_stage2_grad", "--no_render_remat",
            "--seed", "2"] + extra
    hist = []
    stage2.train(parse_args_with_configs(argv),
                 progress_cb=lambda li, ep, m: hist.append(
                     (li, ep, float(m["loss"]), float(m["swd"]))))
    return hist


SEED_CONTROLS = ("seed3", "seed4", "seed5", "seed6", "seed7")


def main():
    scene_dir, ckpt = ensure_stage1()
    runs = {
        "single": ["--mesh_devices", "1"],
        "seed3":  ["--mesh_devices", "1", "--seed", "3"],
        "seed4":  ["--mesh_devices", "1", "--seed", "4"],
        "seed5":  ["--mesh_devices", "1", "--seed", "5"],
        "seed6":  ["--mesh_devices", "1", "--seed", "6"],
        "seed7":  ["--mesh_devices", "1", "--seed", "7"],
        "dp4":    ["--mesh_devices", "4", "--mesh_fp", "1"],
        "dp4_nb": ["--mesh_devices", "4", "--mesh_fp", "1",
                   "--dp_serial_below", "0"],
        "fp4":    ["--mesh_devices", "4", "--mesh_fp", "4"],
        "bf16":   ["--mesh_devices", "1", "--fp16"],
    }
    hists = {}
    for name, extra in runs.items():
        print(f"=== {name} ===", flush=True)
        hists[name] = run_stage2(name, scene_dir, ckpt, extra)

    # per-level final swd loss (the optimization target) per run
    levels = sorted({li for li, _, _, _ in hists["single"]})
    lines = ["# Stage-2 trajectory parity (CPU, synthetic scene)", "",
             "Same scene/checkpoint trained 10 ways; five reseeded "
             "single-device controls (`seed3..7`: different "
             "shuffle/noise seeds) define a PER-LEVEL run-to-run noise "
             "spread (the table's band column = max |seed - single|). "
             "GATE: dp4/fp4/bf16 must deviate from `single` by at most "
             "max(2x that spread, 5%) at EVERY pyramid level — the 2x "
             "allows for the spread of a 5-sample max underestimating "
             "the true run-to-run distribution.  A sharded run that "
             "lands in the seed distribution is converging like a "
             "reseeded run: the per-step arithmetic is exact up to f32 "
             "reduction order (tests), and Adam chaotically amplifies "
             "ulp-level differences over hundreds of steps, so "
             "trajectory identity is not achievable — distributional "
             "parity is the correct bar (dp4 with the shipped serial "
             "feeding IS bit-identical at these levels, see its "
             "column).  Values = final `swd` looping loss per level.",
             "",
             "`dp4` runs the shipped defaults: levels with fewer than "
             "`--dp_serial_below` patches feed ONE patch per optimizer "
             "step (weight-0 filler rows, exact via the masked psum), "
             "keeping the reference's batch-1 Adam regime where step "
             "counts are small.  `dp4_nb` is the same mesh with that "
             "fallback disabled (`--dp_serial_below 0`) — the round-2 "
             "configuration — kept as the ROOT-CAUSE diagnostic: "
             "batching n_dp patches per step cuts the number of Adam "
             "updates n_dp-fold, and at coarse pyramid levels with a "
             "handful of patches those few large steps converge "
             "differently (outside the band).  The parallel arithmetic "
             "itself is exact (tests/test_parallel.py::"
             "test_dp_step_matches_single_device, "
             "::test_stage2_dp_serial_matches_single_device).", "",
             "| level | " + " | ".join(runs) + " | noise band |",
             "|---|" + "---|" * (len(runs) + 1)]
    final = {}
    for name, h in hists.items():
        f = {}
        for li, ep, loss, swd in h:
            f[li] = swd
        final[name] = f
    noise = {li: max(abs(final[s][li] - final["single"][li])
                     for s in SEED_CONTROLS) for li in levels}
    for li in levels:
        lines.append(f"| {li} | " + " | ".join(
            f"{final[n][li]:.4f}" for n in runs)
            + f" | ±{noise[li]:.4f} |")

    lines.append("")
    ok = True
    for n in ("dp4", "dp4_nb", "fp4", "bf16"):
        worst = ""
        n_ok = True
        for li in levels:
            dev = abs(final[n][li] - final["single"][li])
            band = max(2 * noise[li], 0.05 * abs(final["single"][li]))
            if dev > band:
                n_ok = False
                worst += f" l{li}: dev {dev:.4f} > band {band:.4f};"
        if n != "dp4_nb":          # diagnostic run, not a gate
            ok &= n_ok
        lines.append(f"- `{n}`: "
                     + ("**within** the noise band at every level"
                        if n_ok else f"**OUTSIDE**:{worst}")
                     + (" (diagnostic; expected outside at coarse "
                        "levels — see above)" if n == "dp4_nb" else ""))
    lines.append("")
    lines.append(f"Overall: {'PASS' if ok else 'FAIL'}")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EVIDENCE_trajectories.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
