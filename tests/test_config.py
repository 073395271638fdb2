import pytest

from videoloop3d_tpu import config as C


def test_two_level_override(tmp_path):
    base = tmp_path / "base.txt"
    base.write_text("lrate = 0.1\nmpi_d = 16\nscale_invariant\n")
    scene = tmp_path / "scene.txt"
    scene.write_text("lrate = 0.5\nexpname = foo\n")
    args = C.parse_args_with_configs(
        ["--config", str(base), "--config1", str(scene)])
    assert args.lrate == 0.5          # scene overrides base
    assert args.mpi_d == 16
    assert args.scale_invariant
    assert args.expname == "foo"


def test_cli_overrides_files(tmp_path):
    base = tmp_path / "base.txt"
    base.write_text("lrate = 0.1\n")
    args = C.parse_args_with_configs(
        ["--config", str(base), "--lrate", "0.9"])
    assert args.lrate == 0.9


def test_prefix_key_resolution(tmp_path):
    base = tmp_path / "base.txt"
    base.write_text("i_weight = 7\n")         # reference-config quirk
    args = C.parse_args_with_configs(["--config", str(base)])
    assert args.i_weights == 7


def test_ambiguous_key_rejected(tmp_path):
    base = tmp_path / "base.txt"
    base.write_text("swd_patch_size = 3\n")   # exact name, fine
    C.parse_args_with_configs(["--config", str(base)])
    base.write_text("swd_patch = 3\n")        # prefix of _size and _size_ref
    with pytest.raises(KeyError):
        C.parse_args_with_configs(["--config", str(base)])


def test_evaluate_cli_flags_parse():
    from videoloop3d_tpu.config import build_parser
    parser = build_parser()
    parser.add_argument("--skip", type=str, default="")
    parser.add_argument("--with_svfid", action="store_true")
    args = C.parse_args_with_configs(
        ["--skip", "lpips,nnmse", "--with_svfid"], parser)
    assert args.skip == "lpips,nnmse" and args.with_svfid


def test_shipped_stage2_config_fast_paths_on():
    """The measured-and-shipped exact fast paths must stay ON in the
    stage-2 base config (mpv_base.txt): each was an on-chip A/B win
    (bench_ab.log round 3) and all are exactness-tested, so silently
    dropping one is a pure perf regression."""
    import os
    base = os.path.join(os.path.dirname(__file__), "..",
                        "configs", "mpv_base.txt")
    args = C.parse_args_with_configs(["--config", base])
    assert args.fp16                 # bf16 gathers (75 dB same-ckpt A/B)
    assert args.fast_stage2_grad     # per-tile adjoint backward
    assert args.no_render_remat
    assert args.compact_hits         # hit-compacted sparse sweep
    assert args.compact_tiles        # patch-active adjoint tile bound
    assert args.blocked_lookup       # per-scanline tile-map block fetch
    # measured HBM-bound at training patch sizes: must stay OFF
    assert not args.fast_nn_dist


def test_fast_nn_dist_per_view_override():
    """--fast_nn_dist_ref/_other override the global flag per loss
    config; '' inherits (the shipped split: ref-view 11x11 ON because
    that step is latency-bound, other-view 3x3 OFF because it is
    HBM-bound)."""
    from videoloop3d_tpu.train.stage2 import loss_config_from_args
    args = C.parse_args_with_configs(["--fast_nn_dist_ref", "on"])
    assert loss_config_from_args(args, ref=True)["fast_nn_dist"]
    assert not loss_config_from_args(args, ref=False)["fast_nn_dist"]
    args = C.parse_args_with_configs(["--fast_nn_dist",
                                      "--fast_nn_dist_ref", "off"])
    assert not loss_config_from_args(args, ref=True)["fast_nn_dist"]
    assert loss_config_from_args(args, ref=False)["fast_nn_dist"]
    args = C.parse_args_with_configs([])
    assert not loss_config_from_args(args, ref=True)["fast_nn_dist"]
