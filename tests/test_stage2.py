import os

import numpy as np
import jax.numpy as jnp

from videoloop3d_tpu.config import parse_args_with_configs
from videoloop3d_tpu.data import synthetic
from videoloop3d_tpu.train import stage1, stage2


def _stage2_args(tmp_path, scene_dir, **over):
    argv = [
        "--datadir", scene_dir, "--expdir", str(tmp_path / "mpv"),
        "--expname", "smoke2", "--factor", "1",
        "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
        "--mpi_h_verts", "5", "--mpi_w_verts", "7",
        "--mpi_d", "4", "--atlas_grid_h", "2",
        "--mpv_frm_num", "6", "--mpv_isloop",
        "--patch_h_size", "24", "--patch_w_size", "32",
        "--patch_h_stride", "16", "--patch_w_stride", "24",
        "--lrate", "0.3", "--lrate_decay", "100", "--lrate_adaptive",
        "--pyr_minimal_dim", "16", "--pyr_num_epoch", "2",
        "--pyr_factor", "0.75",
        "--i_weights", "100", "--i_video", "1000", "--i_img", "5",
        "--i_print", "1000", "--scale_invariant", "--init_std", "0.02",
        "--loss_name", "gpnn_lm", "--loss_name_ref", "gpnn_lm",
        "--swd_patch_size", "3", "--swd_patcht_size", "3",
        "--swd_stride", "2", "--swd_stridet", "1",
        "--swd_alpha", "10000", "--swd_rou", "-2", "--swd_scaling", "0.1",
        "--swd_patch_size_ref", "5", "--swd_patcht_size_ref", "3",
        "--swd_stride_ref", "2", "--swd_stridet_ref", "1",
        "--swd_alpha_ref", "10000", "--swd_rou_ref", "-2",
        "--swd_scaling_ref", "0.1", "--swd_loss_gain_ref", "3.5",
        "--swd_macro_block", "17", "--loss_ref_idx", "0",
        "--rgb_smooth_loss_weight", "0.2",
        "--a_smooth_loss_weight", "0.2",
        "--seed", "1",
    ]
    for k, v in over.items():
        if v is None:
            argv += [f"--{k}"]
        else:
            argv += [f"--{k}", str(v)]
    return parse_args_with_configs(argv)


def _make_stage1_ckpt(tmp_path, scene_dir):
    """Run a quick stage 1 with culling to feed stage 2."""
    argv = [
        "--datadir", scene_dir, "--expdir", str(tmp_path / "mpi"),
        "--expname", "s1", "--factor", "1",
        "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
        "--mpi_h_verts", "5", "--mpi_w_verts", "7",
        "--mpi_d", "4", "--atlas_grid_h", "2",
        "--patch_h_size", "24", "--patch_w_size", "32",
        "--patch_h_stride", "16", "--patch_w_stride", "24",
        "--lrate", "0.1", "--N_iters", "3", "--sparsify_epoch", "2",
        "--sparsify_alpha_thresh", "0.01",
        "--i_weights", "3", "--i_video", "1000", "--i_img", "100",
        "--i_print", "1000", "--scale_invariant", "--learn_loop_mask",
        "--seed", "1", "--mesh_devices", "1",
    ]
    args = parse_args_with_configs(argv)
    model, params, rundir = stage1.train(args)
    ckpts = sorted(f for f in os.listdir(rundir) if "ckpt" in f)
    return os.path.join(rundir, ckpts[-1])


def test_stage2_from_scratch_dense(tmp_path):
    """Dense-phase stage 2 (no stage-1 init): loss must decrease."""
    scene = synthetic.make_scene(n_views=2, h=24, w=32, n_frames=6, seed=0)
    scene_dir = str(tmp_path / "scene")
    synthetic.write_llff_dir(scene, scene_dir, factor=1)

    args = _stage2_args(tmp_path, scene_dir, mesh_devices="1")
    losses = []
    model, params, rundir = stage2.train(
        args, progress_cb=lambda p, e, m: losses.append(float(m["loss"])))
    assert len(losses) >= 4
    assert losses[-1] < losses[0], losses
    assert not model.is_sparse
    ckpts = [f for f in os.listdir(rundir) if "ckpt" in f]
    assert ckpts


def test_stage2_init_adopts_sh_checkpoint(tmp_path):
    """A direct2sh-converted stage-1 ckpt (13-channel SH atlas) must be
    consumable by stage 2: init_from_stage1 adopts the checkpoint's
    rgb_mlp_type and channel count, and the render stays finite."""
    from videoloop3d_tpu.models import checkpoint as ckpt_io
    from videoloop3d_tpu.models.mpmesh import MPMesh, convert_direct_to_sh
    from videoloop3d_tpu.models.mpv import MPMeshVid
    from videoloop3d_tpu.train.stage1 import save_stage1_checkpoint

    scene = synthetic.make_scene(n_views=2, h=24, w=32, n_frames=6, seed=0)
    scene_dir = str(tmp_path / "scene")
    synthetic.write_llff_dir(scene, scene_dir, factor=1)
    args = _stage2_args(tmp_path, scene_dir)
    ref_extrin = np.eye(4, dtype=np.float32)
    m1 = MPMesh(args, 24, 32, ref_extrin, scene["intrins"][0], 1.0, 6.0)
    p1 = m1.init_params(0)
    p1 = convert_direct_to_sh(m1, p1)
    path = str(tmp_path / "sh_ckpt.npz")
    save_stage1_checkpoint(path, m1, p1, epoch=0)

    m2 = MPMeshVid(args, 24, 32, ref_extrin, scene["intrins"][0], 1.0, 6.0)
    p2 = m2.init_from_stage1(ckpt_io.load_checkpoint(path))
    assert m2.cfg.rgb_mlp_type == "rgb_sh"
    assert p2["atlas_dyn"].shape[-1] == 13
    rgb, _ = m2.render(p2, 24, 32, ref_extrin[None],
                       scene["intrins"][:1], jnp.asarray([0, 2]))
    assert rgb.shape == (2, 24, 32, 3)
    assert np.isfinite(np.asarray(rgb)).all()


def test_stage2_full_pipeline_sparse(tmp_path):
    """Stage 1 -> culling -> stage 2 on the sparse MTV, loss decreases
    and a checkpoint with tile maps lands.  Runs on the virtual 8-device
    mesh (dp x fp sharded training path) by default."""
    scene = synthetic.make_scene(n_views=2, h=24, w=32, n_frames=6, seed=0)
    scene_dir = str(tmp_path / "scene")
    synthetic.write_llff_dir(scene, scene_dir, factor=1)
    ckpt_path = _make_stage1_ckpt(tmp_path, scene_dir)

    args = _stage2_args(tmp_path, scene_dir, init_from=ckpt_path,
                        fast_stage2_grad=None, compact_hits=None,
                        compact_tiles=None)
    losses = []
    model, params, rundir = stage2.train(
        args, progress_cb=lambda p, e, m: losses.append(float(m["loss"])))
    assert model.is_sparse
    assert params["atlas_dyn"].ndim == 5        # (Nd, th, tw, F, 4)
    assert losses[-1] < losses[0] * 1.5         # not diverging
    from videoloop3d_tpu.models import checkpoint as ckpt_io
    ckpts = sorted(f for f in os.listdir(rundir) if "ckpt" in f)
    loaded = ckpt_io.load_checkpoint(os.path.join(rundir, ckpts[-1]))
    assert loaded["meta"]["stage"] == "mpv"
    assert loaded["meta"]["frm_num"] == 6
    assert loaded["tile_map_dyn"] is not None

    # eval-path render at explicit timesteps
    from videoloop3d_tpu.train.stage2 import render_eval
    ext = np.eye(4, dtype=np.float32)[None]
    intr = scene["intrins"][:1]
    frames = render_eval(model, params, 24, 32, ext, intr, [0, 3, 5])
    assert frames.shape == (3, 24, 32, 3)
    assert np.isfinite(frames).all()
