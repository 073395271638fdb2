import os

import numpy as np
import jax
import jax.numpy as jnp

from videoloop3d_tpu.data import synthetic
from videoloop3d_tpu.train import stage1, stage2
from tests.test_stage1 import _debug_args
from tests.test_stage2 import _stage2_args, _make_stage1_ckpt


def test_stage1_auto_resume(tmp_path):
    scene = synthetic.make_scene(n_views=2, h=24, w=32, n_frames=4, seed=0)
    scene_dir = str(tmp_path / "scene")
    synthetic.write_llff_dir(scene, scene_dir, factor=1)

    args = _debug_args(tmp_path, scene_dir, N_iters="2", i_weights="1",
                       sparsify_epoch="-1")
    stage1.train(args)
    # second invocation with more epochs must resume at epoch 2
    args2 = _debug_args(tmp_path, scene_dir, N_iters="4", i_weights="1",
                        sparsify_epoch="-1")
    epochs = []
    stage1.train(args2, progress_cb=lambda e, m: epochs.append(e))
    assert epochs == [2, 3], epochs


def test_stage2_auto_resume(tmp_path):
    scene = synthetic.make_scene(n_views=2, h=24, w=32, n_frames=6, seed=0)
    scene_dir = str(tmp_path / "scene")
    synthetic.write_llff_dir(scene, scene_dir, factor=1)
    ckpt = _make_stage1_ckpt(tmp_path, scene_dir)

    args = _stage2_args(tmp_path, scene_dir, init_from=ckpt,
                        i_weights="1")
    stage2.train(args)
    # rerun: every level/epoch already checkpointed -> resumes at the end
    args2 = _stage2_args(tmp_path, scene_dir, init_from=ckpt,
                         i_weights="1")
    seen = []
    stage2.train(args2, progress_cb=lambda p, e, m: seen.append((p, e)))
    assert len(seen) <= 1, seen          # at most the final partial epoch


def test_mpv_sh_render_path():
    """rgb_sh MPV decode with per-pixel view dirs runs and is finite."""
    from videoloop3d_tpu.config import parse_args_with_configs
    from videoloop3d_tpu.models.mpv import MPMeshVid
    argv = ["--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
            "--mpi_h_verts", "5", "--mpi_w_verts", "7",
            "--mpi_d", "4", "--atlas_grid_h", "2",
            "--mpv_frm_num", "4", "--rgb_mlp_type", "rgb_sh",
            "--atlas_cnl", "13"]
    args = parse_args_with_configs(argv)
    model = MPMeshVid(args, 16, 20, np.eye(4, dtype=np.float32),
                      np.array([[20.0, 0, 10], [0, 20, 8], [0, 0, 1]],
                               np.float32), 1.5, 6.0)
    rng = np.random.default_rng(0)
    g = model.geom
    params = {
        "atlas": jnp.zeros((0, 1, 1, 13), jnp.float32),
        "atlas_dyn": jnp.asarray(rng.random(
            (g.n_planes, g.mpi_h, g.mpi_w, 4, 13), dtype=np.float32)),
    }
    rgb, _ = model.render(params, 16, 20, jnp.eye(4)[None],
                          jnp.asarray(np.array(
                              [[20.0, 0, 10], [0, 20, 8], [0, 0, 1]],
                              np.float32))[None], jnp.arange(2))
    assert rgb.shape == (2, 16, 20, 3)
    assert np.isfinite(np.asarray(rgb)).all()


def test_direct2sh_conversion():
    from videoloop3d_tpu.models.geometry import MPIGeometry
    from videoloop3d_tpu.models.mpmesh import (MPMesh, MPMeshConfig,
                                               convert_direct_to_sh)
    km = np.array([[20.0, 0, 12], [0, 20, 10], [0, 0, 1]])
    geom = MPIGeometry(
        n_planes=2, mpi_h=21, mpi_w=25, n_tiles_h=2, n_tiles_w=3,
        near=1.5, far=6.0, depths=(5.0, 2.0),
        ref_intrin_mpi=tuple(tuple(float(v) for v in r) for r in km),
        ref_extrin=tuple(tuple(float(v) for v in r) for r in np.eye(4)))
    model = MPMesh.from_geometry(geom, MPMeshConfig(), 20, 24)
    rng = np.random.default_rng(0)
    params = {"atlas": jnp.asarray(
        rng.random((2, 21, 25, 4), dtype=np.float32))}
    new = convert_direct_to_sh(model, params)
    assert model.cfg.rgb_mlp_type == "rgb_sh"
    assert new["atlas"].shape == (2, 21, 25, 13)
    # dc coefficients carry the direct colors; alpha preserved
    assert np.allclose(np.asarray(new["atlas"][..., 0]),
                       np.asarray(params["atlas"][..., 0]))
    assert np.allclose(np.asarray(new["atlas"][..., -1]),
                       np.asarray(params["atlas"][..., -1]))
    # and the converted model renders finite images
    rgbl, _ = model.render(new, 20, 24, jnp.eye(4)[None],
                           jnp.asarray(km.astype(np.float32))[None])
    assert np.isfinite(np.asarray(rgbl)).all()


def test_nex_and_mlp_decoders_train():
    """The learnable view-conditioned decoders render, differentiate,
    and their weights receive gradients."""
    from videoloop3d_tpu.models.geometry import MPIGeometry
    from videoloop3d_tpu.models.mpmesh import MPMesh, MPMeshConfig
    km = np.array([[20.0, 0, 12], [0, 20, 10], [0, 0, 1]])
    geom = MPIGeometry(
        n_planes=2, mpi_h=21, mpi_w=25, n_tiles_h=2, n_tiles_w=3,
        near=1.5, far=6.0, depths=(5.0, 2.0),
        ref_intrin_mpi=tuple(tuple(float(v) for v in r) for r in km),
        ref_extrin=tuple(tuple(float(v) for v in r) for r in np.eye(4)))
    for mlp_type in ("nex_rgb", "mlp_alpha"):
        cfg = MPMeshConfig(rgb_mlp_type=mlp_type, atlas_cnl=8)
        model = MPMesh.from_geometry(geom, cfg, 20, 24)
        params = model.init_params(0)
        assert "decoder" in params
        intr = jnp.asarray(km.astype(np.float32))[None]

        def loss(p):
            rgbl, _ = model.forward(p, 20, 24, jnp.eye(4)[None], intr,
                                    training=False)
            return jnp.mean(rgbl ** 2)

        g = jax.grad(loss)(params)
        assert np.isfinite(float(loss(params)))
        assert float(jnp.abs(g["decoder"]["l0"]["w"]).max()) > 0, mlp_type
