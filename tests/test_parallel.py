import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videoloop3d_tpu.config import parse_args_with_configs
from videoloop3d_tpu.data import synthetic
from videoloop3d_tpu.models.mpv import MPMeshVid
from videoloop3d_tpu.parallel.mesh import make_mesh
from videoloop3d_tpu.parallel.dp_step import make_dp_stage2_step
from videoloop3d_tpu.train.stage2 import make_stage2_step
from videoloop3d_tpu.core import cameras


def _tiny_mpv(tmp_scene=None, frm=4):
    scene = synthetic.make_scene(n_views=2, h=24, w=32, n_frames=frm,
                                 seed=0)
    argv = ["--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
            "--mpi_h_verts", "5", "--mpi_w_verts", "7",
            "--mpi_d", "4", "--atlas_grid_h", "2",
            "--mpv_frm_num", str(frm), "--mpv_isloop",
            "--scale_invariant", "--init_std", "0.02",
            "--rgb_smooth_loss_weight", "0.2",
            "--a_smooth_loss_weight", "0.2"]
    args = parse_args_with_configs(argv)
    poses, intrins, bds = scene["poses"], scene["intrins"], scene["bds"]
    ref_pose = cameras.average_pose(poses)[:, :4]
    ref_extrin = cameras.pose_to_extrinsic(ref_pose)
    model = MPMeshVid(args, 24, 32, ref_extrin, intrins[0],
                      float(bds[0]), float(bds[1]))
    params = model.init_params(0)
    return scene, args, model, params


LOSSCFG = {"loss_name": "gpnn_lm", "patch_size": 3, "patcht_size": 3,
           "stride": 2, "stridet": 1, "alpha": 10000, "rou": "-2",
           "scaling": 0.1, "macro_block": 17, "factor": 1,
           "loss_gain": 1.0, "dist_fn": "mse", "num_proj": 32}


def _patch_batch(scene, n):
    ext = np.stack([np.linalg.inv(np.concatenate(
        [scene["poses"][i % 2], np.array([[0, 0, 0, 1.0]], np.float32)]))
        for i in range(n)])
    intr = np.stack([scene["intrins"][i % 2] for i in range(n)])
    vids = np.stack([scene["videos"][i % 2] for i in range(n)])
    return ext.astype(np.float32), intr.astype(np.float32), \
        vids.astype(np.float32)


def test_dp_step_matches_single_device():
    """8-way DP on identical patches == the single-device step.

    Uses SGD: the update is linear in the gradient, so pmean-of-identical
    grads must reproduce the single-device update bit-near-exactly.
    (Adam's first step is +-lr * sign(grad), which amplifies f32
    reduction noise on near-zero gradients into +-lr param diffs.)
    """
    assert len(jax.devices()) >= 8
    scene, args, model, params = _tiny_mpv()
    args.optimizer = "sgd"
    mesh = make_mesh(n_dp=8, n_fp=1)
    weights = {k: jnp.asarray(0.2, jnp.float32)
               for k in ("sparsity", "rgb_smooth", "a_smooth", "d_smooth",
                         "density")}
    rng = jax.random.PRNGKey(0)

    ext, intr, vids = _patch_batch(scene, 8)
    # all 8 identical -> pmean(grad) == grad
    ext[:] = ext[:1]
    intr[:] = intr[:1]
    vids[:] = vids[:1]

    dp_step, dp_init = make_dp_stage2_step(model, args, 24, 32, LOSSCFG,
                                           mesh)
    p_dp, o_dp, m_dp = dp_step(
        jax.tree.map(jnp.copy, params), dp_init(params),
        {"extrin": jnp.asarray(ext), "intrin": jnp.asarray(intr),
         "video": jnp.asarray(vids)},
        jnp.asarray(0.1), weights, rng)

    single_step, s_init = make_stage2_step(model, args, 24, 32, LOSSCFG)
    p_s, o_s, m_s = single_step(
        jax.tree.map(jnp.copy, params), s_init(params),
        {"extrin": jnp.asarray(ext[:1]), "intrin": jnp.asarray(intr[:1]),
         "video": jnp.asarray(vids[0])},
        jnp.asarray(0.1), weights, rng)

    # rng folding differs (dp folds in axis index) -> compare only the
    # deterministic parts: same loss and same updated params
    assert np.isclose(float(m_dp["loss"]), float(m_s["loss"]), rtol=1e-4)
    for k in params:
        a, b = np.asarray(p_dp[k]), np.asarray(p_s[k])
        assert np.allclose(a, b, atol=1e-5), k


def test_dp_step_weight_masked_padding():
    """Zero-weight rows must contribute NOTHING: two dp batches that
    differ only in their wt=0 filler rows produce identical updates
    (exact per-epoch accounting for partial batches / --shard_views)."""
    scene, args, model, params = _tiny_mpv()
    args.optimizer = "sgd"
    mesh = make_mesh(n_dp=8, n_fp=1)
    weights = {k: jnp.asarray(0.2, jnp.float32)
               for k in ("sparsity", "rgb_smooth", "a_smooth", "d_smooth",
                         "density")}
    rng = jax.random.PRNGKey(0)
    ext, intr, vids = _patch_batch(scene, 8)
    wt = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)

    dp_step, dp_init = make_dp_stage2_step(model, args, 24, 32, LOSSCFG,
                                           mesh)

    def run(fill):
        e, i, v = ext.copy(), intr.copy(), vids.copy()
        e[5:], i[5:], v[5:] = fill(e), fill(i), fill(v)
        p, _, m = dp_step(
            jax.tree.map(jnp.copy, params), dp_init(params),
            {"extrin": jnp.asarray(e), "intrin": jnp.asarray(i),
             "video": jnp.asarray(v), "wt": jnp.asarray(wt)},
            jnp.asarray(0.1), weights, rng)
        return p, m

    p_a, m_a = run(lambda a: a[:3])               # fillers = copies
    p_b, m_b = run(lambda a: a[2:5][::-1])        # fillers = different
    assert np.isclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for k in params:
        assert np.allclose(np.asarray(p_a[k]), np.asarray(p_b[k]),
                           atol=1e-6), k


def _tiny_mpi():
    scene = synthetic.make_scene(n_views=3, h=24, w=32, n_frames=4,
                                 seed=0)
    argv = ["--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
            "--mpi_h_verts", "5", "--mpi_w_verts", "7",
            "--mpi_d", "4", "--atlas_grid_h", "2",
            "--scale_invariant", "--learn_loop_mask",
            "--init_std", "0.02",
            "--rgb_smooth_loss_weight", "0.2",
            "--a_smooth_loss_weight", "0.2"]
    args = parse_args_with_configs(argv)
    from videoloop3d_tpu.models.mpmesh import MPMesh
    poses, intrins, bds = scene["poses"], scene["intrins"], scene["bds"]
    ref_pose = cameras.average_pose(poses)[:, :4]
    ref_extrin = cameras.pose_to_extrinsic(ref_pose)
    model = MPMesh(args, 24, 32, ref_extrin, intrins[0],
                   float(bds[0]), float(bds[1]))
    params = model.init_params(0)
    return scene, args, model, params


def _image_batch(scene, n):
    ext = np.stack([np.linalg.inv(np.concatenate(
        [scene["poses"][i % 3], np.array([[0, 0, 0, 1.0]], np.float32)]))
        for i in range(n)])
    intr = np.stack([scene["intrins"][i % 3] for i in range(n)])
    rgbs = np.stack([scene["videos"][i % 3].mean(0) for i in range(n)])
    rng = np.random.default_rng(0)
    lms = (rng.random((n, 24, 32)) > 0.5).astype(np.float32)
    return (ext.astype(np.float32), intr.astype(np.float32),
            rgbs.astype(np.float32), lms)


def test_stage1_dp_step_matches_single_device():
    """8-way stage-1 DP on identical patches == the single-device step
    (SGD, so pmean-of-identical grads reproduces the update exactly —
    see test_dp_step_matches_single_device)."""
    from videoloop3d_tpu.parallel.dp_step import make_dp_stage1_step
    from videoloop3d_tpu.train.stage1 import make_train_step
    assert len(jax.devices()) >= 8
    scene, args, model, params = _tiny_mpi()
    args.optimizer = "sgd"
    mesh = make_mesh(n_dp=8, n_fp=1)
    weights = {k: jnp.asarray(0.1, jnp.float32)
               for k in ("sparsity", "rgb_smooth", "a_smooth", "d_smooth",
                         "l_smooth", "density")}
    rng = jax.random.PRNGKey(0)
    ext, intr, rgbs, lms = _image_batch(scene, 8)
    ext[:] = ext[:1]
    intr[:] = intr[:1]
    rgbs[:] = rgbs[:1]
    lms[:] = lms[:1]

    dp_step, dp_init, _ = make_dp_stage1_step(model, args, 24, 32, mesh)
    p_dp, o_dp, m_dp = dp_step(
        jax.tree.map(jnp.copy, params), dp_init(params),
        {"extrin": jnp.asarray(ext), "intrin": jnp.asarray(intr),
         "rgb": jnp.asarray(rgbs), "loopmask": jnp.asarray(lms)},
        jnp.asarray(0.1), weights, rng)

    single_step, s_init, _ = make_train_step(model, args, 24, 32)
    p_s, o_s, m_s = single_step(
        jax.tree.map(jnp.copy, params), s_init(params),
        {"extrin": jnp.asarray(ext[:1]), "intrin": jnp.asarray(intr[:1]),
         "rgb": jnp.asarray(rgbs[:1]), "loopmask": jnp.asarray(lms[:1])},
        jnp.asarray(0.1), weights, rng)

    assert np.isclose(float(m_dp["loss"]), float(m_s["loss"]), rtol=1e-4)
    for k in params:
        a, b = np.asarray(p_dp[k]), np.asarray(p_s[k])
        assert np.allclose(a, b, atol=1e-5), k


def test_stage1_trainer_dp_mesh(tmp_path):
    """End-to-end stage-1 trainer on a dp=4 mesh (covers mesh setup,
    global batching, commit_batch placement, culling re-spec)."""
    from tests.test_stage1 import _debug_args
    from videoloop3d_tpu.train import stage1
    scene = synthetic.make_scene(n_views=3, h=24, w=32, n_frames=4,
                                 seed=0)
    scene_dir = str(tmp_path / "scene")
    synthetic.write_llff_dir(scene, scene_dir, factor=1)
    args = _debug_args(tmp_path, scene_dir, mesh_devices="4",
                       N_iters="8", sparsify_epoch="6",
                       sparsify_alpha_thresh="0.03", i_weights="8")
    psnrs = []
    model, params, _ = stage1.train(
        args, progress_cb=lambda e, m: psnrs.append(
            float(m["psnr"]) if m else np.nan))
    vals = [p for p in psnrs if np.isfinite(p)]
    assert len(vals) >= 2
    assert vals[-1] > vals[0], psnrs
    assert model.is_sparse                       # culling event ran on dp


def test_stage1_trainer_shard_views_matches_plain(tmp_path):
    """Single-process --shard_views (sharded image stacks + local view
    indices + sharded batching) must reproduce the plain dp=4 trainer
    exactly: nproc=1 makes the sharded feed the same chunks in the same
    order, so params trajectories coincide."""
    from tests.test_stage1 import _debug_args
    from videoloop3d_tpu.train import stage1
    scene = synthetic.make_scene(n_views=4, h=24, w=32, n_frames=4,
                                 seed=0)
    scene_dir = str(tmp_path / "scene")
    synthetic.write_llff_dir(scene, scene_dir, factor=1)

    runs = {}
    for name, over in (("plain", {}), ("sv", {"shard_views": None})):
        args = _debug_args(tmp_path, scene_dir, mesh_devices="4",
                           N_iters="3", i_weights="100",
                           expname=f"s1{name}", **over)
        losses = []
        _, params, _ = stage1.train(
            args, progress_cb=lambda e, m: losses.append(
                float(m["loss"]) if m else np.nan))
        runs[name] = (losses, params)

    la, pa = runs["plain"]
    lb, pb = runs["sv"]
    assert np.allclose(la, lb, rtol=1e-6), (la, lb)
    for k in pa:
        assert np.allclose(np.asarray(pa[k]), np.asarray(pb[k]),
                           atol=1e-6), k


def test_stage2_dp_serial_matches_single_device(tmp_path):
    """--dp_serial_below (B=1 feeding on the dp mesh via weight-0
    filler rows) must reproduce the single-device trainer's loss
    trajectory: same patch order, same adaptive-lr divisor, one real
    patch per optimizer step.  This isolates the round-2 dp4
    trajectory deviation to the B=n_dp batch regime (Adam step-count
    collapse at small levels), not the parallel arithmetic."""
    from tests.test_stage2 import _stage2_args
    from videoloop3d_tpu.train import stage2
    scene = synthetic.make_scene(n_views=3, h=24, w=32, n_frames=6,
                                 seed=0)
    scene_dir = str(tmp_path / "scene")
    synthetic.write_llff_dir(scene, scene_dir, factor=1)

    runs = {}
    for name, over in (
            ("single", {"mesh_devices": "1"}),
            ("dpser", {"mesh_devices": "4", "mesh_fp": "1",
                       "dp_serial_below": "100000"})):
        losses = []
        args = _stage2_args(tmp_path, scene_dir, expname=f"ser_{name}",
                            **over)
        stage2.train(args, progress_cb=lambda p, e, m: losses.append(
            float(m["loss"])))
        runs[name] = losses

    a, b = np.asarray(runs["single"]), np.asarray(runs["dpser"])
    assert a.shape == b.shape
    assert np.allclose(a, b, rtol=1e-3, atol=1e-4), (a, b)


def test_stage2_dp_serial_shard_views_matches_plain(tmp_path):
    """The serial (B=1) feeding branch under --shard_views: with one
    process the sharded feed must reproduce the plain dp-serial
    trainer's trajectory (same patches, one real row per step, local
    fillers elsewhere)."""
    from tests.test_stage2 import _stage2_args
    from videoloop3d_tpu.train import stage2
    scene = synthetic.make_scene(n_views=3, h=24, w=32, n_frames=6,
                                 seed=0)
    scene_dir = str(tmp_path / "scene")
    synthetic.write_llff_dir(scene, scene_dir, factor=1)

    runs = {}
    for name, over in (
            ("plain", {}),
            ("sv", {"shard_views": None})):
        losses = []
        args = _stage2_args(tmp_path, scene_dir, expname=f"svs_{name}",
                            mesh_devices="4", mesh_fp="1",
                            dp_serial_below="100000", **over)
        stage2.train(args, progress_cb=lambda p, e, m: losses.append(
            float(m["loss"])))
        runs[name] = np.asarray(losses)

    a, b = runs["plain"], runs["sv"]
    assert a.shape == b.shape
    assert np.allclose(a, b, rtol=1e-3, atol=1e-4), (a, b)


def test_dp_step_distinct_patches_trains():
    """Distinct patches per device: one step must run and reduce loss
    over a few iterations."""
    scene, args, model, params = _tiny_mpv()
    mesh = make_mesh(n_dp=8, n_fp=1)
    weights = {k: jnp.asarray(0.0, jnp.float32)
               for k in ("sparsity", "rgb_smooth", "a_smooth", "d_smooth",
                         "density")}
    rng = jax.random.PRNGKey(1)
    ext, intr, vids = _patch_batch(scene, 8)
    dp_step, dp_init = make_dp_stage2_step(model, args, 24, 32, LOSSCFG,
                                           mesh)
    opt = dp_init(params)
    batch = {"extrin": jnp.asarray(ext), "intrin": jnp.asarray(intr),
             "video": jnp.asarray(vids)}
    losses = []
    for i in range(6):
        rng, sub = jax.random.split(rng)
        params, opt, m = dp_step(params, opt, batch,
                                 jnp.asarray(0.3), weights, sub)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
