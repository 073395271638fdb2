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
