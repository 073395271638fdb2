"""Stage-1 --fused_render (render/fused_s1.py): the fused decode +
composite + loop-composite + regularizer custom-vjp must reproduce the
unfused dense path's outputs, extra losses, and parameter gradients (up
to float reassociation — sequential product vs cumprod scan)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videoloop3d_tpu.config import parse_args_with_configs
from videoloop3d_tpu.models.mpmesh import MPMesh

WEIGHTS = {"sparsity": 0.7, "rgb_smooth": 0.5, "a_smooth": 0.9,
           "d_smooth": 1.1, "l_smooth": 0.6, "density": 0.3}


def _build(fused, learn_loop=True, fast=False, d=6, h=24, w=32,
           extra_argv=()):
    intrin = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]],
                      np.float32)
    argv = ["--datadir", "x", "--expname", "x",
            "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
            "--mpi_h_verts", "4", "--mpi_w_verts", "5",
            "--mpi_d", str(d), "--atlas_grid_h", "2",
            "--sparsity_loss_weight", "0.1",
            "--rgb_smooth_loss_weight", "0.1",
            "--a_smooth_loss_weight", "0.1",
            "--d_smooth_loss_weight", "0.1",
            "--density_loss_weight", "0.1",
            *extra_argv]
    if learn_loop:
        argv += ["--learn_loop_mask", "--l_smooth_loss_weight", "0.1"]
    if fused:
        argv.append("--fused_render")
    if fast:
        argv.append("--fast_stage1_grad")
    args = parse_args_with_configs(argv)
    model = MPMesh(args, h, w, np.eye(4, dtype=np.float32), intrin,
                   1.5, 6.0)
    params = model.init_params(3)
    rng = np.random.default_rng(7)
    params["atlas"] = jnp.asarray(rng.standard_normal(
        params["atlas"].shape).astype(np.float32))
    if "atlas_mask" in params:
        params["atlas_mask"] = jnp.asarray(rng.standard_normal(
            params["atlas_mask"].shape).astype(np.float32))
    ext = np.eye(4, dtype=np.float32)[None]
    ext[:, 0, 3] = 0.1
    ext[:, 1, 3] = -0.05
    return model, params, jnp.asarray(ext), jnp.asarray(intrin)[None], \
        (h, w)


def _total(model, params, ext, intr, hw, rngk=None):
    rgbl, extra = model.forward(params, hw[0], hw[1], ext, intr,
                                training=True, rng=rngk)
    total = jnp.mean(rgbl ** 2)
    for k, v in extra.items():
        total = total + WEIGHTS[k] * v
    return total, (rgbl, extra)


@pytest.mark.parametrize("learn_loop", [True, False])
def test_fused_s1_matches_unfused(learn_loop):
    mu, pu, ext, intr, hw = _build(False, learn_loop)
    mf, pf, _, _, _ = _build(True, learn_loop)

    (tu, (rgbl_u, extra_u)) = _total(mu, pu, ext, intr, hw)
    (tf, (rgbl_f, extra_f)) = _total(mf, pf, ext, intr, hw)
    np.testing.assert_allclose(np.asarray(rgbl_f), np.asarray(rgbl_u),
                               rtol=0, atol=2e-6)
    assert set(extra_f) == set(extra_u)
    for k in extra_u:
        np.testing.assert_allclose(float(extra_f[k]), float(extra_u[k]),
                                   rtol=2e-5, err_msg=k)

    gu = jax.grad(lambda p: _total(mu, p, ext, intr, hw)[0])(pu)
    gf = jax.grad(lambda p: _total(mf, p, ext, intr, hw)[0])(pf)
    for k in gu:
        a, b = np.asarray(gu[k]), np.asarray(gf[k])
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, rtol=0, atol=3e-6 * scale,
                                   err_msg=k)


def test_fused_s1_matches_with_adjoint_sampler():
    """fused_render composes with fast_stage1_grad (the block-adjoint
    sampler): gradients still match the plain autodiff path."""
    mu, pu, ext, intr, hw = _build(False, True, fast=False)
    mf, pf, _, _, _ = _build(True, True, fast=True)
    gu = jax.grad(lambda p: _total(mu, p, ext, intr, hw)[0])(pu)
    gf = jax.grad(lambda p: _total(mf, p, ext, intr, hw)[0])(pf)
    for k in gu:
        a, b = np.asarray(gu[k]), np.asarray(gf[k])
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, rtol=0, atol=5e-6 * scale,
                                   err_msg=k)


def test_fused_s1_batched_patches():
    """B > 1 patch batches run through the fused path and match."""
    mu, pu, ext, intr, hw = _build(False, True)
    mf, pf, _, _, _ = _build(True, True)
    ext2 = jnp.concatenate([ext, ext.at[:, 0, 3].set(-0.12)], axis=0)
    intr2 = jnp.concatenate([intr, intr], axis=0)
    (tu, (rgbl_u, _)) = _total(mu, pu, ext2, intr2, hw)
    (tf, (rgbl_f, _)) = _total(mf, pf, ext2, intr2, hw)
    assert rgbl_f.shape[0] == 2
    np.testing.assert_allclose(np.asarray(rgbl_f), np.asarray(rgbl_u),
                               rtol=0, atol=2e-6)
    gu = jax.grad(lambda p: _total(mu, p, ext2, intr2, hw)[0])(pu)
    gf = jax.grad(lambda p: _total(mf, p, ext2, intr2, hw)[0])(pf)
    for k in gu:
        a, b = np.asarray(gu[k]), np.asarray(gf[k])
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, rtol=0, atol=3e-6 * scale,
                                   err_msg=k)


def test_fused_s1_normalized_disparity():
    """normalize_blendweight_fordepth divides the fused disp output by
    alpha_sum outside the custom-vjp; gradients must still match."""
    extra = ("--normalize_blendweight_fordepth",)
    mu, pu, ext, intr, hw = _build(False, True, extra_argv=extra)
    mf, pf, _, _, _ = _build(True, True, extra_argv=extra)
    gu = jax.grad(lambda p: _total(mu, p, ext, intr, hw)[0])(pu)
    gf = jax.grad(lambda p: _total(mf, p, ext, intr, hw)[0])(pf)
    for k in gu:
        a, b = np.asarray(gu[k]), np.asarray(gf[k])
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, rtol=0, atol=3e-6 * scale,
                                   err_msg=k)


def test_fused_s1_falls_back_for_sh_decoder():
    """Non-direct decoders must silently take the unfused path."""
    mf, pf, ext, intr, hw = _build(True, False,
                                   extra_argv=("--rgb_mlp_type", "rgb_sh"))
    rgbl, extra = mf.forward(pf, hw[0], hw[1], ext, intr, training=True)
    assert np.isfinite(np.asarray(rgbl)).all()
    assert "sparsity" in extra
