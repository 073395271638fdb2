"""--fused_render (render/fused.py): the fused decode+composite+
regularizer custom-vjp must reproduce the unfused path's outputs, extra
losses and parameter gradients (up to float reassociation — the fused
composite is a sequential product, the unfused one a cumprod scan)."""
import numpy as np
import jax
import jax.numpy as jnp

from videoloop3d_tpu.config import parse_args_with_configs
from videoloop3d_tpu.models.mpv import MPMeshVid
from videoloop3d_tpu.render.compact import slot_bound

WEIGHTS = {"sparsity": 0.7, "rgb_smooth": 0.5, "a_smooth": 0.9,
           "d_smooth": 1.1, "density": 0.3}


def _build(fused, fast=False, seed=5, keep_s=0.12, keep_d=0.1, d=10,
           frm=5):
    h, w = 24, 32
    intrin = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]],
                      np.float32)
    argv = ["--datadir", "x", "--expname", "x",
            "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
            "--mpi_h_verts", "4", "--mpi_w_verts", "5",
            "--mpi_d", str(d), "--mpv_frm_num", str(frm), "--mpv_isloop",
            "--sparsity_loss_weight", "0.1",
            "--rgb_smooth_loss_weight", "0.1",
            "--a_smooth_loss_weight", "0.1",
            "--d_smooth_loss_weight", "0.1",
            "--density_loss_weight", "0.1"]
    if fused:
        argv.append("--fused_render")
    if fast:
        argv.append("--fast_stage2_grad")
    args = parse_args_with_configs(argv)
    model = MPMeshVid(args, h, w, np.eye(4, dtype=np.float32),
                      intrin, 1.5, 6.0)
    g = model.geom
    r = np.random.default_rng(seed).random(
        (g.n_planes, g.n_tiles_h, g.n_tiles_w))
    tm_s = np.full(r.shape, -1, np.int32)
    tm_d = np.full(r.shape, -1, np.int32)
    tm_s[r < keep_s] = np.arange((r < keep_s).sum(), dtype=np.int32)
    sel_d = (r > 1 - keep_d)
    tm_d[sel_d] = np.arange(sel_d.sum(), dtype=np.int32)
    model.is_sparse = True
    model.tile_map_static = tm_s
    model.tile_map_dyn = tm_d
    model.tile_hw = g.default_tile_texels()
    model.base_tile_hw = model.tile_hw
    return model, int((r < keep_s).sum()), int(sel_d.sum()), intrin, (h, w)


def _params(ns, nd, th, tw, frm=5, seed=11):
    rng = np.random.default_rng(seed)
    return {
        "atlas": jnp.asarray(
            rng.standard_normal((ns, th, tw, 4)).astype(np.float32)),
        "atlas_dyn": jnp.asarray(
            rng.standard_normal((nd, th, tw, frm, 4)).astype(np.float32)),
    }


def _view(intrin):
    ext = np.eye(4, dtype=np.float32)
    ext[:3, 3] = [0.1, -0.05, 0.02]
    return jnp.asarray(ext)[None], jnp.asarray(intrin)[None]


def _loss(model, p, h, w, ext, intr):
    rgb, variables = model.render(p, h, w, ext, intr, ts=None,
                                  training=True)
    extra = model.training_extras(variables, loss_gain=1.3)
    assert set(extra) == set(WEIGHTS), extra.keys()
    tot = 0.1 * jnp.sum(rgb ** 2)
    for k, wk in WEIGHTS.items():
        tot = tot + wk * extra[k]
    return tot, (rgb, extra)


def _compare(model_a, model_b, params, h, w, ext, intr,
             rtol=2e-5, gtol=2e-5):
    (la, (ra, ea)) = _loss(model_a, params, h, w, ext, intr)
    (lb, (rb, eb)) = _loss(model_b, params, h, w, ext, intr)
    assert np.allclose(np.asarray(ra), np.asarray(rb), atol=1e-6)
    for k in WEIGHTS:
        assert np.isclose(float(ea[k]), float(eb[k]),
                          rtol=rtol, atol=1e-8), (k, ea[k], eb[k])
    ga = jax.grad(lambda p: _loss(model_a, p, h, w, ext, intr)[0])(params)
    gb = jax.grad(lambda p: _loss(model_b, p, h, w, ext, intr)[0])(params)
    for k in ga:
        a, b = np.asarray(ga[k]), np.asarray(gb[k])
        scale = np.abs(a).max() + 1e-12
        assert np.abs(a - b).max() <= gtol * scale, \
            (k, np.abs(a - b).max(), scale)


def test_fused_matches_unfused_dense_sweep():
    model_a, ns, nd, intrin, (h, w) = _build(fused=False)
    model_b, _, _, _, _ = _build(fused=True)
    th, tw = model_a.tile_hw
    params = _params(ns, nd, th, tw)
    ext, intr = _view(intrin)
    _compare(model_a, model_b, params, h, w, ext, intr)


def test_fused_matches_unfused_compacted_adjoint():
    """The shipped fast path: fused + --compact_hits +
    --fast_stage2_grad (the fused backward's texel cotangents feed the
    per-tile adjoint samplers).  Baseline is the UNFUSED compacted
    autodiff path: the smooth regularizers are defined on the compacted
    stack (per-pixel slot contents differ from per-plane rows — the
    reference's truncated fragment stack has the same semantics), so
    dense-sweep regularizer values are not the comparison point."""
    model_a, ns, nd, intrin, (h, w) = _build(fused=False, keep_s=0.07,
                                             keep_d=0.05)
    model_b, _, _, _, _ = _build(fused=True, fast=True, keep_s=0.07,
                                 keep_d=0.05)
    ext, intr = _view(intrin)
    S = slot_bound(model_a.geom, model_a.tile_map_static,
                   model_a.tile_map_dyn, np.asarray(ext),
                   np.asarray(intr), h, w)
    assert S < model_a.geom.n_planes
    model_a.compact_slots = S
    model_b.compact_slots = S
    th, tw = model_a.tile_hw
    params = _params(ns, nd, th, tw)
    _compare(model_a, model_b, params, h, w, ext, intr)


def test_fused_falls_back_for_sh_decoder():
    """Non-direct decoders bypass the fused path (stack regularizers
    present in variables)."""
    import dataclasses

    model, ns, nd, intrin, (h, w) = _build(fused=True)
    model.cfg = dataclasses.replace(model.cfg, rgb_mlp_type="rgba_sh")
    th, tw = model.tile_hw
    rng = np.random.default_rng(3)
    params = {
        "atlas": jnp.asarray(rng.standard_normal(
            (ns, th, tw, 36)).astype(np.float32)),
        "atlas_dyn": jnp.asarray(rng.standard_normal(
            (nd, th, tw, 5, 36)).astype(np.float32)),
    }
    ext, intr = _view(intrin)
    rgb, variables = model.render(params, h, w, ext, intr, ts=None,
                                  training=True)
    assert variables.get("fused_regs") is None
    assert variables["alpha_planes"] is not None
    assert np.isfinite(np.asarray(rgb)).all()
