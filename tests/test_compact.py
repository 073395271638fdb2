"""Hit-compaction (render/compact.py): exactness vs the dense sweep.

The compacted sparse render must reproduce the dense-sweep renders and
gradients exactly (dropped entries are exact zeros), on both the plain
autodiff path and the --fast_stage2_grad per-tile adjoint path.
"""
import numpy as np
import jax
import jax.numpy as jnp

from videoloop3d_tpu.config import parse_args_with_configs
from videoloop3d_tpu.models.mpv import MPMeshVid
from videoloop3d_tpu.render import renderer as R
from videoloop3d_tpu.render.compact import (compact_sweep,
                                            expand_cotangent, slot_bound)


def _build(fast, seed=5, keep_s=0.1, keep_d=0.08, d=10, frm=5):
    h, w = 24, 32
    intrin = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]],
                      np.float32)
    argv = ["--datadir", "x", "--expname", "x",
            "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
            "--mpi_h_verts", "4", "--mpi_w_verts", "5",
            "--mpi_d", str(d), "--mpv_frm_num", str(frm), "--mpv_isloop"]
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


def _view(intrin):
    ext = np.eye(4, dtype=np.float32)
    ext[:3, 3] = [0.1, -0.05, 0.02]
    return jnp.asarray(ext)[None], jnp.asarray(intrin)[None]


def test_compact_render_and_grad_equivalence():
    """Dense sweep == compacted sweep (plain and adjoint), values and
    atlas gradients."""
    rng = np.random.default_rng(11)
    model_a, ns, nd, intrin, (h, w) = _build(False)
    model_b, _, _, _, _ = _build(False)
    model_c, _, _, _, _ = _build(True)
    th, tw = model_a.tile_hw
    params = {
        "atlas": jnp.asarray(
            rng.standard_normal((ns, th, tw, 4)).astype(np.float32)),
        "atlas_dyn": jnp.asarray(
            rng.standard_normal((nd, th, tw, 5, 4)).astype(np.float32)),
    }
    ext, intr = _view(intrin)
    S = slot_bound(model_a.geom, model_a.tile_map_static,
                   model_a.tile_map_dyn, np.asarray(ext),
                   np.asarray(intr), h, w)
    assert S < model_a.geom.n_planes, "fixture not sparse enough"
    model_b.compact_slots = S
    model_c.compact_slots = S

    def loss(model, p):
        rgb, variables = model.render(p, h, w, ext, intr, ts=None,
                                      training=True)
        return jnp.sum(rgb ** 2) + jnp.sum(variables["alpha"]), rgb

    # hit-compaction + tile-compaction combined (the shipped fast path)
    from videoloop3d_tpu.render.adjoint import active_tile_bound
    model_d, _, _, _, _ = _build(True)
    model_d.compact_slots = S
    model_d.active_tiles = tuple(
        active_tile_bound(model_a.geom, tm, np.asarray(ext),
                          np.asarray(intr), h, w, [(0, 0)], margin=1)
        for tm in (model_a.tile_map_static, model_a.tile_map_dyn))
    # ... plus the blocked tile-map lookup on top
    model_e, _, _, _, _ = _build(True)
    model_e.compact_slots = S
    model_e.active_tiles = model_d.active_tiles
    model_e.lookup_spans = R.lookup_span_bound(
        model_a.geom, np.asarray(ext), np.asarray(intr), h, w, [(0, 0)])

    (la, ra) = loss(model_a, params)
    (lb, rb) = loss(model_b, params)
    (lc, rc) = loss(model_c, params)
    (ld, rd) = loss(model_d, params)
    (le, re) = loss(model_e, params)
    assert np.allclose(np.asarray(ra), np.asarray(rb), atol=1e-6)
    assert np.allclose(np.asarray(ra), np.asarray(rc), atol=1e-6)
    assert np.allclose(np.asarray(ra), np.asarray(rd), atol=1e-6)
    # the blocked lookup yields IDENTICAL k/u/v -> bit-identical render
    assert np.array_equal(np.asarray(rd), np.asarray(re))
    assert np.isclose(float(la), float(lb), rtol=1e-6)
    assert np.isclose(float(la), float(lc), rtol=1e-6)
    assert np.isclose(float(la), float(ld), rtol=1e-6)
    assert float(ld) == float(le)

    ga = jax.grad(lambda p: loss(model_a, p)[0])(params)
    gb = jax.grad(lambda p: loss(model_b, p)[0])(params)
    gc = jax.grad(lambda p: loss(model_c, p)[0])(params)
    gd = jax.grad(lambda p: loss(model_d, p)[0])(params)
    ge = jax.grad(lambda p: loss(model_e, p)[0])(params)
    for key in ("atlas", "atlas_dyn"):
        a = np.asarray(ga[key])
        for name, g in (("plain", gb), ("adjoint", gc),
                        ("adjoint+tiles", gd)):
            b = np.asarray(g[key])
            rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
            assert rel < 2e-5, (key, name, rel)
    # tile-compaction must be bit-identical to the uncompacted adjoint,
    # and the blocked lookup bit-identical on top
    for key in ("atlas", "atlas_dyn"):
        assert np.array_equal(np.asarray(gc[key]), np.asarray(gd[key])), \
            key
        assert np.array_equal(np.asarray(gd[key]), np.asarray(ge[key])), \
            key


def test_compact_extras_invariants():
    """sparsity/density/d_smooth are exactly invariant under compaction;
    the smooth regularizers carry the reference's L/D renorm."""
    rng = np.random.default_rng(3)
    model_a, ns, nd, intrin, (h, w) = _build(False)
    model_b, _, _, _, _ = _build(False)
    th, tw = model_a.tile_hw
    params = {
        "atlas": jnp.asarray(
            rng.standard_normal((ns, th, tw, 4)).astype(np.float32)),
        "atlas_dyn": jnp.asarray(
            rng.standard_normal((nd, th, tw, 5, 4)).astype(np.float32)),
    }
    import dataclasses
    for m in (model_a, model_b):
        m.cfg = dataclasses.replace(
            m.cfg, sparsity_on=True, rgb_smooth_on=True, a_smooth_on=True,
            density_on=True, d_smooth_on=True)
    ext, intr = _view(intrin)
    S = slot_bound(model_a.geom, model_a.tile_map_static,
                   model_a.tile_map_dyn, np.asarray(ext),
                   np.asarray(intr), h, w)
    model_b.compact_slots = S

    _, va = model_a.render(params, h, w, ext, intr, ts=None, training=True)
    _, vb = model_b.render(params, h, w, ext, intr, ts=None, training=True)
    ea = model_a.training_extras(va)
    eb = model_b.training_extras(vb)
    assert va["alpha_planes"].shape[0] == model_a.geom.n_planes
    assert vb["alpha_planes"].shape[0] == S
    for k in ("sparsity", "density", "d_smooth"):
        assert np.isclose(float(ea[k]), float(eb[k]), rtol=1e-5), k
    # smooth regs run on the compacted stack (the reference's truncated
    # fragment stack, MPV.py:518) — finite and same order of magnitude
    for k in ("rgb_smooth", "a_smooth"):
        assert np.isfinite(float(eb[k]))
        assert 0.0 < float(eb[k]) < 10 * float(ea[k]) + 1.0


def test_compact_sweep_semantics():
    """Slots hold exactly the hit planes, far -> near; overflow drops
    the farthest hits; empty slots read k = -1."""
    D, h, w = 5, 2, 2
    rng = np.random.default_rng(0)
    k_s = np.full((D, h, w), -1, np.int32)
    k_d = np.full((D, h, w), -1, np.int32)
    # pixel (0,0): hits on planes 0,2,4 (static), pixel (1,1): dyn 1,3
    k_s[0, 0, 0], k_s[2, 0, 0], k_s[4, 0, 0] = 7, 8, 9
    k_d[1, 1, 1], k_d[3, 1, 1] = 3, 4
    fu = rng.random((D, h, w)).astype(np.float32)
    fv = rng.random((D, h, w)).astype(np.float32)
    valid = np.ones((D, h, w), bool)
    zview = rng.random((D, h, w)).astype(np.float32) + 1.0

    cs = compact_sweep(jnp.asarray(k_s), jnp.asarray(k_d),
                       jnp.asarray(fu), jnp.asarray(fv),
                       jnp.asarray(valid), jnp.asarray(zview), 3)
    ks = np.asarray(cs.k_s)
    kd = np.asarray(cs.k_d)
    # pixel (0,0): slots far->near = planes 0,2,4 -> static 7,8,9
    assert list(ks[:, 0, 0]) == [7, 8, 9]
    assert list(kd[:, 0, 0]) == [-1, -1, -1]
    # pixel (1,1): 2 hits -> slot 0 empty, then planes 1,3
    assert list(kd[:, 1, 1]) == [-1, 3, 4]
    # coords selected from the right planes
    assert np.isclose(float(cs.fu[1, 1, 1]), fu[1, 1, 1])
    assert np.isclose(float(cs.fv[2, 1, 1]), fv[3, 1, 1])
    assert np.isclose(float(cs.zview[0, 0, 0]), zview[0, 0, 0])
    # empty pixel: all slots empty
    assert list(ks[:, 0, 1]) == [-1, -1, -1]

    # overflow S=2: pixel (0,0) drops its FARTHEST hit (plane 0)
    cs2 = compact_sweep(jnp.asarray(k_s), jnp.asarray(k_d),
                        jnp.asarray(fu), jnp.asarray(fv),
                        jnp.asarray(valid), jnp.asarray(zview), 2)
    assert list(np.asarray(cs2.k_s)[:, 0, 0]) == [8, 9]


def test_expand_cotangent_transpose():
    """expand_cotangent is the exact transpose of the slot selection."""
    D, h, w, S, K = 4, 3, 3, 2, 3
    rng = np.random.default_rng(1)
    hit = rng.random((D, h, w)) < 0.4
    rnc = np.cumsum(hit[::-1], axis=0)[::-1]
    oh = np.zeros((S, D, h * w), np.float32)
    for s in range(S):
        oh[s] = ((rnc == S - s) & hit).reshape(D, -1)
    ct = rng.standard_normal((S, h, w, K)).astype(np.float32)
    full = np.asarray(expand_cotangent(jnp.asarray(oh), jnp.asarray(ct)))
    ref = np.einsum("sdp,spk->dpk", oh, ct.reshape(S, -1, K)).reshape(
        D, h, w, K)
    assert np.allclose(full, ref, atol=1e-6)


def test_compact_under_dp_and_fp_mesh():
    """Compaction composes with the mesh paths: the dp- and fp-sharded
    steps on a compacted sparse model match the single-device compacted
    step (SGD: update linear in the gradient)."""
    import jax  # noqa: F811 (explicit for clarity)
    from videoloop3d_tpu.parallel.mesh import make_mesh
    from videoloop3d_tpu.parallel.dp_step import make_dp_stage2_step
    from videoloop3d_tpu.parallel.fp_step import make_fp_stage2_step
    from videoloop3d_tpu.train.stage2 import make_stage2_step
    from tests.test_parallel import LOSSCFG

    rng_np = np.random.default_rng(7)
    model, ns, nd, intrin, (h, w) = _build(True, frm=8)
    from videoloop3d_tpu.config import parse_args_with_configs as _parse
    args = _parse(["--datadir", "x", "--expname", "x",
                   "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
                   "--mpi_h_verts", "4", "--mpi_w_verts", "5",
                   "--mpi_d", "10", "--mpv_frm_num", "8", "--mpv_isloop",
                   "--fast_stage2_grad", "--optimizer", "sgd"])
    th, tw = model.tile_hw
    params = {
        "atlas": jnp.asarray(rng_np.standard_normal(
            (ns, th, tw, 4)).astype(np.float32) * 0.1),
        "atlas_dyn": jnp.asarray(rng_np.standard_normal(
            (nd, th, tw, 8, 4)).astype(np.float32) * 0.1),
    }
    ext, intr = _view(intrin)
    S = slot_bound(model.geom, model.tile_map_static, model.tile_map_dyn,
                   np.asarray(ext), np.asarray(intr), h, w)
    assert S < model.geom.n_planes
    model.compact_slots = S

    vids = rng_np.random((8, h, w, 3)).astype(np.float32)
    weights = {k: jnp.asarray(0.2, jnp.float32)
               for k in ("sparsity", "rgb_smooth", "a_smooth", "d_smooth",
                         "density")}
    rng = jax.random.PRNGKey(0)

    single_step, s_init = make_stage2_step(model, args, h, w, LOSSCFG)
    p_s, _, m_s = single_step(
        jax.tree.map(jnp.copy, params), s_init(params),
        {"extrin": ext, "intrin": intr, "video": jnp.asarray(vids)},
        jnp.asarray(0.1), weights, rng)

    # dp=2: identical rows -> pmean(grad) == grad
    mesh = make_mesh(n_dp=2, n_fp=1)
    bat2 = {"extrin": jnp.concatenate([ext, ext]),
            "intrin": jnp.concatenate([intr, intr]),
            "video": jnp.asarray(np.stack([vids, vids]))}
    dp_step, dp_init = make_dp_stage2_step(model, args, h, w, LOSSCFG,
                                           mesh)
    p_dp, _, m_dp = dp_step(
        jax.tree.map(jnp.copy, params), dp_init(params), bat2,
        jnp.asarray(0.1), weights, rng)
    assert np.isclose(float(m_dp["loss"]), float(m_s["loss"]), rtol=1e-4)

    # fp=4 over the 8-frame axis
    mesh = make_mesh(n_dp=1, n_fp=4)
    fp_step, fp_init = make_fp_stage2_step(
        model, args, h, w, LOSSCFG, mesh, param_keys=tuple(params))
    p_fp, _, m_fp = fp_step(
        jax.tree.map(jnp.copy, params), fp_init(params),
        {"extrin": ext, "intrin": intr,
         "video": jnp.asarray(vids)[None]},
        jnp.asarray(0.1), weights, rng)
    assert np.isclose(float(m_fp["loss"]), float(m_s["loss"]),
                      rtol=2e-4), (float(m_fp["loss"]), float(m_s["loss"]))

    for name, p in (("dp", p_dp), ("fp", p_fp)):
        for k in params:
            a, b = np.asarray(p[k]), np.asarray(p_s[k])
            if a.size == 0:
                continue
            assert np.allclose(a, b, atol=3e-4), \
                (name, k, np.abs(a - b).max())


def test_slot_bound_covers_true_max():
    """slot_bound >= the actual per-pixel hit count at the pixel grid."""
    model, ns, nd, intrin, (h, w) = _build(False, seed=9, keep_s=0.4,
                                           keep_d=0.3)
    ext, intr = _view(intrin)
    S = slot_bound(model.geom, model.tile_map_static, model.tile_map_dyn,
                   np.asarray(ext), np.asarray(intr), h, w)
    coords = R.warp_coordinates(model.geom, ext, intr, h, w)
    k_s, k_d, _, _ = R.tile_lookup2(model.geom, model.tile_map_static,
                                    model.tile_map_dyn, coords)
    hits = (((np.asarray(k_s[0]) >= 0) | (np.asarray(k_d[0]) >= 0))
            & np.asarray(coords.valid[0])).sum(0)
    assert S >= hits.max()
    assert S <= model.geom.n_planes
