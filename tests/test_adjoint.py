"""The gather-based adjoint must reproduce autodiff gradients exactly."""
import numpy as np
import jax
import jax.numpy as jnp

from videoloop3d_tpu.core import planes as plane_math
from videoloop3d_tpu.render import adjoint as A
from videoloop3d_tpu.render import renderer as R
from videoloop3d_tpu.models.geometry import MPIGeometry


def _setup(seed=0, h=20, w=26):
    rng = np.random.default_rng(seed)
    intrin = np.array([[25.0, 0, w / 2], [0, 25.0, h / 2], [0, 0, 1]],
                      np.float32)
    km = intrin.copy()
    km[0, 0] *= 1.6            # nominal 1.6 texels / pixel
    km[1, 1] *= 1.6
    km[0, 2] = 20
    km[1, 2] = 16
    geom = MPIGeometry(
        n_planes=3, mpi_h=int(h * 1.6) + 10, mpi_w=int(w * 1.6) + 12,
        n_tiles_h=2, n_tiles_w=3, near=1.5, far=6.0,
        depths=(5.0, 3.0, 2.0),
        ref_intrin_mpi=tuple(tuple(float(v) for v in r) for r in km),
        ref_extrin=tuple(tuple(float(v) for v in r) for r in np.eye(4)))
    atlas = jnp.asarray(rng.random(
        (3, geom.mpi_h, geom.mpi_w, 4), dtype=np.float32))
    angle = 0.06
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = np.array([[np.cos(angle), 0, np.sin(angle)],
                            [0, 1, 0],
                            [-np.sin(angle), 0, np.cos(angle)]])
    ext[:3, 3] = [0.15, -0.08, 0.05]
    return geom, atlas, jnp.asarray(ext)[None], jnp.asarray(intrin)[None], \
        rng, (h, w)


def test_adjoint_matches_autodiff():
    geom, atlas, ext, intrin, rng, (h, w) = _setup()
    coords = R.warp_coordinates(geom, ext, intrin, h, w)
    M = A.forward_projection(geom.depths_np(), geom.ref_intrin_mpi_np(),
                             ext, intrin)
    ct = jnp.asarray(rng.random((1, 3, h, w, 4), dtype=np.float32))
    rect = A.rect_size_for(geom, h, w, (h, w))

    def loss_auto(a):
        vals = R.sample_dense(a, coords)
        return jnp.sum(vals * ct)

    def loss_adj(a):
        vals = A.sample_dense_adjoint(a, coords.x, coords.y, M, rect, 5)
        return jnp.sum(vals * ct)

    # forwards identical
    assert np.isclose(float(loss_auto(atlas)), float(loss_adj(atlas)),
                      rtol=1e-5)
    g_auto = np.asarray(jax.grad(loss_auto)(atlas))
    g_adj = np.asarray(jax.grad(loss_adj)(atlas))
    err = np.abs(g_auto - g_adj).max()
    assert err < 1e-4, err


def test_adjoint_matches_autodiff_oblique_and_lod():
    """Stronger warp (rotation + off-center patch intrinsic) and a
    coarser lod geometry still match."""
    geom, atlas, ext, intrin, rng, (h, w) = _setup(seed=3)
    geom2 = geom.scaled(int(geom.mpi_h * 0.75), int(geom.mpi_w * 0.75))
    atlas2 = jnp.asarray(np.random.default_rng(5).random(
        (3, geom2.mpi_h, geom2.mpi_w, 4), dtype=np.float32))
    intrin_off = np.asarray(intrin).copy()
    intrin_off[0, 0, 2] -= 6     # patch-style shifted principal point
    intrin_off[0, 1, 2] += 4
    intrin_off = jnp.asarray(intrin_off)
    coords = R.warp_coordinates(geom2, ext, intrin_off, h, w)
    M = A.forward_projection(geom2.depths_np(), geom2.ref_intrin_mpi_np(),
                             ext, intrin_off)
    ct = jnp.asarray(rng.random((1, 3, h, w, 4), dtype=np.float32))
    rect = A.rect_size_for(geom2, h, w, (h, w))

    def loss_auto(a):
        return jnp.sum(R.sample_dense(a, coords) * ct)

    def loss_adj(a):
        return jnp.sum(A.sample_dense_adjoint(
            a, coords.x, coords.y, M, rect, 5) * ct)

    g_auto = np.asarray(jax.grad(loss_auto)(atlas2))
    g_adj = np.asarray(jax.grad(loss_adj)(atlas2))
    err = np.abs(g_auto - g_adj).max()
    assert err < 1e-4, err


def test_block_matmul_adjoint_matches_autodiff():
    geom, atlas, ext, intrin, rng, (h, w) = _setup(seed=7)
    coords = R.warp_coordinates(geom, ext, intrin, h, w)
    M = A.forward_projection(geom.depths_np(), geom.ref_intrin_mpi_np(),
                             ext, intrin)
    ct = jnp.asarray(rng.random((1, 3, h, w, 4), dtype=np.float32))
    block_hw, tb_hw = A.block_plan_for(geom, h, w, (h, w))

    def loss_auto(a):
        return jnp.sum(R.sample_dense(a, coords) * ct)

    def loss_adj(a):
        return jnp.sum(A.sample_dense_blockadj(
            a, coords.x, coords.y, M, block_hw, tb_hw) * ct)

    assert np.isclose(float(loss_auto(atlas)), float(loss_adj(atlas)),
                      rtol=1e-5)
    g_auto = np.asarray(jax.grad(loss_auto)(atlas))
    g_adj = np.asarray(jax.grad(loss_adj)(atlas))
    err = np.abs(g_auto - g_adj).max()
    assert err < 1e-4, err


def test_block_matmul_adjoint_oblique_partial_coverage():
    """Oblique view where part of the patch falls outside the atlas —
    invalid samples must not poison the block bboxes."""
    geom, atlas, ext, intrin, rng, (h, w) = _setup(seed=9)
    ext = np.asarray(ext).copy()
    ext[0, :3, 3] = [1.5, 0.9, 0.2]       # push much of the patch off-plane
    ext = jnp.asarray(ext)
    coords = R.warp_coordinates(geom, ext, intrin, h, w)
    M = A.forward_projection(geom.depths_np(), geom.ref_intrin_mpi_np(),
                             ext, intrin)
    ct = jnp.asarray(rng.random((1, 3, h, w, 4), dtype=np.float32))
    block_hw, tb_hw = A.block_plan_for(geom, h, w, (h, w))

    def loss_auto(a):
        return jnp.sum(R.sample_dense(a, coords) * ct)

    def loss_adj(a):
        return jnp.sum(A.sample_dense_blockadj(
            a, coords.x, coords.y, M, block_hw, tb_hw) * ct)

    g_auto = np.asarray(jax.grad(loss_auto)(atlas))
    g_adj = np.asarray(jax.grad(loss_adj)(atlas))
    err = np.abs(g_auto - g_adj).max()
    assert err < 1e-4, err


def test_bwd_block_plan_grad_matches_autodiff():
    """A backward-specific block plan (bwd_block_plan_for, larger blocks
    + unrolled accumulation) == autodiff, including a 2-view batch."""
    geom, atlas, ext, intrin, rng, (h, w) = _setup(seed=11)
    ext2 = np.asarray(ext).copy()
    ext2[0, :3, 3] = [0.02, 0.04, -0.03]
    ext = jnp.concatenate([ext, jnp.asarray(ext2)], 0)
    intrin = jnp.concatenate([intrin, intrin], 0)
    coords = R.warp_coordinates(geom, ext, intrin, h, w)
    M = A.forward_projection(geom.depths_np(), geom.ref_intrin_mpi_np(),
                             ext, intrin)
    ct = jnp.asarray(rng.random((2, 3, h, w, 4), dtype=np.float32))
    block_hw, tb_hw = A.block_plan_for(geom, h, w, (h, w))
    plan = A.bwd_block_plan_for(geom, h, w, (h, w), block_hw=(10, 13))

    def loss_auto(a):
        return jnp.sum(R.sample_dense(a, coords) * ct)

    def loss_adj(a):
        return jnp.sum(A.sample_dense_blockadj(
            a, coords.x, coords.y, M, block_hw, tb_hw, plan) * ct)

    assert np.isclose(float(loss_auto(atlas)), float(loss_adj(atlas)),
                      rtol=1e-5)
    g_auto = np.asarray(jax.grad(loss_auto)(atlas))
    g_adj = np.asarray(jax.grad(loss_adj)(atlas))
    err = np.abs(g_auto - g_adj).max()
    assert err < 1e-4, err


def test_bwd_block_plan_grad_oblique_partial_coverage():
    """Off-plane samples must not poison the backward block bboxes."""
    geom, atlas, ext, intrin, rng, (h, w) = _setup(seed=13)
    ext = np.asarray(ext).copy()
    ext[0, :3, 3] = [1.5, 0.9, 0.2]
    ext = jnp.asarray(ext)
    coords = R.warp_coordinates(geom, ext, intrin, h, w)
    M = A.forward_projection(geom.depths_np(), geom.ref_intrin_mpi_np(),
                             ext, intrin)
    ct = jnp.asarray(rng.random((1, 3, h, w, 4), dtype=np.float32))
    block_hw, tb_hw = A.block_plan_for(geom, h, w, (h, w))
    plan = A.bwd_block_plan_for(geom, h, w, (h, w), block_hw=(20, 26))

    def loss_auto(a):
        return jnp.sum(R.sample_dense(a, coords) * ct)

    def loss_adj(a):
        return jnp.sum(A.sample_dense_blockadj(
            a, coords.x, coords.y, M, block_hw, tb_hw, plan) * ct)

    g_auto = np.asarray(jax.grad(loss_auto)(atlas))
    g_adj = np.asarray(jax.grad(loss_adj)(atlas))
    err = np.abs(g_auto - g_adj).max()
    assert err < 1e-4, err


def test_tile_adjoint_matches_autodiff():
    """Per-tile packed adjoint == autodiff for both the static (4-D) and
    the tile-major dynamic (5-D) samplers, with partial culling and an
    oblique view."""
    from videoloop3d_tpu.render.sample import (bilinear_tiles,
                                               bilinear_tiles_tilemajor)
    geom, _, ext, intrin, rng, (h, w) = _setup()
    coords = R.warp_coordinates(geom, ext, intrin, h, w)

    tile_map = np.full((geom.n_planes, geom.n_tiles_h, geom.n_tiles_w),
                       -1, np.int32)
    keep = rng.random(tile_map.shape) < 0.7
    tile_map[keep] = np.arange(keep.sum(), dtype=np.int32)
    n = int(keep.sum())
    th, tw = geom.default_tile_texels()

    k, fu, fv = R.tile_lookup(geom, jnp.asarray(tile_map), coords)
    u = (fu * (tw - 1))[0]
    v = (fv * (th - 1))[0]
    k0 = k[0]
    M = A.forward_projection(geom.depths_np(), geom.ref_intrin_mpi_np(),
                             ext, intrin)[0]
    samp = A.make_tile_adjoint(A.tile_positions(tile_map), geom.tile_span,
                               A.tile_window_for(geom, (h, w)))

    for frames in (None, 3):
        shape = (n, th, tw, 4) if frames is None else (n, th, tw, frames, 4)
        tiles = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        ct = jnp.asarray(
            rng.standard_normal(k0.shape + shape[3:]).astype(np.float32))

        def loss_auto(t):
            if frames is None:
                vals, _ = bilinear_tiles(t, k0, u, v)
            else:
                vals, _ = bilinear_tiles_tilemajor(t, k0, u, v)
            return jnp.sum(vals * ct)

        def loss_adj(t):
            vals, _ = samp(t, k0, u, v, M)
            return jnp.sum(vals * ct)

        assert np.isclose(float(loss_auto(tiles)), float(loss_adj(tiles)),
                          rtol=1e-5)
        g_auto = np.asarray(jax.grad(loss_auto)(tiles))
        g_adj = np.asarray(jax.grad(loss_adj)(tiles))
        err = np.abs(g_auto - g_adj).max()
        rel = err / (np.abs(g_auto).max() + 1e-12)
        assert rel < 1e-5, (frames, rel)


def test_tile_adjoint_active_compaction_exact():
    """active_t tile-compaction: the adjoint restricted to the
    patch-active tile bound must reproduce the full per-tile gradient
    exactly (inactive tiles contribute nothing), for both the 4-D and
    tile-major samplers, on a small patch that sees only part of the
    scene."""
    from videoloop3d_tpu.core import cameras
    geom, _, ext, intrin, rng, (h, w) = _setup()
    # a quarter patch at an interior origin: most tiles inactive
    ph, pw = 10, 12
    h0, w0 = 6, 8
    pintr = cameras.shift_intrinsic(np.asarray(intrin[0]), h0, w0)[None]
    coords = R.warp_coordinates(geom, ext, jnp.asarray(pintr), ph, pw)

    tile_map = np.full((geom.n_planes, geom.n_tiles_h, geom.n_tiles_w),
                       -1, np.int32)
    keep = rng.random(tile_map.shape) < 0.8
    tile_map[keep] = np.arange(keep.sum(), dtype=np.int32)
    n = int(keep.sum())
    th, tw = geom.default_tile_texels()

    k, fu, fv = R.tile_lookup(geom, jnp.asarray(tile_map), coords)
    u = (fu * (tw - 1))[0]
    v = (fv * (th - 1))[0]
    k0 = k[0]
    M = A.forward_projection(geom.depths_np(), geom.ref_intrin_mpi_np(),
                             ext, jnp.asarray(pintr))[0]
    T = A.active_tile_bound(geom, tile_map, np.asarray(ext),
                            np.asarray(intrin), ph, pw,
                            [(w0, h0)], margin=1)
    assert 0 < T <= n
    win = A.tile_window_for(geom, (ph, pw))
    pos = A.tile_positions(tile_map)
    samp_full = A.make_tile_adjoint(pos, geom.tile_span, win)
    samp_act = A.make_tile_adjoint(pos, geom.tile_span, win, active_t=T)

    for frames in (None, 3):
        shape = (n, th, tw, 4) if frames is None \
            else (n, th, tw, frames, 4)
        tiles = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        ct = jnp.asarray(
            rng.standard_normal(k0.shape + shape[3:]).astype(np.float32))

        def loss(sampler, t):
            vals, _ = sampler(t, k0, u, v, M)
            return jnp.sum(vals * ct)

        g_full = np.asarray(jax.grad(lambda t: loss(samp_full, t))(tiles))
        g_act = np.asarray(jax.grad(lambda t: loss(samp_act, t))(tiles))
        assert np.array_equal(g_full, g_act), (
            frames, np.abs(g_full - g_act).max())


def test_fast_stage2_grad_render_equivalence():
    """MPMeshVid render gradients with --fast_stage2_grad on == off."""
    from videoloop3d_tpu.config import parse_args_with_configs
    from videoloop3d_tpu.models.mpv import MPMeshVid

    rng = np.random.default_rng(3)
    h, w = 24, 32
    intrin = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]],
                      np.float32)

    def build(fast):
        argv = ["--datadir", "x", "--expname", "x",
                "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
                "--mpi_h_verts", "4", "--mpi_w_verts", "5",
                "--mpi_d", "3", "--mpv_frm_num", "5", "--mpv_isloop"]
        if fast:
            argv.append("--fast_stage2_grad")
        args = parse_args_with_configs(argv)
        model = MPMeshVid(args, h, w, np.eye(4, dtype=np.float32),
                          intrin, 1.5, 6.0)
        g = model.geom
        tm_s = np.arange(g.n_planes * g.n_tiles_h * g.n_tiles_w,
                         dtype=np.int32).reshape(g.n_planes, g.n_tiles_h,
                                                 g.n_tiles_w)
        tm_d = np.full_like(tm_s, -1)
        keep = np.random.default_rng(5).random(tm_d.shape) < 0.6
        tm_d[keep] = np.arange(keep.sum(), dtype=np.int32)
        model.is_sparse = True
        model.tile_map_static = tm_s
        model.tile_map_dyn = tm_d
        model.tile_hw = g.default_tile_texels()
        model.base_tile_hw = model.tile_hw
        return model, tm_s.size, int(keep.sum())

    model_a, ns, nd = build(False)
    model_b, _, _ = build(True)
    th, tw = model_a.tile_hw
    params = {
        "atlas": jnp.asarray(
            rng.standard_normal((ns, th, tw, 4)).astype(np.float32)),
        "atlas_dyn": jnp.asarray(
            rng.standard_normal((nd, th, tw, 5, 4)).astype(np.float32)),
    }
    ext = np.eye(4, dtype=np.float32)
    ext[:3, 3] = [0.1, -0.05, 0.02]
    ext = jnp.asarray(ext)[None]
    intr = jnp.asarray(intrin)[None]

    def loss(model, p):
        out = model.render(p, h, w, ext, intr, ts=None, training=True)
        rgb = out["rgb"] if isinstance(out, dict) else out[0]
        return jnp.sum(rgb ** 2)

    la = float(loss(model_a, params))
    lb = float(loss(model_b, params))
    assert np.isclose(la, lb, rtol=1e-6)
    ga = jax.grad(lambda p: loss(model_a, p))(params)
    gb = jax.grad(lambda p: loss(model_b, p))(params)
    for key in ("atlas", "atlas_dyn"):
        a, b = np.asarray(ga[key]), np.asarray(gb[key])
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert rel < 2e-5, (key, rel)


def test_fast_stage1_sparse_grad_render_equivalence():
    """MPMesh SPARSE-phase render gradients with --fast_stage1_grad on ==
    off (the post-cull per-tile adjoint path)."""
    from videoloop3d_tpu.config import parse_args_with_configs
    from videoloop3d_tpu.models.mpmesh import MPMesh

    rng = np.random.default_rng(6)
    h, w = 24, 32
    intrin = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]],
                      np.float32)

    def build(fast):
        argv = ["--datadir", "x", "--expname", "x",
                "--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
                "--mpi_h_verts", "4", "--mpi_w_verts", "5",
                "--mpi_d", "3"]
        if fast:
            argv.append("--fast_stage1_grad")
        args = parse_args_with_configs(argv)
        model = MPMesh(args, h, w, np.eye(4, dtype=np.float32),
                       intrin, 1.5, 6.0)
        g = model.geom
        tm_s = np.full((g.n_planes, g.n_tiles_h, g.n_tiles_w), -1,
                       np.int32)
        tm_d = np.full_like(tm_s, -1)
        r = np.random.default_rng(8).random(tm_s.shape)
        tm_s[r < 0.5] = np.arange((r < 0.5).sum(), dtype=np.int32)
        tm_d[r >= 0.7] = np.arange((r >= 0.7).sum(), dtype=np.int32)
        model.is_sparse = True
        model.has_dyn = True
        model.tile_map_static = tm_s
        model.tile_map_dyn = tm_d
        model.tile_hw = g.default_tile_texels()
        return model, int((r < 0.5).sum()), int((r >= 0.7).sum())

    model_a, ns, nd = build(False)
    model_b, _, _ = build(True)
    th, tw = model_a.tile_hw
    params = {
        "atlas": jnp.asarray(
            rng.standard_normal((ns, th, tw, 4)).astype(np.float32)),
        "atlas_dyn": jnp.asarray(
            rng.standard_normal((nd, th, tw, 4)).astype(np.float32)),
    }
    ext = np.eye(4, dtype=np.float32)
    ext[:3, 3] = [0.1, -0.05, 0.02]
    ext = jnp.asarray(ext)[None]
    intr = jnp.asarray(intrin)[None]

    def loss(model, p):
        rgbl, _ = model.render(p, h, w, ext, intr, training=True)
        return jnp.sum(rgbl ** 2)

    la = float(loss(model_a, params))
    lb = float(loss(model_b, params))
    assert np.isclose(la, lb, rtol=1e-6)
    ga = jax.grad(lambda p: loss(model_a, p))(params)
    gb = jax.grad(lambda p: loss(model_b, p))(params)
    for key in ("atlas", "atlas_dyn"):
        a, b = np.asarray(ga[key]), np.asarray(gb[key])
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert rel < 2e-5, (key, rel)

    # --compact_tiles wiring on MPMesh: a forced patch-active bound
    # must leave the adjoint gradients bit-identical
    from videoloop3d_tpu.render.adjoint import active_tile_bound
    model_c, _, _ = build(True)
    model_c.active_tiles = tuple(
        active_tile_bound(model_c.geom, tm, np.asarray(ext),
                          np.asarray(intr), h, w, [(0, 0)], margin=1)
        for tm in (model_c.tile_map_static, model_c.tile_map_dyn))
    lc = float(loss(model_c, params))
    assert np.isclose(lc, lb, rtol=1e-7)
    gc = jax.grad(lambda p: loss(model_c, p))(params)
    for key in ("atlas", "atlas_dyn"):
        assert np.array_equal(np.asarray(gb[key]), np.asarray(gc[key])), \
            key

    # --blocked_lookup wiring on MPMesh: identical k/u/v -> bit-identical
    from videoloop3d_tpu.render.renderer import lookup_span_bound
    model_d, _, _ = build(True)
    model_d.active_tiles = model_c.active_tiles
    model_d.lookup_spans = lookup_span_bound(
        model_d.geom, np.asarray(ext), np.asarray(intr), h, w, [(0, 0)])
    ld = float(loss(model_d, params))
    assert ld == lc
    gd = jax.grad(lambda p: loss(model_d, p))(params)
    for key in ("atlas", "atlas_dyn"):
        assert np.array_equal(np.asarray(gc[key]), np.asarray(gd[key])), \
            key


def test_blockadj_prec_and_fwd_block_plumbing():
    """--s1_gemm_bf16 / --s1_fwd_block plumbing: prec="default" and a
    non-default forward block plan produce the same values/grads on CPU
    (where DEFAULT precision is still f32 — this pins the wiring, the
    bf16 effect itself is a TPU-only quality question benched on-chip)."""
    geom, atlas, ext, intrin, rng, (h, w) = _setup(seed=11)
    coords = R.warp_coordinates(geom, ext, intrin, h, w)
    M = A.forward_projection(geom.depths_np(), geom.ref_intrin_mpi_np(),
                             ext, intrin)
    ct = jnp.asarray(rng.random((1, 3, h, w, 4), dtype=np.float32))
    base_hw, base_tb = A.block_plan_for(geom, h, w, (h, w))
    big_hw, big_tb = A.block_plan_for(geom, h, w, (h, w),
                                      block_hw=(h, w))

    def loss(a, bhw, tbw, prec):
        return jnp.sum(A.sample_dense_blockadj(
            a, coords.x, coords.y, M, bhw, tbw, None, prec) * ct)

    ref_v = float(loss(atlas, base_hw, base_tb, "highest"))
    ref_g = np.asarray(jax.grad(loss)(atlas, base_hw, base_tb, "highest"))
    for bhw, tbw in ((base_hw, base_tb), (big_hw, big_tb)):
        v = float(loss(atlas, bhw, tbw, "default"))
        g = np.asarray(jax.grad(loss)(atlas, bhw, tbw, "default"))
        assert np.isclose(ref_v, v, rtol=1e-5)
        assert np.abs(ref_g - g).max() < 1e-4


def test_model_level_s1_fast_gemm_flags():
    """MPMesh with --s1_gemm_bf16 --s1_fwd_block renders identically on
    CPU and its config plumbs to the adjoint call."""
    from videoloop3d_tpu.config import parse_args_with_configs
    from videoloop3d_tpu.models.mpmesh import MPMesh

    H, W = 48, 64
    base = ["--mpi_h_scale", "1.2", "--mpi_w_scale", "1.2",
            "--mpi_h_verts", "5", "--mpi_w_verts", "7",
            "--mpi_d", "4", "--atlas_grid_h", "2",
            "--fast_stage1_grad", "--scale_invariant"]
    fast = base + ["--s1_gemm_bf16", "--s1_fwd_block", "24x32"]
    ref_intrin = np.array([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2],
                           [0, 0, 1]], np.float32)
    ext = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    intr = jnp.asarray(ref_intrin[None])
    outs = []
    for argv in (base, fast):
        args = parse_args_with_configs(argv)
        model = MPMesh(args, H, W, np.eye(4, dtype=np.float32),
                       ref_intrin, 2.0, 10.0)
        params = model.init_params(1)
        rgbl, _ = model.render(params, H, W, ext, intr, training=True)
        outs.append(np.asarray(rgbl))
    assert np.abs(outs[0] - outs[1]).max() < 1e-5
