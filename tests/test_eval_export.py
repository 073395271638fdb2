import json
import os

import numpy as np

from videoloop3d_tpu.eval import metrics as M
from videoloop3d_tpu.eval import nnmse as NN


def test_psnr_matches_closed_form():
    rng = np.random.default_rng(0)
    a = rng.random((1, 16, 20, 3)).astype(np.float32)
    b = np.clip(a + 0.1, 0, 1)
    v = M.compute_img_metric(a, b, "psnr")
    # mse on [-1,1] scale is 4x [0,1]-scale -> psnr identical to [0,1]
    mse = np.mean((a - b) ** 2)
    assert np.isclose(v, 10 * np.log10(1.0 / mse), atol=0.05)


def test_masked_psnr_correction():
    rng = np.random.default_rng(1)
    a = rng.random((1, 16, 20, 3)).astype(np.float32)
    b = a.copy()
    # corrupt only the masked-OUT half -> masked psnr should be huge
    b[:, :, :10] += 0.5
    mask = np.zeros((1, 16, 20), np.float32)
    mask[:, :, 10:] = 1
    v = M.compute_img_metric(a, b, "psnr", mask)
    assert v > 60


def test_ssim_identity_and_range():
    rng = np.random.default_rng(2)
    a = rng.random((1, 24, 24, 3)).astype(np.float32)
    v_same = M.compute_img_metric(a, a, "ssim")
    assert v_same > 0.99
    b = rng.random((1, 24, 24, 3)).astype(np.float32)
    v_diff = M.compute_img_metric(a, b, "ssim")
    assert v_diff < v_same


def test_ssim_matches_skimage_formula_on_constant_shift():
    a = np.zeros((1, 16, 16, 3), np.float32) + 0.5
    b = a + 0.1
    v = M.compute_img_metric(a, b, "ssim", range01=True)
    # constant images: structure term 1, luminance term analytic
    ux, uy = 0.0, 0.2         # after *2-1 mapping
    C1 = (0.01 * 2) ** 2
    want = (2 * ux * uy + C1) / (ux ** 2 + uy ** 2 + C1)
    assert np.isclose(v, want, atol=1e-4)


def test_dynamics_error():
    rng = np.random.default_rng(3)
    static = np.repeat(rng.random((1, 8, 8, 3)) * 255, 6, axis=0)
    moving = static + rng.normal(0, 20, (6, 8, 8, 3))
    assert M.dynamics_error(static, static) == 0
    assert M.dynamics_error(static, moving) > 1


def test_nnmse_zero_for_identical_and_positive_otherwise():
    rng = np.random.default_rng(4)
    v = rng.random((3, 6, 24, 24)).astype(np.float32)
    w = rng.random((3, 6, 24, 24)).astype(np.float32)
    assert NN.compute_nnerr(v, v, 3, 2, 3, 1, macro_block=17) < 1e-6
    assert NN.compute_nnerr(v, w, 3, 2, 3, 1, macro_block=17) > 0.01


def test_nnmse_temporal_decomposition_matches_direct():
    """The banded-sum temporal decomposition (and the shared-distance
    pair variant) must reproduce the direct temporal-patch NN error."""
    import jax
    import jax.numpy as jnp
    from videoloop3d_tpu.losses import patch_nn as P

    def direct_nnerr(src, tar, p, s, pt, st, macro_block):
        """The pre-decomposition formulation, inlined as the oracle."""
        psz, strides = (pt, p, p), (st, s, s)

        def block_err(s_crop, t_crop):
            Xp = P.extract_patches_flat(s_crop, psz, strides)
            Yp = P.extract_patches_flat(t_crop, psz, strides)
            ntx, nh, nw, dim = Xp.shape
            nty = Yp.shape[0]
            Xf = Xp.reshape(ntx, nh * nw, dim).transpose(1, 0, 2)
            Yf = Yp.reshape(nty, nh * nw, dim).transpose(1, 0, 2)
            nns = P.nn_indices(Xf, Yf, None)
            sel = jnp.take_along_axis(Yf, nns[..., None], axis=1)
            return jnp.mean(jnp.abs(sel - Xf))

        fn = jax.jit(jax.vmap(block_err))
        # reuse _nnerr_impl's cropping by monkeypatching the block fn
        orig = NN._block_err_fn
        NN._block_err_fn = lambda *a, **k: fn
        try:
            return NN.compute_nnerr(src, tar, p, s, pt, st, macro_block)
        finally:
            NN._block_err_fn = orig

    rng = np.random.default_rng(7)
    F, H, W = 10, 28, 32
    base = rng.random((3, 1, H, W), dtype=np.float32)
    src = (base + 0.1 * rng.random((3, F, H, W))).astype(np.float32)
    tar = (np.roll(src, 2, axis=1)
           + 0.02 * rng.random((3, F, H, W))).astype(np.float32)
    for p, s, pt, st in ((5, 2, 4, 1), (3, 2, 3, 2)):
        want = direct_nnerr(src, tar, p, s, pt, st, 17)
        got = NN.compute_nnerr(src, tar, p, s, pt, st, 17)
        assert abs(got - want) / (abs(want) + 1e-12) < 1e-4, \
            (p, s, pt, st, want, got)
        f2, b2 = NN.compute_nnerr_pair(src, tar, p, s, pt, st, 17)
        assert abs(f2 - got) < 1e-7
        want_b = NN.compute_nnerr(tar, src, p, s, pt, st, 17)
        assert abs(b2 - want_b) / (abs(want_b) + 1e-12) < 1e-6, \
            (b2, want_b)


def test_loop_quality_perfect_loop():
    """A perfectly looping prediction whose seam window exists in gt
    scores ~0."""
    rng = np.random.default_rng(5)
    base = rng.random((3, 8, 16, 16)).astype(np.float32)
    pred = base
    gt = np.concatenate([base, base[:, :4]], axis=1)   # gt contains wrap
    q = NN.loop_quality(pred, gt, 3, 2, 3, 1, macro_block=17)
    assert q < 1e-5, q


def test_export_roundtrip(tmp_path):
    from videoloop3d_tpu.export import mesh_export as EX
    from videoloop3d_tpu.export.objio import load_obj
    from videoloop3d_tpu.models.geometry import MPIGeometry

    km = np.array([[20.0, 0, 16], [0, 20, 12], [0, 0, 1]])
    geom = MPIGeometry(
        n_planes=2, mpi_h=25, mpi_w=31, n_tiles_h=2, n_tiles_w=3,
        near=1.5, far=6.0, depths=(5.0, 2.0),
        ref_intrin_mpi=tuple(tuple(float(v) for v in r) for r in km),
        ref_extrin=tuple(tuple(float(v) for v in r) for r in np.eye(4)))
    rng = np.random.default_rng(0)
    n_tiles = 2 * 2 * 3
    flat = np.arange(n_tiles)
    tm_s = np.where(flat % 2 == 0, -1, flat)
    tm_d = np.where(flat % 2 == 0, flat, -1)
    pack_s = np.full(n_tiles, -1, np.int32)
    pack_s[tm_s >= 0] = np.arange((tm_s >= 0).sum())
    pack_d = np.full(n_tiles, -1, np.int32)
    pack_d[tm_d >= 0] = np.arange((tm_d >= 0).sum())
    th, tw = 5, 6
    F = 3
    params = {
        "atlas": rng.random(((tm_s >= 0).sum(), th, tw, 4),
                            dtype=np.float32),
        "atlas_dyn": rng.random(((tm_d >= 0).sum(), th, tw, F, 4),
                                dtype=np.float32),
    }
    meta = {"fov": 60.0, "near": 1.5, "far": 6.0, "up": [0, -1, 0],
            "lookat": [0, 0, 3.0], "limit": [1, 1, 1]}
    outdir = EX.export_mtv(str(tmp_path / "mesh"), geom, params,
                           pack_s.reshape(2, 2, 3), pack_d.reshape(2, 2, 3),
                           meta)
    assert os.path.exists(os.path.join(outdir, "geometry.obj"))
    assert os.path.exists(os.path.join(outdir, "static.png"))
    for i in range(F):
        assert os.path.exists(os.path.join(outdir, "dynamic",
                                           f"{i:04d}.png"))
    j = json.load(open(os.path.join(outdir, "meta.json")))
    assert j["frame_count"] == F and j["fov"] == 60.0

    verts, uvs, faces, uvfaces = load_obj(
        os.path.join(outdir, "geometry.obj"))
    n_kept = (tm_s >= 0).sum() + (tm_d >= 0).sum()
    assert len(faces) == 2 * n_kept
    # painter's order: face depth non-increasing
    depth = verts[faces[:, 0]][:, 2]
    assert np.all(np.diff(depth) <= 1e-6)
    # vertex colors present (x y z r g b)
    assert verts.shape[1] == 6


def test_save_mesh_preview(tmp_path):
    from videoloop3d_tpu.export.mesh_export import (save_mesh_preview,
                                                    full_tile_map)
    from videoloop3d_tpu.export.objio import load_obj
    from videoloop3d_tpu.models.geometry import MPIGeometry
    km = np.array([[20.0, 0, 16], [0, 20, 12], [0, 0, 1]])
    geom = MPIGeometry(
        n_planes=2, mpi_h=25, mpi_w=31, n_tiles_h=2, n_tiles_w=3,
        near=1.5, far=6.0, depths=(5.0, 2.0),
        ref_intrin_mpi=tuple(tuple(float(v) for v in r) for r in km),
        ref_extrin=tuple(tuple(float(v) for v in r) for r in np.eye(4)))
    save_mesh_preview(geom, full_tile_map(geom), None,
                      str(tmp_path / "mesh"))
    verts, uvs, faces, uvfaces = load_obj(str(tmp_path / "mesh.obj"))
    assert len(faces) == 2 * 2 * 2 * 3      # 2 tris x D x nth x ntw


def test_export_viewer_roundtrip_render(tmp_path):
    """The exported artifacts (geometry.obj + static.png +
    dynamic/%04d.png), re-rendered by an INDEPENDENT GL-style viewer
    simulator — C++ rasterizer, perspective-correct varying
    interpolation, standard normalized texel-center sampling, painter's
    alpha blending — must reproduce the model's own render to 8-bit
    quantization accuracy.  This is what the external VideoLoopUI WebGL
    player computes from these files (ref script_export_mesh.py:76-191),
    so it pins the vertex/UV/atlas-packing conventions end-to-end.

    The view is the MPI reference camera at the virtual-texel grid
    resolution, where every plane maps texels 1:1 to pixels — so the
    raw-vs-activated interpolation-order difference (present in the
    reference's viewer too) vanishes and the comparison isolates the
    export layout.  Pixels on inter-tile edges are excluded (the test
    rasterizer's inclusive edge rule double-draws them; GL fill rules
    don't)."""
    import imageio.v2 as iio
    import jax.numpy as jnp
    from videoloop3d_tpu.config import parse_args_with_configs
    from videoloop3d_tpu.export import mesh_export as EX
    from videoloop3d_tpu.export.objio import load_obj
    from videoloop3d_tpu.models.mpv import MPMeshVid
    from videoloop3d_tpu.render import raster_cpp

    H, W, D, F = 25, 31, 4, 3          # integer tile spans (12, 10)
    intrin = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]],
                      np.float32)
    args = parse_args_with_configs(
        ["--mpi_h_scale", "1.0", "--mpi_w_scale", "1.0",
         "--mpi_h_verts", "3", "--mpi_w_verts", "4",
         "--mpi_d", str(D), "--mpv_frm_num", str(F), "--mpv_isloop"])
    model = MPMeshVid(args, H, W, np.eye(4, dtype=np.float32), intrin,
                      1.5, 6.0)
    g = model.geom
    rng = np.random.default_rng(3)
    r = rng.random((g.n_planes, g.n_tiles_h, g.n_tiles_w))
    tm_s = np.full(r.shape, -1, np.int32)
    tm_d = np.full(r.shape, -1, np.int32)
    tm_s[r < 0.5] = np.arange((r < 0.5).sum(), dtype=np.int32)
    tm_d[r > 0.7] = np.arange((r > 0.7).sum(), dtype=np.int32)
    model.is_sparse = True
    model.tile_map_static = tm_s
    model.tile_map_dyn = tm_d
    model.tile_hw = g.default_tile_texels()
    model.base_tile_hw = model.tile_hw
    th, tw = model.tile_hw
    ns, nd = int((tm_s >= 0).sum()), int((tm_d >= 0).sum())
    params = {
        "atlas": jnp.asarray(rng.standard_normal((ns, th, tw, 4)),
                             jnp.float32),
        "atlas_dyn": jnp.asarray(
            rng.standard_normal((nd, th, tw, F, 4)), jnp.float32),
    }

    ext = jnp.eye(4, dtype=jnp.float32)[None]
    kin = jnp.asarray(g.ref_intrin_mpi_np())[None]
    out, _ = model.render(params, g.mpi_h, g.mpi_w, ext, kin, ts=[0, 2])
    out = np.asarray(out)

    outdir = EX.export_mtv(
        str(tmp_path / "mesh"), g,
        {k: np.asarray(v) for k, v in params.items()}, tm_s, tm_d,
        {"fov": 60.0, "near": 1.5, "far": 6.0, "up": [0, -1, 0],
         "lookat": [0, 0, 3.0], "limit": [1, 1, 1]})

    verts6, uvs, faces, uvfaces = load_obj(
        os.path.join(outdir, "geometry.obj"))
    pos, col = verts6[:, :3], verts6[:, 3:]
    static_img = iio.imread(os.path.join(outdir, "static.png")) \
        .astype(np.float64) / 255.0

    def sample(img, uv):
        hh, ww = img.shape[:2]
        x = np.clip(uv[..., 0] * ww - 0.5, 0, ww - 1)
        y = np.clip((1.0 - uv[..., 1]) * hh - 0.5, 0, hh - 1)
        x0 = np.floor(x).astype(int)
        y0 = np.floor(y).astype(int)
        x1 = np.minimum(x0 + 1, ww - 1)
        y1 = np.minimum(y0 + 1, hh - 1)
        fx, fy = (x - x0)[..., None], (y - y0)[..., None]
        return (img[y0, x0] * (1 - fx) * (1 - fy)
                + img[y0, x1] * fx * (1 - fy)
                + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)

    def viewer_render(t):
        dyn_img = iio.imread(os.path.join(
            outdir, "dynamic", f"{t:04d}.png")).astype(np.float64) / 255.0
        sv = raster_cpp.project_vertices(pos, np.eye(4),
                                         g.ref_intrin_mpi_np())
        K = g.n_planes + 4
        p2f, zb, bary = raster_cpp.rasterize(
            sv, faces.astype(np.int32), g.mpi_h, g.mpi_w, K)
        # the test rasterizer's inclusive edge rule yields BOTH
        # triangles of a quad on the shared diagonal; drop same-depth
        # duplicates (uv there is identical)
        dup = (p2f[..., 1:] >= 0) & (zb[..., 1:] == zb[..., :-1])
        p2f[..., 1:][dup] = -1
        canvas = np.zeros((g.mpi_h, g.mpi_w, 3))
        is_dyn_face = col[faces[:, 0], 1] > 0.5
        for k in range(K - 1, -1, -1):            # far -> near
            f = p2f[..., k]
            valid = f >= 0
            fc = np.maximum(f, 0)
            uv = (uvs[uvfaces[fc]] * bary[..., k, :, None]).sum(-2)
            rgba = np.where(is_dyn_face[fc][..., None],
                            sample(dyn_img, uv), sample(static_img, uv))
            a = rgba[..., 3:] * valid[..., None]
            canvas = rgba[..., :3] * a + canvas * (1 - a)
        return canvas

    sy, sx = g.tile_span
    mask = np.ones((g.mpi_h, g.mpi_w), bool)
    mask[::int(sy), :] = False
    mask[:, ::int(sx)] = False
    assert mask.sum() > 500
    for i, t in enumerate((0, 2)):
        diff = np.abs(viewer_render(t) - out[i])[mask]
        assert diff.max() < 0.012, diff.max()     # 8-bit quantization
        assert diff.mean() < 0.005, diff.mean()


def test_evaluate_pred_dir_scores_external_renders(tmp_path):
    """--pred_dir path: externally rendered loops are scored by the same
    metric code as checkpoint renders (head-to-head harness input)."""
    from videoloop3d_tpu.config import parse_args_with_configs
    from videoloop3d_tpu.data import synthetic
    from videoloop3d_tpu.eval.evaluate import evaluate

    scene = synthetic.make_scene(n_views=2, h=24, w=32, n_frames=6,
                                 seed=0)
    scene_dir = str(tmp_path / "scene")
    synthetic.write_llff_dir(scene, scene_dir, factor=1)

    from videoloop3d_tpu.data import llff
    videos, _, _ = llff.load_mv_videos(basedir=scene_dir, factor=1,
                                       bd_factor=(1.0, 1.0),
                                       recenter=True)
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    rng = np.random.default_rng(1)
    for v in range(2):
        gt = np.asarray(videos[v]).astype(np.int32)
        noisy = np.clip(gt + rng.integers(-3, 4, gt.shape), 0, 255)
        np.save(pred_dir / f"view{v:02d}.npy", noisy.astype(np.uint8))

    args = parse_args_with_configs([
        "--datadir", scene_dir, "--expdir", str(tmp_path / "mpv"),
        "--expname", "x", "--factor", "1", "--seed", "1",
        "--mpv_frm_num", "6",
    ])
    table = evaluate(args, compute_flags={"lpips": False,
                                          "nnmse": False,
                                          "loopq": False},
                     pred_dir=str(pred_dir))
    out = pred_dir / "eval_metrics.txt"
    assert out.exists()
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 2 + 2  # header + 2 views + aggregate
    # near-identical preds: tiny dynamics error (masked PSNR may be
    # -inf on a fully-loopable synthetic scene - empty static mask)
    dyn_col = lines[0].split(", ").index("dyn")
    for row in lines[1:3]:
        # dyn is std-map MSE on the 0-255 scale; +-3 noise -> O(1)
        assert float(row.split(", ")[dyn_col]) < 5.0
