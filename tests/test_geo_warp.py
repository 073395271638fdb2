"""Differentiable vertex-grid warp (optimize_geo): flat parity with the
plane sweep, and vertex recovery on a mis-registered scene."""
import numpy as np
import jax
import jax.numpy as jnp

from videoloop3d_tpu.config import parse_args_with_configs
from videoloop3d_tpu.models.mpmesh import MPMesh
from videoloop3d_tpu.render import geo_warp as GW
from videoloop3d_tpu.render import renderer as R


def _model(h=36, w=48, normalize=False, loop_mask=False):
    argv = ["--mpi_h_scale", "1.3", "--mpi_w_scale", "1.3",
            "--mpi_h_verts", "5", "--mpi_w_verts", "7",
            "--mpi_d", "3", "--atlas_grid_h", "1",
            "--rgb_smooth_loss_weight", "0"]
    if normalize:
        argv.append("--normalize_verts")
    if loop_mask:
        argv.append("--learn_loop_mask")
    args = parse_args_with_configs(argv)
    ref_extrin = np.eye(4, dtype=np.float32)
    focal = 0.8 * w
    ref_intrin = np.array([[focal, 0, w / 2], [0, focal, h / 2],
                           [0, 0, 1]], np.float32)
    model = MPMesh(args, h, w, ref_extrin, ref_intrin, 1.5, 6.0)
    return model, model.init_params(0)


def _views(h, w, ref_intrin):
    exts = []
    for off in (0.0, 0.12, -0.1):
        e = np.eye(4, dtype=np.float32)
        e[0, 3] = off
        e[1, 3] = off * 0.4
        exts.append(e)
    ext = jnp.asarray(np.stack(exts))
    intr = jnp.asarray(np.repeat(ref_intrin[None], 3, axis=0))
    return ext, intr


def test_flat_verts_match_plane_sweep():
    """Unperturbed verts must reproduce the closed-form sweep coords and
    the rendered image (the capability is a strict superset)."""
    model, params = _model()
    h, w = model.H, model.W
    ext, intr = _views(h, w, np.asarray([[0.8 * w, 0, w / 2],
                                         [0, 0.8 * w, h / 2],
                                         [0, 0, 1]], np.float32))
    flat = R.warp_coordinates(model.geom, ext, intr, h, w)
    gw = GW.warp_coordinates_verts(model.geom, params["verts"], ext, intr,
                                   h, w)
    m = np.asarray(flat.valid & gw.valid)
    assert m.mean() > 0.5
    assert np.abs(np.asarray(gw.x - flat.x))[m].max() < 1e-2
    assert np.abs(np.asarray(gw.y - flat.y))[m].max() < 1e-2
    # validity may differ only on the 1-texel rim where barycentric edge
    # tolerance meets the rect clamp
    disagree = np.asarray(flat.valid ^ gw.valid)
    assert disagree.mean() < 0.05

    # rendered images match
    rgb_flat, _ = model.forward(params, h, w, ext, intr, training=False)
    model.optimize_geometry = True
    rgb_gw, _ = model.forward(params, h, w, ext, intr, training=False)
    diff = np.abs(np.asarray(rgb_flat) - np.asarray(rgb_gw))
    assert diff.max() < 2e-2, diff.max()
    assert diff.mean() < 1e-3, diff.mean()


def test_normalized_verts_roundtrip():
    model, params = _model(normalize=True)
    g = model.geom
    dn = np.asarray(GW.denormalize_verts(g, params["verts"], True))
    assert np.allclose(dn, g.vertex_grid(), atol=1e-4)


def test_vertex_recovery_on_misregistered_scene():
    """GT rendered through PERTURBED verts; training only the verts from
    the flat init must drive the loss down and the verts toward truth."""
    model, params = _model()
    h, w = model.H, model.W
    ext, intr = _views(h, w, np.asarray([[0.8 * w, 0, w / 2],
                                         [0, 0.8 * w, h / 2],
                                         [0, 0, 1]], np.float32))
    model.optimize_geometry = True
    # contentful SMOOTH atlas: the default alpha init (-3) renders nearly
    # transparent, and texel-scale noise would shrink the warp's
    # attraction basin below the perturbation size
    g0 = model.geom
    ty, tx = np.meshgrid(np.arange(g0.mpi_h), np.arange(g0.mpi_w),
                         indexing="ij")
    a = np.zeros((g0.n_planes, g0.mpi_h, g0.mpi_w, 4), np.float32)
    for d in range(g0.n_planes):
        a[d, ..., 0] = np.sin(2 * np.pi * tx / (14 + 3 * d))
        a[d, ..., 1] = np.sin(2 * np.pi * ty / (11 + 2 * d))
        a[d, ..., 2] = np.sin(2 * np.pi * (tx + ty) / 17)
    a[..., -1] = 2.0
    params["atlas"] = jnp.asarray(a)

    g = model.geom
    rng = np.random.default_rng(3)
    true_verts = np.asarray(g.vertex_grid()).copy()
    span = min((g.mpi_h - 1) / g.n_tiles_h, (g.mpi_w - 1) / g.n_tiles_w)
    # in-plane jiggle, a fraction of a quad (the refinement regime)
    depths = g.depths_np()
    scale_px = depths / (0.8 * w)              # world units per texel
    pert = (rng.random(true_verts.reshape(
        g.n_planes, -1, 3)[..., :2].shape) - 0.5) \
        * (0.35 * span) * scale_px[:, None, None]
    tv = true_verts.reshape(g.n_planes, -1, 3).copy()
    tv[..., :2] += pert
    true_verts = tv.reshape(-1, 3)

    gt_params = dict(params)
    gt_params["verts"] = jnp.asarray(true_verts)
    gt, _ = model.forward(gt_params, h, w, ext, intr, training=False)
    gt = jax.lax.stop_gradient(gt)

    def loss_fn(v):
        p = dict(params)
        p["verts"] = v
        rgb, _ = model.forward(p, h, w, ext, intr, training=False)
        return jnp.mean((rgb - gt) ** 2)

    from videoloop3d_tpu.train import optimizer as opt_lib
    v = params["verts"]
    val0 = float(loss_fn(v))
    err0 = float(jnp.abs(v - gt_params["verts"]).mean())
    g_fn = jax.jit(jax.value_and_grad(loss_fn))
    opt_init, opt_update = opt_lib.make_optimizer("adam", eps=1e-8)
    state = opt_init({"verts": v})
    lr = {"verts": jnp.asarray(3e-3)}
    for i in range(80):
        val, grad = g_fn(v)
        upd, state = opt_update({"verts": v}, {"verts": grad}, state, lr)
        v = upd["verts"]
    val1 = float(loss_fn(v))
    err1 = float(jnp.abs(v - gt_params["verts"]).mean())
    assert val1 < 0.5 * val0, (val0, val1)
    assert err1 < err0, (err0, err1)


def _contentful_atlas(g):
    ty, tx = np.meshgrid(np.arange(g.mpi_h), np.arange(g.mpi_w),
                         indexing="ij")
    a = np.zeros((g.n_planes, g.mpi_h, g.mpi_w, 4), np.float32)
    for d in range(g.n_planes):
        a[d, ..., 0] = np.sin(2 * np.pi * tx / (14 + 3 * d))
        a[d, ..., 1] = np.sin(2 * np.pi * ty / (11 + 2 * d))
        a[d, ..., 2] = np.sin(2 * np.pi * (tx + ty) / 17)
    a[..., -1] = 2.0
    return a


def test_sparse_phase_vertex_recovery():
    """optimize_geo in the SPARSE phase: the warped texel coords feed
    the packed-tile lookup; training only the verts on a culled model
    recovers a perturbed-vertex scene (ref MPI.py:452-475 keeps
    rasterizing culled quads)."""
    from videoloop3d_tpu.core.activations import ACTIVATIONS
    from videoloop3d_tpu.models.sparsify import apply_tile_cull

    model, params = _model(loop_mask=True)
    h, w = model.H, model.W
    ext, intr = _views(h, w, np.asarray([[0.8 * w, 0, w / 2],
                                         [0, 0.8 * w, h / 2],
                                         [0, 0, 1]], np.float32))
    g = model.geom
    params["atlas"] = jnp.asarray(_contentful_atlas(g))
    # half the virtual plane dynamic so both packed atlases are nonempty
    mask = np.full((g.n_planes, g.mpi_h, g.mpi_w, 1), -3.0, np.float32)
    mask[:, :, : g.mpi_w // 2] = 3.0
    params["atlas_mask"] = jnp.asarray(mask)

    params, info = apply_tile_cull(
        model, params, ACTIVATIONS[model.cfg.alpha_activate],
        erode_num=0, alpha_thresh=0.01, rm_first_layers=0)
    assert model.is_sparse and model.has_dyn
    assert params["atlas"].shape[0] > 0 and params["atlas_dyn"].shape[0] > 0
    model.optimize_geometry = True

    rng = np.random.default_rng(3)
    true_verts = np.asarray(g.vertex_grid()).copy()
    span = min((g.mpi_h - 1) / g.n_tiles_h, (g.mpi_w - 1) / g.n_tiles_w)
    depths = g.depths_np()
    scale_px = depths / (0.8 * w)
    pert = (rng.random(true_verts.reshape(
        g.n_planes, -1, 3)[..., :2].shape) - 0.5) \
        * (0.35 * span) * scale_px[:, None, None]
    tv = true_verts.reshape(g.n_planes, -1, 3).copy()
    tv[..., :2] += pert
    gt_params = dict(params)
    gt_params["verts"] = jnp.asarray(tv.reshape(-1, 3))
    gt = jax.lax.stop_gradient(
        model.forward(gt_params, h, w, ext, intr, training=False)[0])

    def loss_fn(v):
        p = dict(params)
        p["verts"] = v
        rgb, _ = model.forward(p, h, w, ext, intr, training=False)
        return jnp.mean((rgb - gt) ** 2)

    from videoloop3d_tpu.train import optimizer as opt_lib
    v = params["verts"]
    val0 = float(loss_fn(v))
    err0 = float(jnp.abs(v - gt_params["verts"]).mean())
    g_fn = jax.jit(jax.value_and_grad(loss_fn))
    opt_init, opt_update = opt_lib.make_optimizer("adam", eps=1e-8)
    state = opt_init({"verts": v})
    lr = {"verts": jnp.asarray(3e-3)}
    for _ in range(80):
        val, grad = g_fn(v)
        upd, state = opt_update({"verts": v}, {"verts": grad}, state, lr)
        v = upd["verts"]
    val1 = float(loss_fn(v))
    err1 = float(jnp.abs(v - gt_params["verts"]).mean())
    assert val1 < 0.5 * val0, (val0, val1)
    assert err1 < err0, (err0, err1)


def test_vertex_crossing_guard():
    """The guard fires when a vertex's depth deviation exceeds half the
    inter-plane gap (the documented validity bound of the global plane
    order) and stays quiet on in-regime perturbations."""
    from videoloop3d_tpu.render.geo_warp import vertex_crossing_report
    model, params = _model()
    g = model.geom
    model.optimize_geometry = True
    dz, half_gap = vertex_crossing_report(g, params["verts"],
                                          model.cfg.normalize_verts)
    assert dz < 1e-5 and half_gap > 0
    v = np.asarray(params["verts"]).copy()
    depths = g.depths_np()
    gap = np.abs(np.diff(depths)).min()
    v[0, 2] += gap                                # cross into the next plane
    dz2, _ = vertex_crossing_report(g, jnp.asarray(v),
                                    model.cfg.normalize_verts)
    assert dz2 > half_gap
