import numpy as np
import jax
import jax.numpy as jnp

from videoloop3d_tpu.models.geometry import MPIGeometry
from videoloop3d_tpu.models.mpmesh import MPMesh, MPMeshConfig
from videoloop3d_tpu.render import renderer as R
from videoloop3d_tpu.render.sample import bilinear_planes, bilinear_tiles
from videoloop3d_tpu.render.composite import composite_front_to_back
from videoloop3d_tpu.data import synthetic


def _np_bilinear(tex, x, y):
    return np.asarray(synthetic._bilinear(tex, x, y))


def test_bilinear_planes_matches_numpy():
    rng = np.random.default_rng(0)
    tex = rng.random((2, 5, 7, 3)).astype(np.float32)
    x = rng.uniform(-1, 7.5, size=(2, 20)).astype(np.float32)
    y = rng.uniform(-1, 5.5, size=(2, 20)).astype(np.float32)
    vals, inside = bilinear_planes(jnp.asarray(tex), jnp.asarray(x),
                                   jnp.asarray(y))
    vals = np.asarray(vals)
    for d in range(2):
        expected = _np_bilinear(tex[d], x[d], y[d])
        assert np.allclose(vals[d], expected, atol=1e-5)
    inside = np.asarray(inside)
    assert np.array_equal(
        inside, (x >= 0) & (x <= 6) & (y >= 0) & (y <= 4))


def test_bilinear_tiles_gather():
    rng = np.random.default_rng(1)
    tiles = rng.random((3, 4, 4, 2)).astype(np.float32)
    k = jnp.asarray(np.array([0, 2, -1]))
    u = jnp.asarray(np.array([1.5, 0.0, 2.0], np.float32))
    v = jnp.asarray(np.array([2.0, 3.0, 1.0], np.float32))
    vals, valid = bilinear_tiles(jnp.asarray(tiles), k, u, v)
    vals = np.asarray(vals)
    assert np.allclose(vals[0], 0.5 * (tiles[0, 2, 1] + tiles[0, 2, 2]),
                       atol=1e-6)
    assert np.allclose(vals[1], tiles[2, 3, 0], atol=1e-6)
    assert np.allclose(vals[2], 0.0)
    assert np.array_equal(np.asarray(valid), [True, True, False])


def test_composite_front_to_back():
    alpha = jnp.asarray(np.array([[0.5, 0.5, 1.0]], np.float32))
    content = jnp.asarray(np.array(
        [[[1.0], [2.0], [4.0]]], np.float32))
    out, w = composite_front_to_back(alpha, content)
    # w = [0.5, 0.25, 0.25]
    assert np.allclose(np.asarray(w), [[0.5, 0.25, 0.25]], atol=1e-6)
    assert np.allclose(np.asarray(out), [[0.5 + 0.5 + 1.0]], atol=1e-6)


def _oracle_geometry(scene, h, w):
    th, tw = scene["plane_texs_hw"]
    return MPIGeometry(
        n_planes=2, mpi_h=th, mpi_w=tw, n_tiles_h=4, n_tiles_w=6,
        near=float(scene["bds"][0]), far=float(scene["bds"][1]),
        depths=tuple(float(d) for d in scene["plane_depths"]),
        ref_intrin_mpi=tuple(tuple(float(v) for v in row)
                             for row in scene["plane_intrin"]),
        ref_extrin=tuple(tuple(float(v) for v in row) for row in np.eye(4)),
    )


def _scene_atlas(scene, frame=0):
    """Rebuild the exact plane textures the ray-cast oracle used."""
    th, tw = scene["plane_texs_hw"]
    far_tex = np.concatenate(
        [synthetic.checker(th, tw, 16, 0.0, seed=0), np.ones((th, tw, 1))],
        -1)
    near_base = synthetic.checker(th, tw, 9, 1.0, seed=1)
    near_alpha = np.zeros((th, tw, 1), np.float32)
    near_alpha[th // 4: 3 * th // 4, tw // 4: 3 * tw // 4] = 0.9
    n_frames = scene["videos"].shape[1]
    phase = 2 * np.pi * frame / n_frames
    near_tex = np.concatenate(
        [near_base * (0.75 + 0.25 * np.sin(phase)), near_alpha], -1)
    near_tex = np.roll(near_tex, int(round(3 * np.sin(phase))), axis=1)
    return np.stack([far_tex, near_tex]).astype(np.float32)


def test_plane_sweep_matches_raycast_oracle():
    """The homography plane-sweep must reproduce the independently
    ray-cast ground truth (cross-validation of the renderer)."""
    scene = synthetic.make_scene(n_views=3, h=32, w=40, n_frames=4, seed=0)
    h, w = 32, 40
    geom = _oracle_geometry(scene, h, w)
    atlas = jnp.asarray(_scene_atlas(scene, frame=0))

    cfg = MPMeshConfig(rgb_activate="none", alpha_activate="none",
                       learn_loop_mask=False)
    model = MPMesh.from_geometry(geom, cfg, h, w)
    params = {"atlas": atlas}
    for v in range(3):
        ext = np.linalg.inv(
            np.concatenate([scene["poses"][v],
                            np.array([[0, 0, 0, 1.0]], np.float32)]))
        rgbl, _ = model.render(
            params, h, w, jnp.asarray(ext)[None],
            jnp.asarray(scene["intrins"][v])[None])
        got = np.asarray(rgbl[0])
        want = scene["videos"][v, 0]
        assert np.abs(got - want).max() < 2e-3, (
            f"view {v}: max err {np.abs(got - want).max()}")


def test_sparse_render_matches_dense():
    """With integer tile spans the packed-tile resampling is the identity,
    so the sparse render must match the dense render almost exactly."""
    rng = np.random.default_rng(3)
    h, w = 32, 40
    intrin = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]],
                      np.float32)
    km = intrin.copy()
    km[0, 2] += 10
    km[1, 2] += 8
    geom = MPIGeometry(
        n_planes=3, mpi_h=49, mpi_w=61, n_tiles_h=4, n_tiles_w=6,
        near=1.5, far=6.0, depths=(5.0, 3.0, 2.0),
        ref_intrin_mpi=tuple(tuple(float(v) for v in r) for r in km),
        ref_extrin=tuple(tuple(float(v) for v in r) for r in np.eye(4)))
    atlas = rng.random((3, 49, 61, 4)).astype(np.float32)
    atlas[..., 3] *= 0.9

    from videoloop3d_tpu.models.sparsify import extract_tiles
    tiles, tile_map = extract_tiles(atlas, geom)
    assert tile_map.min() >= 0
    assert tiles.shape[1:3] == (13, 11)       # span 12 & 10 -> +1 texel

    ext = np.eye(4, dtype=np.float32)
    ext[0, 3] = 0.12
    cfg = MPMeshConfig(rgb_activate="none", alpha_activate="none")
    model = MPMesh.from_geometry(geom, cfg, h, w)
    dense, _ = model.render({"atlas": jnp.asarray(atlas)}, h, w,
                            jnp.asarray(ext)[None], jnp.asarray(intrin)[None])

    model_s = MPMesh.from_geometry(geom, cfg, h, w)
    model_s.is_sparse = True
    model_s.has_dyn = True
    model_s.tile_map_static = tile_map
    model_s.tile_map_dyn = np.full_like(tile_map, -1)
    sparse, _ = model_s.render(
        {"atlas": jnp.asarray(tiles),
         "atlas_dyn": jnp.zeros((1,) + tiles.shape[1:], jnp.float32)},
        h, w, jnp.asarray(ext)[None], jnp.asarray(intrin)[None])
    err = np.abs(np.asarray(dense) - np.asarray(sparse)).max()
    assert err < 5e-3, err


def test_forward_gradients_flow():
    scene = synthetic.make_scene(n_views=1, h=16, w=20, n_frames=2, seed=0)
    geom = _oracle_geometry(scene, 16, 20)
    cfg = MPMeshConfig(learn_loop_mask=True)
    model = MPMesh.from_geometry(geom, cfg, 16, 20)
    rng = np.random.default_rng(0)
    params = {
        "atlas": jnp.asarray(rng.random((2, geom.mpi_h, geom.mpi_w, 4),
                                        dtype=np.float32)),
        "atlas_mask": jnp.zeros((2, geom.mpi_h, geom.mpi_w, 1)),
    }
    target = jnp.asarray(scene["videos"][0, 0])

    def loss_fn(p):
        rgbl, extra = model.forward(
            p, 16, 20, jnp.eye(4)[None],
            jnp.asarray(scene["intrins"][0])[None], training=True,
            rng=jax.random.PRNGKey(0))
        loss = jnp.mean((rgbl[..., :3] - target) ** 2)
        for v in extra.values():
            loss = loss + 0.01 * v
        return loss

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["atlas"]).max()) > 0
    assert float(jnp.abs(g["atlas_mask"]).max()) >= 0
    assert np.all(np.isfinite(np.asarray(g["atlas"])))


def test_create_occlusion_near_plane_wins():
    """Regression: MPIGeometry.create must store depths FAR-first so the
    composite (which assumes index 0 = far) lets the NEAR plane occlude.
    Round-1 bug: create() reversed make_depths, inverting occlusion in
    every production run (hand-built geometries in other tests hid it)."""
    import types
    h, w = 24, 32
    args = types.SimpleNamespace(mpi_h_scale=1.0, mpi_w_scale=1.0,
                                 mpi_d=2, mpi_h_verts=3, mpi_w_verts=4)
    intrin = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]],
                      np.float32)
    geom = MPIGeometry.create(args, h, w, np.eye(4, dtype=np.float32),
                              intrin, near=2.0, far=8.0)
    assert geom.depths[0] > geom.depths[-1]  # far first

    # plane 0 (far) solid red, plane 1 (near) solid green, both opaque
    atlas = np.zeros((2, geom.mpi_h, geom.mpi_w, 4), np.float32)
    atlas[0, ..., 0] = 1.0
    atlas[1, ..., 1] = 1.0
    atlas[..., 3] = 1.0

    cfg = MPMeshConfig(rgb_activate="none", alpha_activate="none",
                       learn_loop_mask=False)
    model = MPMesh.from_geometry(geom, cfg, h, w)
    rgb, _ = model.render({"atlas": jnp.asarray(atlas)}, h, w,
                          jnp.asarray(np.eye(4, dtype=np.float32))[None],
                          jnp.asarray(intrin)[None])
    center = np.asarray(rgb[0, h // 2, w // 2, :3])
    assert center[1] > 0.99 and center[0] < 0.01, (
        f"near (green) plane must win, got {center}")


def test_blocked_tile_lookup_matches_plain():
    """tile_lookup2_blocked == tile_lookup2 for every valid pixel, with
    spans from lookup_span_bound, across views/origins/jitter."""
    rng = np.random.default_rng(11)
    h, w = 32, 40
    ph, pw = 20, 24
    intrin = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]],
                      np.float32)
    km = intrin.copy()
    km[0, 2] += 10
    km[1, 2] += 8
    geom = MPIGeometry(
        n_planes=3, mpi_h=49, mpi_w=61, n_tiles_h=4, n_tiles_w=6,
        near=1.5, far=6.0, depths=(5.0, 3.0, 2.0),
        ref_intrin_mpi=tuple(tuple(float(v) for v in r) for r in km),
        ref_extrin=tuple(tuple(float(v) for v in r) for r in np.eye(4)))

    n_tiles = geom.n_planes * geom.n_tiles_h * geom.n_tiles_w
    tm_a = np.full(n_tiles, -1, np.int32)
    tm_b = np.full(n_tiles, -1, np.int32)
    ka = rng.random(n_tiles) < 0.6
    kb = rng.random(n_tiles) < 0.3
    tm_a[ka] = np.arange(ka.sum())
    tm_b[kb] = np.arange(kb.sum())
    shape3 = (geom.n_planes, geom.n_tiles_h, geom.n_tiles_w)
    tm_a = tm_a.reshape(shape3)
    tm_b = tm_b.reshape(shape3)

    exts, intrs = [], []
    for vi in range(3):
        e = np.eye(4, dtype=np.float32)
        e[:3, 3] = rng.uniform(-0.15, 0.15, 3)
        exts.append(e)
        intrs.append(intrin)
    origins = [(0, 0), (8, 4), (16, 12)]

    from videoloop3d_tpu.core import cameras
    spans = R.lookup_span_bound(geom, np.stack(exts), np.stack(intrs),
                                ph, pw, origins)
    Ti, J = spans
    assert 1 <= Ti <= geom.n_tiles_h and 1 <= J <= geom.n_tiles_w

    for vi in range(3):
        for w0, h0 in origins:
            pintr = cameras.shift_intrinsic(intrs[vi], h0, w0)
            # runtime intrinsic jitter inside the +-0.55 envelope
            pj = pintr.copy()
            pj[0, 2] += rng.uniform(-0.5, 0.5)
            pj[1, 2] += rng.uniform(-0.5, 0.5)
            coords = R.warp_coordinates(
                geom, jnp.asarray(exts[vi])[None],
                jnp.asarray(pj)[None], ph, pw)
            ka1, kb1, fu1, fv1 = R.tile_lookup2(geom, tm_a, tm_b, coords)
            ka2, kb2, fu2, fv2 = R.tile_lookup2_blocked(
                geom, tm_a, tm_b, coords, spans)
            assert np.array_equal(np.asarray(ka1), np.asarray(ka2))
            assert np.array_equal(np.asarray(kb1), np.asarray(kb2))
            assert np.array_equal(np.asarray(fu1), np.asarray(fu2))
            assert np.array_equal(np.asarray(fv1), np.asarray(fv2))
