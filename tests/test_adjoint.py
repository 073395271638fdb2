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
