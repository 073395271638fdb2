"""Golden tests: the C++ rasterizer path must reproduce the TPU
homography plane-sweep render for fronto-parallel tile geometry."""
import numpy as np
import jax.numpy as jnp

from videoloop3d_tpu.models.geometry import MPIGeometry
from videoloop3d_tpu.models.mpmesh import MPMesh, MPMeshConfig
from videoloop3d_tpu.render import raster_cpp


def test_single_triangle_coverage_and_bary():
    verts = np.array([[1.0, 1.0, 2.0], [9.0, 1.0, 2.0], [1.0, 9.0, 2.0]],
                     np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    p2f, z, bary = raster_cpp.rasterize(verts, faces, 12, 12, 1)
    assert p2f[2, 2, 0] == 0                 # inside
    assert p2f[10, 10, 0] == -1              # outside
    assert np.isclose(z[2, 2, 0], 2.0, atol=1e-5)
    # barycentric at vertex 0's pixel
    assert np.allclose(bary[1, 1, 0], [1, 0, 0], atol=1e-5)
    assert np.allclose(bary[1, 1, 0].sum(), 1.0, atol=1e-5)


def test_k_depth_ordering():
    """Two stacked triangles: nearest first in the K list."""
    verts = np.array([
        [0, 0, 4.0], [10, 0, 4.0], [0, 10, 4.0],      # far
        [0, 0, 2.0], [10, 0, 2.0], [0, 10, 2.0],      # near
    ], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    p2f, z, _ = raster_cpp.rasterize(verts, faces, 8, 8, 2)
    assert p2f[2, 2, 0] == 1 and p2f[2, 2, 1] == 0
    assert z[2, 2, 0] < z[2, 2, 1]


def _composite_from_fragments(p2f, bary, uvs_per_face, atlas_lookup,
                              alpha_lookup):
    """Minimal fragment compositor for the golden test."""
    H, W, K = p2f.shape
    out = np.zeros((H, W, 3))
    trans = np.ones((H, W))
    for k in range(K):
        for y in range(H):
            for x in range(W):
                f = p2f[y, x, k]
                if f < 0:
                    continue
                uv = (bary[y, x, k][:, None] * uvs_per_face[f]).sum(0)
                rgba = atlas_lookup(f, uv)
                a = rgba[3]
                out[y, x] += trans[y, x] * a * rgba[:3]
                trans[y, x] *= (1 - a)
    return out


def test_raster_path_matches_plane_sweep():
    """Full golden test: build the MPI tile mesh, rasterize with the C++
    path, perspective-interpolate per-plane texel coordinates, bilinear
    gather, over-composite -> must match MPMesh.render."""
    rng = np.random.default_rng(0)
    h, w = 20, 26
    intrin = np.array([[25.0, 0, w / 2], [0, 25.0, h / 2], [0, 0, 1]],
                      np.float32)
    km = intrin.copy()
    km[0, 2] += 5
    km[1, 2] += 4
    geom = MPIGeometry(
        n_planes=2, mpi_h=33, mpi_w=41, n_tiles_h=2, n_tiles_w=4,
        near=1.5, far=6.0, depths=(5.0, 2.5),
        ref_intrin_mpi=tuple(tuple(float(v) for v in r) for r in km),
        ref_extrin=tuple(tuple(float(v) for v in r) for r in np.eye(4)))
    atlas = rng.random((2, 33, 41, 4)).astype(np.float32)
    atlas[..., 3] *= 0.8

    ext = np.eye(4, dtype=np.float32)
    ext[0, 3] = 0.15
    ext[1, 3] = -0.05

    # plane-sweep render
    cfg = MPMeshConfig(rgb_activate="none", alpha_activate="none")
    model = MPMesh.from_geometry(geom, cfg, h, w)
    sweep, _ = model.render({"atlas": jnp.asarray(atlas)}, h, w,
                            jnp.asarray(ext)[None], jnp.asarray(intrin)[None])
    sweep = np.asarray(sweep[0])

    # C++ raster path on the same tile mesh
    verts_ref = geom.vertex_grid()                       # (D*vh*vw, 3)
    vh, vw = geom.n_tiles_h + 1, geom.n_tiles_w + 1
    faces = []
    texcoords = []                                       # per-vertex texel xy
    km_np = np.asarray(km)
    for d in range(2):
        for i in range(geom.n_tiles_h):
            for j in range(geom.n_tiles_w):
                base = d * vh * vw
                v0 = base + i * vw + j
                v1, v2, v3 = v0 + 1, v0 + vw, v0 + vw + 1
                # faces ordered far plane first (plane 0 = far)
                faces.append([v0, v1, v3])
                faces.append([v3, v2, v0])
    faces = np.array(faces, np.int32)
    # per-vertex plane-texture texel coordinate = projection of the
    # vertex through the mpi intrinsic at its plane depth
    tex_xy = (verts_ref[:, :2] / verts_ref[:, 2:3]
              * np.array([km_np[0, 0], km_np[1, 1]])
              + np.array([km_np[0, 2], km_np[1, 2]]))

    screen = raster_cpp.project_vertices(verts_ref, ext, intrin)
    K = 2
    p2f, z, bary = raster_cpp.rasterize(screen, faces, h, w, K)

    def bilin(tex, x, y):
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = x - x0, y - y0
        def g(xi, yi):
            if xi < 0 or yi < 0 or xi >= tex.shape[1] or yi >= tex.shape[0]:
                return np.zeros(4)
            return tex[yi, xi]
        return ((g(x0, y0) * (1 - fx) + g(x0 + 1, y0) * fx) * (1 - fy)
                + (g(x0, y1 := y0 + 1) * (1 - fx) + g(x0 + 1, y1) * fx) * fy)

    out = np.zeros((h, w, 3))
    trans = np.ones((h, w))
    n_tiles_per_plane = geom.n_tiles_h * geom.n_tiles_w * 2
    for k in range(K):
        for y in range(h):
            for x in range(w):
                f = p2f[y, x, k]
                if f < 0:
                    continue
                d = f // n_tiles_per_plane
                vidx = faces[f]
                uv = (bary[y, x, k][:, None] * tex_xy[vidx]).sum(0)
                rgba = bilin(atlas[d], uv[0], uv[1])
                a = rgba[3]
                out[y, x] += trans[y, x] * a * rgba[:3]
                trans[y, x] *= 1 - a

    err = np.abs(out - sweep)
    # small disagreements on triangle edges (coverage rounding); interior
    # must match tightly
    assert np.median(err) < 2e-3, np.median(err)
    assert (err < 5e-3).mean() > 0.93, (err < 5e-3).mean()
