import numpy as np
import jax.numpy as jnp

from videoloop3d_tpu.core import cameras, planes, sh
from videoloop3d_tpu.core.activations import ACTIVATIONS


def test_make_depths_disparity_spacing():
    d = planes.make_depths(5, 2.0, 10.0)
    disp = 1.0 / d
    diffs = np.diff(disp)
    assert np.allclose(diffs, diffs[0], rtol=1e-5)
    assert np.isclose(d[0], 10.0, rtol=1e-5)   # FAR first (index 0 = far)
    assert np.isclose(d[-1], 2.0, rtol=1e-5)


def test_pose_extrinsic_involution():
    rng = np.random.default_rng(0)
    # random valid pose
    q = rng.normal(size=(3, 3))
    u, _, vt = np.linalg.svd(q)
    rot = u @ vt
    pose = np.concatenate([rot, rng.normal(size=(3, 1))], axis=1)
    ext = cameras.pose_to_extrinsic(pose)
    back = cameras.pose_to_extrinsic(ext)
    pose4 = cameras.homogenize(pose[None])[0]
    assert np.allclose(back, pose4, atol=1e-6)


def test_shift_and_scale_intrinsic():
    intrin = np.array([[100.0, 0, 32], [0, 100, 24], [0, 0, 1]])
    out = cameras.shift_intrinsic(intrin, 5, 7)
    assert out[0, 2] == 25 and out[1, 2] == 19
    out2 = cameras.scale_intrinsic(intrin, 0.5, 2.0)
    assert out2[0, 0] == 200 and out2[1, 1] == 50 and out2[2, 2] == 1


def test_plane_homography_roundtrip():
    """warp_grid must agree with explicit point projection."""
    rng = np.random.default_rng(1)
    depths = np.array([4.0, 2.5], np.float32)
    km = np.array([[50.0, 0, 40], [0, 50, 30], [0, 0, 1]], np.float32)
    kt = np.array([[55.0, 0, 20], [0, 52, 16], [0, 0, 1]], np.float32)
    # small random relative extrinsic
    angle = 0.05
    R = np.array([[np.cos(angle), -np.sin(angle), 0],
                  [np.sin(angle), np.cos(angle), 0],
                  [0, 0, 1]], np.float32)
    t = rng.normal(scale=0.1, size=3).astype(np.float32)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3], ext[:3, 3] = R, t

    G = planes.plane_homographies(depths, km, jnp.asarray(ext)[None],
                                  jnp.asarray(kt)[None])
    h, w = 8, 10
    x, y, zview = planes.warp_grid(G, h, w)
    x, y, zview = map(np.asarray, (x, y, zview))

    km_inv = np.linalg.inv(km)
    for d in range(2):
        for (yy, xx) in [(0, 0), (3, 7), (7, 9)]:
            hp = np.array([x[0, d, yy, xx], y[0, d, yy, xx], 1.0])
            p_ref = depths[d] * km_inv @ hp
            p_view = R @ p_ref + t
            proj = kt @ p_view
            proj = proj[:2] / proj[2]
            assert np.allclose(proj, [xx, yy], atol=1e-3)
            assert np.isclose(p_view[2], zview[0, d, yy, xx], rtol=1e-4)


def test_identity_view_warp_is_intrinsic_shift():
    """From the reference camera itself, plane coords are just a rescaled
    pixel grid through the two intrinsics."""
    depths = np.array([3.0], np.float32)
    km = np.array([[50.0, 0, 40], [0, 50, 30], [0, 0, 1]], np.float32)
    kt = np.array([[50.0, 0, 10], [0, 50, 8], [0, 0, 1]], np.float32)
    G = planes.plane_homographies(depths, km, jnp.eye(4)[None],
                                  jnp.asarray(kt)[None])
    x, y, z = planes.warp_grid(G, 4, 6)
    assert np.allclose(np.asarray(z), 3.0, atol=1e-4)
    assert np.allclose(np.asarray(x)[0, 0, 0], np.arange(6) + 30, atol=1e-3)
    assert np.allclose(np.asarray(y)[0, 0, :, 0], np.arange(4) + 22,
                       atol=1e-3)


def test_sh_bases_match_constants():
    dirs = jnp.asarray(np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]]))
    out = np.asarray(sh.eval_sh_bases(9, dirs))
    assert out.shape == (2, 9)
    assert np.allclose(out[:, 0], 0.28209479177387814)
    # z-direction: basis 2 = C1 * z
    assert np.isclose(out[0, 2], 0.4886025119029199, rtol=1e-6)
    assert np.isclose(out[1, 3], -0.4886025119029199, rtol=1e-6)


def test_activations_table():
    x = jnp.asarray(np.linspace(-3, 3, 7, dtype=np.float32))
    sig = np.asarray(ACTIVATIONS["sigmoid"](x))
    assert np.all((sig > 0) & (sig < 1))
    uns = np.asarray(ACTIVATIONS["unsigmoid"](jnp.asarray(sig)))
    assert np.allclose(uns, np.asarray(x), atol=1e-4)
    clamped = np.asarray(ACTIVATIONS["clamp"](x))
    assert clamped.min() == 0 and clamped.max() == 1
