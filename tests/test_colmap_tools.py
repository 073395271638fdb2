import os

import numpy as np

from videoloop3d_tpu.tools.colmap import binmodel
from videoloop3d_tpu.tools.colmap.poses import (load_colmap_scene,
                                                save_llff_poses)
from videoloop3d_tpu.data import llff
from videoloop3d_tpu.tools.owndata_step1 import split_on_black, standardize


def test_quaternion_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = binmodel.qvec_to_rotmat(q)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-10)
        q2 = binmodel.rotmat_to_qvec(R)
        assert np.allclose(q, q2, atol=1e-8)


def _synthetic_colmap_model(tmp_path, n_views=4):
    """Write a synthetic sparse/0 with known cameras + points."""
    rng = np.random.default_rng(1)
    sparse = tmp_path / "sparse" / "0"
    os.makedirs(sparse)
    w, h, focal = 64, 48, 55.0
    cams = {1: binmodel.Camera(1, "SIMPLE_PINHOLE", w, h,
                               np.array([focal, w / 2, h / 2]))}
    images = {}
    c2ws = []
    for i in range(n_views):
        angle = 0.05 * i
        R_c2w = np.array([[np.cos(angle), 0, np.sin(angle)],
                          [0, 1, 0],
                          [-np.sin(angle), 0, np.cos(angle)]])
        t_c2w = np.array([0.2 * i, 0.05 * i, 0.0])
        c2w = np.eye(4)
        c2w[:3, :3] = R_c2w
        c2w[:3, 3] = t_c2w
        c2ws.append(c2w)
        w2c = np.linalg.inv(c2w)
        q = binmodel.rotmat_to_qvec(w2c[:3, :3])
        images[i + 1] = binmodel.Image(
            i + 1, q, w2c[:3, 3], 1, f"{i:04d}.png",
            np.zeros((0, 2)), np.zeros(0, np.int64))
    pts = {}
    for pid in range(30):
        xyz = rng.normal(size=3) * np.array([1, 1, 0.5]) + [0, 0, 4.0]
        pts[pid + 1] = binmodel.Point3D(
            pid + 1, xyz, np.array([128, 128, 128]), 0.5,
            np.arange(1, n_views + 1), np.zeros(n_views, np.int32))
    binmodel.write_cameras_binary(str(sparse / "cameras.bin"), cams)
    binmodel.write_images_binary(str(sparse / "images.bin"), images)
    binmodel.write_points3d_binary(str(sparse / "points3D.bin"), pts)
    return np.stack(c2ws), (h, w, focal), pts


def test_binary_model_roundtrip(tmp_path):
    c2ws, hwf, pts = _synthetic_colmap_model(tmp_path)
    sparse = str(tmp_path / "sparse" / "0")
    cams = binmodel.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    assert cams[1].model == "SIMPLE_PINHOLE"
    assert cams[1].width == 64 and np.isclose(cams[1].params[0], 55.0)
    images = binmodel.read_images_binary(os.path.join(sparse, "images.bin"))
    assert len(images) == len(c2ws)
    assert images[1].name == "0000.png"
    pts_r = binmodel.read_points3d_binary(
        os.path.join(sparse, "points3D.bin"))
    assert len(pts_r) == 30
    assert np.allclose(pts_r[1].xyz, pts[1].xyz)


def test_colmap_to_llff_conversion(tmp_path):
    """Full conversion: synthetic model -> poses_bounds.npy -> our LLFF
    loader reproduces the known camera geometry."""
    c2ws, (h, w, focal), _ = _synthetic_colmap_model(tmp_path)
    poses, pts3d, perm, names = load_colmap_scene(str(tmp_path))
    save_llff_poses(str(tmp_path), poses, pts3d, perm)
    assert os.path.exists(tmp_path / "poses_bounds.npy")

    loaded, bds = llff.load_poses_bounds(str(tmp_path), factor=1)
    # the writer's [-u, r, -t] swap and the loader's swap are mutually
    # inverse: loaded poses equal the COLMAP c2w exactly (x right,
    # y down, z forward — the convention the renderer uses throughout)
    for i in range(len(c2ws)):
        assert np.allclose(loaded[i, :3, :4], c2ws[i][:3, :4],
                           atol=1e-6), i
    assert np.allclose(loaded[0, :, 4], [h, w, focal], atol=1e-6)
    # bounds: points at z~4 in front of cameras
    assert 2.0 < bds.min() < bds.max() < 6.0


def test_split_on_black_and_standardize(tmp_path):
    rng = np.random.default_rng(2)
    clip1 = rng.integers(60, 255, (4, 16, 20, 3)).astype(np.uint8)
    clip2 = rng.integers(60, 255, (5, 16, 20, 3)).astype(np.uint8)
    black = np.zeros((2, 16, 20, 3), np.uint8)
    vid = np.concatenate([clip1, black, clip2])
    clips = list(split_on_black(vid))
    assert len(clips) == 2
    assert len(clips[0]) == 4 and len(clips[1]) == 5

    src = str(tmp_path / "cap.npy")
    np.save(src, vid)
    out = str(tmp_path / "scene")
    n = standardize(src, out, factors=[1, 2])
    assert n == 2
    assert os.path.exists(os.path.join(out, "images", "0001.png"))
    assert os.path.exists(os.path.join(out, "videos_1"))
    assert os.path.exists(os.path.join(out, "videos_2"))
