"""Synthetic multi-view looping scenes for tests and benchmarks.

The reference ships no dataset; fixtures are generated here.  Ground
truth is produced by *ray casting* planes in numpy — a deliberately
independent formulation from the homography plane-sweep renderer, so
end-to-end tests cross-validate the two.
"""
from __future__ import annotations

import os

import numpy as np

from videoloop3d_tpu.data import llff as llff_io


def _bilinear(tex, x, y):
    """tex: (H, W, C); x, y arrays of texel coords; zeros outside."""
    H, W = tex.shape[:2]
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    out = 0.0
    for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
            xi, yi = x0 + dx, y0 + dy
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            v = tex[np.clip(yi, 0, H - 1), np.clip(xi, 0, W - 1)]
            out = out + v * wx * wy * valid[..., None]
    return out


def raycast_planes(pose, intrin, h, w, plane_depths, plane_texs,
                   plane_intrin):
    """Render planes (RGBA textures at given ref-space depths) by casting
    rays from a camera.  pose: c2w (3,4) in ref space; plane_texs: list of
    (Ht, Wt, 4) float; plane_intrin maps ref-space points to texels.
    Planes ordered far -> near.  Returns (h, w, 3) float + alpha (h, w).
    """
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32), indexing="xy")
    pix = np.stack([xs, ys, np.ones_like(xs)], -1)
    dirs = pix @ np.linalg.inv(intrin).T @ pose[:3, :3].T
    origin = pose[:3, 3]

    fx, fy = plane_intrin[0, 0], plane_intrin[1, 1]
    cx, cy = plane_intrin[0, 2], plane_intrin[1, 2]

    rgb = np.zeros((h, w, 3), np.float32)
    trans = np.ones((h, w, 1), np.float32)
    # iterate near -> far for front-to-back compositing
    order = np.argsort(plane_depths)
    for idx in order:
        z = plane_depths[idx]
        t = (z - origin[2]) / dirs[..., 2]
        px = origin[0] + t * dirs[..., 0]
        py = origin[1] + t * dirs[..., 1]
        u = px / z * fx + cx
        v = py / z * fy + cy
        rgba = _bilinear(plane_texs[idx], u, v)
        inside = (u >= 0) & (u <= plane_texs[idx].shape[1] - 1) & \
                 (v >= 0) & (v <= plane_texs[idx].shape[0] - 1) & (t > 0)
        a = rgba[..., 3:] * inside[..., None]
        rgb = rgb + trans * a * rgba[..., :3]
        trans = trans * (1 - a)
    return rgb, 1 - trans[..., 0]


def checker(h, w, period, phase=0.0, channels=3, seed=0):
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = 0.5 + 0.5 * np.sin(2 * np.pi * (xs + ys) / period + phase)
    rng = np.random.default_rng(seed)
    color = rng.random(channels) * 0.7 + 0.3
    return base[..., None] * color[None, None]


def make_scene(n_views=3, h=48, w=64, n_frames=8, seed=0,
               variant="basic"):
    """A tiny 2-plane scene: static far plane + looping near plane.

    variant="rich" (the h2h scene 2, VERDICT r4 item 7): three planes
    (static far, static mid occluder, looping near), a tighter rig
    (offset step 0.08 vs 0.15) and a wider near-plane alpha region so
    the rig-end views are NOT content-thin — the "basic" scene's views
    7-9 see almost no dynamic content, which dominated the round-4
    per-view PSNR spread on both h2h sides.

    Returns dict: videos (V, F, h, w, 3) float[0,1], poses (V,3,4),
    intrins (V,3,3), bds (2,), plane description (for oracles).
    """
    if variant == "rich":
        return _make_scene_rich(n_views, h, w, n_frames, seed)
    assert variant == "basic", variant
    rng = np.random.default_rng(seed)
    focal = 0.9 * w
    intrin = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                      np.float32)
    depths = np.array([4.0, 2.0], np.float32)          # far, near
    near, far = 1.5, 6.0

    # plane textures sized to over-scan the image a bit
    th, tw = int(h * 1.5), int(w * 1.5)
    plane_intrin = intrin.copy()
    plane_intrin[0, 2] += (tw - w) / 2
    plane_intrin[1, 2] += (th - h) / 2

    far_tex = np.concatenate(
        [checker(th, tw, 16, 0.0, seed=seed), np.ones((th, tw, 1))], -1)
    near_base = checker(th, tw, 9, 1.0, seed=seed + 1)
    near_alpha = np.zeros((th, tw, 1), np.float32)
    near_alpha[th // 4: 3 * th // 4, tw // 4: 3 * tw // 4] = 0.9

    poses = []
    for v in range(n_views):
        offset = (v - (n_views - 1) / 2) * 0.15
        pose = np.eye(4, dtype=np.float32)[:3]
        pose[0, 3] = offset
        pose[1, 3] = offset * 0.3
        poses.append(pose)
    poses = np.stack(poses)
    intrins = np.repeat(intrin[None], n_views, axis=0)

    videos = np.zeros((n_views, n_frames, h, w, 3), np.float32)
    for f in range(n_frames):
        phase = 2 * np.pi * f / n_frames
        near_tex = np.concatenate(
            [near_base * (0.75 + 0.25 * np.sin(phase)),
             near_alpha], -1)
        # textural motion: roll the near texture by a looping shift
        shift = int(round(3 * np.sin(phase)))
        near_tex = np.roll(near_tex, shift, axis=1)
        for v in range(n_views):
            rgb, _ = raycast_planes(
                poses[v], intrins[v], h, w, depths,
                [far_tex, near_tex], plane_intrin)
            videos[v, f] = rgb
    return {
        "videos": videos,
        "poses": poses,
        "intrins": intrins,
        "bds": np.array([near, far], np.float32),
        "plane_depths": depths,
        "plane_intrin": plane_intrin,
        "plane_texs_hw": (th, tw),
    }


def _make_scene_rich(n_views, h, w, n_frames, seed):
    """Scene 2 of the h2h protocol: 3 planes, no content-thin views."""
    rng = np.random.default_rng(seed)
    focal = 0.9 * w
    intrin = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                      np.float32)
    depths = np.array([4.5, 3.0, 2.0], np.float32)      # far, mid, near
    near, far = 1.5, 6.0

    th, tw = int(h * 1.5), int(w * 1.5)
    plane_intrin = intrin.copy()
    plane_intrin[0, 2] += (tw - w) / 2
    plane_intrin[1, 2] += (th - h) / 2

    far_tex = np.concatenate(
        [checker(th, tw, 14, 0.0, seed=seed), np.ones((th, tw, 1))], -1)
    # static mid occluder: two solid blobs, offset from center
    mid_base = checker(th, tw, 7, 0.5, seed=seed + 2)
    mid_alpha = np.zeros((th, tw, 1), np.float32)
    mid_alpha[th // 8: 3 * th // 8, tw // 10: 4 * tw // 10] = 0.95
    mid_alpha[5 * th // 8: 7 * th // 8, 6 * tw // 10: 9 * tw // 10] = 0.95
    # looping near plane: wide alpha band so EVERY view sees motion
    near_base = checker(th, tw, 9, 1.0, seed=seed + 1)
    near_alpha = np.zeros((th, tw, 1), np.float32)
    near_alpha[th // 8: 7 * th // 8, tw // 8: 7 * tw // 8] = 0.9

    poses = []
    for v in range(n_views):
        offset = (v - (n_views - 1) / 2) * 0.08
        pose = np.eye(4, dtype=np.float32)[:3]
        pose[0, 3] = offset
        pose[1, 3] = offset * 0.25
        poses.append(pose)
    poses = np.stack(poses)
    intrins = np.repeat(intrin[None], n_views, axis=0)

    mid_tex = np.concatenate([mid_base, mid_alpha], -1)
    videos = np.zeros((n_views, n_frames, h, w, 3), np.float32)
    for f in range(n_frames):
        phase = 2 * np.pi * f / n_frames
        # two looping motions: a brightness pulse + a texture roll
        near_tex = np.concatenate(
            [near_base * (0.75 + 0.25 * np.sin(phase)), near_alpha], -1)
        shift = int(round(4 * np.sin(phase)))
        near_tex = np.roll(near_tex, shift, axis=1)
        shift_v = int(round(2 * np.cos(phase)))
        near_tex = np.roll(near_tex, shift_v, axis=0)
        for v in range(n_views):
            rgb, _ = raycast_planes(
                poses[v], intrins[v], h, w, depths,
                [far_tex, mid_tex, near_tex], plane_intrin)
            videos[v, f] = rgb
    return {
        "videos": videos,
        "poses": poses,
        "intrins": intrins,
        "bds": np.array([near, far], np.float32),
        "plane_depths": depths,
        "plane_intrin": plane_intrin,
        "plane_texs_hw": (th, tw),
    }


def write_llff_dir(scene, basedir, factor=1, container="npy"):
    """Materialize a synthetic scene as an LLFF directory (consumed by
    data.llff.load_mv_videos).

    container: "npy" (fast, tests) or "tif" (multi-frame TIFF readable by
    plain ``imageio.mimread`` — the format both this repo AND the
    reference implementation can decode without ffmpeg, used for the
    head-to-head run; ref dataloader.py:144 globs ``videos_{factor}/*``).
    """
    os.makedirs(os.path.join(basedir, f"videos_{factor}"), exist_ok=True)
    vids = (np.clip(scene["videos"], 0, 1) * 255).astype(np.uint8)
    for v in range(len(vids)):
        base = os.path.join(basedir, f"videos_{factor}", f"{v:04d}")
        if container == "npy":
            np.save(base + ".npy", vids[v])
        elif container == "tif":
            import imageio
            imageio.mimwrite(base + ".tif", list(vids[v]))
        else:
            raise ValueError(f"unknown container {container!r}")
    h, w = vids.shape[2:4]
    llff_io.save_poses_bounds(
        os.path.join(basedir, "poses_bounds.npy"),
        scene["poses"], scene["intrins"], scene["bds"], (h, w))
