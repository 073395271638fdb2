"""Camera math: poses, extrinsics, intrinsics, rays, render paths.

Conventions follow the LLFF/NeRF lineage used by the reference
implementation (see /root/reference/utils.py:159-219 and
/root/reference/dataloader.py:211-260 for the behavior being matched):

* A *pose* is a camera-to-world matrix (3x4 or 4x4), columns = (right,
  up-ish, forward-ish, position) after the LLFF axis correction.
* An *extrinsic* is the world-to-camera matrix (inverse of the pose).
* Intrinsics are 3x3 with last row (0, 0, 1); pixel (0, 0) is the first
  pixel center.

Functions here are pure and operate on numpy or jax arrays symmetrically
where practical; host-side path-generation helpers are numpy-only.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# pose <-> extrinsic
# ---------------------------------------------------------------------------

def homogenize(mat):
    """Append the (0,0,0,1) row to a batch of 3x4 matrices (numpy or jax)."""
    xp = jnp if isinstance(mat, jnp.ndarray) else np
    if mat.shape[-2] == 4:
        return mat
    bottom = xp.zeros_like(mat[..., :1, :])
    bottom = bottom.at[..., 0, 3].set(1.0) if xp is jnp else _np_set_bottom(bottom)
    return xp.concatenate([mat, bottom], axis=-2)


def _np_set_bottom(bottom):
    bottom[..., 0, 3] = 1.0
    return bottom


def pose_to_extrinsic(pose):
    """Invert camera-to-world into world-to-camera (and vice versa).

    Parity: utils.py:203-219 (pose2extrin_np / pose2extrin_torch).
    """
    mat = homogenize(pose)
    xp = jnp if isinstance(mat, jnp.ndarray) else np
    return xp.linalg.inv(mat)


extrinsic_to_pose = pose_to_extrinsic  # the operation is an involution


def shift_intrinsic(intrin, h_start, w_start):
    """Intrinsics for a crop whose origin is (h_start, w_start) of the
    original image.  Parity: utils.py:196-200 (get_new_intrin)."""
    xp = jnp if isinstance(intrin, jnp.ndarray) else np
    out = xp.array(intrin, copy=True) if xp is np else intrin
    if xp is np:
        out[..., 0, 2] -= w_start
        out[..., 1, 2] -= h_start
        return out
    out = intrin.at[..., 0, 2].add(-w_start)
    out = out.at[..., 1, 2].add(-h_start)
    return out


def scale_intrinsic(intrin, sy, sx):
    """Rescale intrinsics for a resized image (sy = new_h/old_h)."""
    xp = jnp if isinstance(intrin, jnp.ndarray) else np
    scale = xp.asarray([[sx, sx, sx], [sy, sy, sy], [1, 1, 1]], dtype=intrin.dtype)
    return intrin * scale


def get_rays(h, w, intrin, pose):
    """Per-pixel ray origins & directions in world space.

    intrin: (3,3); pose: camera-to-world (3,4) or (4,4).
    Returns (rays_o, rays_d) of shape (h, w, 3).
    Parity: utils.py:159-166 (get_rays_np).
    """
    xp = jnp if isinstance(intrin, jnp.ndarray) else np
    x, y = xp.meshgrid(xp.arange(w, dtype=intrin.dtype),
                       xp.arange(h, dtype=intrin.dtype), indexing="xy")
    pix = xp.stack([x, y, xp.ones_like(x)], axis=-1)          # (h, w, 3)
    local = pix @ xp.linalg.inv(intrin).T                     # (h, w, 3)
    rays_d = local @ pose[:3, :3].T
    rays_o = xp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


# ---------------------------------------------------------------------------
# averaged pose / recentering / spiral path (host-side, numpy)
# ---------------------------------------------------------------------------

def _normalize(v):
    return v / np.linalg.norm(v)


def look_at_matrix(forward, up, position):
    """3x4 camera-to-world from forward direction, up hint and position.
    Parity: dataloader.py:215-221 (viewmatrix)."""
    z = _normalize(forward)
    x = _normalize(np.cross(up, z))
    y = _normalize(np.cross(z, x))
    return np.stack([x, y, z, position], axis=1)


def average_pose(poses):
    """Average camera pose of a batch of (N, 3, 4+) poses.
    Parity: dataloader.py:224-232 (poses_avg)."""
    center = poses[:, :3, 3].mean(0)
    forward = _normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    mat = look_at_matrix(forward, up, center)
    if poses.shape[-1] > 4:
        mat = np.concatenate([mat, poses[0, :3, -1:]], axis=1)
    return mat


def recenter_poses(poses):
    """Rigidly transform all poses so the average pose is the identity.
    Parity: dataloader.py:235-246."""
    avg = homogenize(average_pose(poses)[:, :4][None])[0]
    poses4 = homogenize(poses[:, :3, :4])
    out = np.linalg.inv(avg) @ poses4
    result = poses.copy()
    result[:, :3, :4] = out[:, :3, :4]
    return result


def spiral_render_path(c2w, up, radii, focus_depth, zrate, zdelta, rotations, n_frames):
    """Spiral of camera-to-world poses around a central pose.
    Parity: dataloader.py:249-260 (render_path_spiral)."""
    radii = np.array(list(radii) + [1.0])
    poses = []
    for theta in np.linspace(0.0, 2.0 * np.pi * rotations, n_frames + 1)[:-1]:
        offs = np.array([np.cos(theta), -np.sin(theta),
                         (np.cos(theta * zrate) * zdelta) ** 2, 1.0]) * radii
        center = c2w[:3, :4] @ offs
        forward = _normalize(np.array([0, 0, focus_depth]) - center)
        poses.append(look_at_matrix(forward, up, center))
    return np.stack(poses)
