"""Patch-grid datasets for stage 1 (images) and stage 2 (videos).

Host-side numpy iterators producing fixed-shape batches for the jitted
train steps.  Parity: reference train_3d.py:20-95 (MVPatchDataset) and
train_3dvid.py:22-66 (MVVidPatchDataset), utils.py:115-134
(generate_patchinfo).
"""
from __future__ import annotations

import os

import numpy as np

from videoloop3d_tpu.core import cameras
from videoloop3d_tpu.data import video as video_io
from videoloop3d_tpu.data.loopmask import compute_loopable_mask


def patch_grid(H, W, patch_size, patch_stride):
    """Patch origins covering (H, W); images are padded on bottom/right so
    every origin yields a full patch.  Returns (origins (N,2) as (w, h),
    pad (pad_h, pad_w)).  Parity: utils.py:115-134."""
    ph, pw = patch_size
    sh, sw = patch_stride
    hs = np.arange(0, H - ph + sh, sh)
    ws = np.arange(0, W - pw + sw, sw)
    pad_h = int(hs.max() + ph - H)
    pad_w = int(ws.max() + pw - W)
    assert sh > pad_h >= 0 and sw > pad_w >= 0
    gw, gh = np.meshgrid(ws, hs)
    origins = np.stack([gw.reshape(-1), gh.reshape(-1)], axis=-1)
    return origins.astype(np.int64), (pad_h, pad_w)


class PatchSampler:
    """Common origin/view bookkeeping for both datasets."""

    def __init__(self, hw, n_views, patch_size, patch_stride, poses,
                 intrins, raw_hw):
        self.h, self.w = hw
        self.v = n_views
        self.poses = np.asarray(poses, np.float32)
        intrins = np.asarray(intrins, np.float32).copy()
        sy = self.h / raw_hw[0]
        sx = self.w / raw_hw[1]
        intrins[:, 0] *= sx
        intrins[:, 1] *= sy
        self.intrins = intrins
        if self.h * self.w < patch_size[0] * patch_size[1]:
            self.patch_size = (self.h, self.w)
            self.origins = np.zeros((1, 2), np.int64)
            self.pad = (0, 0)
        else:
            self.patch_size = tuple(patch_size)
            self.origins, self.pad = patch_grid(
                self.h, self.w, patch_size, patch_stride)
        n_per_view = len(self.origins)
        self.view_index = np.repeat(np.arange(n_views), n_per_view)
        self.flat_origins = np.tile(self.origins, (n_views, 1))

    def __len__(self):
        return len(self.flat_origins)

    def item_geometry(self, item):
        w0, h0 = self.flat_origins[item]
        vi = int(self.view_index[item])
        pose = self.poses[vi]
        intrin = cameras.shift_intrinsic(self.intrins[vi], h0, w0)
        return int(w0), int(h0), vi, pose, intrin

    def iter_epoch(self, rng: np.random.Generator, shuffle=True):
        order = np.arange(len(self))
        if shuffle:
            rng.shuffle(order)
        for item in order:
            yield self[item]          # type: ignore[index]


class ImagePatchDataset(PatchSampler):
    """Stage-1: videos collapsed to single images + 2D loopable masks.
    Parity: train_3d.py:20-95."""

    def __init__(self, hw, videos, patch_size, patch_stride, poses, intrins,
                 mode="average", cache_dir=None):
        # None entries = views whose pixels live on another process
        # (multi-host per-process loading, --shard_views); geometry is
        # still built for them, only images/masks are absent.
        raw_hw = next(v for v in videos if v is not None).shape[1:3]
        super().__init__(hw, len(videos), patch_size, patch_stride, poses,
                         intrins, raw_hw)
        # cache_dir: persist the collapsed images + loopable masks per
        # (view, resolution, mode) — the vid2img collapse and the
        # min/max-tracking mask heuristic are host-CPU work over every
        # frame and dominate dataset construction at production scale
        # (part of the measured ~13 s stage-1 init, EVIDENCE.md §6);
        # resumes/reruns of the same scene skip it entirely.  Guarded by
        # a cheap content checksum so a changed video invalidates.
        self.images = []
        self.masks = []
        for vi, vid in enumerate(videos):
            if vid is None:
                self.images.append(None)
                self.masks.append(None)
                continue
            cpath = None
            if cache_dir:
                tag = np.asarray(vid, np.uint8).reshape(-1)[::100_003]
                chk = int(tag.astype(np.uint64).sum() % (1 << 31))
                cpath = os.path.join(
                    cache_dir, f"s1img_v{vi:02d}_{self.h}x{self.w}"
                               f"_{mode}_{vid.shape[0]}f_{chk}.npz")
                if os.path.exists(cpath):
                    with np.load(cpath) as z:
                        self.images.append(z["img"])
                        self.masks.append(z["mask"])
                    continue
            vid = video_io.resize_video(vid, self.h, self.w)
            vidf = vid.astype(np.float32) / 255.0
            img = video_io.collapse_video(vidf, mode)
            mask = compute_loopable_mask(vidf).astype(np.float32)
            ph, pw = self.pad
            img = np.pad(img, ((0, ph), (0, pw), (0, 0))).astype(np.float32)
            mask = np.pad(mask, ((0, ph), (0, pw)))
            if cpath:
                os.makedirs(cache_dir, exist_ok=True)
                tmp = cpath + ".tmp.npz"
                np.savez(tmp, img=img, mask=mask)
                os.replace(tmp, cpath)
            self.images.append(img)
            self.masks.append(mask)

    def __getitem__(self, item):
        w0, h0, vi, pose, intrin = self.item_geometry(item)
        out = {
            "wh_start": (w0, h0),
            "view": vi,
            "pose": pose,
            "intrin": intrin,
        }
        # rgb/loopmask crops are for tests/bench; the trainer crops on
        # device from the run-resident stacks.  Foreign views under
        # --shard_views (images[vi] is None) yield metadata only.
        if self.images[vi] is not None:
            ph, pw = self.patch_size
            out["rgb"] = self.images[vi][h0:h0 + ph, w0:w0 + pw]
            out["loopmask"] = self.masks[vi][h0:h0 + ph, w0:w0 + pw]
        return out


class VideoPatchDataset(PatchSampler):
    """Stage-2: full-length video crops + a per-view loss config.
    Parity: train_3dvid.py:22-66."""

    def __init__(self, hw, videos, patch_size, patch_stride, poses, intrins,
                 loss_configs):
        # None entries = views whose pixels live on another process
        # (multi-host per-process loading); geometry/metadata is still
        # built for them, only the pixel data is absent.
        raw_hw = next(v for v in videos if v is not None).shape[1:3]
        super().__init__(hw, len(videos), patch_size, patch_stride, poses,
                         intrins, raw_hw)
        assert len(loss_configs) == len(videos)
        self.loss_configs = loss_configs
        ph, pw = self.pad
        self.videos = []
        for vid in videos:
            if vid is None:
                self.videos.append(None)
                continue
            vid = video_io.resize_video(vid, self.h, self.w)
            vid = np.pad(vid, ((0, 0), (0, ph), (0, pw), (0, 0)))
            self.videos.append(vid)   # keep uint8; crop converts

    def __getitem__(self, item):
        # NOTE: no host crop here — the default trainer path crops on
        # device from the level's resident stack and only reads
        # view/wh_start, so slicing+float32-converting the full
        # (F, ph, pw, 3) crop per item (~35 MB/step at production scale)
        # would be pure waste.  --host_crops / tests call get_video().
        w0, h0, vi, pose, intrin = self.item_geometry(item)
        return {
            "wh_start": (w0, h0),
            "view": vi,
            "pose": pose,
            "intrin": intrin,
            "losscfg": self.loss_configs[vi],
        }

    def get_video(self, item_or_view, wh_start=None):
        """Host crop for one item: (F, ph, pw, 3) float32 in [0, 1]."""
        if wh_start is None:
            vi = item_or_view["view"]
            w0, h0 = item_or_view["wh_start"]
        else:
            vi = item_or_view
            w0, h0 = wh_start
        if self.videos[vi] is None:
            raise ValueError(
                f"view {vi}'s pixels were not loaded on this process "
                f"(per-process data loading); only metadata is available")
        ph, pw = self.patch_size
        crop = self.videos[vi][:, h0:h0 + ph, w0:w0 + pw]
        return crop.astype(np.float32) / 255.0
