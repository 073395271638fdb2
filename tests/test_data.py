import os

import numpy as np

from videoloop3d_tpu.data import llff, synthetic, patches, video as video_io
from videoloop3d_tpu.data.loopmask import compute_loopable_mask


def test_poses_bounds_roundtrip(tmp_path):
    scene = synthetic.make_scene(n_views=3, h=24, w=32, n_frames=2)
    path = str(tmp_path / "poses_bounds.npy")
    llff.save_poses_bounds(path, scene["poses"], scene["intrins"],
                           scene["bds"], (24, 32))
    poses, bds = llff.load_poses_bounds(str(tmp_path), factor=1)
    assert np.allclose(poses[:, :3, :4], scene["poses"], atol=1e-5)
    assert np.allclose(bds, np.broadcast_to(scene["bds"], bds.shape),
                       atol=1e-6)
    assert np.allclose(poses[:, 2, 4], scene["intrins"][:, 0, 0], atol=1e-4)


def test_load_mv_videos_roundtrip(tmp_path):
    scene = synthetic.make_scene(n_views=2, h=24, w=32, n_frames=3)
    synthetic.write_llff_dir(scene, str(tmp_path), factor=1)
    videos, fps, loaded = llff.load_mv_videos(
        str(tmp_path), factor=1, recenter=False, bd_factor=None)
    assert len(videos) == 2 and videos[0].shape == (3, 24, 32, 3)
    assert loaded["hw"] == (24, 32)
    # translations rescaled by 1/near
    sc = 1.0 / scene["bds"][0]
    assert np.allclose(loaded["poses"][:, :3, 3],
                       scene["poses"][:, :3, 3] * sc, atol=1e-5)
    assert loaded["render_poses"].shape[0] == 120


def test_patch_grid_covers_image():
    origins, pad = patches.patch_grid(36, 64, (16, 16), (15, 15))
    H, W = 36 + pad[0], 64 + pad[1]
    cover = np.zeros((H, W), bool)
    for (w0, h0) in origins:
        cover[h0:h0 + 16, w0:w0 + 16] = True
    assert cover.all()


def test_image_patch_dataset():
    scene = synthetic.make_scene(n_views=2, h=24, w=32, n_frames=4)
    vids = [(v * 255).astype(np.uint8) for v in scene["videos"]]
    ds = patches.ImagePatchDataset(
        (24, 32), vids, (16, 16), (8, 8), scene["poses"], scene["intrins"],
        mode="average")
    assert len(ds) > 0
    item = ds[0]
    assert item["rgb"].shape == (16, 16, 3)
    assert item["loopmask"].shape == (16, 16)
    # intrinsic shifted by patch origin
    item2 = ds[len(ds) // 2]
    w0, h0 = item2["wh_start"]
    assert np.isclose(item2["intrin"][0, 2],
                      ds.intrins[item2["view"]][0, 2] - w0)


def test_video_patch_dataset_and_resize():
    scene = synthetic.make_scene(n_views=2, h=24, w=32, n_frames=4)
    vids = [(v * 255).astype(np.uint8) for v in scene["videos"]]
    cfgs = [{"loss_name": "mse"}, {"loss_name": "gpnn_lm"}]
    ds = patches.VideoPatchDataset(
        (12, 16), vids, (8, 8), (6, 6), scene["poses"], scene["intrins"],
        cfgs)
    item = ds[len(ds) - 1]
    vid = ds.get_video(item)
    assert vid.shape == (4, 8, 8, 3)
    assert vid.dtype == np.float32 and vid.max() <= 1.0
    assert item["losscfg"]["loss_name"] in ("mse", "gpnn_lm")


def test_collapse_modes():
    rng = np.random.default_rng(0)
    vid = rng.random((5, 8, 8, 3)).astype(np.float32)
    for mode in ["average", "median", "first", "dynamic", "dynamic0.5",
                 "blur3"]:
        img = video_io.collapse_video(vid, mode)
        assert img.shape == (8, 8, 3)
        assert np.isfinite(img).all()
    assert np.allclose(video_io.collapse_video(vid, "average"),
                       vid.mean(0), atol=1e-6)
    assert np.allclose(video_io.collapse_video(vid, "first"), vid[0])


def test_loopable_mask_classification():
    """Looping sinusoid -> loopable; monotonic ramp -> not; static -> not."""
    f, h, w = 12, 16, 24
    t = np.arange(f)[:, None, None, None]
    vid = np.zeros((f, h, w, 3), np.float32) + 0.5
    # left third: static. middle: loops. right: monotonic rise.
    vid[:, :, 8:16] = 0.5 + 0.4 * np.sin(2 * np.pi * t / f)
    vid[:, :, 16:] = 0.2 + 0.6 * (t / f)
    mask = compute_loopable_mask(vid)
    assert mask[:, 10:14].mean() > 0.8
    assert mask[:, 0:6].mean() < 0.2
    assert mask[:, 19:].mean() < 0.2


def test_stage1_dataset_cache(tmp_path, monkeypatch):
    """The vid2img/loop-mask disk cache must round-trip exactly and
    skip recomputation on the second construction."""
    import numpy as np
    from videoloop3d_tpu.data import patches as P

    rng = np.random.default_rng(0)
    videos = [(rng.random((4, 12, 16, 3)) * 255).astype(np.uint8)
              for _ in range(2)]
    poses = np.repeat(np.eye(4, dtype=np.float32)[None, :3], 2, 0)
    intr = np.array([[10.0, 0, 8], [0, 10.0, 6], [0, 0, 1]], np.float32)
    intrins = np.repeat(intr[None], 2, 0)
    kw = dict(patch_size=(6, 8), patch_stride=(4, 6), poses=poses,
              intrins=intrins, mode="average")
    cdir = str(tmp_path / "cache")

    d1 = P.ImagePatchDataset((12, 16), videos, cache_dir=cdir, **kw)
    import os
    files = os.listdir(cdir)
    assert len(files) == 2

    calls = []
    real = P.compute_loopable_mask
    monkeypatch.setattr(P, "compute_loopable_mask",
                        lambda v: calls.append(1) or real(v))
    d2 = P.ImagePatchDataset((12, 16), videos, cache_dir=cdir, **kw)
    assert not calls, "cache hit must skip the mask heuristic"
    for a, b in zip(d1.images, d2.images):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(d1.masks, d2.masks):
        np.testing.assert_array_equal(a, b)

    # changed content -> cache miss (checksum in the key)
    videos2 = [v.copy() for v in videos]
    videos2[0][:] = 0
    P.ImagePatchDataset((12, 16), videos2, cache_dir=cdir, **kw)
    assert calls, "changed video must recompute"
