"""LPIPS / C3D-SVFID forward graphs exercised with synthetic weights
(the real pretrained weights are not shippable offline; these tests pin
the architecture and the gating behavior)."""
import os

import numpy as np
import pytest

from videoloop3d_tpu.eval import lpips as L
from videoloop3d_tpu.eval import svfid as S


def _fake_lpips_weights(path):
    rng = np.random.default_rng(0)
    out = {}
    in_c = 3
    chans = [64, 192, 384, 256, 256]
    ksz = [11, 5, 3, 3, 3]
    for i, (oc, k) in enumerate(zip(chans, ksz)):
        out[f"conv{i}/w"] = rng.normal(
            0, 0.05, (oc, in_c, k, k)).astype(np.float32)
        out[f"conv{i}/b"] = np.zeros(oc, np.float32)
        in_c = oc
    for i, oc in enumerate(chans):
        out[f"lin{i}/w"] = np.abs(rng.normal(
            0, 0.1, (1, oc, 1, 1))).astype(np.float32)
    np.savez(path, **out)


def test_lpips_gating_and_forward(tmp_path):
    net = L.LPIPS(weights_path=str(tmp_path / "missing.npz"))
    assert not net.available
    with pytest.raises(RuntimeError):
        net(np.zeros((1, 3, 64, 64)), np.zeros((1, 3, 64, 64)))

    wpath = str(tmp_path / "w.npz")
    _fake_lpips_weights(wpath)
    net = L.LPIPS(weights_path=wpath)
    assert net.available
    rng = np.random.default_rng(1)
    a = rng.random((1, 3, 64, 64)).astype(np.float32) * 2 - 1
    b = rng.random((1, 3, 64, 64)).astype(np.float32) * 2 - 1
    d_same = float(net(a, a)[0])
    d_diff = float(net(a, b)[0])
    assert d_same < 1e-6
    assert d_diff > d_same
    assert np.isfinite(d_diff)

    # the min-over-frames video metric
    vid_a = (rng.random((3, 64, 64, 3)) * 255).astype(np.float32)
    vid_b = np.concatenate([vid_a[1:2], vid_a[0:1], vid_a[2:3]])
    v = L.compute_lpips(net, vid_b, vid_a)   # permuted frames still match
    assert v < 1e-6


def _fake_c3d_weights(path):
    rng = np.random.default_rng(2)
    out = {}
    in_c = 3
    chans = [64, 128, 256, 256, 512, 512, 512, 512]
    for i, oc in enumerate(chans):
        out[f"conv{i}/w"] = rng.normal(
            0, 0.05, (oc, in_c, 3, 3, 3)).astype(np.float32)
        out[f"conv{i}/b"] = np.zeros(oc, np.float32)
        in_c = oc
    np.savez(path, **out)


def test_svfid_gating_and_forward(tmp_path):
    net = S.C3DFeatures(weights_path=str(tmp_path / "missing.npz"))
    assert not net.available

    wpath = str(tmp_path / "c3d.npz")
    _fake_c3d_weights(wpath)
    net = S.C3DFeatures(weights_path=wpath)
    assert net.available
    rng = np.random.default_rng(3)
    # enough frames that the temporal pools leave >1 sample for the
    # per-location covariance (ref uses ~50-frame clips)
    vid = (rng.random((50, 64, 64, 3)) * 255).astype(np.float32)
    vid2 = (rng.random((50, 64, 64, 3)) * 255).astype(np.float32)
    d_same = S.svfid(net, vid, vid)
    d_diff = S.svfid(net, vid, vid2)
    assert np.isfinite(d_diff)
    assert d_same < d_diff


def test_batched_frechet_identity():
    rng = np.random.default_rng(4)
    mu = rng.random((2, 5))
    cov = np.stack([np.eye(5) * 0.3] * 2)
    d = S.batched_frechet(mu, cov, mu, cov)
    assert np.allclose(d, 0, atol=1e-4)   # eps regularizer offsets by ~1e-5


def test_profiler_trace_and_timer(tmp_path):
    import argparse
    import jax.numpy as jnp
    from videoloop3d_tpu.train.common import Profiler
    args = argparse.Namespace(profile_steps="1:3",
                              profile_dir=str(tmp_path / "prof"))
    prof = Profiler(args, str(tmp_path))
    for i in range(5):
        prof.step(i)
        _ = jnp.ones((4, 4)).sum()
        prof.tick()
    prof.close()
    assert prof.steps_per_sec() > 0
    assert os.path.isdir(tmp_path / "prof")
    assert any(os.scandir(tmp_path / "prof"))
