"""Torch-parity golden tests for the pretrained-metric converters.

The real backbones (torchvision AlexNet, c3d.pickle) are not obtainable
in this environment, so fidelity is proven structurally: deterministic
random weights are saved in the exact torch state-dict formats the
converters consume (`convert_torch_weights`), and the JAX forward passes
are compared against independent torch-side forwards written with
torch.nn.functional following the reference code
(reference evaluations/lpips/lpips.py, pretrained_networks.py,
C3D_model.py).  This pins the converter layout (OIHW/OIDHW, key naming),
the conv/pool geometry (strides, paddings, pool5's (0,1,1) pad), the
scaling layer, and the normalize-eps placement.  The shipped LPIPS
linear heads (reference evaluations/lpips/weights/v0.1/alex.pth) are
used verbatim when present.
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

REF_LIN = "/root/reference/evaluations/lpips/weights/v0.1/alex.pth"

_ALEX = [  # (conv features-index, out_c, in_c, k, stride, pad)
    (0, 64, 3, 11, 4, 2), (3, 192, 64, 5, 1, 2), (6, 384, 192, 3, 1, 1),
    (8, 256, 384, 3, 1, 1), (10, 256, 256, 3, 1, 1)]


def _rand_alex_sd(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for cid, oc, ic, k, _, _ in _ALEX:
        std = (2.0 / (ic * k * k)) ** 0.5
        sd[f"features.{cid}.weight"] = torch.randn(
            (oc, ic, k, k), generator=g) * std
        sd[f"features.{cid}.bias"] = torch.randn((oc,), generator=g) * 0.01
    return sd


def _rand_lin_sd(seed=1):
    g = torch.Generator().manual_seed(seed)
    return {f"lin{i}.model.1.weight":
            torch.rand((1, c, 1, 1), generator=g) * 0.5
            for i, c in enumerate([64, 192, 384, 256, 256])}


def _torch_lpips(alex_sd, lin_sd, a, b):
    """Reference LPIPS forward in torch (lpips.py:140-230 semantics)."""
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def feats(x):
        h = (x - shift) / scale
        out = []
        for i, (cid, *_rest, s, p) in enumerate(_ALEX):
            h = F.conv2d(h, alex_sd[f"features.{cid}.weight"],
                         alex_sd[f"features.{cid}.bias"], stride=s,
                         padding=p)
            h = F.relu(h)
            out.append(h)
            if i in (0, 1):
                h = F.max_pool2d(h, 3, 2)
        return out

    fa, fb = feats(a), feats(b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / (torch.sqrt(torch.sum(xa ** 2, 1, keepdim=True)) + 1e-10)
        nb = xb / (torch.sqrt(torch.sum(xb ** 2, 1, keepdim=True)) + 1e-10)
        diff = (na - nb) ** 2
        proj = (diff * lin_sd[f"lin{i}.model.1.weight"]).sum(
            1, keepdim=True)
        total = total + proj.mean([2, 3], keepdim=True)
    return total[:, 0, 0, 0]


def test_lpips_converter_matches_torch(tmp_path):
    from videoloop3d_tpu.eval.lpips import LPIPS, convert_torch_weights

    alex_sd = _rand_alex_sd()
    if os.path.exists(REF_LIN):
        lin_sd = torch.load(REF_LIN, map_location="cpu")
    else:
        lin_sd = _rand_lin_sd()
    alex_pth = str(tmp_path / "alex_backbone.pth")
    lin_pth = str(tmp_path / "lin.pth")
    torch.save(alex_sd, alex_pth)
    torch.save(lin_sd, lin_pth)
    npz = str(tmp_path / "lpips.npz")
    convert_torch_weights(alex_pth, lin_pth, npz)
    net = LPIPS(weights_path=npz)
    assert net.available

    g = torch.Generator().manual_seed(7)
    a = torch.rand((2, 3, 64, 64), generator=g) * 2 - 1
    b = torch.rand((2, 3, 64, 64), generator=g) * 2 - 1
    want = _torch_lpips(alex_sd, lin_sd, a, b).numpy()
    got = net(a.numpy(), b.numpy())
    assert np.allclose(got, want, rtol=1e-4, atol=1e-5), (got, want)
    # distances behave like a metric: d(a,a) = 0 <= d(a,b)
    assert np.allclose(net(a.numpy(), a.numpy()), 0, atol=1e-6)


_VGG = [  # (features idx, out_c, in_c)
    (0, 64, 3), (2, 64, 64), (5, 128, 64), (7, 128, 128),
    (10, 256, 128), (12, 256, 256), (14, 256, 256),
    (17, 512, 256), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512)]
_VGG_POOL_BEFORE = {5, 10, 17, 24}
_VGG_TAPS = {2, 7, 14, 21, 28}

_SQUEEZE_FIRES = [  # (features idx, in_c, squeeze_c, expand_c)
    (3, 64, 16, 64), (4, 128, 16, 64), (6, 128, 32, 128),
    (7, 256, 32, 128), (9, 256, 48, 192), (10, 384, 48, 192),
    (11, 384, 64, 256), (12, 512, 64, 256)]


def _rand_vgg_sd(seed=4):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for cid, oc, ic in _VGG:
        std = (2.0 / (ic * 9)) ** 0.5
        sd[f"features.{cid}.weight"] = torch.randn(
            (oc, ic, 3, 3), generator=g) * std
        sd[f"features.{cid}.bias"] = torch.randn((oc,), generator=g) * 0.01
    return sd


def _rand_squeeze_sd(seed=5):
    g = torch.Generator().manual_seed(seed)
    sd = {"features.0.weight": torch.randn((64, 3, 3, 3), generator=g)
          * (2.0 / 27) ** 0.5,
          "features.0.bias": torch.randn((64,), generator=g) * 0.01}
    for fid, ic, sc, ec in _SQUEEZE_FIRES:
        sd[f"features.{fid}.squeeze.weight"] = torch.randn(
            (sc, ic, 1, 1), generator=g) * (2.0 / ic) ** 0.5
        sd[f"features.{fid}.squeeze.bias"] = torch.randn(
            (sc,), generator=g) * 0.01
        sd[f"features.{fid}.expand1x1.weight"] = torch.randn(
            (ec, sc, 1, 1), generator=g) * (2.0 / sc) ** 0.5
        sd[f"features.{fid}.expand1x1.bias"] = torch.randn(
            (ec,), generator=g) * 0.01
        sd[f"features.{fid}.expand3x3.weight"] = torch.randn(
            (ec, sc, 3, 3), generator=g) * (2.0 / (sc * 9)) ** 0.5
        sd[f"features.{fid}.expand3x3.bias"] = torch.randn(
            (ec,), generator=g) * 0.01
    return sd


def _torch_feats_vgg(sd, x):
    h = x
    out = []
    for cid, *_ in _VGG:
        if cid in _VGG_POOL_BEFORE:
            h = F.max_pool2d(h, 2, 2)
        h = F.relu(F.conv2d(h, sd[f"features.{cid}.weight"],
                            sd[f"features.{cid}.bias"], padding=1))
        if cid in _VGG_TAPS:
            out.append(h)
    return out


def _torch_feats_squeeze(sd, x):
    h = F.relu(F.conv2d(x, sd["features.0.weight"],
                        sd["features.0.bias"], stride=2))
    out = [h]
    for i, (fid, *_rest) in enumerate(_SQUEEZE_FIRES):
        if i in (0, 2, 4):
            h = F.max_pool2d(h, 3, 2, ceil_mode=True)
        sq = F.relu(F.conv2d(h, sd[f"features.{fid}.squeeze.weight"],
                             sd[f"features.{fid}.squeeze.bias"]))
        e1 = F.relu(F.conv2d(sq, sd[f"features.{fid}.expand1x1.weight"],
                             sd[f"features.{fid}.expand1x1.bias"]))
        e3 = F.relu(F.conv2d(sq, sd[f"features.{fid}.expand3x3.weight"],
                             sd[f"features.{fid}.expand3x3.bias"],
                             padding=1))
        h = torch.cat([e1, e3], 1)
        if i in (1, 3, 4, 5, 6, 7):
            out.append(h)
    return out


def _torch_lpips_from_feats(feats_fn, sd, lin_sd, a, b, n_lin):
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
    fa = feats_fn(sd, (a - shift) / scale)
    fb = feats_fn(sd, (b - shift) / scale)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / (torch.sqrt(torch.sum(xa ** 2, 1, keepdim=True)) + 1e-10)
        nb = xb / (torch.sqrt(torch.sum(xb ** 2, 1, keepdim=True)) + 1e-10)
        diff = (na - nb) ** 2
        proj = (diff * lin_sd[f"lin{i}.model.1.weight"]).sum(1,
                                                             keepdim=True)
        total = total + proj.mean([2, 3], keepdim=True)
    return total[:, 0, 0, 0]


@pytest.mark.parametrize("net,chns", [
    ("vgg", [64, 128, 256, 512, 512]),
    ("squeeze", [64, 128, 256, 384, 384, 512, 512])])
def test_lpips_vgg_squeeze_converters_match_torch(tmp_path, net, chns):
    """The vgg16 / squeezenet1.1 backbones (ref
    pretrained_networks.py:6-130) match an independent torch forward."""
    from videoloop3d_tpu.eval.lpips import LPIPS, convert_torch_weights
    sd = _rand_vgg_sd() if net == "vgg" else _rand_squeeze_sd()
    g = torch.Generator().manual_seed(8)
    lin_sd = {f"lin{i}.model.1.weight":
              torch.rand((1, c, 1, 1), generator=g) * 0.5
              for i, c in enumerate(chns)}
    bpth = str(tmp_path / "backbone.pth")
    lpth = str(tmp_path / "lin.pth")
    torch.save(sd, bpth)
    torch.save(lin_sd, lpth)
    npz = str(tmp_path / f"lpips_{net}.npz")
    convert_torch_weights(bpth, lpth, npz, net=net)
    lp = LPIPS(weights_path=npz)
    assert lp.available and lp.net == net

    # 65x65: odd size exercises squeeze's ceil-mode pools
    a = torch.rand((2, 3, 65, 65), generator=g) * 2 - 1
    b = torch.rand((2, 3, 65, 65), generator=g) * 2 - 1
    feats = _torch_feats_vgg if net == "vgg" else _torch_feats_squeeze
    want = _torch_lpips_from_feats(feats, sd, lin_sd, a, b,
                                   len(chns)).numpy()
    got = lp(a.numpy(), b.numpy())
    assert np.allclose(got, want, rtol=1e-4, atol=1e-5), (got, want)
    assert np.allclose(lp(a.numpy(), a.numpy()), 0, atol=1e-6)


_C3D_LAYERS = [  # (name, in_c, out_c, pool, pool_pad)
    ("conv1", 3, 64, (1, 2, 2), 0), ("conv2", 64, 128, (2, 2, 2), 0),
    ("conv3a", 128, 256, None, 0), ("conv3b", 256, 256, (2, 2, 2), 0),
    ("conv4a", 256, 512, None, 0), ("conv4b", 512, 512, (2, 2, 2), 0),
    ("conv5a", 512, 512, None, 0),
    ("conv5b", 512, 512, (2, 2, 2), (0, 1, 1))]


def _rand_c3d_sd(seed=2):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for name, ic, oc, _, _ in _C3D_LAYERS:
        std = (2.0 / (ic * 27)) ** 0.5
        sd[f"{name}.weight"] = torch.randn((oc, ic, 3, 3, 3),
                                           generator=g) * std
        sd[f"{name}.bias"] = torch.randn((oc,), generator=g) * 0.01
    return sd


def _torch_c3d(sd, x):
    """Reference conv-only C3D forward (C3D_model.py:41-60)."""
    h = x
    for name, _, _, pool, ppad in _C3D_LAYERS:
        h = F.relu(F.conv3d(h, sd[f"{name}.weight"], sd[f"{name}.bias"],
                            padding=1))
        if pool is not None:
            h = F.max_pool3d(h, pool, pool, padding=ppad)
    return h


def test_c3d_converter_matches_torch(tmp_path):
    from videoloop3d_tpu.eval import svfid as S

    sd = _rand_c3d_sd()
    pth = str(tmp_path / "c3d.pickle")
    torch.save(sd, pth)
    npz = str(tmp_path / "c3d.npz")
    S.convert_torch_weights(pth, npz)
    net = S.C3DFeatures(weights_path=npz)
    assert net.available

    g = torch.Generator().manual_seed(9)
    x = torch.rand((1, 3, 16, 32, 32), generator=g) * 255
    want = _torch_c3d(sd, x).numpy()
    got = net(x.numpy())
    assert got.shape == want.shape, (got.shape, want.shape)
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 1e-4

    # end-to-end SVFID parity: same features -> same Fréchet pipeline
    # (>= 48 frames so the temporal feature axis survives the 4 temporal
    # pools with N > 1 for the covariance, like the reference's 50-frame
    # clips)
    f = torch.rand((48, 32, 32, 3), generator=g) * 255
    t = torch.rand((48, 32, 32, 3), generator=g) * 255
    v = S.svfid(net, f.numpy(), t.numpy())
    assert np.isfinite(v) and v >= 0

    def ref_feat(vid):
        z = _torch_c3d(sd, vid.permute(3, 0, 1, 2)[None])
        z = z[0, :50].permute(2, 3, 1, 0).flatten(0, 1).numpy()
        return z

    fs, ts = ref_feat(f), ref_feat(t)

    def mean_cov(p):
        mu = p.mean(1)
        d = p - mu[:, None]
        return mu, np.einsum("bnd,bne->bde", d, d) / (p.shape[1] - 1)

    want_v = float(S.batched_frechet(*mean_cov(fs), *mean_cov(ts)).mean())
    assert np.isclose(v, want_v, rtol=1e-3), (v, want_v)
