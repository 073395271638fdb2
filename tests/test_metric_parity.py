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
