import numpy as np
import jax
import jax.numpy as jnp

from videoloop3d_tpu.losses import patch_nn as P


def test_extract_patches_shapes_and_values():
    rng = np.random.default_rng(0)
    x = rng.random((3, 5, 8, 9)).astype(np.float32)
    out = np.asarray(P.extract_patches_3d(jnp.asarray(x), (3, 3, 3),
                                          (1, 2, 2)))
    assert out.shape == (3, 3, 4, 3, 3, 3, 3)
    assert np.allclose(out[1, 2, 0], x[:, 1:4, 4:7, 0:3])
    assert np.allclose(out[0, 0, 3], x[:, 0:3, 0:3, 6:9])


def test_fold_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.random((2, 5, 9, 11)).astype(np.float32)
    psz, strides = (3, 3, 3), (2, 2, 2)
    patches = P.extract_patches_3d(jnp.asarray(x), psz, strides)
    folded = np.asarray(P.fold_patches_3d(patches, x.shape[1:], strides))
    weight = P.fold_weight(x.shape[1:], psz, strides)
    assert np.allclose(folded / weight[None], x, atol=1e-5)


def test_fold_weight_matches_bruteforce():
    psz, strides = (3, 5, 5), (1, 2, 2)
    shape = (5, 9, 13)
    w = P.fold_weight(shape, psz, strides)
    ones = jnp.ones((1,) + tuple(
        (P.n_patches(s, p, st) - 1) * st + p
        for s, p, st in zip(shape, psz, strides)))
    patches = P.extract_patches_3d(ones, psz, strides)
    brute = np.asarray(P.fold_patches_3d(patches, shape, strides))[0]
    assert np.allclose(w, brute)


def test_nn_indices_bruteforce_and_alpha():
    rng = np.random.default_rng(2)
    X = rng.random((4, 6, 10)).astype(np.float32)
    Y = rng.random((4, 5, 10)).astype(np.float32)
    nns = np.asarray(P.nn_indices(jnp.asarray(X), jnp.asarray(Y)))
    # brute force
    d = ((X[:, :, None] - Y[:, None]) ** 2).sum(-1) / 10
    assert np.array_equal(nns, d.argmin(-1))
    # alpha normalization changes the answer the documented way
    alpha = 0.01
    colmin = d.min(1, keepdims=True)
    dn = d / (alpha + colmin)
    nns_a = np.asarray(P.nn_indices(jnp.asarray(X), jnp.asarray(Y), alpha))
    assert np.array_equal(nns_a, dn.argmin(-1))


def test_nn_retarget_identity():
    """With y == x every patch's NN is itself -> retarget reproduces x."""
    rng = np.random.default_rng(3)
    x = rng.random((3, 7, 9, 9)).astype(np.float32)
    psz, strides = (3, 3, 3), (2, 2, 2)
    y2x = np.asarray(P.nn_retarget(jnp.asarray(x), jnp.asarray(x), psz,
                                   strides))
    weight = P.fold_weight(x.shape[1:], psz, strides)
    assert np.allclose(y2x / weight[None], x, atol=1e-5)


def test_robust_lossfun_matches_reference_formula():
    x = np.linspace(-2, 2, 9, dtype=np.float32)
    for rou, scale in [("mse", 0.2), ("abs", 0.2), (0, 0.2), (2, 0.1),
                       (-2, 0.1), (1, 0.3)]:
        got = np.asarray(P.robust_lossfun(jnp.asarray(x), rou, scale))
        # reference formula (utils_vid.py:10-26) in numpy
        if rou == "mse":
            want = x ** 2
        elif rou == "abs":
            want = np.abs(x)
        else:
            r = float(rou)
            z = (x / scale) ** 2
            if r == 0:
                want = np.log1p(z * 0.5)
            elif r == 2:
                want = 0.5 * z
            else:
                b = abs(r - 2) + 1e-6
                d = r + 1e-6 if r >= 0 else r - 1e-6
                want = (b / d) * ((z / b + 1) ** (0.5 * d) - 1) * scale * 10
        assert np.allclose(got, want, rtol=1e-4), rou


def test_gpnn_lowmem_identity_is_zero():
    rng = np.random.default_rng(4)
    x = rng.random((3, 6, 20, 24)).astype(np.float32)
    loss = P.gpnn_lowmem_loss(jnp.asarray(x), jnp.asarray(x),
                              patch_size=3, patcht_size=3, stride=2,
                              stridet=1, alpha=1e10, rou="mse",
                              macro_block=12)
    assert float(loss) < 1e-8


def test_gpnn_lowmem_prefers_matching_video():
    """Retargeting toward a shuffled version of x costs less than toward
    an unrelated video."""
    rng = np.random.default_rng(5)
    x = rng.random((3, 6, 16, 16)).astype(np.float32)
    y_near = x + rng.normal(scale=0.01, size=x.shape).astype(np.float32)
    y_far = rng.random((3, 6, 16, 16)).astype(np.float32)
    kw = dict(patch_size=3, patcht_size=3, stride=2, stridet=1,
              alpha=1e10, rou="mse", macro_block=12)
    l_near = float(P.gpnn_lowmem_loss(jnp.asarray(x), jnp.asarray(y_near),
                                      **kw))
    l_far = float(P.gpnn_lowmem_loss(jnp.asarray(x), jnp.asarray(y_far),
                                     **kw))
    assert l_near < l_far


def test_gpnn_gradient_flows_only_through_render():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((3, 6, 16, 16)).astype(np.float32))
    y = jnp.asarray(rng.random((3, 6, 16, 16)).astype(np.float32))

    def loss(x_):
        return P.gpnn_lowmem_loss(x_, y, patch_size=3, patcht_size=3,
                                  stride=2, stridet=1, alpha=1e10,
                                  rou=0, scaling=0.2, macro_block=12)
    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_gpnn_downsample_reduces_to_lowmem_and_runs():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((3, 6, 24, 24)).astype(np.float32))
    y = jnp.asarray(rng.random((3, 6, 24, 24)).astype(np.float32))
    kw = dict(patch_size=3, patcht_size=3, stride=2, stridet=1,
              alpha=1e10, rou="mse", macro_block=12)
    l1 = float(P.gpnn_downsample_loss(x, y, factor=1, **kw))
    l_lm = float(P.gpnn_lowmem_loss(x, y, **kw))
    assert np.isclose(l1, l_lm)
    l2 = float(P.gpnn_downsample_loss(x, y, factor=2, **kw))
    assert np.isfinite(l2) and l2 > 0


def _numpy_gpnn_down(x, y, p, pt, s, st, macro, f, rou, scaling):
    """Literal numpy port of the INTENDED reference gpnn_down algorithm
    (ref utils_vid.py:352-434: macro-block loop, low-res brute-force NN
    per spatial column, repeat_interleave index upsampling :245-248,
    same-size full-res patch gather, overlap-add fold), written with
    plain loops and no shared helpers from the implementation."""
    C, Tx, H, W = x.shape
    hd, wd = H // f, W // f
    fit = lambda n, pp, ss: (n - pp) // ss * ss + pp
    fhd, fwd = fit(hd, p, s), fit(wd, p, s)
    ftx, fty = fit(Tx, pt, st), fit(y.shape[1], pt, st)
    fh, fw = fhd * f, fwd * f
    xs, ys = x[:, :ftx, :fh, :fw], y[:, :fty, :fh, :fw]
    x_down = np.asarray(jax.image.resize(
        jnp.asarray(xs), (C, ftx, fhd, fwd), "linear"))
    y_down = np.asarray(jax.image.resize(
        jnp.asarray(ys), (C, fty, fhd, fwd), "linear"))
    macro = min(fit(macro, p, s), fhd, fwd)
    mstride = macro - p + s
    starts = lambda n: sorted({min(st0, n - macro)
                               for st0 in range(0, n - macro + mstride,
                                                mstride)})
    nL = (macro - p) // s + 1
    span = (nL * f - 1) * s + p
    off = (p * (f - 1)) // 2
    ntx = (ftx - pt) // st + 1
    nty = (fty - pt) // st + 1
    y2x = np.zeros((C, ftx, fh, fw))
    wsum = np.zeros((ftx, fh, fw))
    for h0 in starts(fhd):
        for w0 in starts(fwd):
            hF = min(h0 * f + off, fh - span)
            wF = min(w0 * f + off, fw - span)
            for ih in range(nL * f):
                for iw in range(nL * f):
                    # low-res parent column
                    lh, lw = h0 + (ih // f) * s, w0 + (iw // f) * s
                    for it in range(ntx):
                        xp = x_down[:, it * st:it * st + pt,
                                    lh:lh + p, lw:lw + p]
                        best, bd = 0, np.inf
                        for jt in range(nty):
                            yp = y_down[:, jt * st:jt * st + pt,
                                        lh:lh + p, lw:lw + p]
                            d = np.mean((xp - yp) ** 2)
                            if d < bd:
                                bd, best = d, jt
                        gh, gw = hF + ih * s, wF + iw * s
                        y2x[:, it * st:it * st + pt, gh:gh + p,
                            gw:gw + p] += ys[:, best * st:best * st + pt,
                                             gh:gh + p, gw:gw + p]
                        wsum[it * st:it * st + pt, gh:gh + p,
                             gw:gw + p] += 1
    mask = wsum > 0
    out = y2x / np.clip(wsum, 1e-10, None)[None]
    diff = (xs - out) * mask[None]
    rl = np.asarray(P.robust_lossfun(jnp.asarray(diff), rou, scaling))
    return float(rl.sum() / (mask.sum() * C))


def test_gpnn_downsample_matches_numpy_port():
    """The repeat_interleave index-upsampling implementation equals a
    literal loop-based numpy port, single- and multi-crop."""
    rng = np.random.default_rng(11)
    x = rng.random((3, 5, 16, 16)).astype(np.float32)
    y = rng.random((3, 5, 16, 16)).astype(np.float32)
    for macro in (7, 32):          # multi-crop and single-crop paths
        want = _numpy_gpnn_down(x, y, p=3, pt=3, s=2, st=1, macro=macro,
                                f=2, rou="mse", scaling=0.2)
        got = float(P.gpnn_downsample_loss(
            jnp.asarray(x), jnp.asarray(y), patch_size=3, patcht_size=3,
            stride=2, stridet=1, alpha=1e10, rou="mse", scaling=0.2,
            macro_block=macro, factor=2))
        assert np.isclose(got, want, rtol=1e-4), (macro, got, want)


def test_mse_and_avg_losses():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.random((3, 5, 8, 8)).astype(np.float32))
    y = jnp.asarray(rng.random((3, 7, 8, 8)).astype(np.float32))
    assert float(P.video_mse_loss(x, x)) == 0
    assert float(P.video_mse_loss(x, y)) > 0
    assert float(P.video_avg_loss(x, x)) == 0


def test_swd_loss_runs_and_discriminates():
    from videoloop3d_tpu.losses.swd import swd_3d_loss
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((3, 6, 16, 16)).astype(np.float32))
    y = jnp.asarray(rng.random((3, 6, 16, 16)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    kw = dict(patch_size=3, patcht_size=3, stride=1, stridet=1, num_proj=32)
    l_same = float(swd_3d_loss(x, x, key, **kw))
    l_diff = float(swd_3d_loss(x, y, key, **kw))
    assert l_same < 1e-6
    assert l_diff > l_same


def test_swd_mask_duplication():
    """Mask-weighted SWD (ref utils_vid.py:186-194): masked target
    patches are duplicated into the matched distribution."""
    from videoloop3d_tpu.losses.swd import swd_3d_loss, mask_patch_columns
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((3, 4, 12, 12)).astype(np.float32))
    # y differs from x ONLY inside the masked window
    y_np = np.asarray(x).copy()
    mask = np.zeros((12, 12), np.float32)
    mask[2:7, 2:7] = 1
    y_np[:, :, 2:7, 2:7] = rng.random((3, 4, 5, 5)).astype(np.float32)
    y = jnp.asarray(y_np)
    key = jax.random.PRNGKey(1)
    kw = dict(patch_size=3, patcht_size=3, stride=1, stridet=1,
              num_proj=64)

    # factor 1 == no-mask matmul-branch baseline
    l1 = float(swd_3d_loss(x, y, key, mask=mask, mask_patches_factor=1,
                           **kw))
    l3 = float(swd_3d_loss(x, y, key, mask=mask, mask_patches_factor=3,
                           **kw))
    # duplicating the (mismatching) masked patches increases the loss
    assert l3 > l1, (l1, l3)

    # duplicating the WHOLE set leaves the sorted distribution intact
    full = np.ones((12, 12), np.float32)
    lf1 = float(swd_3d_loss(x, y, key, mask=full, mask_patches_factor=1,
                            **kw))
    lf3 = float(swd_3d_loss(x, y, key, mask=full, mask_patches_factor=3,
                            **kw))
    assert abs(lf1 - lf3) < 1e-5, (lf1, lf3)

    # the column selector matches a brute-force patch scan
    sel = mask_patch_columns(mask, 3, 3, 1, 1, n_frames=4)
    T, H, W = 4, 12, 12
    cf, ch, cw = (T - 3) + 1, (H - 3) + 1, (W - 3) + 1
    k = 0
    for f in range(cf):
        for i in range(ch):
            for j in range(cw):
                assert sel[k] == mask[i:i + 3, j:j + 3].any(), (f, i, j)
                k += 1


def test_ssim_distance_nn():
    """ssim patch distance: identical patches are nearest; a
    contrast-matched but shifted-mean patch ranks worse than under mse."""
    rng = np.random.default_rng(10)
    base = rng.random((1, 4, 27)).astype(np.float32)
    X = base
    # candidates: [exact copy, mean-shifted copy, noise]
    Y = np.concatenate([base + 0.5, base,
                        rng.random((1, 4, 27)).astype(np.float32)],
                       axis=1)
    nns = np.asarray(P.nn_indices(jnp.asarray(X), jnp.asarray(Y),
                                  dist_fn="ssim"))
    assert np.all(nns == np.arange(4, 8)), nns    # exact copies win

    loss = P.gpnn_lowmem_loss(
        jnp.asarray(rng.random((3, 6, 16, 16)).astype(np.float32)),
        jnp.asarray(rng.random((3, 6, 16, 16)).astype(np.float32)),
        patch_size=3, patcht_size=3, stride=2, stridet=1, alpha=1e10,
        rou="mse", macro_block=12, dist_fn="ssim")
    assert np.isfinite(float(loss))


def test_flat_extract_and_fold_match_reshape_path():
    """The conv-based flat extract/fold must equal the reshape-based
    reference implementations (channel ordering (C, dt, dy, dx))."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((3, 6, 13, 15)).astype(np.float32))
    psz, strides = (3, 5, 5), (1, 2, 2)
    ref = np.asarray(P.extract_patches_3d(x, psz, strides))
    nt, nh, nw = ref.shape[:3]
    flat = np.asarray(P.extract_patches_flat(x, psz, strides))
    assert flat.shape == (nt, nh, nw, 3 * 3 * 5 * 5)
    assert np.allclose(flat, ref.reshape(nt, nh, nw, -1), atol=1e-6)

    folded_ref = np.asarray(P.fold_patches_3d(
        jnp.asarray(ref), x.shape[1:], strides))
    folded_flat = np.asarray(P.fold_patches_flat(
        jnp.asarray(flat), 3, psz, strides))
    assert np.allclose(folded_flat, folded_ref, atol=1e-5)


def test_matmul_extract_and_fold_match_conv_path():
    """The banded-matmul extract/fold (the wide-patch TPU path) must be
    bit-exact vs the identity-kernel conv formulation, including
    uneven strides and pt=1 frame patches."""
    rng = np.random.default_rng(13)
    for psz, strides, shape in [
            ((3, 5, 5), (1, 2, 2), (3, 6, 13, 15)),
            ((3, 11, 11), (1, 4, 4), (3, 8, 23, 27)),
            ((1, 7, 7), (1, 3, 3), (4, 5, 16, 19)),
    ]:
        x = jnp.asarray(rng.random(shape).astype(np.float32))
        C = shape[0]
        conv = np.asarray(P.extract_patches_flat(x, psz, strides,
                                                 via="conv"))
        mm = np.asarray(P.extract_patches_flat(x, psz, strides,
                                               via="matmul"))
        assert mm.shape == conv.shape
        assert np.allclose(mm, conv, atol=1e-6), (psz, strides)

        pat = jnp.asarray(conv)
        f_conv = np.asarray(P.fold_patches_flat(pat, C, psz, strides,
                                                via="conv"))
        f_mm = np.asarray(P.fold_patches_flat(pat, C, psz, strides,
                                              via="matmul"))
        assert np.allclose(f_mm, f_conv, atol=1e-5), (psz, strides)


def test_matmul_fold_bf16_accumulates_f32():
    """bf16 patches must fold through the matmul path with f32
    accumulation (exact sum of the bf16 values, like the conv path)."""
    rng = np.random.default_rng(17)
    psz, strides = (3, 11, 11), (1, 4, 4)
    x = jnp.asarray(rng.random((3, 6, 23, 23)).astype(np.float32))
    pat = P.extract_patches_flat(x, psz, strides, via="conv")
    pb = pat.astype(jnp.bfloat16)
    f_mm = P.fold_patches_flat(pb, 3, psz, strides, via="matmul")
    assert f_mm.dtype == jnp.float32
    f_ref = np.asarray(P.fold_patches_flat(
        pb.astype(jnp.float32), 3, psz, strides, via="conv"))
    assert np.allclose(np.asarray(f_mm), f_ref, atol=1e-6)

    # bf16 extraction stays bf16 (selection is exact per element)
    xb = x.astype(jnp.bfloat16)
    e_mm = P.extract_patches_flat(xb, psz, strides, via="matmul")
    assert e_mm.dtype == jnp.bfloat16
    e_ref = np.asarray(P.extract_patches_flat(
        xb.astype(jnp.float32), psz, strides, via="conv"))
    assert np.array_equal(np.asarray(e_mm, np.float32), e_ref)


def test_nn_bf16_close_to_f32():
    """nn_bf16 runs the stop-gradient NN retarget in bf16; the loss and
    its gradient must stay close to the f32 path (same argmins on
    well-separated patches, target quantized ~1e-3)."""
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.random((3, 8, 20, 20)).astype(np.float32))
    y = jnp.asarray(rng.random((3, 8, 20, 20)).astype(np.float32))
    kw = dict(patch_size=5, patcht_size=3, stride=2, stridet=1,
              alpha=1e10, rou="mse", macro_block=12)
    l32, g32 = jax.value_and_grad(
        lambda a: P.gpnn_lowmem_loss(a, y, **kw))(x)
    l16, g16 = jax.value_and_grad(
        lambda a: P.gpnn_lowmem_loss(a, y, nn_bf16=True, **kw))(x)
    assert np.isfinite(float(l16))
    assert abs(float(l16) - float(l32)) < 3e-3 * max(float(l32), 1e-6)
    assert np.allclose(np.asarray(g16), np.asarray(g32), atol=2e-3)


def test_fast_nn_dist_matches_direct():
    """--fast_nn_dist (temporally-decomposed NN retarget) must match the
    direct formulation: same NN targets and fold, with and without the
    alpha completeness normalization, for stridet 1 and 2."""
    rng = np.random.default_rng(21)
    C, T, H, W = 3, 9, 17, 19
    base = rng.random((C, 1, H, W), dtype=np.float32)
    x = (base + 0.15 * rng.random((C, T, H, W))).astype(np.float32)
    y = (np.roll(x, 3, axis=1)
         + 0.03 * rng.random((C, T, H, W))).astype(np.float32)
    for pt, st in ((3, 1), (4, 2)):
        psz, strides = (pt, 3, 3), (st, 2, 2)
        fh = P.fit_patch_size(H, 3, 2)
        fw = P.fit_patch_size(W, 3, 2)
        ft = P.fit_patch_size(T, pt, st)
        xs = x[:, :ft, :fh, :fw]
        ys = y[:, :ft, :fh, :fw]
        for alpha in (None, 10000.0):
            want = np.asarray(P.nn_retarget(
                jnp.asarray(xs), jnp.asarray(ys), psz, strides, alpha))
            got = np.asarray(P.nn_retarget(
                jnp.asarray(xs), jnp.asarray(ys), psz, strides, alpha,
                fast_nn_dist=True))
            assert np.allclose(got, want, atol=2e-5), (
                pt, st, alpha, np.abs(got - want).max())
