"""Frame-parallel sharding must reproduce the single-device step."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from videoloop3d_tpu.parallel.mesh import make_mesh
from videoloop3d_tpu.parallel.fp_step import (make_fp_stage2_step,
                                              sharded_gpnn_lowmem)
from videoloop3d_tpu.train.stage2 import make_stage2_step
from videoloop3d_tpu.losses import patch_nn as pnl
from tests.test_parallel import _tiny_mpv, _patch_batch, LOSSCFG


def _single_loss(x, y, alpha, pad):
    x_pad = jnp.concatenate([x, x[:, :pad]], axis=1)
    return pnl.gpnn_lowmem_loss(
        x_pad, y, patch_size=LOSSCFG["patch_size"],
        patcht_size=LOSSCFG["patcht_size"], stride=LOSSCFG["stride"],
        stridet=1, alpha=1e10 if alpha is None else alpha,
        rou=LOSSCFG["rou"], scaling=LOSSCFG["scaling"],
        macro_block=LOSSCFG["macro_block"])


def test_sharded_gpnn_matches_single_device():
    """The ring-halo'd, fold-spilled, pad-wrapped sharded loss equals the
    single-device loop-padded gpnn_lm loss."""
    rng = np.random.default_rng(0)
    F, h, w = 8, 20, 24
    x = rng.random((3, F, h, w)).astype(np.float32)
    y = rng.random((3, F, h, w)).astype(np.float32)
    pad = LOSSCFG["patcht_size"] - 1

    for alpha in (None, 0.01):
        want = float(_single_loss(jnp.asarray(x), jnp.asarray(y), alpha,
                                  pad))
        for S in (2, 4):
            mesh = make_mesh(n_dp=1, n_fp=S)

            def worker(xl, yl):
                return sharded_gpnn_lowmem(
                    xl, yl, patch_size=LOSSCFG["patch_size"],
                    patcht_size=LOSSCFG["patcht_size"],
                    stride=LOSSCFG["stride"], alpha=alpha,
                    rou=LOSSCFG["rou"], scaling=LOSSCFG["scaling"],
                    macro_block=LOSSCFG["macro_block"], fp_size=S,
                    frm_num=F)

            mapped = jax.shard_map(
                worker, mesh=mesh,
                in_specs=(P(None, "fp"), P()), out_specs=P(),
                check_vma=False)
            got = float(jax.jit(mapped)(jnp.asarray(x),
                                        jnp.asarray(y)))
            assert np.isclose(got, want, rtol=2e-4), (S, alpha, got, want)


def test_sharded_swd_matches_single_device():
    """The all-gathered frame-sharded swd equals the single-device
    loop-padded swd_3d_loss: value AND gradient (gradients flow through
    the halo ppermute + all_gather)."""
    from videoloop3d_tpu.losses.swd import swd_3d_loss
    from videoloop3d_tpu.parallel.fp_step import sharded_swd
    rng = np.random.default_rng(2)
    F, h, w = 8, 20, 24
    x = rng.random((3, F, h, w)).astype(np.float32)
    y = rng.random((3, F, h, w)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    kw = dict(patch_size=5, patcht_size=3, stride=2, stridet=1,
              num_proj=16)
    pad = kw["patcht_size"] - 1

    def single(xv):
        x_pad = jnp.concatenate([xv, xv[:, :pad]], axis=1)
        return swd_3d_loss(x_pad, jnp.asarray(y), key, **kw)

    want, want_g = jax.value_and_grad(single)(jnp.asarray(x))

    for S in (2, 4):
        mesh = make_mesh(n_dp=1, n_fp=S)

        def worker(xl, yl):
            return sharded_swd(xl, yl, key, fp_size=S, frm_num=F, **kw)

        mapped = jax.jit(jax.shard_map(
            worker, mesh=mesh, in_specs=(P(None, "fp"), P()),
            out_specs=P(), check_vma=False))
        got, got_g = jax.value_and_grad(
            lambda xv: mapped(xv, jnp.asarray(y)))(jnp.asarray(x))
        assert np.isclose(float(got), float(want), rtol=2e-5), (S, got,
                                                                want)
        assert np.allclose(np.asarray(got_g), np.asarray(want_g),
                           atol=1e-5), S


def test_sharded_gpnn_direct_matches_single_device():
    """loss_name='gpnn' under fp sharding (macro_block=None -> one
    full-rectangle crop) equals the single-device gpnn_direct_loss."""
    rng = np.random.default_rng(1)
    F, h, w = 8, 15, 24
    x = rng.random((3, F, h, w)).astype(np.float32)
    y = rng.random((3, F, h, w)).astype(np.float32)
    pad = LOSSCFG["patcht_size"] - 1
    x_pad = jnp.concatenate([jnp.asarray(x), jnp.asarray(x[:, :pad])],
                            axis=1)
    want = float(pnl.gpnn_direct_loss(
        x_pad, jnp.asarray(y), patch_size=LOSSCFG["patch_size"],
        patcht_size=LOSSCFG["patcht_size"], stride=LOSSCFG["stride"],
        stridet=1, alpha=1e10, rou=LOSSCFG["rou"],
        scaling=LOSSCFG["scaling"]))

    S = 4
    mesh = make_mesh(n_dp=1, n_fp=S)

    def worker(xl, yl):
        return sharded_gpnn_lowmem(
            xl, yl, patch_size=LOSSCFG["patch_size"],
            patcht_size=LOSSCFG["patcht_size"], stride=LOSSCFG["stride"],
            alpha=None, rou=LOSSCFG["rou"], scaling=LOSSCFG["scaling"],
            macro_block=None, fp_size=S, frm_num=F)

    mapped = jax.shard_map(worker, mesh=mesh,
                           in_specs=(P(None, "fp"), P()), out_specs=P(),
                           check_vma=False)
    got = float(jax.jit(mapped)(jnp.asarray(x), jnp.asarray(y)))
    assert np.isclose(got, want, rtol=2e-4), (got, want)


def test_fp_step_matches_single_device():
    """Full fp=4 sharded training step == single-device step (SGD)."""
    scene, args, model, params = _tiny_mpv(frm=8)
    args.optimizer = "sgd"
    mesh = make_mesh(n_dp=2, n_fp=4)
    weights = {k: jnp.asarray(0.2, jnp.float32)
               for k in ("sparsity", "rgb_smooth", "a_smooth", "d_smooth",
                         "density")}
    rng = jax.random.PRNGKey(0)
    ext, intr, vids = _patch_batch(scene, 2)
    ext[:] = ext[:1]
    intr[:] = intr[:1]
    vids[:] = vids[:1]

    fp_step, fp_init = make_fp_stage2_step(
        model, args, 24, 32, LOSSCFG, mesh, param_keys=tuple(params))
    p_fp, o_fp, m_fp = fp_step(
        jax.tree.map(jnp.copy, params), fp_init(params),
        {"extrin": jnp.asarray(ext), "intrin": jnp.asarray(intr),
         "video": jnp.asarray(vids)},
        jnp.asarray(0.1), weights, rng)

    single_step, s_init = make_stage2_step(model, args, 24, 32, LOSSCFG)
    p_s, o_s, m_s = single_step(
        jax.tree.map(jnp.copy, params), s_init(params),
        {"extrin": jnp.asarray(ext[:1]), "intrin": jnp.asarray(intr[:1]),
         "video": jnp.asarray(vids[0])},
        jnp.asarray(0.1), weights, rng)

    assert np.isclose(float(m_fp["loss"]), float(m_s["loss"]),
                      rtol=2e-4), (float(m_fp["loss"]), float(m_s["loss"]))
    for k in params:
        a, b = np.asarray(p_fp[k]), np.asarray(p_s[k])
        p0 = np.asarray(params[k])
        if a.size == 0:
            continue
        # tolerance RELATIVE to the update magnitude: a flat absolute
        # atol is blind to uniform gradient mis-scaling when updates are
        # tiny (it hid the fp cotangent S x bug); the residual band
        # covers NN-argmin tie flips between the sharded and single
        # fold, whose few texels get different (not mis-scaled) targets
        upd = np.abs(b - p0).max()
        assert np.abs(a - b).max() < max(0.25 * upd, 1e-7), \
            (k, np.abs(a - b).max(), upd)
        # and the bulk gradient scale must be exactly 1 (median over
        # significant elements)
        if upd == 0.0:
            continue            # no gradient on this param (e.g. verts)
        g_fp = (p0 - a).ravel()
        g_s = (p0 - b).ravel()
        mbig = np.abs(g_s) > np.abs(g_s).max() * 1e-3
        med = np.median(g_fp[mbig] / g_s[mbig])
        assert abs(med - 1.0) < 1e-3, (k, med)


def test_fp_step_swd_trains():
    """loss_name='swd' on an fp mesh: the full sharded step runs and
    reduces the loss (value/grad parity is covered patch-level by
    test_sharded_swd_matches_single_device; the full step folds the
    rng per dp row, so projections differ from single-device by
    design, like uv noise)."""
    scene, args, model, params = _tiny_mpv(frm=8)
    mesh = make_mesh(n_dp=2, n_fp=4)
    swdcfg = dict(LOSSCFG, loss_name="swd", num_proj=16)
    weights = {k: jnp.asarray(0.0, jnp.float32)
               for k in ("sparsity", "rgb_smooth", "a_smooth", "d_smooth",
                         "density")}
    rng = jax.random.PRNGKey(3)
    ext, intr, vids = _patch_batch(scene, 2)
    step, init = make_fp_stage2_step(model, args, 24, 32, swdcfg, mesh,
                                     param_keys=tuple(params))
    opt = init(params)
    batch = {"extrin": jnp.asarray(ext), "intrin": jnp.asarray(intr),
             "video": jnp.asarray(vids)}
    losses = []
    for _ in range(6):
        rng, sub = jax.random.split(rng)
        params, opt, m = step(params, opt, batch, jnp.asarray(0.3),
                              weights, sub)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_fp_step_trains():
    scene, args, model, params = _tiny_mpv(frm=8)
    mesh = make_mesh(n_dp=2, n_fp=4)
    weights = {k: jnp.asarray(0.0, jnp.float32)
               for k in ("sparsity", "rgb_smooth", "a_smooth", "d_smooth",
                         "density")}
    rng = jax.random.PRNGKey(1)
    ext, intr, vids = _patch_batch(scene, 2)
    step, init = make_fp_stage2_step(model, args, 24, 32, LOSSCFG, mesh,
                                     param_keys=tuple(params))
    opt = init(params)
    batch = {"extrin": jnp.asarray(ext), "intrin": jnp.asarray(intr),
             "video": jnp.asarray(vids)}
    losses = []
    for _ in range(6):
        rng, sub = jax.random.split(rng)
        params, opt, m = step(params, opt, batch, jnp.asarray(0.3),
                              weights, sub)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_fp_worker_grad_matches_single_device():
    """Gradients taken INSIDE the shard_map worker (the trainer's
    structure) must equal single-device gradients.  Both fp losses
    all_gather the grad-carrying frames, whose transpose (psum_scatter)
    sums the S identical per-shard cotangents — without the worker's
    cotangent descale the gradients come out exactly S x too large
    (fp_step.py worker comment)."""
    from videoloop3d_tpu.losses.swd import swd_3d_loss
    from videoloop3d_tpu.parallel.fp_step import sharded_swd
    rng = np.random.default_rng(5)
    F, h, w = 8, 20, 24
    x = rng.random((3, F, h, w)).astype(np.float32)
    y = rng.random((3, F, h, w)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    S = 4
    mesh = make_mesh(n_dp=1, n_fp=S)

    def descale(v):
        return v / S + jax.lax.stop_gradient(v - v / S)

    # swd
    kw = dict(patch_size=5, patcht_size=3, stride=2, stridet=1,
              num_proj=16)
    pad = kw["patcht_size"] - 1

    def single_swd(xv):
        x_pad = jnp.concatenate([xv, xv[:, :pad]], axis=1)
        return swd_3d_loss(x_pad, jnp.asarray(y), key, **kw)

    want_g = jax.grad(single_swd)(jnp.asarray(x))

    def worker(xl, yl):
        return jax.grad(lambda xi: descale(sharded_swd(
            xi, yl, key, fp_size=S, frm_num=F, **kw)))(xl)

    got_g = jax.jit(jax.shard_map(
        worker, mesh=mesh, in_specs=(P(None, "fp"), P()),
        out_specs=P(None, "fp"), check_vma=False))(
        jnp.asarray(x), jnp.asarray(y))
    assert np.allclose(np.asarray(got_g), np.asarray(want_g),
                       atol=1e-5)

    # gpnn
    pad = LOSSCFG["patcht_size"] - 1

    def single_gpnn(xv):
        return _single_loss(xv, jnp.asarray(y), None, pad)

    want_g = jax.grad(single_gpnn)(jnp.asarray(x))

    def worker_g(xl, yl):
        return jax.grad(lambda xi: descale(sharded_gpnn_lowmem(
            xi, yl, patch_size=LOSSCFG["patch_size"],
            patcht_size=LOSSCFG["patcht_size"],
            stride=LOSSCFG["stride"], alpha=None, rou=LOSSCFG["rou"],
            scaling=LOSSCFG["scaling"],
            macro_block=LOSSCFG["macro_block"], fp_size=S,
            frm_num=F)))(xl)

    got_g = jax.jit(jax.shard_map(
        worker_g, mesh=mesh, in_specs=(P(None, "fp"), P()),
        out_specs=P(None, "fp"), check_vma=False))(
        jnp.asarray(x), jnp.asarray(y))
    assert np.allclose(np.asarray(got_g), np.asarray(want_g),
                       atol=1e-5)
