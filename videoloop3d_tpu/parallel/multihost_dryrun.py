"""Worker for the 2-process CPU multi-host dryrun.

Each process runs this module with a distinct --process_id; together
they form one jax.distributed job (gloo collectives on CPU) and execute
ONE step of the REAL dp-sharded stage-2 training step on a global
('dp', 'fp') mesh whose dp axis spans the two processes — the same
code path a real multi-host TPU job takes (see parallel/distributed.py).

Run via __graft_entry__.dryrun_multichip (which spawns both processes)
or by hand:

    python -m videoloop3d_tpu.parallel.multihost_dryrun \
        --process_id 0 --num_processes 2 --port 29531 &
    python -m videoloop3d_tpu.parallel.multihost_dryrun \
        --process_id 1 --num_processes 2 --port 29531
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--port", type=int, default=29531)
    ap.add_argument("--local_devices", type=int, default=2)
    opts = ap.parse_args(argv)

    # CPU platform + virtual local devices, BEFORE backend init
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
                    f"{opts.local_devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from videoloop3d_tpu.parallel import distributed as dist
    dist.init_distributed(
        coordinator_address=f"localhost:{opts.port}",
        num_processes=opts.num_processes, process_id=opts.process_id)

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    assert jax.process_count() == opts.num_processes
    n_dev = jax.device_count()

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, repo_root)
    import __graft_entry__ as ge
    import numpy as np

    from videoloop3d_tpu.parallel.dp_step import make_dp_stage2_step

    scene, args, model, params, (h, w) = ge._tiny_setup(frm=4)
    mesh = dist.make_global_mesh(n_dp=n_dev, n_fp=1)
    assert mesh.devices.shape == (n_dev, 1)

    losscfg = {"loss_name": "gpnn_lm", "patch_size": 3, "patcht_size": 3,
               "stride": 2, "stridet": 1, "alpha": 10000, "rou": "-2",
               "scaling": 0.1, "macro_block": 17, "factor": 1,
               "loss_gain": 1.0, "dist_fn": "mse", "num_proj": 32}
    step, opt_init = make_dp_stage2_step(model, args, h, w, losscfg, mesh)

    ext = np.stack([np.linalg.inv(np.concatenate(
        [scene["poses"][i % 2], np.array([[0, 0, 0, 1.0]], np.float32)]))
        for i in range(n_dev)]).astype(np.float32)
    intr = np.stack([scene["intrins"][i % 2]
                     for i in range(n_dev)]).astype(np.float32)
    vids = np.stack([scene["videos"][i % 2]
                     for i in range(n_dev)]).astype(np.float32)

    # every process builds the same global values; commit_* places them
    rep = lambda tree: dist.commit_batch(         # noqa: E731
        mesh, jax.tree.map(lambda _: P(), tree), tree)
    params = rep({k: np.asarray(v) for k, v in params.items()})
    opt_state = opt_init(params)
    batch = dist.commit_batch(
        mesh, {"extrin": P("dp"), "intrin": P("dp"), "video": P("dp")},
        {"extrin": ext, "intrin": intr, "video": vids})
    weights = rep({k: np.asarray(0.1, np.float32)
                   for k in ("sparsity", "rgb_smooth", "a_smooth",
                             "d_smooth", "density")})
    lr = rep({"lr": np.asarray(0.1, np.float32)})["lr"]
    rng = rep({"k": np.asarray(jax.random.PRNGKey(0))})["k"]

    shapes = {k: v.shape for k, v in params.items()}
    params2, opt_state, metrics = step(params, opt_state, batch, lr,
                                       weights, rng)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    # checkpoint path: collective host gather, then primary-only write
    host = dist.gather_for_host(params2)
    for k, v in host.items():
        v = np.asarray(v)
        assert v.shape == shapes[k], (k, v.shape, shapes[k])
        assert np.isfinite(v).all(), k
    assert dist.is_primary() == (opts.process_id == 0)
    # the dp pmean must agree across processes: print on both, the
    # launcher compares
    print(f"MULTIHOST_OK process={opts.process_id} "
          f"procs={jax.process_count()} devices={n_dev} "
          f"loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
