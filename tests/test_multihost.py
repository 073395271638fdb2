"""Multi-host scaffolding: 2 coordinated processes run the real
dp-sharded stage-2 step on a global mesh (gloo collectives on CPU)."""
import os
import re
import subprocess
import sys


def test_two_process_dp_step():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    if "XLA_FLAGS" in env:
        env["XLA_FLAGS"] = re.sub(
            r"--xla_force_host_platform_device_count=\d+", "",
            env["XLA_FLAGS"]).strip()
        if not env["XLA_FLAGS"]:
            del env["XLA_FLAGS"]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, "-m",
         "videoloop3d_tpu.parallel.multihost_dryrun",
         "--process_id", str(i), "--num_processes", "2",
         "--port", "29537"],
        cwd=root, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    losses = []
    for i, out in enumerate(outs):
        m = re.search(r"MULTIHOST_OK process=%d procs=2 devices=(\d+) "
                      r"loss=([-\d.]+)" % i, out)
        assert m, f"process {i} failed:\n{out[-2000:]}"
        assert int(m.group(1)) == 4
        losses.append(float(m.group(2)))
    # the pmean'd loss must be bit-identical across processes
    assert losses[0] == losses[1], losses


def test_make_global_mesh_single_process():
    """Single-process fallback keeps make_mesh semantics."""
    from videoloop3d_tpu.parallel.distributed import make_global_mesh
    mesh = make_global_mesh(n_dp=0, n_fp=2)
    assert mesh.axis_names == ("dp", "fp")
    assert mesh.shape["fp"] == 2


def test_partition_views_uneven_10_over_4():
    """10 views / 4 processes: every process owns >=2 views, counts are
    3/3/2/2, ref and other loss-config classes each spread round-robin
    (VERDICT r3 item 6 — uneven partitions)."""
    from videoloop3d_tpu.parallel.distributed import partition_views

    train_view = list(range(10))
    ref = {1, 6}
    owner = partition_views(train_view, ref, 4)
    assert set(owner) == set(train_view)
    counts = sorted(sum(1 for p in owner.values() if p == q)
                    for q in range(4))
    assert counts == [2, 2, 3, 3], counts
    # each class is round-robined separately
    assert owner[1] == 0 and owner[6] == 1
    others = [v for v in train_view if v not in ref]
    assert [owner[v] for v in others] == [0, 1, 2, 3, 0, 1, 2, 3]


def test_partition_views_rejects_starved_process():
    import pytest

    from videoloop3d_tpu.parallel.distributed import partition_views

    with pytest.raises(ValueError, match="shard_views"):
        partition_views([0, 1, 2], set(), 4)
