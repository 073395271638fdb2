"""Multi-host distribution: coordination-service entry, DCN-aware
meshes, and global batch placement.

The reference has no distribution at all (an inert single-GPU
``nn.DataParallel``, train_3dvid.py:151); scale-out here follows the
standard JAX multi-process recipe (SURVEY §2.3/§5):

* one process per host calls :func:`init_distributed`
  (``jax.distributed.initialize``) BEFORE any backend touch;
* :func:`make_global_mesh` builds the ('dp', 'fp') mesh so the frame
  ring ('fp' — halo exchange every step, see fp_step.py) stays inside a
  host's ICI while data-parallel ('dp' — ONE gradient psum per step)
  is what spans the DCN;
* :func:`commit_batch` turns the host-built global batch into global
  jax.Arrays (every process builds the same batch from the same seeded
  dataset; each contributes only its addressable shards).

Validated by the 2-process CPU dryrun (parallel/multihost_dryrun.py,
wired into __graft_entry__.dryrun_multichip) which runs the REAL
dp-sharded stage-2 training step across two coordinated processes.
"""
from __future__ import annotations

import os

import numpy as np

_initialized = False


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None):
    """Idempotent ``jax.distributed.initialize``.

    Explicit args win; otherwise JAX falls back to its env vars /
    cluster autodetection (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID — or TPU pod metadata on real multi-host slices).
    Must run before anything initializes a backend.
    """
    global _initialized
    if _initialized:
        return
    import jax
    kwargs = {k: v for k, v in dict(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids).items() if v is not None}
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:               # already initialized
        if "already" not in str(e).lower():
            raise
    _initialized = True


def maybe_init_from_args(args):
    """Trainer/tool hook: initialize the coordination service when the
    config (or the JAX env vars) ask for more than one process."""
    coord = getattr(args, "coordinator_address", "") or None
    nproc = int(getattr(args, "num_processes", 0) or 0) or None
    pid = getattr(args, "process_id", -1)
    pid = None if pid is None or int(pid) < 0 else int(pid)
    if coord or nproc or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        init_distributed(coordinator_address=coord, num_processes=nproc,
                         process_id=pid)


def make_global_mesh(n_dp=0, n_fp=1):
    """('dp', 'fp') mesh across all processes, DCN-aware.

    fp must fit inside one process's devices (the per-step ring halo
    must ride ICI); dp rows are laid out process-major so the gradient
    psum is the only collective that crosses the DCN.  Single-process:
    defers to mesh.make_mesh (same semantics).
    """
    import jax
    from jax.sharding import Mesh

    nproc = jax.process_count()
    if nproc == 1:
        from videoloop3d_tpu.parallel.mesh import make_mesh
        return make_mesh(n_dp=n_dp, n_fp=n_fp)

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devs)
    local = n // nproc
    assert local % n_fp == 0, \
        f"fp={n_fp} must divide the {local} per-process devices " \
        f"(the frame ring must stay inside one host's ICI)"
    if n_dp == 0:
        n_dp = n // n_fp
    assert n_dp * n_fp == n, (n_dp, n_fp, n)
    try:
        # real TPU pods: respect the ICI topology within each slice
        from jax.experimental import mesh_utils
        dev = mesh_utils.create_hybrid_device_mesh(
            (n_dp // nproc, n_fp), (nproc, 1))
    except Exception:
        # CPU / flat topologies: process-major rows give the same
        # DCN-crossing structure
        dev = np.asarray(devs).reshape(n_dp, n_fp)
    return Mesh(dev, ("dp", "fp"))


def commit_batch(mesh, spec_tree, tree):
    """Host-built GLOBAL numpy batch -> jax.Arrays on `mesh`.

    Every process must supply identical global arrays (the trainers
    build batches from the same seeded dataset on every process); each
    process contributes the shards it can address.  Single-process this
    is a plain device_put-equivalent.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    if jax.process_count() == 1:
        return jax.tree.map(jnp.asarray, tree)

    def place(spec, arr):
        sh = NamedSharding(mesh, spec)
        if isinstance(arr, jax.Array):   # already device-resident
            # guard against process-local arrays sneaking into a
            # multi-process step (they fail later with an opaque
            # incompatible-devices error)
            if not arr.sharding.is_equivalent_to(sh, arr.ndim):
                raise ValueError(
                    f"commit_batch: pre-placed array has sharding "
                    f"{arr.sharding}, expected {sh}; place it with "
                    f"commit_batch/make_array_from_callback on the "
                    f"global mesh first")
            return arr
        arr = np.asarray(arr)
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    return jax.tree.map(place, spec_tree, tree,
                        is_leaf=lambda x: x is None)


def partition_views(train_view, ref_idxs, nproc):
    """Owner process for every train view (per-process data loading).

    Round-robins each loss-config class (reference vs other views,
    train_3dvid.py:160-192) over processes separately, so every process
    gets a proportional share of each config when counts allow.
    Returns {view_id: process_index}.  Raises if some process would own
    zero views (it could never contribute real data).
    """
    ref = [v for v in train_view if v in ref_idxs]
    oth = [v for v in train_view if v not in ref_idxs]
    owner = {}
    for cls in (ref, oth):
        for i, v in enumerate(cls):
            owner[v] = i % nproc
    counts = [sum(1 for p in owner.values() if p == q)
              for q in range(nproc)]
    if min(counts) == 0:
        raise ValueError(
            f"--shard_views: {len(train_view)} train views cannot give "
            f"every one of {nproc} processes a view (counts {counts}); "
            f"run with fewer processes or without --shard_views")
    return owner


def build_sharded_video_stack(mesh, owner, train_view, videos_local,
                              dtype_threshold_bytes=1.1e9):
    """Per-process device video stacks as ONE global array sharded over
    'dp': global shape (n_dp, V_max, F, h, w, 3) where row r's shard
    holds row-r's-process's view subset (padded to V_max by repeating
    its last view; padding slots are never indexed).  Non-addressable
    shards never materialize on this host — the whole point.

    videos_local: list over train_view positions, None for foreign
    views.  Returns (global_array, local_index) where
    local_index[position] = index into the OWNER's stack (valid only on
    the owner, but deterministically identical on every process).
    """
    import jax
    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import NamedSharding, PartitionSpec as P

    nproc = jax.process_count()
    me = jax.process_index()
    n_dp = mesh.shape["dp"]
    assert n_dp % max(nproc, 1) == 0, (n_dp, nproc)

    per_proc = [[] for _ in range(nproc)]
    local_index = {}
    for pos, v in enumerate(train_view):
        p = owner[v]
        local_index[pos] = len(per_proc[p])
        per_proc[p].append(pos)
    v_max = max(len(q) for q in per_proc)

    mine = per_proc[me]
    stack = np.stack([videos_local[pos] for pos in mine])
    if v_max > len(mine):                       # pad, never referenced
        pad = np.repeat(stack[-1:], v_max - len(mine), axis=0)
        stack = np.concatenate([stack, pad])
    # dtype decision must be GLOBALLY deterministic (all shards of one
    # array share a dtype): use the padded global per-row size.  Only
    # uint8 pixel stacks get the /255 float conversion — stage-1 image/
    # mask stacks arrive as float already
    if stack.dtype == np.uint8 and stack.size * 4 <= dtype_threshold_bytes:
        stack = stack.astype(np.float32) / 255.0
    g_shape = (n_dp,) + stack.shape
    sh = NamedSharding(mesh, P("dp"))

    def cb(idx):
        rows = idx[0].stop - idx[0].start
        return np.broadcast_to(stack[None], (rows,) + stack.shape)

    arr = jax.make_array_from_callback(g_shape, sh, cb)
    return arr, local_index


def is_primary():
    """True on the process that should write files (checkpoints,
    previews, logs).  Always true single-process."""
    import jax
    return jax.process_index() == 0


def any_process_flag(flag: bool) -> bool:
    """OR a host-side bool across processes.

    Used once per epoch to coordinate graceful shutdown: a SIGTERM may
    reach only one process of a multi-host job, and a process that
    stopped feeding steps alone would wedge its peers inside the next
    collective.  COLLECTIVE in multi-process jobs (every process must
    call it at the same point); plain passthrough single-process."""
    import jax
    if jax.process_count() == 1:
        return bool(flag)
    import numpy as np
    from jax.experimental import multihost_utils
    flags = multihost_utils.process_allgather(
        np.asarray([bool(flag)]), tiled=True)
    return bool(flags.any())


def gather_for_host(tree):
    """Materialize a (possibly cross-process-sharded) param tree on the
    host for checkpointing.  COLLECTIVE in multi-process jobs: every
    process must call it; each gets the full global arrays.  No-op
    device_get single-process."""
    import jax
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree, tiled=True)
