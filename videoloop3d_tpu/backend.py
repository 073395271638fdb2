"""Backend selection from config flags.

The reference switches stage-2 / render / eval to a CPU execution mode
when ``gpu_num <= 0`` (reference train_3dvid.py:70-73 via the
DataParallelCPU shim, utils.py:320-334).  Here the same flag selects the
JAX CPU backend — the identical jitted programs run on either backend.

Must be called BEFORE any computation touches a device: the runtime's
sitecustomize pins JAX_PLATFORMS, so both the env var and the jax config
knob have to be set (see CLAUDE.md "environment gotchas").
"""
from __future__ import annotations

import os


def apply_backend_from_args(args) -> None:
    """Honor ``gpu_num <= 0`` -> CPU backend (no-op otherwise)."""
    if int(getattr(args, "gpu_num", 1)) <= 0:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backend already initialized; env var still wins on fork
        print("[backend] gpu_num <= 0: running on the CPU backend")
