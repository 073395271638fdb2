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


def enable_compile_cache(cache_dir=None) -> None:
    """Persistent XLA compilation cache: warm starts skip the ~70 s
    cold compile of the production-scale steps (measured ~30 s warm on
    the v5e for the stage-1 step).  Default location is repo-local
    ``.jax_cache`` (gitignored); override with $VL3D_COMPILE_CACHE,
    disable with VL3D_COMPILE_CACHE=off."""
    env = os.environ.get("VL3D_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "none"):
        return
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return  # CPU compiles are seconds; not worth cache noise
    if cache_dir is None:
        cache_dir = env or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # threshold at 5 s: catches the 20-70 s TPU step compiles while
        # skipping the small CPU-backend programs (whose XLA:CPU AOT
        # cache entries cross-load with noisy machine-feature warnings)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without the knobs: cold compiles only


def apply_backend_from_args(args) -> None:
    """Honor ``gpu_num <= 0`` -> CPU backend (no-op otherwise) and turn
    on the persistent compilation cache."""
    if int(getattr(args, "gpu_num", 1)) <= 0:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backend already initialized; env var still wins on fork
        print("[backend] gpu_num <= 0: running on the CPU backend")
    enable_compile_cache()
