"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real TPU chip is reserved for bench.py; unit tests exercise the same
jitted code paths on the CPU backend (XLA semantics are identical), and the
sharding tests need multiple devices, which we get via
--xla_force_host_platform_device_count.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"   # force: the harness presets 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# a sitecustomize.py in this image pins the platform regardless of the env
# var, so pin it back through the config API as well.
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

# repo root on sys.path so `import videoloop3d_tpu` works without install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
