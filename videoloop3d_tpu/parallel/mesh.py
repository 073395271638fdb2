"""Device-mesh helpers.

The reference has no real distribution (`nn.DataParallel` over one GPU,
config_parser.py:212-213); scale-out here is native `jax.sharding`:

* ``dp`` — data parallel over training patches (grad psum over ICI),
* ``fp`` — frame parallel over the video time axis: the dynamic tile
  stack and the rendered frames are sharded; the temporal coupling of
  the looping loss (patches spanning patcht frames) is covered by a
  ring halo exchange, and the loop-closure pad wraps around the ring —
  see parallel/fp_step.py.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_dp=0, n_fp=1, devices=None):
    """Mesh with ('dp', 'fp') axes.  n_dp=0 -> use all remaining."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_dp == 0:
        assert n % n_fp == 0
        n_dp = n // n_fp
    assert n_dp * n_fp <= n
    dev = np.asarray(devices[: n_dp * n_fp]).reshape(n_dp, n_fp)
    return Mesh(dev, ("dp", "fp"))
