"""Activation table for atlas texels.

Parity: reference MPI.py:21-33 (ACTIVATES, ALPHA_INIT_VAL).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ALPHA_INIT_VAL = -3.0


def _unsigmoid(x):
    x = jnp.clip(x, 1e-6, 1 - 1e-6)
    return jnp.log(x / (1 - x))


def _clamp_grad_passthrough(x):
    clamped = jnp.clip(x, 0.0, 1.0)
    return x + jax.lax.stop_gradient(clamped - x)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "unsigmoid": _unsigmoid,
    "exp": jnp.exp,
    "none": lambda x: x,
    "sigmoid1": lambda x: 1.002 / (jnp.exp(-x) + 1) - 0.001,
    "softplus": lambda x: jax.nn.softplus(x - 1),
    "tanh": jnp.tanh,
    "clamp": lambda x: jnp.clip(x, 0.0, 1.0),
    "clamp_g": _clamp_grad_passthrough,
    "plus05": lambda x: x + 0.5,
}


def get_activation(name):
    if name not in ACTIVATIONS:
        raise KeyError(f"unknown activation '{name}'")
    return ACTIVATIONS[name]
