"""Optimizers with per-parameter-group learning rates.

Matches torch.optim semantics used by the reference (MPI.py:122-152,
MPV.py:200-229): Adam with bias correction and eps *outside* the sqrt,
or SGD with momentum 0.9; the `_verts` group runs at
``lrate * optimize_verts_gain``; the lr itself is supplied every step
(exponential decay, optionally divided by dataset length).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def lr_schedule(step, base_lr, decay_rate=0.1, decay_steps_k=30):
    """Exponential decay: lr * decay_rate**(step / (decay_steps_k*1000)).
    Parity: MPI.py:143-152 (get_lrate)."""
    return base_lr * decay_rate ** (step / (decay_steps_k * 1000.0))


def make_group_fn(verts_gain):
    """Returns param-name -> lr multiplier (group assignment)."""
    def group(name):
        return verts_gain if name == "verts" else 1.0
    return group


def adam_init(params):
    zeros = jax.tree.map(jnp.zeros_like, params)
    return {"m": zeros,
            "v": jax.tree.map(jnp.zeros_like, params),
            "step": jnp.zeros((), jnp.int32)}


def adam_update(params, grads, state, lr_tree, b1=0.9, b2=0.999, eps=1e-8):
    """One torch-compatible Adam step.

    lr_tree: pytree of scalars matching params (per-group lr already
    multiplied in).
    """
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    new_m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                         state["m"], grads)
    new_v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * (g * g),
                         state["v"], grads)

    def upd(p, m, v, lr):
        mhat = m / bc1
        vhat = v / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps)

    new_params = jax.tree.map(upd, params, new_m, new_v, lr_tree)
    return new_params, {"m": new_m, "v": new_v, "step": step}


def sgd_init(params):
    return {"momentum": jax.tree.map(jnp.zeros_like, params),
            "step": jnp.zeros((), jnp.int32)}


def sgd_update(params, grads, state, lr_tree, momentum=0.9):
    new_mom = jax.tree.map(lambda b, g: momentum * b + g,
                           state["momentum"], grads)
    new_params = jax.tree.map(lambda p, b, lr: p - lr * b,
                              params, new_mom, lr_tree)
    return new_params, {"momentum": new_mom, "step": state["step"] + 1}


def make_optimizer(name, eps=1e-8):
    if name == "adam":
        return adam_init, lambda p, g, s, lr: adam_update(p, g, s, lr,
                                                          eps=eps)
    if name == "sgd":
        return sgd_init, sgd_update
    raise ValueError(f"unrecognized optimizer {name}")


def build_lr_tree(params, base_lr, group_fn):
    """Pytree of per-param lr scalars. base_lr may be a traced scalar."""
    return {k: base_lr * group_fn(k) for k in params}
