"""Per-network optimizer state and the generic jitted train step.

Mirrors the reference optimizer setup (models/synthesizer.py:114-143:
per-net Adam/AdamW, beta=(0, 0.99), lr 1e-4; AdamW masks out biases/1-d
params and module-declared no-decay lists, synthesizer.py:1091-1103) and its
safety rails (grad clip synthesizer.py:1085-1087; NaN-skip with
consecutive-failure counter synthesizer.py:1057-1066 — here a pure
where-select on the update instead of a host-side branch, so the step stays
fully jitted and every host agrees by construction).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


class NetState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    nancount: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params), tx=tx,
                   nancount=jnp.zeros((), jnp.int32))


def _wd_mask(params):
    """AdamW decay mask: skip biases and 1-d params (synthesizer.py:1091-1103)."""
    def mask(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return leaf.ndim > 1 and name != "bias"

    return jax.tree_util.tree_map_with_path(mask, params)


def make_optimizer(mcfg) -> optax.GradientTransformation:
    chain = []
    if mcfg.clip_value > 0:
        chain.append(optax.clip_by_global_norm(mcfg.clip_value))
    if mcfg.optimizer == "adam":
        chain.append(optax.adam(mcfg.lr, b1=mcfg.beta1, b2=mcfg.beta2))
    elif mcfg.optimizer == "adamw":
        chain.append(
            optax.masked(
                optax.adamw(mcfg.lr, b1=mcfg.beta1, b2=mcfg.beta2, weight_decay=mcfg.wd),
                _wd_mask,
            )
            if mcfg.wd > 0
            else optax.adamw(mcfg.lr, b1=mcfg.beta1, b2=mcfg.beta2, weight_decay=0.0)
        )
    else:
        raise ValueError(mcfg.optimizer)
    return optax.chain(*chain)


def train_step_fn(loss_fn: Callable):
    """Build a pure train step: (state, *args) -> (state, metrics).

    loss_fn(params, *args) -> (loss, metrics). Non-finite losses skip the
    update and increment nancount (reference NaN-skip semantics); metrics
    carry the nancount for the trainer's abort-after-10 check."""

    def step(state: NetState, *args):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, *args
        )
        finite = jnp.isfinite(loss)
        safe_grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, new_opt = state.tx.update(safe_grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_params, state.params
        )
        new_opt = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o) if hasattr(n, "shape") else n,
            new_opt, state.opt_state,
        )
        nancount = jnp.where(finite, 0, state.nancount + 1)
        metrics = dict(metrics)
        metrics["nancount"] = nancount
        new_state = state.replace(params=new_params, opt_state=new_opt, nancount=nancount)
        return new_state, metrics

    return step
