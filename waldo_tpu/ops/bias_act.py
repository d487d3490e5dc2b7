"""Fused bias + activation (+ gain + clamp).

TPU-native counterpart of the reference CUDA plugin
(models/modules/mat_utils/torch_utils/ops/bias_act.py:41-89 and bias_act.cu):
same activation table/default gains, same fallback architecture — a jnp
reference path that XLA already fuses into one VPU pass, with a Pallas kernel
selectable via `set_impl` for the MAT inpainter hot path.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_IMPL = "xla"


def set_impl(name: str) -> None:
    global _IMPL
    assert name in ("xla", "pallas")
    _IMPL = name


_ACTS = {
    "linear": (lambda x: x, 1.0),
    "relu": (jax.nn.relu, math.sqrt(2.0)),
    "lrelu": (lambda x: jax.nn.leaky_relu(x, 0.2), math.sqrt(2.0)),
    "tanh": (jnp.tanh, 1.0),
    "sigmoid": (jax.nn.sigmoid, 1.0),
    "elu": (jax.nn.elu, 1.0),
    "selu": (jax.nn.selu, 1.0),
    "softplus": (jax.nn.softplus, 1.0),
    "swish": (jax.nn.swish, math.sqrt(2.0)),
}


def bias_act(x, b=None, dim=-1, act="linear", alpha=None, gain=None, clamp=None):
    """y = clamp(act(x + b) * gain); b broadcasts along `dim` (default: channel-last)."""
    fn, def_gain = _ACTS[act]
    gain = def_gain if gain is None else gain
    if _IMPL == "pallas":
        from .pallas.bias_act import bias_act_pallas

        return bias_act_pallas(x, b, dim, act, gain, clamp)
    if b is not None:
        shape = [1] * x.ndim
        shape[dim] = b.shape[0]
        x = x + b.reshape(shape)
    x = fn(x)
    if gain != 1.0:
        x = x * gain
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x
