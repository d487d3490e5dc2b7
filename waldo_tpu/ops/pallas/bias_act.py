"""Pallas TPU kernel: fused bias + activation + gain + clamp.

Counterpart of the reference CUDA kernel (torch_utils/ops/bias_act.cu:23-170)
for the waldo ops layer's `set_impl("pallas")` hook. One VPU pass over
channel-last data; the bias is broadcast along the last axis. XLA fuses the
jnp path identically in practice — the kernel exists so the native-op
dispatch architecture (jnp fallback + native impl) is real on both ops, and
as the fusion anchor if bias_act ever needs to merge with neighbor ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 256


def _apply_act(x, act, alpha):
    if act == "linear":
        return x
    if act == "relu":
        return jnp.maximum(x, 0.0)
    if act == "lrelu":
        return jnp.where(x >= 0, x, x * 0.2)
    if act == "tanh":
        return jnp.tanh(x)
    if act == "sigmoid":
        return jax.nn.sigmoid(x)
    if act == "elu":
        return jnp.where(x >= 0, x, jnp.exp(x) - 1.0)
    if act == "selu":
        return 1.0507009873554805 * jnp.where(
            x >= 0, x, 1.6732632423543772 * (jnp.exp(x) - 1.0))
    if act == "softplus":
        return jnp.log1p(jnp.exp(-jnp.abs(x))) + jnp.maximum(x, 0.0)
    if act == "swish":
        return x * jax.nn.sigmoid(x)
    raise ValueError(act)


def _kernel(x_ref, b_ref, out_ref, *, act, gain, clamp):
    y = x_ref[...] + b_ref[...]
    y = _apply_act(y, act, None)
    if gain != 1.0:
        y = y * gain
    if clamp is not None and clamp >= 0:
        y = jnp.clip(y, -clamp, clamp)
    out_ref[...] = y


@functools.partial(jax.jit,
                   static_argnames=("dim", "act", "gain", "clamp", "interpret"))
def bias_act_pallas(x, b=None, dim=-1, act="linear", gain=1.0, clamp=None,
                    interpret=False):
    """y = clamp(act(x + b) * gain), channel-last bias broadcast."""
    assert dim in (-1, x.ndim - 1), "pallas bias_act is channel-last only"
    c = x.shape[-1]
    if b is None:
        b = jnp.zeros((c,), x.dtype)
    orig_shape = x.shape
    flat = x.reshape(-1, c)
    n = flat.shape[0]
    pad = (-n) % _ROWS
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    rows = flat.shape[0]
    out = pl.pallas_call(
        functools.partial(_kernel, act=act, gain=float(gain),
                          clamp=None if clamp is None else float(clamp)),
        grid=(rows // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        interpret=interpret,
    )(flat, b.reshape(1, c).astype(x.dtype))
    return out[:n].reshape(orig_shape)
