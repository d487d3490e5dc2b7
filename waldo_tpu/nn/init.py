"""Weight-init parity with the reference (models/modules/weight_init.py:70-82):

* Linear: trunc_normal(std=0.02) kernels, zero bias
* Conv:   xavier-uniform kernels
* LayerNorm: unit scale, zero bias (flax default)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

# Global computation dtype for network matmuls/convs (params stay float32).
# Set from Config.compute_dtype by Synthesizer; the geometry/warp path is
# unaffected (it pins its own precision).
_COMPUTE_DTYPE = jnp.float32


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype) if not isinstance(dtype, str) else {
        "float32": jnp.float32, "bfloat16": jnp.bfloat16
    }[dtype]


def compute_dtype():
    return _COMPUTE_DTYPE


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def dense_kwargs():
    return dict(kernel_init=trunc_normal_init(), bias_init=nn.initializers.zeros,
                dtype=compute_dtype())


def conv_kwargs():
    return dict(kernel_init=nn.initializers.xavier_uniform(),
                bias_init=nn.initializers.zeros, dtype=compute_dtype())
