"""Weight-init parity with the reference (models/modules/weight_init.py:70-82):

* Linear: trunc_normal(std=0.02) kernels, zero bias
* Conv:   xavier-uniform kernels
* LayerNorm: unit scale, zero bias (flax default)
"""
from __future__ import annotations

import jax
import flax.linen as nn


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def dense_kwargs():
    return dict(kernel_init=trunc_normal_init(), bias_init=nn.initializers.zeros)


def conv_kwargs():
    return dict(kernel_init=nn.initializers.xavier_uniform(), bias_init=nn.initializers.zeros)
