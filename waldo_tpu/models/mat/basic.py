"""StyleGAN2-style basic modules for MAT, channel-last flax.

Re-design of reference models/modules/mat_utils/networks/basic_module.py:
19-246 and torch_utils/ops/conv2d_resample.py:60-155. Runtime weight gains
(equalized lr), fused bias+activation via ops.bias_act, and up/down
resampling via ops.upfirdn2d — our TPU-native equivalents of the reference's
CUDA plugins.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ...ops.bias_act import bias_act, _ACTS
from ...ops.upfirdn2d import upfirdn2d, setup_filter, upsample2d


def normalize_2nd_moment(x, axis=-1, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(x ** 2, axis=axis, keepdims=True) + eps)


class FullyConnectedLayer(nn.Module):
    """Equalized-lr dense (basic_module.py:19-49): unit-normal init, runtime
    gain lr_mul/sqrt(in), bias scaled by lr_mul, fused activation."""

    features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        w = self.param(
            "weight",
            lambda k, s: jax.random.normal(k, s) / self.lr_multiplier,
            (in_f, self.features),
        )
        gain = self.lr_multiplier / math.sqrt(in_f)
        y = x @ (w * gain)
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.constant(self.bias_init),
                           (self.features,))
            b = b * self.lr_multiplier
        return bias_act(y, b, act=self.activation)


def conv2d_resample(x, w, f=None, up=1, down=1, padding=0, groups=1):
    """2-D conv with optional up/down resampling, channel-last.

    x (B,H,W,Cin), w (kh,kw,Cin/groups,Cout). Mirrors the reference padding
    arithmetic (conv2d_resample.py:94-105) via the generic path: upsample+pad
    with upfirdn2d, plain conv, then downsample."""
    kh, kw = w.shape[0], w.shape[1]
    if isinstance(padding, int):
        px0 = px1 = py0 = py1 = padding
    else:
        px0, px1, py0, py1 = padding
    fh, fw = (f.shape if f is not None else (1, 1))
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    x = upfirdn2d(x, f if up > 1 else None, up=up, padding=(px0, px1, py0, py1),
                  gain=up ** 2)
    x = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, precision=jax.lax.Precision.HIGHEST,
    )
    if down > 1:
        x = upfirdn2d(x, f, down=down)
    return x


class Conv2dLayer(nn.Module):
    """Equalized-lr conv with resampling + fused bias/act (basic_module.py:54-97)."""

    features: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: tuple = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    trainable: bool = True

    @nn.compact
    def __call__(self, x, gain=1.0):
        in_f = x.shape[-1]
        k = self.kernel_size
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, in_f, self.features))
        wg = 1.0 / math.sqrt(in_f * k * k)
        f = jnp.asarray(setup_filter(list(self.resample_filter)))
        y = conv2d_resample(x, w * wg, f=f, up=self.up, down=self.down, padding=k // 2)
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        act_gain = _ACTS[self.activation][1] * gain
        clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(y, b, act=self.activation, gain=act_gain, clamp=clamp)


class ModulatedConv2d(nn.Module):
    """Style-modulated conv (basic_module.py:102-144), grouped over batch via vmap."""

    features: int
    kernel_size: int
    demodulate: bool = True
    up: int = 1
    down: int = 1
    resample_filter: tuple = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, style):
        b, h, wdt, in_f = x.shape
        k = self.kernel_size
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, in_f, self.features))
        wg = 1.0 / math.sqrt(in_f * k * k)
        s = FullyConnectedLayer(in_f, bias_init=1.0, name="affine")(style)  # (B, Cin)
        w = weight[None] * wg * s[:, None, None, :, None]  # (B,k,k,Cin,Cout)
        if self.demodulate:
            d = jax.lax.rsqrt((w ** 2).sum(axis=(1, 2, 3)) + 1e-8)  # (B, Cout)
            w = w * d[:, None, None, None, :]
        f = jnp.asarray(setup_filter(list(self.resample_filter)))

        def one(xi, wi):
            return conv2d_resample(xi[None], wi, f=f, up=self.up, down=self.down,
                                   padding=k // 2)[0]

        return jax.vmap(one)(x, w)


class StyleConv(nn.Module):
    """ModulatedConv2d + noise + fused bias/act (basic_module.py:149-205)."""

    features: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None
    demodulate: bool = True

    @nn.compact
    def __call__(self, x, style, noise_mode="random", gain=1.0):
        x = ModulatedConv2d(self.features, self.kernel_size, demodulate=self.demodulate,
                            up=self.up, conv_clamp=self.conv_clamp, name="conv")(x, style)
        if self.use_noise and noise_mode != "none":
            strength = self.param("noise_strength", nn.initializers.zeros, ())
            if noise_mode == "random":
                noise = jax.random.normal(self.make_rng("noise"),
                                          (x.shape[0], x.shape[1], x.shape[2], 1))
            else:  # const
                nc = self.variable("noise_const", "n",
                                   lambda: jax.random.normal(jax.random.PRNGKey(0),
                                                             (x.shape[1], x.shape[2])))
                noise = nc.value[None, :, :, None]
            x = x + noise * strength
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        act_gain = _ACTS[self.activation][1] * gain
        clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=clamp)


class ToRGB(nn.Module):
    """Modulated 1x1 to image channels with skip accumulation (basic_module.py:208-239)."""

    features: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, style, skip=None):
        x = ModulatedConv2d(self.features, self.kernel_size, demodulate=False,
                            conv_clamp=self.conv_clamp, name="conv")(x, style)
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        out = bias_act(x, b, clamp=self.conv_clamp)
        if skip is not None:
            if skip.shape != out.shape:
                f = jnp.asarray(setup_filter([1, 3, 3, 1]))
                skip = upsample2d(skip, f)
            out = out + skip
        return out


class MappingNet(nn.Module):
    """z -> w mapping with broadcast + truncation (basic_module.py:367-440)."""

    z_dim: int
    w_dim: int
    num_ws: int
    num_layers: int = 8
    lr_multiplier: float = 0.01
    w_avg_beta: float = 0.995

    @nn.compact
    def __call__(self, z, truncation_psi=1.0, truncation_cutoff=None, update_w_avg=False):
        x = normalize_2nd_moment(z.astype(jnp.float32))
        for i in range(self.num_layers):
            x = FullyConnectedLayer(self.w_dim, activation="lrelu",
                                    lr_multiplier=self.lr_multiplier, name=f"fc{i}")(x)
        w_avg = self.variable("w_stats", "w_avg", lambda: jnp.zeros(self.w_dim))
        if update_w_avg and not self.is_initializing():
            w_avg.value = jnp.mean(x, axis=0) + self.w_avg_beta * (
                w_avg.value - jnp.mean(x, axis=0)
            )
        ws = jnp.repeat(x[:, None], self.num_ws, axis=1)
        if truncation_psi != 1.0:
            if truncation_cutoff is None:
                ws = w_avg.value + truncation_psi * (ws - w_avg.value)
            else:
                trunc = w_avg.value + truncation_psi * (ws[:, :truncation_cutoff] - w_avg.value)
                ws = jnp.concatenate([trunc, ws[:, truncation_cutoff:]], axis=1)
        return ws
