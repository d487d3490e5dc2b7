"""Convolutional modules: UNet (WIF fusion) and ConvPatchProj (patch codec).

Channel-last (NHWC) re-designs of reference models/modules/conv.py:28-180 —
NHWC is the native TPU conv layout so XLA needs no transposes. Transposed
convs reproduce torch `ConvTranspose2d(3, stride=2, padding=1,
output_padding=1)` taps exactly (asymmetric ((1,2),(1,2)) padding): verified
against torch to 2e-6, so reference checkpoints convert loss-free
(models/convert.py flips the torch kernel spatially when mapping).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .init import conv_kwargs
from .transform import CustomNorm


def conv3x3(features, zero_init=False):
    kw = conv_kwargs()
    if zero_init:
        kw["kernel_init"] = nn.initializers.zeros
    return nn.Conv(features, (3, 3), strides=1, padding=1, use_bias=False, **kw)


def conv_down(features):
    return nn.Conv(features, (3, 3), strides=2, padding=1, use_bias=False, **conv_kwargs())


# torch ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1) tap
# alignment: lax.conv_transpose with explicit lo=1/hi=2 padding.
_DECONV_PAD = ((1, 2), (1, 2))


def deconv_up(features):
    return nn.ConvTranspose(
        features, (3, 3), strides=(2, 2), padding=_DECONV_PAD, use_bias=False,
        **conv_kwargs()
    )


class _ConvBlock(nn.Module):
    features: int
    mode: str  # "conv" | "deconv"
    norm_layer: str

    @nn.compact
    def __call__(self, x):
        x = (conv_down if self.mode == "conv" else deconv_up)(self.features)(x)
        x = CustomNorm(self.norm_layer)(x)
        return nn.gelu(x, approximate=False)


class UNet(nn.Module):
    """Stride-2 conv/deconv UNet with skip concat (reference conv.py:28-64)."""

    num_channels_out: int
    embed_dim: int
    norm_layer: str
    depth: int
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        y_list = [conv3x3(self.embed_dim // (2 ** (self.depth - 1)))(x)]
        for i in range(self.depth):
            planes = self.embed_dim // (2 ** (self.depth - 1 - i))
            y_list.append(_ConvBlock(planes * 2, "conv", self.norm_layer)(y_list[-1]))
        y = y_list.pop()
        # deconv_layers[i] outputs `planes_i`; applied in reverse order
        planes_all = [self.embed_dim // (2 ** (self.depth - 1 - i)) for i in range(self.depth)]
        y = _ConvBlock(planes_all[-1], "deconv", self.norm_layer)(y)
        for i in range(1, self.depth):
            y = jnp.concatenate([y, y_list.pop()], axis=-1)
            y = _ConvBlock(planes_all[-1 - i], "deconv", self.norm_layer)(y)
        y = jnp.concatenate([y, y_list.pop()], axis=-1)
        return conv3x3(self.num_channels_out, zero_init=self.zero_init)(y)


class ConvPatchProj(nn.Module):
    """Patchify (image -> tokens) or unpatchify (tokens -> image) via stride-2
    conv stacks (reference conv.py:67-180). `from_patch=True` encodes.
    """

    patch_size: int
    embed_dim: int
    norm_layer: str
    num_channels: int
    skip_channels: int = 0
    from_patch: bool = True
    zero_init_proj: bool = False  # decoder "zero"/"five" init (lvd.py:233-237)

    def _dims(self):
        num_dims = int(math.log2(self.patch_size))
        dims = [self.embed_dim // (2 ** k) for k in range(num_dims)] + [self.num_channels]
        if self.from_patch:
            dims = dims[::-1]
        return dims

    @nn.compact
    def __call__(self, x, latent_shape=None, return_list=False, x_list=None, fuse_m=None, skip=None):
        dims = self._dims()
        use_skip = self.skip_channels > 0

        if self.from_patch:
            # x: (B, H, W, C_in)
            feats = []
            c = x.shape[-1]
            if c == self.num_channels - 1:
                x = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
            if c == self.num_channels + 1:
                x = x[..., : self.num_channels]
            layer_dims, proj_dims = dims[1:], dims[:2]
            x = conv_down(proj_dims[1])(x)
            feats.append(x)
            # intermediate blocks (norm+gelu), final plain conv
            inner = layer_dims
            for i in range(len(inner) - 2):
                x = _ConvBlock(inner[i + 1], "conv", self.norm_layer)(x)
                feats.append(x)
            x = conv_down(inner[-1])(x)
            feats.append(x)
            b, h, w, c = x.shape
            tokens = x.reshape(b, h * w, c)
            if return_list:
                return feats[::-1]
            return tokens

        # tokens -> image. x: (B, L, C), latent_shape (h, w)
        assert latent_shape is not None
        b, l, c = x.shape
        h, w = latent_shape
        x = x.reshape(b, h, w, c)
        layer_dims, proj_dims = dims[:-1], dims[-2:]
        idx = 0

        def fuse(x, idx):
            if x_list is not None:
                xi = x_list[idx]
                m = fuse_m
                if m.shape[-3:-1] != x.shape[-3:-1]:
                    import jax

                    m = jax.image.resize(m, m.shape[:-3] + x.shape[-3:-1] + m.shape[-1:], "bilinear")
                x = m * xi + (1 - m) * x
            return x, idx + 1

        for i in range(len(layer_dims) - 1):
            x, idx = fuse(x, idx)
            x = _ConvBlock(layer_dims[i + 1], "deconv", self.norm_layer)(x)
        x, idx = fuse(x, idx)
        if use_skip:
            x_skip = conv_down(proj_dims[0])(skip)
            x = jnp.concatenate([x, x_skip], axis=-1)
        kw = conv_kwargs()
        if self.zero_init_proj:
            kw["kernel_init"] = nn.initializers.zeros
        proj = nn.ConvTranspose(
            proj_dims[1], (3, 3), strides=(2, 2), padding=_DECONV_PAD,
            use_bias=False, name="proj", **kw
        )
        return proj(x)
