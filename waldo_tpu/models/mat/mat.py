"""MAT generator (Mask-Aware Transformer inpainting), channel-last flax.

Re-design of reference models/modules/mat_utils/networks/mat.py:24-901:
partial convs, window attention with mask-aware key masking, Swin stages
with patch merge/upsample, the style-modulated two-stage synthesis, and the
z->w mapping. Window partition/shift uses static shapes; the stochastic
mul_map dropout of the reference (mat.py:785,838: F.dropout(0.5) at
inference) is reproduced with an explicit rng under `noise_mode='random'`
and becomes deterministic 0.5 blending under 'const'/'none'.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .basic import (
    Conv2dLayer,
    FullyConnectedLayer,
    MappingNet,
    StyleConv,
    ToRGB,
)


def nf(stage: int) -> int:
    return {9: 64, 8: 128, 7: 256, 6: 512, 5: 512, 4: 512, 3: 512, 2: 512}[stage]


# ---------------------------------------------------------------------------
# tokens <-> features, windows
# ---------------------------------------------------------------------------

def token2feature(x, size):
    b, n, c = x.shape
    h, w = size
    return x.reshape(b, h, w, c)


def feature2token(x):
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows, ws, h, w):
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def shift_attn_mask(h, w, window_size, shift):
    """SW-MSA region mask (reference mat.py:226-248), pure numpy constant
    (must not touch jnp: it is evaluated at trace time inside jit)."""
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None)):
        for wsl in (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    ws = window_size
    mw = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    attn = mw[:, None, :] - mw[:, :, None]
    return jnp.asarray(np.where(attn != 0, -100.0, 0.0), jnp.float32)


# ---------------------------------------------------------------------------
# partial conv + window attention
# ---------------------------------------------------------------------------

class Conv2dLayerPartial(nn.Module):
    """Partial convolution: renormalize by valid-mask coverage (mat.py:71-108)."""

    features: int
    kernel_size: int
    activation: str = "linear"
    up: int = 1
    down: int = 1

    @nn.compact
    def __call__(self, x, mask=None):
        conv = Conv2dLayer(self.features, self.kernel_size, activation=self.activation,
                           up=self.up, down=self.down, name="conv")
        if mask is None:
            return conv(x), None
        k = self.kernel_size
        pad = k // 2 if k % 2 == 1 else 0
        ones = jnp.ones((k, k, 1, 1), x.dtype)
        update = jax.lax.conv_general_dilated(
            mask, ones, (self.down, self.down), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.up > 1:
            update = jax.image.resize(
                update, (update.shape[0], update.shape[1] * self.up,
                         update.shape[2] * self.up, 1), "nearest")
        ratio = (k * k) / (update + 1e-8)
        update = jnp.clip(update, 0.0, 1.0)
        ratio = ratio * update
        x = conv(x)
        return x * jax.lax.stop_gradient(ratio), jax.lax.stop_gradient(update)


class WindowAttention(nn.Module):
    """W-MSA with l2-normalized q/k and mask-aware keys (mat.py:111-171)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask_windows=None, mask=None):
        b_, n, c = x.shape
        hn = self.num_heads
        d = c // hn
        norm_x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        q = FullyConnectedLayer(c, name="q")(norm_x).reshape(b_, n, hn, d).transpose(0, 2, 1, 3)
        k = FullyConnectedLayer(c, name="k")(norm_x).reshape(b_, n, hn, d).transpose(0, 2, 3, 1)
        v = FullyConnectedLayer(c, name="v")(x).reshape(b_, n, hn, d).transpose(0, 2, 1, 3)
        scale = d ** -0.5
        attn = (q @ k) * scale
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, hn, n, n) + mask[None, :, None]
            attn = attn.reshape(-1, hn, n, n)
        if mask_windows is not None:
            m = mask_windows[..., 0][:, None, None, :]  # (B_,1,1,N)
            attn = attn + jnp.where(m == 0, -100.0, 0.0)
            mask_windows = jnp.clip(
                mask_windows.sum(axis=1, keepdims=True), 0.0, 1.0
            )
            mask_windows = jnp.repeat(mask_windows, n, axis=1)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b_, n, c)
        return FullyConnectedLayer(c, name="proj")(out), mask_windows


class SwinBlock(nn.Module):
    """Swin block with fuse-shortcut (mat.py:174-309)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x, x_size, mask=None):
        h, w = x_size
        b, l, c = x.shape
        ws, ss = self.window_size, self.shift_size
        if min(x_size) <= ws:
            ss = 0
            ws = min(x_size)

        shortcut = x
        x = x.reshape(b, h, w, c)
        if mask is not None:
            mask = mask.reshape(b, h, w, 1)
        if ss > 0:
            x = jnp.roll(x, (-ss, -ss), axis=(1, 2))
            if mask is not None:
                mask = jnp.roll(mask, (-ss, -ss), axis=(1, 2))
        xw = window_partition(x, ws)
        mw = window_partition(mask, ws) if mask is not None else None
        attn_mask = shift_attn_mask(h, w, ws, ss) if ss > 0 else None
        xw, mw = WindowAttention(self.dim, self.num_heads, name="attn")(xw, mw, attn_mask)
        x = window_reverse(xw, ws, h, w)
        if mw is not None:
            mask = window_reverse(mw.reshape(-1, ws, ws, 1), ws, h, w)
        if ss > 0:
            x = jnp.roll(x, (ss, ss), axis=(1, 2))
            if mask is not None:
                mask = jnp.roll(mask, (ss, ss), axis=(1, 2))
        x = x.reshape(b, h * w, c)
        if mask is not None:
            mask = mask.reshape(b, h * w, 1)
        x = FullyConnectedLayer(c, activation="lrelu", name="fuse")(
            jnp.concatenate([shortcut, x], axis=-1)
        )
        # Mlp (mat.py:24-35): two FC layers, first lrelu
        hidden = int(c * self.mlp_ratio)
        x = FullyConnectedLayer(hidden, activation="lrelu", name="mlp_fc1")(x)
        x = FullyConnectedLayer(c, name="mlp_fc2")(x)
        return x, mask


class PatchMerging(nn.Module):
    features: int
    down: int = 2

    @nn.compact
    def __call__(self, x, x_size, mask=None):
        x = token2feature(x, x_size)
        if mask is not None:
            mask = token2feature(mask, x_size)
        x, mask = Conv2dLayerPartial(self.features, 3, activation="lrelu",
                                     down=self.down, name="conv")(x, mask)
        x_size = (x_size[0] // self.down, x_size[1] // self.down)
        return feature2token(x), x_size, (feature2token(mask) if mask is not None else None)


class PatchUpsampling(nn.Module):
    features: int
    up: int = 2

    @nn.compact
    def __call__(self, x, x_size, mask=None):
        x = token2feature(x, x_size)
        if mask is not None:
            mask = token2feature(mask, x_size)
        x, mask = Conv2dLayerPartial(self.features, 3, activation="lrelu",
                                     up=self.up, name="conv")(x, mask)
        x_size = (x_size[0] * self.up, x_size[1] * self.up)
        return feature2token(x), x_size, (feature2token(mask) if mask is not None else None)


class BasicLayer(nn.Module):
    """Swin stage: optional resample + blocks + partial-conv residual (mat.py:365-432)."""

    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    resample: Optional[str] = None  # None | "down" | "up"
    resample_factor: int = 2

    @nn.compact
    def __call__(self, x, x_size, mask=None):
        if self.resample == "down":
            x, x_size, mask = PatchMerging(self.dim, self.resample_factor,
                                           name="downsample")(x, x_size, mask)
        elif self.resample == "up":
            x, x_size, mask = PatchUpsampling(self.dim, self.resample_factor,
                                              name="upsample")(x, x_size, mask)
        identity = x
        for i in range(self.depth):
            x, mask = SwinBlock(
                self.dim, self.input_resolution, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                name=f"block{i}",
            )(x, x_size, mask)
        m = token2feature(mask, x_size) if mask is not None else None
        xf, m = Conv2dLayerPartial(self.dim, 3, activation="lrelu", name="conv")(
            token2feature(x, x_size), m
        )
        x = feature2token(xf) + identity
        return x, x_size, (feature2token(m) if m is not None else None)


# ---------------------------------------------------------------------------
# encoder / style / decoder (second stage)
# ---------------------------------------------------------------------------

class EncFromRGB(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = Conv2dLayer(self.features, 1, activation="lrelu", name="conv0")(x)
        return Conv2dLayer(self.features, 3, activation="lrelu", name="conv1")(x)


class ConvBlockDown(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = Conv2dLayer(self.features, 3, activation="lrelu", down=2, name="conv0")(x)
        return Conv2dLayer(self.features, 3, activation="lrelu", name="conv1")(x)


class Encoder(nn.Module):
    res_log2: int
    img_channels: int = 3

    @nn.compact
    def __call__(self, x):
        out = {}
        for i in range(self.res_log2, 3, -1):
            if i == self.res_log2:
                x = EncFromRGB(nf(i), name=f"b{i}")(x)
            else:
                x = ConvBlockDown(nf(i), name=f"b{i}")(x)
            out[i] = x
        return out


class ToStyle(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = Conv2dLayer(x.shape[-1], 3, activation="lrelu", down=2, name=f"conv{i}")(x)
        x = x.mean(axis=(1, 2))
        return FullyConnectedLayer(self.features, activation="lrelu", name="fc")(x)


class DecBlockFirstV2(nn.Module):
    """16x16 decoder head (mat.py:557-592)."""

    in_features: int
    out_features: int
    style_dim: int
    use_noise: bool
    demodulate: bool
    img_channels: int

    @nn.compact
    def __call__(self, x, ws, gs, e_features, noise_mode="random"):
        x = Conv2dLayer(self.in_features, 3, activation="lrelu", name="conv0")(x)
        x = x + e_features[4]
        style = jnp.concatenate([ws[:, 0], gs], axis=1)
        x = StyleConv(self.out_features, 3, use_noise=self.use_noise,
                      demodulate=self.demodulate, name="conv1")(x, style, noise_mode)
        style = jnp.concatenate([ws[:, 1], gs], axis=1)
        img = ToRGB(self.img_channels, 1, name="toRGB")(x, style)
        return x, img


class DecBlock(nn.Module):
    """Upsampling decoder block (mat.py:597-638)."""

    res: int
    in_features: int
    out_features: int
    style_dim: int
    use_noise: bool
    demodulate: bool
    img_channels: int

    @nn.compact
    def __call__(self, x, img, ws, gs, e_features, noise_mode="random"):
        r = self.res
        style = jnp.concatenate([ws[:, r * 2 - 9], gs], axis=1)
        x = StyleConv(self.out_features, 3, up=2, use_noise=self.use_noise,
                      demodulate=self.demodulate, name="conv0")(x, style, noise_mode)
        x = x + e_features[r]
        style = jnp.concatenate([ws[:, r * 2 - 8], gs], axis=1)
        x = StyleConv(self.out_features, 3, use_noise=self.use_noise,
                      demodulate=self.demodulate, name="conv1")(x, style, noise_mode)
        style = jnp.concatenate([ws[:, r * 2 - 7], gs], axis=1)
        img = ToRGB(self.img_channels, 1, name="toRGB")(x, style, skip=img)
        return x, img


class Decoder(nn.Module):
    res_log2: int
    style_dim: int
    use_noise: bool
    demodulate: bool
    img_channels: int

    @nn.compact
    def __call__(self, x, ws, gs, e_features, noise_mode="random"):
        x, img = DecBlockFirstV2(nf(4), nf(4), self.style_dim, self.use_noise,
                                 self.demodulate, self.img_channels,
                                 name="Dec_16x16")(x, ws, gs, e_features, noise_mode)
        for res in range(5, self.res_log2 + 1):
            x, img = DecBlock(res, nf(res - 1), nf(res), self.style_dim, self.use_noise,
                              self.demodulate, self.img_channels,
                              name=f"Dec_{2**res}x{2**res}")(x, img, ws, gs, e_features,
                                                             noise_mode)
        return img


class DecStyleBlock(nn.Module):
    """First-stage decoder block (mat.py:660-698)."""

    out_features: int
    style_dim: int
    use_noise: bool
    demodulate: bool
    img_channels: int

    @nn.compact
    def __call__(self, x, img, style, skip, noise_mode="random"):
        x = StyleConv(self.out_features, 3, up=2, use_noise=self.use_noise,
                      demodulate=self.demodulate, name="conv0")(x, style, noise_mode)
        x = x + skip
        x = StyleConv(self.out_features, 3, use_noise=self.use_noise,
                      demodulate=self.demodulate, name="conv1")(x, style, noise_mode)
        img = ToRGB(self.img_channels, 1, name="toRGB")(x, style, skip=img)
        return x, img


class FirstStage(nn.Module):
    """Conv encoder -> Swin 64->16->64 -> style decoder (mat.py:701-796)."""

    img_channels: int = 3
    img_resolution: int = 512
    dim: int = 180
    w_dim: int = 512
    use_noise: bool = False
    demodulate: bool = True

    @nn.compact
    def __call__(self, images_in, masks_in, ws, noise_mode="random"):
        dim = self.dim
        x = jnp.concatenate([masks_in - 0.5, images_in * masks_in], axis=-1)
        skips = []
        x, mask = Conv2dLayerPartial(dim, 3, activation="lrelu", name="conv_first")(x, masks_in)
        skips.append(x)
        down_time = int(math.log2(self.img_resolution // 64))
        for i in range(down_time):
            x, mask = Conv2dLayerPartial(dim, 3, down=2, activation="lrelu",
                                         name=f"enc_conv{i}")(x, mask)
            if i != down_time - 1:
                skips.append(x)

        x_size = (x.shape[1], x.shape[2])
        x = feature2token(x)
        mask = feature2token(mask)
        depths = [2, 3, 4, 3, 2]
        ratios = [1, 0.5, 0.5, 2, 2]
        window_sizes = [8, 16, 16, 16, 8]
        res = 64
        mid = len(depths) // 2
        style = None
        for i, depth in enumerate(depths):
            res = int(res * ratios[i])
            resample = "down" if ratios[i] < 1 else ("up" if ratios[i] > 1 else None)
            layer = BasicLayer(dim, (res, res), depth, 6, window_sizes[i],
                               resample=resample,
                               resample_factor=int(1 / ratios[i]) if ratios[i] < 1 else int(ratios[i]),
                               name=f"tran{i}")
            if i < mid:
                x, x_size, mask = layer(x, x_size, mask)
                skips.append(x)
            elif i > mid:
                x, x_size, mask = layer(x, x_size, None)
                x = x + skips[mid - i]
            else:
                x, x_size, mask = layer(x, x_size, None)
                # stochastic token blending with style tokens (mat.py:780-788)
                if noise_mode == "random":
                    mul_map = jax.random.bernoulli(
                        self.make_rng("noise"), 0.5, x.shape
                    ).astype(x.dtype)
                else:
                    mul_map = jnp.full(x.shape, 0.5, x.dtype)
                ws_s = FullyConnectedLayer(dim, activation="lrelu", name="ws_style")(ws[:, -1])
                add_n = FullyConnectedLayer(16 * 16, activation="lrelu",
                                            name="to_square")(ws_s)[:, :, None]
                add_n = jax.image.resize(add_n, (add_n.shape[0], x.shape[1], 1), "linear")
                x = x * mul_map + add_n * (1 - mul_map)
                xf = token2feature(x, x_size)
                for j in range(4):
                    xf = Conv2dLayer(dim, 3, down=2, activation="lrelu",
                                     name=f"down_conv{j}")(xf)
                gs = FullyConnectedLayer(dim * 2, activation="lrelu",
                                         name="to_style")(xf.mean(axis=(1, 2)))
                style = jnp.concatenate([gs, ws_s], axis=1)

        x = token2feature(x, x_size)
        img = None
        for i in range(down_time):
            x, img = DecStyleBlock(dim, dim * 3, self.use_noise, self.demodulate,
                                   self.img_channels, name=f"dec_conv{i}")(
                x, img, style, skips[down_time - i - 1], noise_mode)
        return img * (1 - masks_in) + images_in * masks_in


class SynthesisNet(nn.Module):
    """Two-stage synthesis (mat.py:799-859)."""

    w_dim: int = 512
    img_resolution: int = 512
    img_channels: int = 3
    use_noise: bool = True
    demodulate: bool = True

    @nn.compact
    def __call__(self, images_in, masks_in, ws, noise_mode="random", return_stg1=False):
        res_log2 = int(math.log2(self.img_resolution))
        out_stg1 = FirstStage(self.img_channels, self.img_resolution, 180, self.w_dim,
                              use_noise=False, demodulate=self.demodulate,
                              name="first_stage")(images_in, masks_in, ws, noise_mode)

        x = images_in * masks_in + out_stg1 * (1 - masks_in)
        x = jnp.concatenate([masks_in - 0.5, x, images_in * masks_in], axis=-1)
        e_features = Encoder(res_log2, self.img_channels, name="enc")(x)

        fea_16 = e_features[4]
        if noise_mode == "random":
            mul_map = jax.random.bernoulli(self.make_rng("noise"), 0.5,
                                           fea_16.shape).astype(fea_16.dtype)
        else:
            mul_map = jnp.full(fea_16.shape, 0.5, fea_16.dtype)
        add_n = FullyConnectedLayer(16 * 16, activation="lrelu",
                                    name="to_square")(ws[:, 0]).reshape(-1, 16, 16, 1)
        add_n = jax.image.resize(
            add_n, (add_n.shape[0], fea_16.shape[1], fea_16.shape[2], 1), "bilinear")
        fea_16 = fea_16 * mul_map + add_n * (1 - mul_map)
        e_features[4] = fea_16

        gs = ToStyle(nf(2) * 2, name="to_style")(fea_16)
        style_dim = self.w_dim + nf(2) * 2
        img = Decoder(res_log2, style_dim, self.use_noise, self.demodulate,
                      self.img_channels, name="dec")(fea_16, ws, gs, e_features, noise_mode)
        img = img * (1 - masks_in) + images_in * masks_in
        if return_stg1:
            return img, out_stg1
        return img

    @property
    def num_layers(self):
        res_log2 = int(math.log2(self.img_resolution))
        return res_log2 * 2 - 3 * 2


class Generator(nn.Module):
    """Mapping + synthesis (mat.py:862-901)."""

    z_dim: int = 512
    w_dim: int = 512
    img_resolution: int = 512
    img_channels: int = 3

    @nn.compact
    def __call__(self, images_in, masks_in, z, truncation_psi=1.0, noise_mode="random"):
        res_log2 = int(math.log2(self.img_resolution))
        num_ws = res_log2 * 2 - 3 * 2
        ws = MappingNet(self.z_dim, self.w_dim, num_ws, name="mapping")(
            z, truncation_psi=truncation_psi)
        return SynthesisNet(self.w_dim, self.img_resolution, self.img_channels,
                            name="synthesis")(images_in, masks_in, ws, noise_mode)
