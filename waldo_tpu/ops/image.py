"""Image-space helper ops: resize, gaussian blur, flow-edge extraction.

Channel-last layout throughout ((..., H, W, C)).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_sample_axis(x, axis, out_size):
    """Non-antialiased bilinear resample along one axis, edge-clamped
    (torch `F.interpolate(mode='bilinear', antialias=False)` semantics)."""
    in_size = x.shape[axis]
    scale = in_size / out_size
    pos = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    lo = jnp.clip(jnp.floor(pos), 0, in_size - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    t = jnp.clip(pos - lo.astype(jnp.float32), 0.0, 1.0)
    xl = jnp.take(x, lo, axis=axis)
    xh = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    t = t.reshape(shape).astype(x.dtype)
    return xl * (1 - t) + xh * t


def _upsample_axis_int(x, axis, factor):
    """Integer-factor bilinear upsample along one axis without gathers.

    Phase decomposition: output index j = f*i + p samples at fractional
    offset d_p = (p+0.5)/f - 0.5 from input index i, so each phase is a
    fixed 2-tap blend of x and its one-pixel edge-replicated shift —
    slices + elementwise, which XLA fuses, instead of the `jnp.take`
    gathers of the generic path (TPU gathers run far below DMA efficiency;
    the HD predict trace spent 63 ms/step in flow_upsample on them).
    Tap positions/weights match `_bilinear_sample_axis` exactly (incl. the
    clamped-t edge behavior, which edge replication reproduces)."""
    axis = axis % x.ndim
    n = x.shape[axis]
    sl = lambda a, b: tuple(
        slice(None) if k != axis else slice(a, b) for k in range(x.ndim)
    )
    xm1 = jnp.concatenate([x[sl(0, 1)], x[sl(0, n - 1)]], axis=axis)
    xp1 = jnp.concatenate([x[sl(1, n)], x[sl(n - 1, n)]], axis=axis)
    phases = []
    for p in range(factor):
        d = (p + 0.5) / factor - 0.5
        if d < 0:
            t = jnp.asarray(d + 1.0, x.dtype)
            phases.append(xm1 * (1 - t) + x * t)
        else:
            t = jnp.asarray(d, x.dtype)
            phases.append(x * (1 - t) + xp1 * t)
    y = jnp.stack(phases, axis=axis + 1)
    return y.reshape(x.shape[: axis] + (n * factor,) + x.shape[axis + 1 :])


def resize(x: jnp.ndarray, scale_factor: float = None, shape=None, method="bilinear"):
    """Bilinear resize of (..., H, W, C); half-pixel centers, no antialiasing
    — matches torch `F.interpolate(..., mode='bilinear')` for both up and
    down scaling (jax.image.resize antialiases on downscale, torch doesn't)."""
    if scale_factor is not None and scale_factor == 1:
        return x
    h, w = x.shape[-3], x.shape[-2]
    if shape is None:
        shape = (int(h * scale_factor), int(w * scale_factor))
    if shape == (h, w):
        return x
    for axis, (n, m) in zip((x.ndim - 3, x.ndim - 2), zip((h, w), shape)):
        if m > n and m % n == 0:
            x = _upsample_axis_int(x, axis, m // n)
        else:
            x = _bilinear_sample_axis(x, axis, m)
    return x


def _torchvision_gaussian_1d(kernel_size: int, sigma: float) -> np.ndarray:
    """1-D gaussian as in torchvision GaussianBlur (used at synthesizer.py:1114)."""
    half = (kernel_size - 1) * 0.5
    x = np.linspace(-half, half, kernel_size)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, sigma: float = 3.0, kernel_size: int = 23):
    """Separable gaussian blur on (..., H, W, C) with reflect padding."""
    g = jnp.asarray(_torchvision_gaussian_1d(kernel_size, sigma))
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    y = x.reshape((-1, h, w, c))
    p = kernel_size // 2
    y = jnp.pad(y, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    kh = jnp.tile(g.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(g.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(y, kh, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    y = jax.lax.conv_general_dilated(y, kw, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return y.reshape(lead + (h, w, c))


class EdgeExtractor:
    """Flow-edge magnitude + dominant-flow mask.

    Correct re-implementation of the reference EdgeExtractor
    (models/modules/edge.py:8-40 — which has a latent missing-import bug);
    input flow is (..., H, W, C), returns (edge (...,H,W,1), dominant (...,H,W,1)).
    """

    def __init__(self, kernel_size: int = 3):
        assert kernel_size % 2 == 1
        k = kernel_size
        self.k = k
        self.max_edge = math.sqrt(32.0)
        # host numpy, not device arrays: device constants captured by jitted
        # closures are fetched back through the axon tunnel at lowering time
        self.mean_kernel = np.ones((k, k, 1, 1), np.float32) / (k * k)
        s = np.arange(k, dtype=np.float64) - k // 2
        sx, sy = s.reshape(-1, 1), s.reshape(1, -1)
        sum_xy = sx ** 2 + sy ** 2
        sum_xy[sum_xy == 0] = 1.0
        sobel_x = (sx / sum_xy).astype(np.float32)
        sobel_y = (sy / sum_xy).astype(np.float32)
        # (k, k, 1, 2): two output channels (x-deriv, y-deriv) on one input ch
        self.sobel_kernel = np.stack([sobel_x, sobel_y], axis=-1)[..., None, :]

    def __call__(self, flow: jnp.ndarray, eps: float = 1e-6):
        lead = flow.shape[:-3]
        h, w, c = flow.shape[-3:]
        x = flow.reshape((-1, h, w, c))
        b = x.shape[0]
        p = self.k // 2
        xc = x.transpose(0, 3, 1, 2).reshape(b * c, h, w, 1)
        xc = jnp.pad(xc, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        dn = ("NHWC", "HWIO", "NHWC")
        mean_flow = jax.lax.conv_general_dilated(xc, self.mean_kernel, (1, 1), "VALID",
                                                 dimension_numbers=dn,
                                                 precision=jax.lax.Precision.HIGHEST)
        mean_flow = mean_flow.reshape(b, c, h, w)
        flow_sq = (x.transpose(0, 3, 1, 2)) ** 2
        mean_norm = (mean_flow ** 2).sum(axis=1)
        flow_norm = flow_sq.sum(axis=1)
        dominant = (flow_norm > mean_norm).astype(flow.dtype)[..., None]

        edge = jax.lax.conv_general_dilated(xc, self.sobel_kernel, (1, 1), "VALID",
                                            dimension_numbers=dn,
                                                 precision=jax.lax.Precision.HIGHEST)  # (b*c,h,w,2)
        edge = jnp.sqrt((edge ** 2).sum(axis=-1) + eps) / self.max_edge
        edge = edge.reshape(b, c, h, w)
        edge = 1.0 - jnp.prod(1.0 - edge, axis=1)
        edge = edge[..., None]
        return edge.reshape(lead + (h, w, 1)), dominant.reshape(lead + (h, w, 1))
