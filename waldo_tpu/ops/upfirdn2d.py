"""upfirdn2d: pad -> zero-insertion upsample -> FIR filter -> downsample.

TPU-native counterpart of the reference CUDA plugin
(models/modules/mat_utils/torch_utils/ops/upfirdn2d.py:125-208 / .cu).
Channel-last layout (B, H, W, C). The whole chain is expressed as a single
`lax.conv_general_dilated`: `lhs_dilation` implements the zero-insertion
upsample, conv padding the pad/crop (XLA supports negative padding), and
`window_strides` the downsample — one fused TPU op, matching the one-pass
structure the reference CUDA kernel hand-codes.

Note: lhs_dilation produces H*up - (up-1) samples (no trailing zeros) while
the reference pads each pixel with up-1 trailing zeros before padding; we
compensate by adding (up-1) to the high-side padding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def setup_filter(f, normalize=True, flip_filter=False, gain=1):
    """Build a 2-D FIR filter (reference upfirdn2d.py:72-119; always non-separable)."""
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float64)
    if f.ndim == 0:
        f = f[None]
    if f.ndim == 1:
        f = np.outer(f, f)
    assert f.ndim == 2
    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[::-1, ::-1]
    f = f * (gain ** (f.ndim / 2))
    # host numpy: setup-time constants stay off-device so jit lowering never
    # fetches them back through the axon tunnel (see ops/tps.py note)
    return np.asarray(f.copy(), dtype=np.float32)


def _parse2(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _parse4(v):
    """-> (padx0, padx1, pady0, pady1), x-axis first like the reference."""
    if isinstance(v, int):
        return v, v, v, v
    if len(v) == 2:
        return v[0], v[0], v[1], v[1]
    return tuple(v)


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """x (B,H,W,C); f (kh,kw) taps (or None = identity). Returns (B,H',W',C)."""
    upx, upy = _parse2(up)
    downx, downy = _parse2(down)
    padx0, padx1, pady0, pady1 = _parse4(padding)
    b, h, w, c = x.shape
    if f is None:
        f = jnp.ones((1, 1), jnp.float32)
    assert f.ndim == 2
    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = f[::-1, ::-1]

    kern = jnp.tile(f[:, :, None, None].astype(x.dtype), (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(downy, downx),
        padding=((pady0, pady1 + upy - 1), (padx0, padx1 + upx - 1)),
        lhs_dilation=(upy, upx),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def filter2d(x, f, padding=0, flip_filter=False, gain=1):
    padx0, padx1, pady0, pady1 = _parse4(padding)
    fh, fw = f.shape
    p = (padx0 + fw // 2, padx1 + (fw - 1) // 2, pady0 + fh // 2, pady1 + (fh - 1) // 2)
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1):
    upx, upy = _parse2(up)
    padx0, padx1, pady0, pady1 = _parse4(padding)
    fh, fw = f.shape if f is not None else (1, 1)
    p = (
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    )
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1):
    downx, downy = _parse2(down)
    padx0, padx1, pady0, pady1 = _parse4(padding)
    fh, fw = f.shape if f is not None else (1, 1)
    p = (
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    )
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
