"""Bilinear grid sampling (torch `F.grid_sample` semantics) for TPU.

Matches the reference's implicit contract everywhere it calls
`F.grid_sample` (e.g. models/nets/lvd.py:518,548,678): bilinear,
`padding_mode='zeros'`, `align_corners=False`.

Layout is channel-last: image (B, H, W, C), grid (B, Ho, Wo, 2) with the
last axis (x, y) in [-1, 1] normalized coordinates. Implemented with four
flat gathers + per-corner zero masks, which XLA lowers to efficient TPU
dynamic-gathers; a Pallas kernel can be swapped in through `set_impl`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_IMPL = "xla"  # "xla" | "pallas"


def set_impl(name: str) -> None:
    global _IMPL
    assert name in ("xla", "pallas")
    _IMPL = name


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample img (B,H,W,C) at grid (B,Ho,Wo,2) -> (B,Ho,Wo,C)."""
    if _IMPL == "pallas":
        from .pallas.grid_sample import grid_sample_pallas

        return grid_sample_pallas(img, grid)
    return grid_sample_ref(img, grid)


def grid_sample_ref(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = img.shape
    gb, gh, gw, _ = grid.shape
    assert gb == b, (img.shape, grid.shape)

    # unnormalize (align_corners=False): x = (gx + 1) * W / 2 - 0.5
    ix = (grid[..., 0] + 1.0) * (w * 0.5) - 0.5
    iy = (grid[..., 1] + 1.0) * (h * 0.5) - 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    flat = img.reshape(b, h * w, c)

    def gather(iyc, ixc):
        valid = (ixc >= 0) & (ixc <= w - 1) & (iyc >= 0) & (iyc <= h - 1)
        idx = jnp.clip(iyc, 0, h - 1) * w + jnp.clip(ixc, 0, w - 1)
        vals = jnp.take_along_axis(flat, idx.reshape(b, -1, 1), axis=1)
        vals = vals.reshape(b, gh, gw, c)
        return vals * valid[..., None].astype(img.dtype)

    w00 = ((1 - tx) * (1 - ty))[..., None].astype(img.dtype)
    w01 = (tx * (1 - ty))[..., None].astype(img.dtype)
    w10 = ((1 - tx) * ty)[..., None].astype(img.dtype)
    w11 = (tx * ty)[..., None].astype(img.dtype)

    return (
        gather(iy0, ix0) * w00
        + gather(iy0, ix1) * w01
        + gather(iy1, ix0) * w10
        + gather(iy1, ix1) * w11
    )
