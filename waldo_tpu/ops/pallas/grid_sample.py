"""Pallas TPU kernel: fused bilinear sampling via hat-function matmuls.

Same math as ops.grid_sample.grid_sample_mxu, but the hat matrices and the
intermediate M = Ry @ tex live entirely in VMEM — XLA's version materializes
them through HBM, which costs more bandwidth than the matmul costs FLOPs at
small tile sizes.

Specialized to single-channel sources (the pipeline's hot case: per-layer
alpha warps are hundreds of 1-channel images); multi-channel batches go
through the XLA MXU path. Each program handles an (8, 128) tile of output
pixels — the native TPU vector tile; Mosaic cannot reshape flat pixel
vectors — and holds the full source image in VMEM (H*W <= ~1M).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8
COLS = 128
TILE_P = ROWS * COLS


def _kernel(tex_ref, ix_ref, iy_ref, out_ref, *, h, w, precision):
    iy = iy_ref[0]  # (8, 128)
    ix = ix_ref[0]
    idx_h = jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS, h), 2).astype(jnp.float32)
    idx_w = jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS, w), 2).astype(jnp.float32)
    ry = jnp.maximum(1.0 - jnp.abs(iy[..., None] - idx_h), 0.0)  # (8,128,H)
    rx = jnp.maximum(1.0 - jnp.abs(ix[..., None] - idx_w), 0.0)  # (8,128,W)
    tex = jnp.broadcast_to(tex_ref[0], (ROWS, h, w))  # (8,H,W)
    m = jax.lax.dot_general(
        ry, tex,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (8, 128, W)
    out_ref[0] = (m * rx).sum(axis=2)  # (8, 128)


@functools.partial(jax.jit, static_argnames=("precision",))
def grid_sample_pallas(img: jnp.ndarray, grid: jnp.ndarray, precision: str = "float32"):
    """img (B,H,W,1), grid (B,Ho,Wo,2) -> (B,Ho,Wo,1); torch zero-pad semantics."""
    b, h, w, c = img.shape
    assert c == 1, "pallas sampler is specialized to single-channel sources"
    _, gh, gw, _ = grid.shape
    p = gh * gw
    pad = (-p) % TILE_P
    ix = (grid[..., 0].reshape(b, p) + 1.0) * (w * 0.5) - 0.5
    iy = (grid[..., 1].reshape(b, p) + 1.0) * (h * 0.5) - 0.5
    if pad:
        # padded coords point far outside -> all-zero hat rows -> zero output
        ix = jnp.pad(ix, ((0, 0), (0, pad)), constant_values=-10.0)
        iy = jnp.pad(iy, ((0, 0), (0, pad)), constant_values=-10.0)
    pp = p + pad
    n_tiles = pp // TILE_P
    ix = ix.reshape(b, n_tiles * ROWS, COLS)
    iy = iy.reshape(b, n_tiles * ROWS, COLS)

    prec = "float32" if precision == "float32" else None
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, precision=prec),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, COLS), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, COLS), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS, COLS), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * ROWS, COLS), img.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * pp * h * w,
            bytes_accessed=b * (h * w + 3 * pp) * 4,
            transcendentals=0,
        ),
    )(img[..., 0], ix, iy)
    return out.reshape(b, pp)[:, :p].reshape(b, gh, gw, 1)
