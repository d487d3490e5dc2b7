"""Thin-plate-spline warping as two batched matmuls (MXU-friendly).

Functional re-design of the reference TPSWarp (models/modules/warp.py:15-55):
the (N+3)x(N+3) inverse kernel and the target-grid representation depend only
on the *target* control points and output shape, so they are precomputed once
on host (numpy, float64 inverse for stability) and closed over; the per-call
work is `tgt_grid_repr @ (inv_kernel @ [src_pts; 0])` — two matmuls that XLA
maps straight onto the MXU, batched over B*T*(No or 1).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .grid import get_grid


def _kernel_distance_np(p1: np.ndarray, p2: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """phi(r) = 0.5 * r^2 * log(r^2 + eps) (reference warp.py:15-18)."""
    d = (
        (p1 ** 2).sum(-1)[:, None]
        + (p2 ** 2).sum(-1)[None, :]
        - 2.0 * p1 @ p2.T
    )
    return 0.5 * d * np.log(d + eps)


class TPSWarp:
    """Precomputed TPS mapping from N source control points to a dense grid.

    `tgt_pts` are the rest positions of the control points (N, 2); calling the
    instance with src_pts (B, N, 2) returns the dense warp grid (B, H, W, 2).
    """

    def __init__(self, tgt_height: int, tgt_width: int, tgt_pts):
        tgt_pts = np.asarray(tgt_pts, dtype=np.float64).reshape(-1, 2)
        n = tgt_pts.shape[0]
        self.tgt_shape = (tgt_height, tgt_width)
        self.num_pts = n

        fk = np.zeros((n + 3, n + 3), dtype=np.float64)
        fk[:n, :n] = _kernel_distance_np(tgt_pts, tgt_pts)
        fk[:n, -3] = 1.0
        fk[-3, :n] = 1.0
        fk[:n, -2:] = tgt_pts
        fk[-2:, :n] = tgt_pts.T
        inverse_kernel = np.linalg.inv(fk)

        tgt_grid = get_grid(tgt_height, tgt_width).reshape(-1, 2).astype(np.float64)
        partial_repr = _kernel_distance_np(tgt_grid, tgt_pts)
        tgt_grid_repr = np.concatenate(
            [partial_repr, np.ones((tgt_grid.shape[0], 1)), tgt_grid], axis=1
        )

        # Fold the constant inverse kernel into the grid representation:
        # grid = repr @ (inv @ pad(src)) == (repr @ inv) @ pad(src). One matmul
        # per call instead of two, with the (HW, N+3) operand precomputed.
        # Kept as HOST numpy: a device-resident constant captured by a jitted
        # closure is fetched back through the axon tunnel at lowering time to
        # be inlined into the MLIR module (~88 s for the 17 MB bg proj — this
        # single line was most of bench.py's cold-start, r4 profile). An
        # in-graph iota rebuild of the repr was tried and rejected: it cut
        # the executable 84->22 MB but tripled effective compile time (the
        # tail landing lazily at first execution, +2-6 min).
        self.proj = np.asarray(tgt_grid_repr @ inverse_kernel, dtype=np.float32)

    def __call__(self, src_pts: jnp.ndarray) -> jnp.ndarray:
        """src_pts (B, N, 2) -> dense grid (B, H, W, 2)."""
        b = src_pts.shape[0]
        h, w = self.tgt_shape
        x = jnp.concatenate(
            [src_pts.astype(jnp.float32), jnp.zeros((b, 3, 2), src_pts.dtype)], axis=1
        )
        # HIGHEST precision: TPU matmuls default to bf16 passes, which is far
        # too coarse for warp coordinates; this matmul is tiny (HW x N+3).
        grid = jnp.einsum(
            "gn,bnc->bgc",
            self.proj,
            x,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return grid.reshape(b, h, w, 2)
