"""Forward-scatter warp-grid inversion, TPU-deterministic.

Re-design of the reference InverseWarp (models/modules/warp.py:58-174).
The reference resolves duplicate scatter targets with a stable sort + adjacent
-difference trick (warp.py:113-123), which (because the sort is stable) means
*the lowest source index wins*. We get the same semantics with a scatter-min
of the source index followed by one gather — O(n) instead of O(n log n) and
fully deterministic on TPU. Hole filling is the reference's fixed 5-iteration
dilate + gaussian-normalized fill (warp.py:135-151) expressed as static
stencil convolutions, which XLA fuses; erosion likewise (warp.py:153-162).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .grid import get_grid, get_gaussian_kernel


def _shift_or(m, axis, direction):
    """Shift a boolean (B,H,W) mask by one pixel, zero-filled."""
    if direction > 0:
        pad = [(0, 0)] * 3
        pad[axis] = (1, 0)
        return jnp.pad(m, pad)[:, : m.shape[1], : m.shape[2]] if axis == 1 else jnp.pad(m, pad)[:, :, : m.shape[2]]
    pad = [(0, 0)] * 3
    pad[axis] = (0, 1)
    if axis == 1:
        return jnp.pad(m, pad)[:, 1:, :]
    return jnp.pad(m, pad)[:, :, 1:]


def _neighbor_any(mask):
    """4-neighborhood OR (dilation step source)."""
    return (
        _shift_or(mask, 1, 1)
        | _shift_or(mask, 1, -1)
        | _shift_or(mask, 2, 1)
        | _shift_or(mask, 2, -1)
    )


def _conv2d_same(x, kernel):
    """x (B,H,W) conv with kernel (k,k), same padding, single channel."""
    k = kernel.shape[0]
    out = jax.lax.conv_general_dilated(
        x[..., None],
        kernel[..., None, None],
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[..., 0]


class InverseWarp:
    """Invert dense forward warp grids by scatter + hole filling.

    __call__(src_grid (B,Hs,Ws,2), niter=5, pad=True, erode=True)
      -> tgt_grid (B,H,W,2)
    where src_grid maps target->source; the result maps source->target with
    unresolved pixels pushed far out of bounds (2W, 2H) so that a subsequent
    zero-padding grid_sample reads 0 there (reference warp.py:164-167).
    """

    def __init__(self, src_height, src_width, tgt_height, tgt_width, kernel_size=3):
        self.src_shape = (src_height, src_width)
        self.tgt_shape = (tgt_height, tgt_width)
        self.kernel = get_gaussian_kernel(kernel_size)
        self.src_grid = get_grid(src_height, src_width)
        self.tgt_grid = get_grid(tgt_height, tgt_width)

    def __call__(self, src_grid, niter=5, pad=True, erode=True):
        b, hs, ws, _ = src_grid.shape
        h, w = self.tgt_shape
        n = niter

        dsrc = src_grid - self.src_grid[None]
        if (hs, ws) != (h, w):
            # torch-tap bilinear (ops/image.py), not jax.image.resize: exact
            # parity with the reference's F.interpolate (warp.py:77)
            from .image import resize

            dsrc = resize(dsrc, shape=(h, w))
        dx = dsrc[..., 0].reshape(b, -1) * (w / 2.0)
        dy = dsrc[..., 1].reshape(b, -1) * (h / 2.0)

        col = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w)).reshape(-1)
        row = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w)).reshape(-1)
        xg = jnp.round(col[None] + dx).astype(jnp.int32)
        yg = jnp.round(row[None] + dy).astype(jnp.int32)
        oob = (xg < 0) | (yg < 0) | (xg > w - 1) | (yg > h - 1)

        hw = h * w
        trash = hw  # extra slot receiving all out-of-bounds / losing writes
        dest = jnp.where(oob, trash, yg * w + xg)  # (B, HW)

        # min-source-index wins among duplicates (deterministic)
        pos = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (b, hw))
        winner = jnp.full((b, hw + 1), hw, dtype=jnp.int32)
        winner = winner.at[jnp.arange(b)[:, None], dest].min(pos)
        keep = (jnp.take_along_axis(winner, dest, axis=1) == pos) & (~oob)
        dest = jnp.where(keep, dest, trash)

        bidx = jnp.arange(b)[:, None]
        inv_dx = jnp.zeros((b, hw + 1), jnp.float32).at[bidx, dest].set(-dx)[:, :hw]
        inv_dy = jnp.zeros((b, hw + 1), jnp.float32).at[bidx, dest].set(-dy)[:, :hw]
        mask = jnp.zeros((b, hw + 1), bool).at[bidx, dest].set(True)[:, :hw]
        inv_dx = inv_dx.reshape(b, h, w)
        inv_dy = inv_dy.reshape(b, h, w)
        mask = mask.reshape(b, h, w)

        if pad:
            p = n + 1
            inv_dx = jnp.pad(inv_dx, ((0, 0), (p, p), (p, p)))
            inv_dy = jnp.pad(inv_dy, ((0, 0), (p, p), (p, p)))
            mask = jnp.pad(mask, ((0, 0), (p, p), (p, p)))

        kern3 = jnp.tile(jnp.asarray(self.kernel)[:, :, None, None], (1, 1, 1, 3))
        for _ in range(niter):
            new_mask = _neighbor_any(mask) & (~mask)
            # one depthwise conv over (dx, dy, mask) instead of three
            stacked = jnp.stack([inv_dx, inv_dy, mask.astype(jnp.float32)], axis=-1)
            k = self.kernel.shape[0]
            filt = jax.lax.conv_general_dilated(
                stacked, kern3, (1, 1),
                [(k // 2, k // 2), (k // 2, k // 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=3,
                precision=jax.lax.Precision.HIGHEST,
            )
            fx, fy, s = filt[..., 0], filt[..., 1], filt[..., 2]
            s = jnp.where(s == 0, 1.0, s)
            inv_dx = jnp.where(new_mask, fx / s, inv_dx)
            inv_dy = jnp.where(new_mask, fy / s, inv_dy)
            mask = mask | new_mask

        if erode:
            for _ in range(niter):
                border = _neighbor_any(~mask) & mask
                mask = mask & (~border)

        inv_dx = jnp.where(mask, inv_dx, 2.0 * w)
        inv_dy = jnp.where(mask, inv_dy, 2.0 * h)

        if pad:
            p = n + 1
            inv_dx = inv_dx[:, p:-p, p:-p]
            inv_dy = inv_dy[:, p:-p, p:-p]

        dtgt = jnp.stack([inv_dx * (2.0 / w), inv_dy * (2.0 / h)], axis=-1)
        return self.tgt_grid[None] + dtgt

    def iterative(self, src_grid, niter=4, tol=0.05, precision="float32"):
        """Gather-based fixed-point inversion (opt-in fast path).

        Solves G(q) = q - u(G(q)) where u is the forward displacement field,
        by iterating v <- -u(q + v); all evaluations are grid_samples, so the
        whole inversion runs on the MXU sampler instead of scatters. Pixels
        that have not converged (fold-overs / disocclusions) are pushed far
        out of bounds like the reference's unfilled pixels. Deviation from
        the scatter path: no 5-step dilate-average hole filling — near-hole
        pixels extrapolate through the smooth fixed point instead.

        `niter` counts grid_sample evaluations. The convergence mask is the
        LAST iteration's step |v_k - v_{k-1}|, which for the pre-update
        iterate equals the fixed-point residual |F(q+v_{k-1}) - q| the old
        code measured with a separate extra sampler call. Default niter=4:
        same sample count as the old 3-iter+residual code, mask identical to
        the old residual of v_3, and the returned iterate is one step better
        (ADVICE r3).

        precision="fast" runs iterations 0..niter-2 with bf16 MXU sampling
        and only the FINAL evaluation in f32: the displacement values are
        O(1) in normalized units, so bf16 weight rounding perturbs an
        intermediate iterate by ~4e-3, and the contraction of the fixed
        point (|∂u| < 1 wherever the inverse exists) shrinks that below the
        f32 result's own hole-mask tolerance on the last step. An f32 MXU
        pass costs ~6x a bf16 pass, so the schedule cuts the inversion's
        matmul cost ~2.6x at niter=4 (audited on-chip:
        evidence_precision_audit.json).
        """
        from .grid_sample import grid_sample

        assert niter >= 1, "iterative inversion needs >=1 evaluation"
        b, hs, ws, _ = src_grid.shape
        h, w = self.tgt_shape
        u = src_grid - self.src_grid[None]  # displacement on the source lattice
        q = jnp.broadcast_to(self.tgt_grid[None], (b, h, w, 2))
        v = jnp.zeros_like(q)
        delta = q  # overwritten on the first iteration (niter >= 1)
        for k in range(niter):
            prec = "float32" if (k == niter - 1 or precision != "fast") else "fast"
            v_new = -grid_sample(u, q + v, precision=prec)
            delta = v_new - v
            v = v_new
        bad = (jnp.abs(delta).max(axis=-1, keepdims=True) > tol) | (
            jnp.abs(q + v).max(axis=-1, keepdims=True) > 1.0
        )
        far = jnp.stack(
            [jnp.full((b, h, w), 4.0), jnp.full((b, h, w), 4.0)], axis=-1
        )
        return jnp.where(bad, far, q + v)
