"""Pallas TPU kernel: fused bilinear sampling via hat-function matmuls.

Same math as ops.grid_sample.grid_sample_mxu (out[p,c] = sum_yx
hat(iy_p,y) hat(ix_p,x) tex[y,x,c]) with the work restricted to the source
rectangle a tile of output pixels actually samples from.

v7 (round 2, shaped by on-chip measurement) — pipelined bounding-box blocks:
- output pixels are re-tiled host-side into (ROWS, COLS) output PATCHES, so a
  kernel tile's source footprint is a small rectangle for the pipeline's
  smooth TPS/flow warps, and per-tile fixed costs amortize over 4096 pixels;
- each program processes a GROUP of TG tiles x all C channels. Per-tile
  source bounding boxes (from min/max of the sample coordinates) are
  precomputed into SMEM, then a flat (tile, channel) loop runs with
  ping-pong DMA: the next step's source block streams from HBM while the
  current step's (TILE_P, HB) @ (HB, WB) MXU dot runs (geometry constants
  below; retuned on-chip from (16,256)/(128,384) to (32,128)/(160,256)). v6 paid a serialized
  compute->scalar->DMA->compute latency chain (~20us) per single-tile
  program; v7 hides it;
- no (TILE_P, W) buffer ever exists, so VMEM stays small at any source
  size; tiles whose footprint exceeds the static (HB, WB) block
  (fast motion, strong TPS zoom) fall back via lax.cond to a generic
  block-culled loop over the whole plane — correctness never depends on the
  bbox fitting. Conservative activation is CORRECT, not just safe: a pixel
  whose iy lies outside a chunk has an all-zero ry row there;
- coordinates and outputs travel as (ROWS, COLS) spatial tiles (Pallas block
  rules require (8k, 128k) minor block dims); the kernel flattens a tile to
  a (TILE_P, 1) column with pltpu.repeat + an iota mask — pure VPU ops.

Mosaic hardware constraints (discovered on-chip; interpret mode hides them):
- tpu.iota only yields integer vectors — iota int32, then cast to f32;
- shape casts like (ROWS,COLS)<->(TILE_P,1) are unsupported inside kernels
  (repeat+mask / masked-dot conversions avoid them);
- direct VMEM vector loads cannot take data-dependent offsets; block
  fetches go through make_async_copy (DMAs accept them), with
  pl.multiple_of hints so Mosaic can prove tile alignment;
- dynamic block starts are aligned to sublane (8) / lane (128) multiples;
- the default MXU precision rounds operands to bf16 — the output-column
  conversion dot pins precision="float32".
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 32
COLS = 128
TILE_P = ROWS * COLS
TG = 16     # tiles per program (group)
HB = 160    # bbox block height (rows); sublane-aligned starts
WB = 256    # bbox block width (cols); lane-aligned starts
WCHUNK = 256  # fallback loop block width


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _col_from_tile(tile):
    """(ROWS, COLS) tile -> (TILE_P, 1) column with p = c*ROWS + r.

    pltpu.repeat (tile-style concat) gives M[p, c'] = tile[p % ROWS, c'];
    masking with E[p, c'] = [p // ROWS == c'] selects c' = p // ROWS. Pure
    VPU ops — exact, and far cheaper than a K=16 MXU dot."""
    m = pltpu.repeat(tile, TILE_P // ROWS, 0)  # (TILE_P, COLS)
    e = (_iota((TILE_P, COLS), 0) // ROWS == _iota((TILE_P, COLS), 1))
    return jnp.sum(m * e.astype(jnp.float32), axis=1, keepdims=True)


def _tile_from_col(col, precision="float32"):
    """(TILE_P, 1) column -> (ROWS, COLS) tile (inverse of _col_from_tile):
    out[r, c'] = col[c'*ROWS + r] via St[r, p] = [p % ROWS == r] applied to
    the E-masked column. In "float32" mode the dot pins f32 precision
    (values must not round to bf16); in fast mode bf16 rounding (~4e-3
    relative) matches the advertised tolerance of the fast sample path."""
    st = (_iota((ROWS, TILE_P), 1) % ROWS == _iota((ROWS, TILE_P), 0))
    e = (_iota((TILE_P, COLS), 0) // ROWS == _iota((TILE_P, COLS), 1))
    return jax.lax.dot_general(
        st.astype(jnp.float32), col * e.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _hats(ix, iy, x0, y0, wc, hc):
    """Hat (bilinear weight) matrices of a tile against a source block."""
    idx_h = _iota((TILE_P, hc), 1).astype(jnp.float32) + y0
    ry = jnp.maximum(1.0 - jnp.abs(iy - idx_h), 0.0)
    idx_w = _iota((TILE_P, wc), 1).astype(jnp.float32) + x0
    rx = jnp.maximum(1.0 - jnp.abs(ix - idx_w), 0.0)
    return ry, rx


def _hat_contrib(tex_b, ry, rx, precision):
    """((ry @ tex_b) * rx).sum(lanes) -> (TILE_P, 1)."""
    m = jax.lax.dot_general(
        ry, tex_b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return (m * rx).sum(axis=1, keepdims=True)


def _block_contrib(tex_b, ix, iy, x0, y0, wc, hc, precision):
    """Contribution of source block tex_b (hc, wc) at (y0, x0) to the tile."""
    ry, rx = _hats(ix, iy, x0, y0, wc, hc)
    return _hat_contrib(tex_b, ry, rx, precision)


def _kernel(tex_hbm, ix_ref, iy_ref, out_ref, bufs, sems, fb_buf, fb_sem,
            bounds, *, h, w, c, hb, wb, hc, wc, precision, shared):
    """shared=True: one grid per image, all channels sample along it (ctx
    fusion). shared=False: per-channel grids (the alpha_ctx warp: each
    layer-alpha plane rides its own flow) — bounds are then per step."""
    i = pl.program_id(0)
    n_steps = TG * c
    n_bounds = TG if shared else TG * c

    def coords(t, ck):
        cc = 0 if shared else ck
        return (_col_from_tile(ix_ref[0, cc, t]),
                _col_from_tile(iy_ref[0, cc, t]))

    # -- phase 1: per-tile (or per-step) bbox bounds into SMEM ------------
    def bounds_body(q, _):
        t = q if shared else q // c
        ck = 0 if shared else q % c
        ixc, iyc = coords(t, ck)
        ylo = jnp.maximum(jnp.floor(jnp.min(iyc)), 0.0)
        yhi = jnp.minimum(jnp.floor(jnp.max(iyc)) + 1.0, h - 1.0)
        xlo = jnp.maximum(jnp.floor(jnp.min(ixc)), 0.0)
        xhi = jnp.minimum(jnp.floor(jnp.max(ixc)) + 1.0, w - 1.0)
        y0 = jnp.clip((ylo.astype(jnp.int32) // 8) * 8, 0, h - hb)
        x0 = jnp.clip((xlo.astype(jnp.int32) // 128) * 128, 0, w - wb)
        fits = ((yhi.astype(jnp.int32) - y0 < hb)
                & (xhi.astype(jnp.int32) - x0 < wb))
        bounds[q, 0] = y0
        bounds[q, 1] = x0
        bounds[q, 2] = fits.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, n_bounds, bounds_body, 0)

    # -- DMA helpers ------------------------------------------------------
    def step_copy(s):
        """Copy descriptor for step s (tile s // c, channel s % c)."""
        t = s // c
        ck = s % c
        q = t if shared else s
        y0 = pl.multiple_of(bounds[q, 0], 8)
        x0 = pl.multiple_of(bounds[q, 1], 128)
        buf = jax.lax.rem(s, 2)
        return pltpu.make_async_copy(
            tex_hbm.at[i, ck, pl.ds(y0, hb), pl.ds(x0, wb)],
            bufs.at[buf],
            sems.at[buf],
        )

    def start(s):
        step_copy(s).start()

    # -- phase 2: flat (tile, channel) loop, ping-pong DMA ----------------
    start(0)

    def step_body(s, _):
        t = s // c
        ck = s % c

        @pl.when(s + 1 < n_steps)
        def _():
            start(s + 1)

        # NOTE: carrying the hats across the channel loop (recompute only at
        # ck==0) was measured SLOWER (413 vs 244 ms on the C=23 fusion shape)
        # — the (TILE_P, WB) cond/loop carries cost more than the recompute.
        ixc, iyc = coords(t, ck)
        q = t if shared else s
        y0 = bounds[q, 0]
        x0 = bounds[q, 1]
        fits = bounds[q, 2] == 1
        step_copy(s).wait()

        def bbox(_):
            buf = jax.lax.rem(s, 2)
            return _block_contrib(bufs[buf], ixc, iyc,
                                  x0.astype(jnp.float32),
                                  y0.astype(jnp.float32), wb, hb, precision)

        def full_loop(_):
            # hc | h and wc | w (wrapper invariant): exact tiling, no overlap

            n_y = h // hc
            n_x = w // wc

            def y_body(ky, acc):
                cy0 = ky * hc
                any_y = jnp.any((iyc > cy0 - 1.0) & (iyc < cy0 + hc))

                def x_body(kx, acc):
                    cx0 = kx * wc
                    active = any_y & jnp.any(
                        (ixc > cx0 - 1.0) & (ixc < cx0 + wc))

                    def do(acc):
                        cp = pltpu.make_async_copy(
                            tex_hbm.at[i, ck, pl.ds(cy0, hc), pl.ds(cx0, wc)],
                            fb_buf,
                            fb_sem,
                        )
                        cp.start()
                        cp.wait()
                        return acc + _block_contrib(
                            fb_buf[...], ixc, iyc, jnp.float32(0) + cx0,
                            jnp.float32(0) + cy0, wc, hc, precision)

                    return jax.lax.cond(active, do, lambda a: a, acc)

                return jax.lax.fori_loop(0, n_x, x_body, acc)

            return jax.lax.fori_loop(0, n_y, y_body,
                                     jnp.zeros((TILE_P, 1), jnp.float32))

        acc = jax.lax.cond(fits, bbox, full_loop, 0)
        out_ref[0, ck, t] = _tile_from_col(
            acc, "float32" if precision == "float32" else None)
        return 0

    jax.lax.fori_loop(0, n_steps, step_body, 0)


def _patch_tile(a, gh, gw):
    """(B, gh, gw) -> (B, n_tiles, ROWS, COLS): square-ish output patches so
    each kernel tile has a small source footprint."""
    b = a.shape[0]
    a = a.reshape(b, gh // ROWS, ROWS, gw // COLS, COLS)
    a = jnp.transpose(a, (0, 1, 3, 2, 4))
    return a.reshape(b, -1, ROWS, COLS)


def _patch_untile(a, gh, gw):
    """(B, C, n_tiles, ROWS, COLS) -> (B, C, gh, gw)."""
    b, c = a.shape[:2]
    a = a.reshape(b, c, gh // ROWS, gw // COLS, ROWS, COLS)
    a = jnp.transpose(a, (0, 1, 2, 4, 3, 5))
    return a.reshape(b, c, gh, gw)


@functools.partial(jax.jit, static_argnames=("precision", "interpret"))
def grid_sample_pallas(img: jnp.ndarray, grid: jnp.ndarray,
                       precision: str = "float32", interpret: bool = False):
    """img (B,H,W,C), grid (B,Ho,Wo,2) or per-channel (B,C,Ho,Wo,2)
    -> (B,Ho,Wo,C); torch zero-pad semantics (align_corners=False).

    The per-channel form samples img[..., k] along grid[:, k] — the
    alpha_ctx warp's shape (layers = channels, each with its own flow),
    amortizing program launches C-fold vs C separate single-channel calls."""
    b, h, w, c = img.shape
    in_dtype = img.dtype
    if img.dtype != jnp.float32:
        # the kernel's VMEM scratch and accumulators are f32; bf16 sources
        # would crash the DMA (dtype-mismatched dynamic_update_slice)
        img = img.astype(jnp.float32)
    shared = grid.ndim == 4
    if shared:
        grid = grid[:, None]
    gc = grid.shape[1]
    assert gc == (1 if shared else c), (img.shape, grid.shape)
    _, _, gh, gw, _ = grid.shape
    ix = (grid[..., 0] + 1.0) * (w * 0.5) - 0.5
    iy = (grid[..., 1] + 1.0) * (h * 0.5) - 0.5

    # pad the source plane to aligned sizes (zero rows/cols are never hit by
    # in-range coords and contribute zero — torch zero-pad preserved); the
    # in-kernel blocks shrink to the plane when it is smaller than (HB, WB)
    hh = h + (-h % 8)
    ww = w + (-w % 128)
    if (hh, ww) != (h, w):
        img = jnp.pad(img, ((0, 0), (0, hh - h), (0, ww - w), (0, 0)))
    # block geometry: bbox block (hb, wb) <= plane; fallback blocks (hc, wc)
    # exactly tile the plane (divisors), so no overlap double-counts and no
    # fetch overruns
    hb = min(hh, HB)
    wb = min(ww, WB)
    hc = max(d for d in (64, 32, 16, 8) if hh % d == 0)
    wc = max(d for d in (WCHUNK, 128) if ww % d == 0)

    # pad the output to (ROWS, COLS) patch multiples AND the tile count to a
    # group multiple. Spatial pad lanes REPLICATE the edge coordinate (not a
    # far-out sentinel): they enter the per-tile bbox min/max, and a sentinel
    # would anchor edge-tile bboxes at the plane origin, forfeiting the bbox
    # fast path for every non-(ROWS,COLS)-multiple output (ADVICE r2). The
    # replicated lanes compute duplicates of real pixels, cropped after.
    ghp, gwp = -gh % ROWS, -gw % COLS
    if ghp or gwp:
        pad5 = ((0, 0), (0, 0), (0, ghp), (0, gwp))
        ix = jnp.pad(ix, pad5, mode="edge")
        iy = jnp.pad(iy, pad5, mode="edge")
    ghh, gww = gh + ghp, gw + gwp
    ix = _patch_tile(ix.reshape(b * gc, ghh, gww), ghh, gww)
    iy = _patch_tile(iy.reshape(b * gc, ghh, gww), ghh, gww)
    n_tiles = ix.shape[1]
    gpad = -n_tiles % TG
    if gpad:
        ix = jnp.pad(ix, ((0, 0), (0, gpad), (0, 0), (0, 0)),
                     constant_values=-10.0)
        iy = jnp.pad(iy, ((0, 0), (0, gpad), (0, 0), (0, 0)),
                     constant_values=-10.0)
    n_tp = n_tiles + gpad
    ix = ix.reshape(b, gc, n_tp, ROWS, COLS)
    iy = iy.reshape(b, gc, n_tp, ROWS, COLS)
    n_groups = n_tp // TG
    tex = jnp.moveaxis(img, -1, 1)  # (B, C, H, W)

    prec = "float32" if precision == "float32" else None
    out = pl.pallas_call(
        functools.partial(_kernel, h=hh, w=ww, c=c, hb=hb, wb=wb, hc=hc,
                          wc=wc, precision=prec, shared=shared),
        grid=(b, n_groups),
        in_specs=[
            # the source stays in HBM; the kernel DMAs only the blocks it
            # needs (data-dependent offsets are legal for DMAs)
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, gc, TG, ROWS, COLS),
                         lambda i, g: (i, 0, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gc, TG, ROWS, COLS),
                         lambda i, g: (i, 0, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, TG, ROWS, COLS),
                               lambda i, g: (i, 0, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, n_tp, ROWS, COLS), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, hb, wb), jnp.float32),       # ping-pong blocks
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((hc, wc), jnp.float32),          # fallback block
            pltpu.SemaphoreType.DMA,
            # y0, x0, fits — per tile (shared grids) or per step
            pltpu.SMEM((TG if shared else TG * c, 3), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            # one bbox block per (tile, channel) for smooth warps
            flops=2 * b * c * n_tp * TILE_P * hb * wb // max(hb * wb // (64 * 256), 1),
            bytes_accessed=b * c * n_tp * (hb * wb + 3 * TILE_P) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tex, ix, iy)
    out = out[:, :, :n_tiles]
    out = _patch_untile(out, ghh, gww)[:, :, :gh, :gw]
    return jnp.moveaxis(out, 1, -1).astype(in_dtype)
