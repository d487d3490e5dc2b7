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
  below; retuned on-chip (16,256)/(128,384) -> (32,128)/(160,256) -> r3:
  (32,128)/(96,256) after raw-tile bounds). v6 paid a serialized
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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 32
COLS = 128
TILE_P = ROWS * COLS
TG = 16     # tiles per program (group)
HB = 96     # bbox block height (rows); sublane-aligned starts. Retuned
            # 160->96 after the raw-tile bounds change (both HD kernels
            # ~12% faster; 64 measured no further gain). A 32-row tile
            # footprint needs y-spread > 55 rows to overflow 96 — such
            # tiles fall back to the (correct) full-plane loop.
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
    # NOTE: replacing this VPU lane reduction with an MXU ones-dot was
    # measured ~2x SLOWER (the MXU is already saturated by the hat dots)
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
    """((ry @ tex_b) * rx).sum(lanes) -> (TILE_P, 1).

    NOTE: running the lane reduction as an MXU ones-dot was measured SLOWER
    than this VPU sum in BOTH precisions and in isolation (the MXU->VPU->MXU
    round-trip serializes against the hat dot); so was pinning f32 on the
    coordinate conversion dots. Keep the reductions on the VPU."""
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


# --- scratch-hoisted variants (the iota/mask constants these helpers build
# are loop-invariant, but Mosaic rematerializes them per fori_loop step; in
# per-channel-grid kernels that build was a dominant per-step VPU cost, so
# the kernels precompute them ONCE per program into VMEM scratch) ---------


def _init_consts(e_s, st_s, ih_s, iw_s):
    """Fill the constant scratch: E selector (TILE_P, COLS), St scatter
    (ROWS, TILE_P), and the hat iotas (TILE_P, hb) / (TILE_P, wb)."""
    e_s[...] = (_iota((TILE_P, COLS), 0) // ROWS
                == _iota((TILE_P, COLS), 1)).astype(jnp.float32)
    st_s[...] = (_iota((ROWS, TILE_P), 1) % ROWS
                 == _iota((ROWS, TILE_P), 0)).astype(jnp.float32)
    ih_s[...] = _iota(ih_s.shape, 1).astype(jnp.float32)
    iw_s[...] = _iota(iw_s.shape, 1).astype(jnp.float32)


def _col_from_tile_s(tile, e_s):
    """_col_from_tile with the E selector read from scratch."""
    m = pltpu.repeat(tile, TILE_P // ROWS, 0)
    return jnp.sum(m * e_s[...], axis=1, keepdims=True)


def _tile_from_col_s(col, st_s, e_s, precision):
    """_tile_from_col with St/E read from scratch."""
    return jax.lax.dot_general(
        st_s[...], col * e_s[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _block_contrib_s(tex_b, ix, iy, x0, y0, ih_s, iw_s, precision):
    """_block_contrib with hat iotas from scratch: the per-step work drops
    to two (TILE_P, 1) shifts + the |.|/max hat evaluations."""
    ry = jnp.maximum(1.0 - jnp.abs((iy - y0) - ih_s[...]), 0.0)
    rx = jnp.maximum(1.0 - jnp.abs((ix - x0) - iw_s[...]), 0.0)
    return _hat_contrib(tex_b, ry, rx, precision)


def _kernel(tex_hbm, ix_ref, iy_ref, bnd_ref, out_ref, bufs, sems, fb_buf,
            fb_sem, hats_s, *, h, w, c, hb, wb, hc, wc, precision, shared,
            kc=1, tp=1):
    """shared=True: one grid per image, all channels sample along it (ctx
    fusion). shared=False: per-channel grids (the alpha_ctx warp: each
    layer-alpha plane rides its own flow) — bounds are then per step.

    v8: for shared grids the per-tile work that channels can reuse — the
    tile->column coordinate conversion and the (TILE_P, hb)/(TILE_P, wb)
    hat matrices — is computed once per tile (at ck==0) into VMEM scratch
    instead of once per (tile, channel) step. The earlier attempt carried
    hats as loop state (slower, see NOTE below); scratch refs avoid the
    carry entirely. Measured on the HD C=23 fusion shape this per-step VPU
    cost (~3.5us of iota/abs/max + repeat/mask ops) dominated the kernel.

    v9 (shared only): each step processes a BLOCK of kc channels — one DMA
    brings (kc, hb, wb), the loop runs TG * ceil(c/kc) steps, amortizing
    the per-step fixed cost (cond/SMEM/semaphore) kc-fold. The tail block
    is clamped to start at c-kc: the overlapped channels recompute the same
    values into the same out slots (idempotent).

    v10: bounds [y0, x0, fits, skip] arrive precomputed in SMEM (bnd_ref,
    (1, TG, gc, 4) with gc = 1 for shared grids) — see _host_bounds /
    _skip_flags. Skipped steps (provably all-zero output: empty footprint,
    group-pad sentinel tiles, or an all-zero source region — the alpha
    planes of the training-path multigrid warp) write zero tiles with no
    DMA / hats / dot."""
    i = pl.program_id(0)
    # texture-row mapping (tp_sz): tp grid rows share one texture row
    ti = i if tp == 1 else i // tp
    nblk = -(-c // kc) if shared else c
    n_steps = TG * nblk

    def chan_start(blk):
        if kc == 1:
            return blk
        return jnp.minimum(blk * kc, c - kc)

    def coords(t, ck):
        cc = 0 if shared else ck
        return (_col_from_tile(ix_ref[0, cc, t]),
                _col_from_tile(iy_ref[0, cc, t]))

    def bnd(s, j):
        t = s // nblk
        ck = 0 if shared else s % c
        return bnd_ref[0, t, ck, j]

    def live(s):
        return bnd(s, 3) == 0

    # -- DMA helpers ------------------------------------------------------
    def step_copy(s):
        """Copy descriptor for step s (tile s // nblk, channel block
        s % nblk: kc planes from chan_start)."""
        cs = chan_start(s % nblk)
        y0 = pl.multiple_of(bnd(s, 0), 8)
        x0 = pl.multiple_of(bnd(s, 1), 128)
        buf = jax.lax.rem(s, 2)
        return pltpu.make_async_copy(
            tex_hbm.at[ti, pl.ds(cs, kc), pl.ds(y0, hb), pl.ds(x0, wb)],
            bufs.at[buf],
            sems.at[buf],
        )

    # -- flat (tile, channel-block) loop, ping-pong DMA --------------------
    @pl.when(live(0))
    def _():
        step_copy(0).start()

    def step_body(s, _):
        t = s // nblk
        blk = s % nblk
        cs = chan_start(blk)

        @pl.when((s + 1 < n_steps) & live(jnp.minimum(s + 1, n_steps - 1)))
        def _():
            step_copy(s + 1).start()

        # NOTE: carrying the hats across the channel loop as LOOP STATE was
        # measured SLOWER (413 vs 244 ms on the C=23 fusion shape) — the
        # (TILE_P, WB) cond/loop carries cost more than the recompute. v8
        # instead stores them in VMEM scratch at ck==0 (no carries), which
        # removes the dominant per-step VPU cost for shared grids.
        y0 = bnd(s, 0)
        x0 = bnd(s, 1)
        fits = bnd(s, 2) == 1

        def sample(_):
            if shared:
                @pl.when(blk == 0)
                def _():
                    ixc, iyc = coords(t, 0)
                    ry, rx = _hats(ixc, iyc, x0.astype(jnp.float32),
                                   y0.astype(jnp.float32), wb, hb)
                    hats_s[0, :, :hb] = ry
                    hats_s[1, :, :wb] = rx
            else:
                ixc, iyc = coords(t, blk)
            step_copy(s).wait()

            def bbox(_):
                buf = jax.lax.rem(s, 2)
                if shared:
                    cols = [_hat_contrib(bufs[buf, j], hats_s[0, :, :hb],
                                         hats_s[1, :, :wb], precision)
                            for j in range(kc)]
                    return jnp.concatenate(cols, axis=1) if kc > 1 else cols[0]
                return _block_contrib(bufs[buf, 0], ixc, iyc,
                                      x0.astype(jnp.float32),
                                      y0.astype(jnp.float32), wb, hb,
                                      precision)

            def full_loop(_):
                # hc | h, wc | w (wrapper invariant): exact tiling, no overlap
                if shared:  # rare path: recompute coords (not kept in scratch)
                    ixc, iyc = coords(t, 0)
                else:
                    ixc, iyc = coords(t, blk)

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
                                tex_hbm.at[ti, pl.ds(cs, kc),
                                           pl.ds(cy0, hc), pl.ds(cx0, wc)],
                                fb_buf,
                                fb_sem,
                            )
                            cp.start()
                            cp.wait()
                            parts = [
                                _block_contrib(
                                    fb_buf[j], ixc, iyc,
                                    jnp.float32(0) + cx0,
                                    jnp.float32(0) + cy0, wc, hc, precision)
                                for j in range(kc)
                            ]
                            return acc + (jnp.concatenate(parts, axis=1)
                                          if kc > 1 else parts[0])

                        return jax.lax.cond(active, do, lambda a: a, acc)

                    return jax.lax.fori_loop(0, n_x, x_body, acc)

                return jax.lax.fori_loop(0, n_y, y_body,
                                         jnp.zeros((TILE_P, kc), jnp.float32))

            return jax.lax.cond(fits, bbox, full_loop, 0)

        acc = jax.lax.cond(
            live(s), sample,
            lambda _: jnp.zeros((TILE_P, kc), jnp.float32), 0)
        out_prec = "float32" if precision == "float32" else None
        for j in range(kc):
            out_ref[0, cs + j, t] = _tile_from_col(acc[:, j:j + 1], out_prec)
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


@functools.partial(jax.jit, static_argnames=("precision", "interpret",
                                             "block_hb", "tp_sz"))
def grid_sample_pallas(img: jnp.ndarray, grid: jnp.ndarray,
                       precision: str = "float32", interpret: bool = False,
                       block_hb: int | None = None, tp_sz: int = 1):
    """img (B,H,W,C), grid (B,Ho,Wo,2) or per-channel (B,C,Ho,Wo,2)
    -> (B,Ho,Wo,C); torch zero-pad semantics (align_corners=False).

    The per-channel form samples img[..., k] along grid[:, k] — the
    alpha_ctx warp's shape (layers = channels, each with its own flow),
    amortizing program launches C-fold vs C separate single-channel calls.

    tp_sz > 1 (shared grids only): grid row i samples TEXTURE row
    i // tp_sz — img carries B // tp_sz unique textures and the output has
    one row per grid. This is the context-fusion shape (each ctx frame
    warped to tp_sz prediction frames): the caller no longer materializes
    tp_sz HBM copies of every ctx frame just to batch the sampler."""
    bt, h, w, c = img.shape
    in_dtype = img.dtype
    if img.dtype != jnp.float32:
        # the kernel's VMEM scratch and accumulators are f32; bf16 sources
        # would crash the DMA (dtype-mismatched dynamic_update_slice)
        img = img.astype(jnp.float32)
    shared = grid.ndim == 4
    if shared:
        grid = grid[:, None]
    assert tp_sz == 1 or shared, "tp_sz mapping needs shared grids"
    b = grid.shape[0]
    assert b == bt * tp_sz, (img.shape, grid.shape, tp_sz)
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
    hb = min(hh, block_hb or HB)
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

    # v10: bounds + sparsity skip precomputed host-side (XLA-batched; the
    # in-kernel phase-1 loop ran the same reductions serially). For shared
    # grids the skip is per TILE (empty/sentinel footprint, or every
    # channel zero over it); per-channel grids skip per (tile, channel) —
    # the training-path alpha warp's planes are mostly zeros.
    bnd3, footprint = _host_bounds(ix, iy, hh, ww, hb, wb)  # (B, gc, n_tp, 3)
    rows = jnp.arange(b, dtype=jnp.int32) // tp_sz  # grid row -> texture row
    if shared:
        nz_any = (tex != 0).any(axis=1, keepdims=True).astype(jnp.float32)
        skip = _skip_flags(nz_any, footprint, rows)  # (B, 1, n_tp)
    else:
        skip = _skip_flags(tex, footprint, rows)  # (B, C, n_tp)
    bnd = jnp.concatenate([bnd3, skip[..., None]], axis=-1)
    bnd = jnp.moveaxis(bnd, 1, 2)  # (B, n_tp, gc, 4)

    prec = "float32" if precision == "float32" else None
    # v9: shared grids process channel BLOCKS per step (one DMA, 1/kc the
    # loop overhead); per-channel grids keep kc=1. Measured on-chip at the
    # HD C=23 fusion shape: kc=1 4311 / 2 2388 / 4 1413 / 8 941 / 16 1083 /
    # 23 837 ms — monotone except kc=16, whose clamped tail block recomputes
    # 9 of 23 channels. Default: ALL channels in one step (capped at 32 to
    # bound the unrolled per-step dot chain and the 2*kc*hb*wb VMEM).
    kc_default = -(-c // -(-c // 32))  # even split: no clamped-tail overlap
    if shared and prec == "float32":
        # the unrolled per-step dot chain keeps kc live (TILE_P, wb) f32
        # matmul temporaries plus the 2*kc*hb*wb ping-pong blocks; at f32
        # Mosaic's scoped-vmem accounting blows the 100M limit near kc=23
        # at HD shapes (measured: f32[12,23,512,1024] src, 512x1024 grid ->
        # 103.83M > 100M). Cap kc so the chain stays under ~56M and
        # re-split evenly to keep the no-overlap tail invariant.
        per_kc = (TILE_P * wb + 2 * hb * wb) * 4
        kc_cap = max(1, (56 * 1024 * 1024) // per_kc)
        if kc_cap < kc_default:
            kc_default = -(-c // -(-c // kc_cap))
    kc = min(int(os.environ.get("WALDO_PALLAS_KC", str(kc_default))),
             c) if shared else 1
    out = pl.pallas_call(
        functools.partial(_kernel, h=hh, w=ww, c=c, hb=hb, wb=wb, hc=hc,
                          wc=wc, precision=prec, shared=shared, kc=kc,
                          tp=tp_sz),
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
            pl.BlockSpec((1, TG, gc, 4), lambda i, g: (i, g, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, c, TG, ROWS, COLS),
                               lambda i, g: (i, 0, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, n_tp, ROWS, COLS), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, kc, hb, wb), jnp.float32),   # ping-pong blocks
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((kc, hc, wc), jnp.float32),      # fallback block
            pltpu.SemaphoreType.DMA,
            # per-tile hat matrices, shared across the channel loop (v8);
            # token-sized when grids are per-channel (hats not reusable)
            pltpu.VMEM((2, TILE_P, max(hb, wb)) if shared else (2, 8, 128),
                       jnp.float32),
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
    )(tex, ix, iy, bnd)
    out = out[:, :, :n_tiles]
    out = _patch_untile(out, ghh, gww)[:, :, :gh, :gw]
    return jnp.moveaxis(out, 1, -1).astype(in_dtype)


# ---------------------------------------------------------------------------
# Fused alpha_ctx warp (multigrid sample + occlusion + flow reduction)
# ---------------------------------------------------------------------------


def _host_bounds(ix, iy, h, w, hb, wb):
    """Per-(row, tile) bbox bounds [y0, x0, fits], computed OUTSIDE the
    kernel (v10): XLA batches the min/max reductions over every
    (program, channel, tile) at once, where the in-kernel phase-1 loop ran
    them serially per step (~15-20%% of the fused kernel's time at HD).

    ix, iy: (..., n_tp, ROWS, COLS) pixel-space sample coords (padded
    layout, including -10 group-pad sentinels). Returns int32 (..., n_tp, 3)
    plus the exact inclusive pixel footprint (r0, r1, c0, c1) for the
    sparsity query."""
    iy_min = iy.min(axis=(-2, -1))
    iy_max = iy.max(axis=(-2, -1))
    ix_min = ix.min(axis=(-2, -1))
    ix_max = ix.max(axis=(-2, -1))
    # inclusive source-row/col support of the bilinear hats
    r0 = jnp.floor(iy_min).astype(jnp.int32)
    r1 = jnp.floor(iy_max).astype(jnp.int32) + 1
    c0 = jnp.floor(ix_min).astype(jnp.int32)
    c1 = jnp.floor(ix_max).astype(jnp.int32) + 1
    ylo = jnp.maximum(r0, 0)
    yhi = jnp.minimum(r1, h - 1)
    xlo = jnp.maximum(c0, 0)
    xhi = jnp.minimum(c1, w - 1)
    y0 = jnp.clip((ylo // 8) * 8, 0, h - hb)
    x0 = jnp.clip((xlo // 128) * 128, 0, w - wb)
    fits = ((yhi - y0 < hb) & (xhi - x0 < wb)).astype(jnp.int32)
    return jnp.stack([y0, x0, fits], axis=-1), (r0, r1, c0, c1)


_CY, _CX = 8, 128  # coarse nonzero-map cell (sublane x lane: free layout)


def _skip_flags(tex, footprint, frame_of_row):
    """Sparsity skip flags (v10): a (tile, channel) step whose source
    footprint contains no nonzero texel samples exactly zero (bilinear with
    zero padding), so the kernel can skip its DMA + hats + MXU dot and
    write a zero tile. Object alpha planes are exactly zero outside each
    object's warped TPS quad (typically >90% of an HD frame), making this
    the dominant work filter for the alpha_ctx warp.

    tex: (F, C, H, W) f32, already padded to (8, 128)-aligned dims (the
    pad region is zero, so counts are unchanged). footprint: inclusive
    pixel ranges (r0, r1, c0, c1), each (N, C, n_tp) int32. frame_of_row:
    (N,) int32 mapping a program row to its unique frame. Returns skip
    (N, C, n_tp) int32 (1 = provably all-zero output tile, incl. fully
    out-of-range tiles and -10 group-pad sentinels)."""
    f, c, h, w = tex.shape
    hy, wx = h // _CY, w // _CX
    cells = (tex != 0).reshape(f, c, hy, _CY, wx, _CX).any(axis=(3, 5))
    # integral image: S[y, x] = #nonzero cells in [0, y) x [0, x)
    s = jnp.cumsum(jnp.cumsum(cells.astype(jnp.int32), axis=2), axis=3)
    s = jnp.pad(s, ((0, 0), (0, 0), (1, 0), (1, 0)))
    r0, r1, c0, c1 = footprint
    cy0 = jnp.clip(jnp.maximum(r0, 0) // _CY, 0, hy)
    cx0 = jnp.clip(jnp.maximum(c0, 0) // _CX, 0, wx)
    cy1 = jnp.clip(jnp.minimum(r1, h - 1) // _CY + 1, 0, hy)
    cx1 = jnp.clip(jnp.minimum(c1, w - 1) // _CX + 1, 0, wx)
    # empty ranges (fully out-of-plane / sentinel tiles) -> zero-area rect
    cy1 = jnp.maximum(cy1, cy0)
    cx1 = jnp.maximum(cx1, cx0)
    fi = frame_of_row[:, None, None]
    ck = jnp.arange(c)[None, :, None]
    count = (s[fi, ck, cy1, cx1] - s[fi, ck, cy0, cx1]
             - s[fi, ck, cy1, cx0] + s[fi, ck, cy0, cx0])
    return (count == 0).astype(jnp.int32)


def _war_kernel(tex_hbm, ix_ref, iy_ref, occ_ref, io_ref, bnd_ref, out_ref,
                bufs, sems, fb_buf, fb_sem, tiles_s,
                e_s, st_s, ih_s, iw_s, *,
                h, w, c, hb, wb, hc, wc, gh_real, gw_real, sh_real, sw_real,
                ntx, tp_sz, precision, has_isobj):
    """Fused kernel for the Warper's alpha_ctx stage (lvd.py:676-695):
    per-layer bilinear sample of the context-frame alphas along per-layer
    flows, the ghost mask multiply, the prediction-time occlusion product
    prod_i (1 - a_i * occ[i, j]), the disocclusion max, and the
    alpha-weighted flow reduction — all per output tile, so the
    (B, Tc, Tp, No+1, H, W) alpha tensors are produced occluded in one pass
    and the per-layer HD flow field is never re-read for the reduction.

    tex rows hold the UNIQUE window frames (b*Tc), not the (b*Tc*Tp)
    gathered copies: program i reads frame i // tp_sz (valid because the
    predict path's ctx_ts is arange(Tc) broadcast over Tp — the wrapper
    asserts this contract).

    Output channels: [0:c] occluded per-layer alphas, [c] disocc max,
    [c+1] flow_x, [c+2] flow_y (normalized units, g_j - base_grid).

    v10: bounds [y0, x0, fits] arrive precomputed in SMEM (bnd_ref, see
    _host_bounds — the serial in-kernel phase-1 loop was ~15-20% of kernel
    time) together with a per-(tile, channel) skip flag (bnd_ref[..., 3],
    see _skip_flags): steps whose source footprint is provably all-zero
    write a zero tile and run NO DMA / hats / dot. Object alpha planes are
    zero outside their warped TPS quads, so most steps skip at HD."""
    i = pl.program_id(0)
    g = pl.program_id(1)
    fi = i // tp_sz  # unique window-frame row (b*Tc + tc)
    n_steps = TG * c
    _init_consts(e_s, st_s, ih_s, iw_s)

    def coords(t, ck):
        return (_col_from_tile_s(ix_ref[0, ck, t], e_s),
                _col_from_tile_s(iy_ref[0, ck, t], e_s))

    def live(s):
        """Step s runs (not skipped). Callers clamp s < n_steps."""
        return bnd_ref[0, s // c, s % c, 3] == 0

    def step_copy(s):
        t = s // c
        ck = s % c
        y0 = pl.multiple_of(bnd_ref[0, t, ck, 0], 8)
        x0 = pl.multiple_of(bnd_ref[0, t, ck, 1], 128)
        buf = jax.lax.rem(s, 2)
        return pltpu.make_async_copy(
            tex_hbm.at[fi, ck, pl.ds(y0, hb), pl.ds(x0, wb)],
            bufs.at[buf],
            sems.at[buf],
        )

    @pl.when(live(0))
    def _():
        step_copy(0).start()

    def step_body(s, _):
        t = s // c
        ck = s % c

        @pl.when((s + 1 < n_steps) & live(jnp.minimum(s + 1, n_steps - 1)))
        def _():
            step_copy(s + 1).start()

        y0 = bnd_ref[0, t, ck, 0]
        x0 = bnd_ref[0, t, ck, 1]
        fits = bnd_ref[0, t, ck, 2] == 1

        def sample(_):
            ixc, iyc = coords(t, ck)
            step_copy(s).wait()

            def bbox(_):
                buf = jax.lax.rem(s, 2)
                return _block_contrib_s(bufs[buf], ixc, iyc,
                                        x0.astype(jnp.float32),
                                        y0.astype(jnp.float32),
                                        ih_s, iw_s, precision)

            def full_loop(_):
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
                                tex_hbm.at[fi, ck,
                                           pl.ds(cy0, hc), pl.ds(cx0, wc)],
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
            tile = _tile_from_col_s(acc, st_s, e_s, precision)
            if has_isobj:
                tile = tile * io_ref[0, ck, t].astype(jnp.float32)
            return tile

        tiles_s[ck] = jax.lax.cond(
            live(s), sample, lambda _: jnp.zeros((ROWS, COLS), jnp.float32), 0)

        # -- epilogue once the tile has all layers sampled ----------------
        @pl.when(ck == c - 1)
        def _():
            a = [tiles_s[j] for j in range(c)]
            dis = a[0]
            for j in range(1, c):
                dis = jnp.maximum(dis, a[j])
            out_ref[0, c, t] = dis

            # output-pixel base grid (pixel centers, get_grid convention);
            # the padded/duplicate lanes compute croppable junk
            tg = g * TG + t
            px = ((tg % ntx) * COLS + _iota((ROWS, COLS), 1)).astype(jnp.float32)
            py = ((tg // ntx) * ROWS + _iota((ROWS, COLS), 0)).astype(jnp.float32)
            base_x = (px + 0.5) * (2.0 / gw_real) - 1.0
            base_y = (py + 0.5) * (2.0 / gh_real) - 1.0
            fx = jnp.zeros((ROWS, COLS), jnp.float32)
            fy = jnp.zeros((ROWS, COLS), jnp.float32)
            for j in range(c):
                # prediction-time occlusion product over occluders iq
                pj = 1.0 - a[0] * occ_ref[0, 0, j]
                for iq in range(1, c):
                    pj = pj * (1.0 - a[iq] * occ_ref[0, iq, j])
                aj = pj * a[j]
                out_ref[0, j, t] = aj
                # flow_j from this layer's sample coordinates: the wrapper
                # built ix = (g + 1) * sw/2 - 0.5 with the REAL source dims
                # (pre-pad), so g_j = (ix + 0.5) * 2/sw - 1 recovers exactly
                # and the flow needs no extra inputs
                gx = (ix_ref[0, j, t] + 0.5) * (2.0 / sw_real) - 1.0
                gy = (iy_ref[0, j, t] + 0.5) * (2.0 / sh_real) - 1.0
                fx = fx + aj * (gx - base_x)
                fy = fy + aj * (gy - base_y)
            out_ref[0, c + 1, t] = fx
            out_ref[0, c + 2, t] = fy
        return 0

    jax.lax.fori_loop(0, n_steps, step_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("tp_sz", "tcp", "precision", "interpret",
                                    "block_hb"))
def warp_alpha_ctx_pallas(alpha, grid, occ, is_obj, *, tp_sz, tcp,
                          precision="fast", interpret=False, block_hb=None):
    """Fused alpha_ctx warp for the predict path (Warper.grid_to_flow hot
    stage, reference lvd.py:676-695).

    alpha  (F, H, W, C)      unique window frames (F = B*Tc), channel-last,
                             frame-occluded per-layer alphas in [0, 1]
    grid   (N, C, gh, gw, 2) per-layer sample grids, N = B*Tc*Tp ordered
                             (b, tc, tp) row-major; program n samples frame
                             n // tp_sz — REQUIRES the predict-path contract
                             ctx_ts = arange(Tc) broadcast over Tp
    occ    (N, C, C)         occlusion weights at prediction time
                             (occ[n, i, j]: layer i occludes j)
    is_obj (B*Tp, C, gh, gw) ghost-suppression masks or None; program n
                             reads row (n // tcp) * tp_sz + n % tp_sz
    tp_sz = Tp, tcp = Tc*Tp (static).

    Returns (alpha_occ (N, gh, gw, C), disocc (N, gh, gw, 1),
    flow (N, gh, gw, 2)): the occlusion-multiplied per-layer alphas, the
    pre-occlusion disocclusion max, and the alpha-weighted normalized flow
    sum_j alpha_occ_j * (g_j - base_grid) — none of the (N, C, gh, gw)
    intermediates ever materialize in HBM."""
    f, h, w, c = alpha.shape
    n = grid.shape[0]
    assert grid.shape[1] == c and occ.shape == (n, c, c), (grid.shape, occ.shape)
    assert n == f * tp_sz and tcp % tp_sz == 0, (n, f, tp_sz, tcp)
    if alpha.dtype != jnp.float32:
        alpha = alpha.astype(jnp.float32)
    _, _, gh, gw, _ = grid.shape
    ix = (grid[..., 0] + 1.0) * (w * 0.5) - 0.5
    iy = (grid[..., 1] + 1.0) * (h * 0.5) - 0.5

    hh = h + (-h % 8)
    ww = w + (-w % 128)
    if (hh, ww) != (h, w):
        alpha = jnp.pad(alpha, ((0, 0), (0, hh - h), (0, ww - w), (0, 0)))
    hb = min(hh, block_hb or HB)
    wb = min(ww, WB)
    hc = max(d for d in (64, 32, 16, 8) if hh % d == 0)
    wc = max(d for d in (WCHUNK, 128) if ww % d == 0)

    ghp, gwp = -gh % ROWS, -gw % COLS
    if ghp or gwp:
        pad5 = ((0, 0), (0, 0), (0, ghp), (0, gwp))
        ix = jnp.pad(ix, pad5, mode="edge")
        iy = jnp.pad(iy, pad5, mode="edge")
    ghh, gww = gh + ghp, gw + gwp
    ix = _patch_tile(ix.reshape(n * c, ghh, gww), ghh, gww)
    iy = _patch_tile(iy.reshape(n * c, ghh, gww), ghh, gww)
    n_tiles = ix.shape[1]
    gpad = -n_tiles % TG
    if gpad:
        tpad = ((0, 0), (0, gpad), (0, 0), (0, 0))
        ix = jnp.pad(ix, tpad, constant_values=-10.0)
        iy = jnp.pad(iy, tpad, constant_values=-10.0)
    n_tp = n_tiles + gpad
    ix = ix.reshape(n, c, n_tp, ROWS, COLS)
    iy = iy.reshape(n, c, n_tp, ROWS, COLS)
    n_groups = n_tp // TG
    tex = jnp.moveaxis(alpha, -1, 1)  # (F, C, H, W)

    # v10: bounds + sparsity skip precomputed host-side (XLA-batched); the
    # kernel reads them from SMEM. bnd layout (N, n_tp, C, 4): [y0, x0,
    # fits, skip]
    bnd3, footprint = _host_bounds(ix, iy, hh, ww, hb, wb)  # (N, C, n_tp, 3)
    frame_of_row = jnp.arange(n, dtype=jnp.int32) // tp_sz
    skip = _skip_flags(tex, footprint, frame_of_row)  # (N, C, n_tp)
    bnd = jnp.concatenate([bnd3, skip[..., None]], axis=-1)
    bnd = jnp.moveaxis(bnd, 1, 2)  # (N, n_tp, C, 4)

    has_isobj = is_obj is not None
    if has_isobj:
        m = is_obj.shape[0]
        io = is_obj.astype(jnp.float32)
        if ghp or gwp:
            io = jnp.pad(io, ((0, 0), (0, 0), (0, ghp), (0, gwp)), mode="edge")
        io = _patch_tile(io.reshape(m * c, ghh, gww), ghh, gww)
        if gpad:
            io = jnp.pad(io, ((0, 0), (0, gpad), (0, 0), (0, 0)))
        io = io.reshape(m, c, n_tp, ROWS, COLS)
        io_map = lambda i, g: ((i // tcp) * tp_sz + i % tp_sz, 0, g, 0, 0)
    else:
        io = jnp.zeros((1, 1, 1, ROWS, COLS), jnp.float32)
        io_map = lambda i, g: (0, 0, 0, 0, 0)

    ntx = gww // COLS
    prec = "float32" if precision == "float32" else None
    out = pl.pallas_call(
        functools.partial(_war_kernel, h=hh, w=ww, c=c, hb=hb, wb=wb, hc=hc,
                          wc=wc, gh_real=gh, gw_real=gw, sh_real=h, sw_real=w,
                          ntx=ntx, tp_sz=tp_sz, precision=prec,
                          has_isobj=has_isobj),
        grid=(n, n_groups),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, c, TG, ROWS, COLS),
                         lambda i, g: (i, 0, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, TG, ROWS, COLS),
                         lambda i, g: (i, 0, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, c), lambda i, g: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, ROWS, COLS) if not has_isobj
                         else (1, c, TG, ROWS, COLS),
                         io_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TG, c, 4), lambda i, g: (i, g, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, c + 3, TG, ROWS, COLS),
                               lambda i, g: (i, 0, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c + 3, n_tp, ROWS, COLS),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, hb, wb), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((hc, wc), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((c, ROWS, COLS), jnp.float32),
            # hoisted loop-invariant constants (see _init_consts)
            pltpu.VMEM((TILE_P, COLS), jnp.float32),
            pltpu.VMEM((ROWS, TILE_P), jnp.float32),
            pltpu.VMEM((TILE_P, hb), jnp.float32),
            pltpu.VMEM((TILE_P, wb), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * n_tp * TILE_P * hb * wb
            // max(hb * wb // (64 * 256), 1),
            bytes_accessed=n * c * n_tp * (hb * wb + 3 * TILE_P) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tex, ix, iy, occ.astype(jnp.float32), io, bnd)
    out = out[:, :, :n_tiles]
    out = _patch_untile(out, ghh, gww)[:, :, :gh, :gw]
    alpha_occ = jnp.moveaxis(out[:, :c], 1, -1)
    disocc = out[:, c][..., None]
    flow = jnp.moveaxis(out[:, c + 1:], 1, -1)
    return alpha_occ, disocc, flow
