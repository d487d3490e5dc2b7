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

_IMPL = "auto"  # "auto" | "gather" | "mxu" | "pallas"

# The matmul formulation costs H*W MACs per output pixel *per channel*;
# measured on v5e it still beats the gather path up to at least C=23 at
# 256x512 sources (316ms vs 672ms for 40 images in bf16), because TPU
# gathers run far below modeled DMA efficiency. Group-chunking (below)
# bounds the transient hat-matrix memory.
_MXU_MAX_SRC = 1 << 19
_MXU_MAX_CHAN = 32
# transient budget for the MXU path's group scan (tests shrink this to
# exercise the scan + remat branch at small shapes)
_SCAN_TRANSIENT_BYTES = 1 << 30


def set_impl(name: str) -> None:
    global _IMPL
    assert name in ("auto", "gather", "mxu", "pallas")
    _IMPL = name


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray, precision: str = "float32") -> jnp.ndarray:
    """Sample img (B,H,W,C) at grid (B,Ho,Wo,2) -> (B,Ho,Wo,C).

    precision: "float32" (exact, default) or "fast" (bf16 MXU passes,
    ~2-3x faster, |err| ~4e-3 — fine for alpha/occupancy maps, never for
    flow/coordinate fields)."""
    impl = _IMPL
    if impl == "pallas":
        return _pallas_with_mxu_grad(img, grid, precision)
    if impl == "auto":
        impl = auto_impl(img.shape, grid.shape, jax.default_backend())
    if impl == "pallas":
        return _pallas_with_mxu_grad(img, grid, precision)
    if impl == "mxu":
        return grid_sample_mxu(img, grid, precision=precision)
    return grid_sample_ref(img, grid)


def auto_impl(img_shape, grid_shape, backend) -> str:
    """Measurement-driven dispatch (v5e, scripts/sampler_bench.py).

    The XLA hat-matmul path wins for small jobs (its (P, W*C) HBM transient
    is cheap and it has no per-tile overhead); the Pallas bbox kernel wins
    once src_pixels*C is large — 256x512 C=23 fusion 244 vs 288 ms,
    512x1024 C=23 fusion 251 vs 856 ms, 512x1024 C=1 alpha 265 vs 305 ms.
    Crossover ~2^19 source-pixel-channels. Every branch is CORRECT for
    every shape (guarded by test_grid_sample_dispatch_envelope); the
    constants only pick the fastest."""
    src = img_shape[-3] * img_shape[-2]
    c = img_shape[-1]
    out_px = grid_shape[-3] * grid_shape[-2]
    if (
        backend == "tpu"
        and src * c >= (1 << 19)
        and src <= (1 << 22)
        # small target grids waste the kernel's patch/group padding and lose
        # to the hat-matmul path anyway (flow_warp_obj row of the bench);
        # huge fold-in batches (training-time B*T*No folds) blow up the
        # kernel's padded layouts
        and out_px >= (1 << 15)
        and img_shape[0] <= 256
    ):
        return "pallas"
    return "mxu" if (src <= _MXU_MAX_SRC and c <= _MXU_MAX_CHAN) else "gather"


def _hat(pos, n, dtype):
    """Bilinear hat weights (P, n): relu(1 - |pos - arange(n)|).

    Rows for out-of-range positions decay to all-zero, which reproduces
    torch grid_sample zero padding exactly (including the partial-weight
    boundary band)."""
    idx = jnp.arange(n, dtype=dtype)
    return jax.nn.relu(1.0 - jnp.abs(pos[:, None] - idx[None, :]))


def grid_sample_mxu(img: jnp.ndarray, grid: jnp.ndarray, precision: str = "float32") -> jnp.ndarray:
    """Bilinear sampling as two matmuls (TPU MXU path).

    out[p, c] = sum_y sum_x hat(iy_p, y) * hat(ix_p, x) * img[y, x, c]
    computed as M = Ry @ img (contracting y) followed by a row-wise
    contraction with Rx — all FLOPs land on the systolic array instead of
    the scalar gather unit (measured ~20x faster at 128x256 sources)."""
    b, h, w, c = img.shape
    gb, gh, gw, _ = grid.shape
    p = gh * gw
    dtype = img.dtype

    ix = (grid[..., 0].reshape(b, p) + 1.0) * (w * 0.5) - 0.5
    iy = (grid[..., 1].reshape(b, p) + 1.0) * (h * 0.5) - 0.5

    def one(im, ixb, iyb):
        ry = _hat(iyb, h, dtype)  # (P, H)
        rx = _hat(ixb, w, dtype)  # (P, W)
        # float32 precision: the default bf16 passes round warp values to
        # ~4e-3, far too coarse for flow fields; float32 is exact (1e-7)
        # and still ~15x faster than the gather path.
        m = jax.lax.dot_general(
            ry, im.reshape(h, w * c),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision="float32" if precision == "float32" else None,
        ).reshape(p, w, c)
        return (m * rx[:, :, None]).sum(axis=1)

    # Bound live memory: a plain vmap would materialize every image's
    # (P,H)/(P,W) hat matrices at once (tens of GB at HD shapes). Scan over
    # groups sized to ~1 GiB of transient hat/intermediate buffers.
    # jax.checkpoint is load-bearing under grad: without it the scan saves
    # every group's (P, W) hat matrices as backward residuals — 32 GB at
    # flagship LVD-training shapes (b≈1000 at 128x256 sources) — while remat
    # recomputes them from the tiny coordinate vectors instead.
    bytes_per_img = p * (h + w + w * c + c) * 4
    group = max(1, min(b, _SCAN_TRANSIENT_BYTES // max(bytes_per_img, 1)))
    if group >= b:
        out = jax.checkpoint(jax.vmap(one))(img, ix, iy)
    else:
        pad = (-b) % group
        imgp = jnp.pad(img, ((0, pad), (0, 0), (0, 0), (0, 0)))
        ixp = jnp.pad(ix, ((0, pad), (0, 0)))
        iyp = jnp.pad(iy, ((0, pad), (0, 0)))
        ng = (b + pad) // group
        out = jax.lax.map(
            jax.checkpoint(lambda t: jax.vmap(one)(*t)),
            (
                imgp.reshape(ng, group, h, w, c),
                ixp.reshape(ng, group, p),
                iyp.reshape(ng, group, p),
            ),
        ).reshape(ng * group, p, c)[:b]
    return out.reshape(b, gh, gw, c).astype(dtype)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _pallas_with_mxu_grad(img, grid, precision):
    from .pallas.grid_sample import grid_sample_pallas

    return grid_sample_pallas(img, grid, precision=precision)


def _pallas_fwd(img, grid, precision):
    from .pallas.grid_sample import grid_sample_pallas

    return grid_sample_pallas(img, grid, precision=precision), (img, grid)


def _pallas_bwd(precision, res, g):
    img, grid = res
    # the backward of the hat-matmul formulation is itself two matmuls;
    # reuse the differentiable MXU path's VJP
    _, vjp = jax.vjp(lambda i, gr: grid_sample_mxu(i, gr, precision=precision), img, grid)
    return vjp(g)


_pallas_with_mxu_grad.defvjp(_pallas_fwd, _pallas_bwd)


def grid_sample_multigrid(img: jnp.ndarray, grids: jnp.ndarray,
                          precision: str = "float32") -> jnp.ndarray:
    """Per-channel-grid sampling: out[..., k] samples img[..., k] along
    grids[:, k]. img (B,H,W,C), grids (B,C,Ho,Wo,2) -> (B,Ho,Wo,C).

    This is the alpha_ctx warp's natural shape (each layer-alpha plane rides
    its own flow). The Pallas kernel runs all C planes of an image in one
    program (bounds per step), amortizing launches C-fold over the folded
    C=1 formulation; elsewhere channels fold into the batch of the standard
    sampler."""
    b, h, w, c = img.shape
    src = h * w
    out_px = grids.shape[-3] * grids.shape[-2]
    if (
        _IMPL in ("auto", "pallas")
        and jax.default_backend() == "tpu"
        and src * c >= (1 << 19)
        and src <= (1 << 22)
        and out_px >= (1 << 15)
        and b <= 256
    ):
        return _pallas_mg_with_mxu_grad(img, grids, precision)
    bc = b * c
    img_f = jnp.moveaxis(img, -1, 1).reshape(bc, h, w, 1)
    grids_f = grids.reshape((bc,) + grids.shape[2:])
    out = grid_sample(img_f, grids_f, precision=precision)
    return jnp.moveaxis(out.reshape((b, c) + out.shape[1:-1]), 1, -1)


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _pallas_mg_with_mxu_grad(img, grids, precision):
    from .pallas.grid_sample import grid_sample_pallas

    return grid_sample_pallas(img, grids, precision=precision)


def _pallas_mg_fwd(img, grids, precision):
    from .pallas.grid_sample import grid_sample_pallas

    return grid_sample_pallas(img, grids, precision=precision), (img, grids)


def _pallas_mg_bwd(precision, res, g):
    img, grids = res
    b, h, w, c = img.shape

    def folded(im, gr):
        im_f = jnp.moveaxis(im, -1, 1).reshape(b * c, h, w, 1)
        gr_f = gr.reshape((b * c,) + gr.shape[2:])
        out = grid_sample_mxu(im_f, gr_f, precision=precision)
        return jnp.moveaxis(out.reshape((b, c) + out.shape[1:-1]), 1, -1)

    _, vjp = jax.vjp(folded, img, grids)
    return vjp(g)


_pallas_mg_with_mxu_grad.defvjp(_pallas_mg_fwd, _pallas_mg_bwd)


def grid_sample_ctx(img: jnp.ndarray, grid: jnp.ndarray, *, tp_sz: int,
                    precision: str = "float32") -> jnp.ndarray:
    """Shared-texture context-fusion sampling: grid row i samples img row
    i // tp_sz. img (F,H,W,C), grid (F*tp_sz,Ho,Wo,2) -> (F*tp_sz,Ho,Wo,C).

    The predict path warps each unique ctx frame to tp_sz prediction
    frames; with the row mapping the texture ships to the kernel ONCE
    instead of as tp_sz materialized HBM copies (the r3 HD trace's #1
    stage, warper/context_fusion_sample, paid gather_time + f32 duplication
    of the full (B,Tc,Tp,Hd,Wd,C) stack before every sample). Inference
    only — no VJP (the training path keeps the dense gather)."""
    import os

    f, h, w, c = img.shape
    n = grid.shape[0]
    assert n == f * tp_sz, (img.shape, grid.shape, tp_sz)
    src = h * w
    out_px = grid.shape[-3] * grid.shape[-2]
    if (
        tp_sz > 1
        # verified on-chip at the flagship (256x512 C=23, fast+f32) and HD
        # (512x1024 C=23, fast) fusion shapes; env kill-switch kept because
        # interpret mode cannot see Mosaic hardware constraints
        and os.environ.get("WALDO_CTX_TPSZ", "1") == "1"
        and _IMPL in ("auto", "pallas")
        and jax.default_backend() == "tpu"
        and src * c >= (1 << 19)
        and src <= (1 << 22)
        and out_px >= (1 << 15)
        and n <= 256
    ):
        from .pallas.grid_sample import grid_sample_pallas

        return grid_sample_pallas(img, grid, precision=precision, tp_sz=tp_sz)
    rep = img if tp_sz == 1 else jnp.repeat(img, tp_sz, axis=0)
    return grid_sample(rep, grid, precision=precision)


def warp_alpha_ctx(alpha_u, grids, occ, is_obj, *, tp_sz, tcp,
                   precision: str = "float32"):
    """Fused predict-path alpha_ctx warp (sample + ghost mask + disocc max +
    prediction-time occlusion product + alpha-weighted flow reduction).

    alpha_u (F, H, W, C): unique frame-occluded per-layer alphas, F = B*Tc
    grids   (N, C, gh, gw, 2): per-layer grids, N = B*Tc*Tp row-major —
            program n samples frame n // tp_sz (REQUIRES ctx_ts uniform over
            the pred axis, the predict-path contract)
    occ     (N, C, C); is_obj (B*Tp, C, gh, gw) or None; tp_sz=Tp, tcp=Tc*Tp

    Returns (alpha_occ (N, gh, gw, C), disocc (N, gh, gw, 1),
    flow (N, gh, gw, 2) = sum_j alpha_occ_j * (g_j - base_grid)).

    On TPU inside the Pallas envelope this runs as ONE kernel and the
    (N, C, gh, gw) alpha intermediates never reach HBM (reference hot loop
    lvd.py:676-695); elsewhere it falls back to the jnp composition."""
    f, h, w, c = alpha_u.shape
    n, gc, gh, gw, _ = grids.shape
    assert gc == c and n == f * tp_sz, (alpha_u.shape, grids.shape, tp_sz)
    if warp_auto_impl(alpha_u.shape, grids.shape,
                      jax.default_backend()) == "pallas":
        from .pallas.grid_sample import warp_alpha_ctx_pallas

        return warp_alpha_ctx_pallas(alpha_u, grids, occ, is_obj,
                                     tp_sz=tp_sz, tcp=tcp, precision=precision)
    return _warp_alpha_ctx_ref(alpha_u, grids, occ, is_obj,
                               tp_sz=tp_sz, tcp=tcp, precision=precision)


def warp_auto_impl(alpha_shape, grid_shape, backend) -> str:
    """Routing decision for warp_alpha_ctx (mirrors auto_impl; pinned by
    tests/test_ops_geometry.py so envelope drift can cost speed but never
    silently change numerics paths)."""
    f, h, w, c = alpha_shape
    n, _, gh, gw, _ = grid_shape
    if (
        _IMPL in ("auto", "pallas")
        and backend == "tpu"
        and h * w * c >= (1 << 19)   # big enough source batch to win
        and h * w <= (1 << 22)       # beyond: gather path in the composition
        and gh * gw >= (1 << 15)     # enough output tiles to amortize
        and n <= 256                 # SMEM bounds table per program
    ):
        return "pallas"
    return "ref"


def _warp_alpha_ctx_ref(alpha_u, grids, occ, is_obj, *, tp_sz, tcp,
                        precision="float32"):
    """jnp composition of the fused warp (same math, XLA-scheduled)."""
    from .grid import get_grid

    f, h, w, c = alpha_u.shape
    n, _, gh, gw, _ = grids.shape
    # frame n // tp_sz, expressed as a reshape (the contract makes the
    # gather a broadcast)
    a_g = jnp.broadcast_to(alpha_u[:, None], (f, tp_sz, h, w, c))
    a_g = a_g.reshape(n, h, w, c)
    sam = grid_sample_multigrid(a_g, grids, precision=precision)
    if is_obj is not None:
        rows = (jnp.arange(n) // tcp) * tp_sz + jnp.arange(n) % tp_sz
        io = jnp.moveaxis(is_obj[rows], 1, -1)
        sam = sam * io.astype(sam.dtype)
    dis = sam.max(-1, keepdims=True)
    o = occ[:, None, None].astype(sam.dtype)  # N 1 1 I J
    occp = jnp.prod(1.0 - sam[..., None] * o, axis=-2)  # N gh gw J
    a_occ = occp * sam
    base = get_grid(gh, gw)  # host numpy constant; see ops/tps.py lowering note
    flow_per = jnp.moveaxis(grids, 1, -2) - base[None, :, :, None]  # N gh gw C 2
    fl = (a_occ[..., None].astype(jnp.float32) * flow_per).sum(-2)
    return a_occ, dis, fl


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
