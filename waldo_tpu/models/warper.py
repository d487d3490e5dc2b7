"""Warper — the geometry engine of LVD (pure ops, no learned parameters).

Re-design of reference models/nets/lvd.py:469-870 in channel-last jnp.
Alpha/occlusion conventions follow the reference exactly: alphas live in
[-1, 1], converted via (a+1)/2; per-layer occlusion is the product
prod_i (1 - alpha_i * occ[i, j]) over occluders i for each occludee j
(lvd.py:569,651,686); unresolved inverse-warp pixels are pushed far out of
bounds so grid_sample reads 0.

Layer-map layout: per-layer maps keep the layer axis immediately after time
while spatial work happens ((B,T,No+1,H,W,C])); "squeezed" per-layer alphas
put layers in the channel axis ((B,T,H,W,No+1)) which is the natural TPU
layout for the fusion/compositing matmuls downstream.

The occlusion products are written as broadcast-multiply + prod reductions
that XLA fuses without materializing the (No+1)^2 x H x W intermediate;
a Pallas kernel for the full sample+occlude+reduce chain can be swapped in
later without changing this interface.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import TPSWarp, InverseWarp, get_grid, grid_sample, resize
from ..ops.grid_sample import grid_sample_multigrid, grid_sample_ctx, warp_alpha_ctx
from ..utils import gather_time
from ..utils.profiling import annotate


class WarpGrids(NamedTuple):
    tgt_obj: Optional[jnp.ndarray]  # (B,T,No,Ho,Wo,2) object-layer sampling grid
    src_obj: Optional[jnp.ndarray]  # (B,T,No,H,W,2) inverse (scatter) grid
    tgt_bg: Optional[jnp.ndarray]   # (B,T,H,W,2)
    src_bg: Optional[jnp.ndarray]   # (B,T,H,W,2)


def _bsample(img, grid):
    """grid_sample with arbitrary leading axes folded into batch."""
    lead = img.shape[:-3]
    out = grid_sample(img.reshape((-1,) + img.shape[-3:]), grid.reshape((-1,) + grid.shape[-3:]))
    return out.reshape(lead + out.shape[1:])


class Warper:
    def __init__(self, cfg):
        m = cfg.model
        self.num_obj = m.num_obj
        self.latent_obj_size = m.obj_shape[0] * m.obj_shape[1]
        self.latent_size = m.latent_shape[0] * m.latent_shape[1]
        self.tgt_shape = (
            int(m.obj_shape[0] * m.patch_size * m.scale_factor),
            int(m.obj_shape[1] * m.patch_size * m.scale_factor),
        )
        self.src_shape = (cfg.dim, int(cfg.dim * cfg.aspect_ratio))
        self.src_shape_hd = (
            (cfg.load_dim, int(cfg.load_dim * cfg.aspect_ratio))
            if cfg.load_dim > 0
            else self.src_shape
        )
        self.scale_hd = cfg.load_dim / cfg.dim if cfg.load_dim > 0 else 1.0
        self.fast = cfg.load_dim == 0
        src_pts = get_grid(*m.latent_shape).reshape(-1, 2)
        tgt_pts = get_grid(*m.obj_shape).reshape(-1, 2)
        self.src_grid = get_grid(*self.src_shape)
        self.src_grid_hd = get_grid(*self.src_shape_hd)
        self.tgt_grid = get_grid(*self.tgt_shape)
        self.tps_obj = TPSWarp(*self.tgt_shape, tgt_pts)
        self.tps_bg = TPSWarp(*self.src_shape, src_pts)
        self.invert_obj = InverseWarp(*self.tgt_shape, *self.src_shape)
        self.invert_bg = InverseWarp(*self.src_shape, *self.src_shape)
        self.weight_cls = m.weight_cls
        self.min_cls = m.min_cls
        self.include_self = m.include_self
        self.no_filter = m.no_filter
        self.allow_ghost = m.allow_ghost
        self.fast_inverse_warp = m.fast_inverse_warp
        self.sample_precision = m.sample_precision

    # ---- grid construction (reference lvd.py:855-870) ----

    def __call__(self, obj_pose, bg_pose, invert=True) -> WarpGrids:
        b, t, no, lo, _ = obj_pose.shape
        # mixed-precision fixed-point schedule rides the model's numerics
        # knob: sample_precision="fast" (the bench default) runs all but the
        # final inversion iteration in bf16 (ops/inverse_warp.py:iterative)
        inv_o = (
            (lambda g: self.invert_obj.iterative(g, precision=self.sample_precision))
            if self.fast_inverse_warp
            else self.invert_obj
        )
        inv_b = (
            (lambda g: self.invert_bg.iterative(g, precision=self.sample_precision))
            if self.fast_inverse_warp
            else (lambda g: self.invert_bg(g, erode=False))
        )
        with annotate("warper/tps_obj"):
            tgt_obj = self.tps_obj(obj_pose.reshape(b * t * no, lo, 2))
        with annotate("warper/invert_obj"):
            src_obj = inv_o(tgt_obj) if invert else None
        tgt_obj = tgt_obj.reshape(b, t, no, *tgt_obj.shape[1:])
        src_obj = src_obj.reshape(b, t, no, *src_obj.shape[1:]) if invert else None

        l = self.latent_size
        with annotate("warper/tps_bg"):
            tgt_bg = self.tps_bg(bg_pose.reshape(b * t, l, 2))
        with annotate("warper/invert_bg"):
            src_bg = inv_b(tgt_bg) if invert else None
        tgt_bg = tgt_bg.reshape(b, t, *tgt_bg.shape[1:])
        src_bg = src_bg.reshape(b, t, *src_bg.shape[1:]) if invert else None
        return WarpGrids(tgt_obj, src_obj, tgt_bg, src_bg)

    # ---- texture gathers (reference lvd.py:502-559) ----

    def obj_from_input(self, x, grids: WarpGrids):
        """x (B,T,H,W,C) or per-layer (B,T,No+1,H,W,C) -> obj (B,T,No,Ho,Wo,C)."""
        b, t = x.shape[:2]
        no = self.num_obj
        if x.ndim == 5:
            x = jnp.broadcast_to(x[:, :, None], (b, t, no) + x.shape[2:])
        else:
            x = x[:, :, 1:]
        return _bsample(x, grids.tgt_obj)

    def bg_from_input(self, x, grids: WarpGrids):
        """x (B,T,H,W,C) or per-layer (B,T,No+1,H,W,C) -> bg (B,T,H,W,C)."""
        if x.ndim == 6:
            x = x[:, :, 0]
        return _bsample(x, grids.tgt_bg)

    def layer_from_input(self, x, grids):
        return self.obj_from_input(x, grids), self.bg_from_input(x, grids)

    def obj_to_output(self, obj, grids: WarpGrids, delta=1.0):
        """obj (B,[T,]No,Ho,Wo,C) -> (B,T,No,H,W,C) via src_obj grids.

        delta shifts values so zero-padding reads as -delta (lvd.py:548)."""
        b, t, no = grids.src_obj.shape[:3]
        if obj.ndim == 5:
            obj = jnp.broadcast_to(obj[:, None], (b, t) + obj.shape[1:])
        return _bsample(obj + delta, grids.src_obj) - delta

    def bg_to_output(self, bg, grids: WarpGrids, delta=1.0):
        """bg (B,[T,]H,W,C) -> (B,T,1,H,W,C) via src_bg grids."""
        b, t = grids.src_bg.shape[:2]
        if bg.ndim == 4:
            bg = jnp.broadcast_to(bg[:, None], (b, t) + bg.shape[1:])
        out = _bsample(bg + delta, grids.src_bg) - delta
        return out[:, :, None]

    def layer_to_output(self, obj, bg, grids, delta_bg=1.0, delta_obj=1.0):
        out_obj = self.obj_to_output(obj, grids, delta_obj)
        out_bg = self.bg_to_output(bg, grids, delta_bg)
        return jnp.concatenate([out_bg, out_obj], axis=2)  # (B,T,No+1,H,W,C)

    # ---- occlusion-aware alpha projection (reference lvd.py:561-573) ----

    @staticmethod
    def occlusion_product(alpha, occ, dtype=None):
        """alpha (B,T,I,H,W,1) in [0,1], occ (B,T,I,J) ->
        (B,T,J,H,W,1): prod_i (1 - alpha_i * occ[i, j]).

        Written so XLA fuses the broadcast into the product reduction.
        `dtype=bfloat16` halves the VPU cost (alphas tolerate ~4e-3)."""
        a = alpha[:, :, :, None]  # B T I 1 H W 1
        o = occ[:, :, :, :, None, None, None]  # B T I J 1 1 1
        if dtype is not None:
            a, o = a.astype(dtype), o.astype(dtype)
        return jnp.prod(1.0 - a * o, axis=2).astype(alpha.dtype)  # B T J H W 1

    def alpha_to_alpha(self, obj_alpha, bg_alpha, grids, occ):
        b, t = grids.src_obj.shape[:2]
        obj_alpha = jnp.broadcast_to(obj_alpha[:, None], (b, t) + obj_alpha.shape[1:])
        bg_alpha = jnp.broadcast_to(bg_alpha[:, None], (b, t) + bg_alpha.shape[1:])
        out = self.layer_to_output(obj_alpha, bg_alpha, grids)
        out = (out + 1.0) / 2.0
        occp = self.occlusion_product(out, occ)
        out = occp * out
        # gather the occlusion *product* back into layer frames (lvd.py:571
        # samples `occ`, not the occluded alpha) — caught by the torch-oracle
        # parity test; the previous code sampled `out` here
        obj_occ, bg_occ = self.layer_from_input(occp, grids)
        obj_alpha2 = obj_occ * (obj_alpha + 1.0) - 1.0
        bg_alpha2 = bg_occ * (bg_alpha + 1.0) - 1.0
        return obj_alpha2, bg_alpha2, out

    # ---- dense flow synthesis: THE hot path (reference lvd.py:602-828) ----

    def grid_to_flow(
        self, x, grids: WarpGrids, occ, obj_alpha, bg_alpha, cls, ctx_ts, pred_ts,
        restrict_to_ctx=False, hd_window=None, ctx_uniform=False,
    ):
        """Dense ctx->pred flow per layer, occlusion-merged.

        x: (B,T,Hd,Wd,3+Nl) rgb+layout at load resolution
        occ: (B,T,No+1,No+1); obj_alpha (B,No,Ho,Wo,1); bg_alpha (B,H,W,1)
        cls: (B,No,Nl) or None; ctx_ts (B,Tc,Tp) int; pred_ts (Tp,) int
        returns flow (B,Tc,Tp,Hd,Wd,2), alpha_unflt/alpha (B,T*,Hd,Wd,No+1),
        alpha_ctx (B,Tc,Tp,Hd,Wd,No+1), disocc (B,Tc,Tp,Hd,Wd,1)

        ctx_uniform: caller promise that ctx_ts is constant along the pred
        axis (ctx_ts[b, k, :] == ctx_ts[b, k, 0], the predict-path shape).
        Enables the fused alpha_ctx warp (ops.warp_alpha_ctx — on TPU one
        Pallas kernel runs the sample, ghost mask, disocclusion max,
        prediction-time occlusion product and flow reduction without
        materializing the (B,Tc,Tp,No+1,Hd,Wd) intermediates). Inference
        only: the fused op has no VJP.

        hd_window: when ctx_ts only references frames [0, hd_window), the
        per-frame HD work (layout refinement, alpha upsample, frame
        occlusion product) is sliced to those frames BEFORE the expensive
        HD ops — bit-identical outputs on the gathered frames, but the
        window statistics (mean_lyt_win) still span the full window like
        the reference. `predict` passes ctx_len (inference gathers only
        context frames); the losses pass None (they read alpha/alpha_unflt
        over the full window).
        """
        b, t = x.shape[:2]
        tc, tp = ctx_ts.shape[1], pred_ts.shape[0]
        no = self.num_obj
        h, w = self.src_shape
        hd, wd = self.src_shape_hd
        ho, wo = self.tgt_shape

        hd_x = x
        x = resize(hd_x, 1.0 / self.scale_hd) if self.scale_hd != 1 else hd_x

        if restrict_to_ctx:
            to_window = lambda tensor: tensor[:, :tc]  # alpha over leading ctx frames
        else:
            to_window = lambda tensor: tensor
        to_multi_ctx = lambda tensor: gather_time(tensor, ctx_ts)
        to_pred = lambda tensor: tensor[:, pred_ts]

        # rough alpha projected into every frame (lvd.py:617-621)
        obj_a = jnp.broadcast_to(
            ((obj_alpha + 1) / 2)[:, None], (b, t, no, ho, wo, 1)
        )
        bg_a = jnp.broadcast_to(((bg_alpha + 1) / 2)[:, None], (b, t, h, w, 1))
        alpha = self.layer_to_output(obj_a, bg_a, grids, delta_bg=0.0, delta_obj=0.0)
        alpha = to_window(alpha)  # (B,Tw,No+1,H,W,1)
        tw = alpha.shape[1]
        # frames whose HD maps are actually gathered downstream
        to_hd = (lambda tensor: tensor[:, :hd_window]) if (
            hd_window is not None and hd_window < tw) else (lambda tensor: tensor)

        # layout-agreement alpha refinement (lvd.py:624-647 / 731-760)
        if not self.no_filter:
          with annotate("warper/lyt_refine"):
            lyt = to_window(x)[..., 3:]  # (B,Tw,H,W,Nl)
            # HD refinement only for the frames gathered downstream
            hd_lyt = to_hd(to_window(hd_x))[..., 3:]  # (B,Tw',Hd,Wd,Nl)
            nl = lyt.shape[-1]
            if cls is None or self.weight_cls:
                # window statistics span the FULL window (low-res, cheap)
                alpha_win = alpha[:, :, 1:] + 1e-6  # B Tw No H W 1
                if self.weight_cls:
                    sm = jax.nn.softmax(lyt, axis=-1)[:, :, None]  # B Tw 1 H W Nl
                    cl = (cls + self.min_cls)[:, None, :, None, None, :]  # B 1 No 1 1 Nl
                    lyt_alpha = (cl * sm).sum(-1, keepdims=True)  # B Tw No H W 1
                    alpha_win = alpha_win * lyt_alpha
                sum_alpha_win = alpha_win.sum(axis=(1, 3, 4), keepdims=True)  # B 1 No 1 1 1
                lyt_win = lyt[:, :, None] * alpha_win  # B Tw No H W Nl
                mean_lyt_win = lyt_win.sum(axis=(1, 3, 4), keepdims=True) / sum_alpha_win
                lyt_alpha = jnp.abs(
                    jax.nn.softmax(mean_lyt_win, axis=-1)
                    - jax.nn.softmax(hd_lyt, axis=-1)[:, :, None]
                )  # B Tw' No Hd Wd Nl
                lyt_alpha = 1.0 - lyt_alpha.sum(-1, keepdims=True) / 2.0
            else:
                cl = cls[:, None, :, None, None, :]
                lyt_alpha = jnp.abs(cl - jax.nn.softmax(hd_lyt, axis=-1)[:, :, None])
                lyt_alpha = 1.0 - lyt_alpha.sum(-1, keepdims=True) / 2.0

        alpha = to_hd(alpha)  # HD per-frame work: gathered frames only
        if self.scale_hd != 1:
            with annotate("warper/alpha_upsample"):
                alpha = resize(alpha, self.scale_hd)
        if not self.no_filter:
            alpha = jnp.concatenate([alpha[:, :, :1], alpha[:, :, 1:] * lyt_alpha], axis=2)

        # occlusion among layers within each frame (lvd.py:649-652).
        # The pairwise products are I*J elementwise ops per pixel — the
        # dominant VPU cost at HD; alphas tolerate bf16 (~4e-3 on [0,1]
        # masks), so "fast" sample precision halves the VPU traffic.
        occ_dtype = jnp.bfloat16 if self.sample_precision == "fast" else None
        with annotate("warper/occ_product_frame"):
            occ_w = to_hd(to_window(occ))
            occp = self.occlusion_product(alpha, occ_w, dtype=occ_dtype)
            alpha = occp * alpha  # B Tw' No+1 Hd Wd 1
        alpha_unflt = alpha

        # per-(pred) sampling grids, shared across ctx (lvd.py:655-660): fold
        # the ctx axis into channels so the sampler runs Tc-fewer, Tc-wider
        # matmuls (better MXU utilization on the 64x64 object textures)
        src_obj = to_pred(grids.src_obj)  # B Tp No H W 2
        src_bg = to_pred(grids.src_bg)  # B Tp H W 2
        pair_grids = WarpGrids(
            None,
            src_obj.reshape(b, tp, no, h, w, 2),
            None,
            src_bg.reshape(b, tp, h, w, 2),
        )

        # flow fields in layer referentials (lvd.py:663-666), ctx in channels
        obj_flow = to_multi_ctx(grids.tgt_obj) - to_pred(grids.tgt_obj)[:, None]
        obj_flow = jnp.moveaxis(obj_flow, 1, -2)  # B Tp No Ho Wo Tc 2
        obj_flow = obj_flow.reshape(b, tp, no, ho, wo, tc * 2)
        bg_flow = to_multi_ctx(grids.tgt_bg) - to_pred(grids.tgt_bg)[:, None]
        bg_flow = jnp.moveaxis(bg_flow, 1, -2).reshape(b, tp, h, w, tc * 2)

        # ghost-object suppression (lvd.py:785-791, restrict_to_ctx path);
        # ctx-independent, broadcast over the ctx axis
        if restrict_to_ctx and not self.allow_ghost:
            ones = jnp.ones_like(obj_flow[..., :1])
            is_obj = self.obj_to_output(ones, pair_grids, delta=0.0)  # B Tp No H W 1
            if self.scale_hd != 1:
                is_obj = resize(is_obj, self.scale_hd)
            is_obj = (is_obj > 0.9).astype(x.dtype).reshape(b, 1, tp, no, hd, wd, 1)
            is_obj = jnp.concatenate([jnp.ones_like(is_obj[:, :, :, :1]), is_obj], axis=3)
        else:
            is_obj = 1.0

        # warp layer flows to output frame (lvd.py:669-673); unpack the ctx
        # channels back into an axis
        with annotate("warper/flow_warp"):
            flow = self.layer_to_output(obj_flow, bg_flow, pair_grids, delta_bg=0.0, delta_obj=0.0)
        flow = flow.reshape(b, tp, no + 1, h, w, tc, 2)
        flow = jnp.moveaxis(flow, -2, 1)  # B Tc Tp No+1 H W 2
        if self.scale_hd != 1:
            with annotate("warper/flow_upsample"):
                flow = resize(flow, self.scale_hd)  # B Tc Tp No+1 Hd Wd 2
        sample_grid = self.src_grid_hd[None, None] + flow.reshape(
            -1, no + 1, hd, wd, 2
        )  # (B*Tc*Tp, No+1, Hd, Wd, 2): per-layer grids

        to_chan_last = lambda a: jnp.moveaxis(a[..., 0], 2, -1) * 2.0 - 1.0
        to_chan_last_ctx = lambda a: jnp.moveaxis(a[..., 0], 3, -1) * 2.0 - 1.0

        # warp per-layer alphas along the flow (lvd.py:676-680). In both paths
        # ctx_ts indexes into the alpha window (full T, or leading Tc frames
        # when restrict_to_ctx), so one gather covers both.
        if ctx_uniform:
            # fused path: gather only the UNIQUE ctx frames (ctx_ts is
            # constant along pred by the caller's promise) and run sample +
            # ghost mask + disocc + occlusion product + flow reduction as one
            # op; none of the (B,Tc,Tp,No+1,Hd,Wd) intermediates materialize
            with annotate("warper/alpha_ctx_fused"):
                idx = ctx_ts[:, :, 0][:, :, None, None, None, None]
                alpha_u = jnp.take_along_axis(alpha, idx, axis=1)
                tex = jnp.moveaxis(alpha_u[..., 0], 2, -1).reshape(
                    b * tc, hd, wd, no + 1)
                occ_n = jnp.broadcast_to(
                    to_pred(occ)[:, None], (b, tc, tp, no + 1, no + 1)
                ).reshape(b * tc * tp, no + 1, no + 1)
                io = None
                if hasattr(is_obj, "shape"):
                    io = is_obj[..., 0][:, 0].reshape(b * tp, no + 1, hd, wd)
                alpha_occ, disocc, flow = warp_alpha_ctx(
                    tex, sample_grid, occ_n, io, tp_sz=tp, tcp=tc * tp,
                    precision=self.sample_precision)
            alpha_ctx = alpha_occ.reshape(b, tc, tp, hd, wd, no + 1)
            if occ_dtype is not None:
                alpha_ctx = alpha_ctx.astype(occ_dtype)
            disocc = disocc.reshape(b, tc, tp, hd, wd, 1)
            flow = flow.reshape(b, tc, tp, hd, wd, 2)
            return (
                flow,
                to_chan_last(alpha_unflt),
                to_chan_last(alpha),
                alpha_ctx * 2.0 - 1.0,
                disocc,
            )
        alpha_ctx = gather_time(alpha, ctx_ts)  # B Tc Tp No+1 Hd Wd 1
        # alpha maps tolerate bf16 sampling error (~4e-3 on [0,1] masks);
        # this is the largest sample batch of the pipeline. Layers become
        # per-grid channels (grid_sample_multigrid) so one kernel program
        # covers all No+1 planes of a (b,ctx,pred) cell.
        with annotate("warper/alpha_ctx_sample"):
            alpha_ctx = grid_sample_multigrid(
                jnp.moveaxis(
                    alpha_ctx.reshape(-1, no + 1, hd, wd), 1, -1
                ),  # (B*Tc*Tp, Hd, Wd, No+1)
                sample_grid,
                precision=self.sample_precision,
            )
        alpha_ctx = jnp.moveaxis(alpha_ctx, -1, 1).reshape(
            b, tc, tp, no + 1, hd, wd, 1
        )
        if occ_dtype is not None:
            # "fast" precision stores the (B,Tc,Tp,No+1,Hd,Wd) alpha maps in
            # bf16 — halves the HBM traffic of the pipeline's biggest tensor
            alpha_ctx = alpha_ctx.astype(occ_dtype)
            is_obj = is_obj.astype(occ_dtype) if hasattr(is_obj, "astype") else is_obj
        alpha_ctx = alpha_ctx * is_obj
        disocc = alpha_ctx.max(axis=3)  # B Tc Tp Hd Wd 1

        # occlusion at prediction time (lvd.py:683-692)
        with annotate("warper/occ_product_pred"):
            occ_pred = to_pred(occ)  # B Tp I J
            a = alpha_ctx[:, :, :, :, None]  # B Tc Tp I 1 Hd Wd 1
            o = occ_pred[:, None, :, :, :, None, None, None]  # B 1 Tp I J 1 1 1
            if occ_dtype is not None:
                a, o = a.astype(occ_dtype), o.astype(occ_dtype)
            alpha_ctx_occ = jnp.prod(1.0 - a * o, axis=3).astype(
                alpha_ctx.dtype)  # B Tc Tp J Hd Wd 1
            alpha_ctx = alpha_ctx_occ * alpha_ctx

        # alpha-weighted flow reduction (lvd.py:695); accumulate f32
        with annotate("warper/flow_reduce"):
            flow = (alpha_ctx.astype(flow.dtype) * flow).sum(axis=3)  # B Tc Tp Hd Wd 2

        return (
            flow,
            to_chan_last(alpha_unflt),
            to_chan_last(alpha),
            to_chan_last_ctx(alpha_ctx),
            disocc,
        )

    # ---- warp context frames & fuse (reference lvd.py:830-853) ----

    def input_to_output(self, x, alpha, flow, ctx_ts, eps=1e-6,
                        ctx_uniform=False):
        """x (B,T,Hd,Wd,C); alpha (B,Tc,Tp,Hd,Wd,No+1) in [-1,1];
        flow (B,Tc,Tp,Hd,Wd,2); returns (output (B,Tp,Hd,Wd,C+1), raw (B,Tc',Tp,Hd,Wd,C+No+1))."""
        b, tc, tp = flow.shape[:3]
        hd, wd = self.src_shape_hd
        c = x.shape[-1]
        # pixel/layout values tolerate bf16 sampling error (~4e-3); this is
        # the most expensive sample of the pipeline (C=3+Nl at load res)
        if ctx_uniform:
            # predict path: ctx_ts is constant along pred, so gather only the
            # UNIQUE ctx frames and let the sampler's tp_sz row mapping fan
            # each one out to the tp grids — the (B,Tc,Tp,Hd,Wd,C) HBM stack
            # never materializes (it was the #1 HD stage cost, r3 trace)
            idx = ctx_ts[:, :, 0][:, :, None, None, None]
            ctx_u = jnp.take_along_axis(x, idx, axis=1)  # B Tc Hd Wd C
            with annotate("warper/context_fusion_sample"):
                out = grid_sample_ctx(
                    ctx_u.reshape(-1, hd, wd, c),
                    (self.src_grid_hd[None] + flow.reshape(-1, hd, wd, 2)),
                    tp_sz=tp,
                    precision=self.sample_precision,
                )
        else:
            ctx = gather_time(x, ctx_ts)  # B Tc Tp Hd Wd C
            with annotate("warper/context_fusion_sample"):
                out = grid_sample(
                    ctx.reshape(-1, hd, wd, c),
                    (self.src_grid_hd[None] + flow.reshape(-1, hd, wd, 2)),
                    precision=self.sample_precision,
                )
        out = out.reshape(b, tc, tp, hd, wd, c)
        if self.sample_precision == "fast":
            # bf16 storage of the warped-context stack (B,Tc,Tp,Hd,Wd,C):
            # halves HBM traffic; the score-fused output accumulates in f32
            out = out.astype(jnp.bfloat16)
            alpha = alpha.astype(jnp.bfloat16)

        with annotate("warper/fuse_score"):
            score = ((alpha + 1) / 2).sum(axis=-1, keepdims=True)  # B Tc Tp Hd Wd 1
            if self.include_self and tp == x.shape[1]:
                score = jnp.concatenate([score, jnp.ones_like(score[:, :1])], axis=1)
                alpha = jnp.concatenate([alpha, jnp.ones_like(alpha[:, :1])], axis=1)
                out = jnp.concatenate([out, x[:, None].astype(out.dtype)], axis=1)
            raw_output = jnp.concatenate([out, alpha], axis=-1)  # B Tc' Tp Hd Wd C+No+1

            output = jnp.concatenate([out, (score * 2 - 1).astype(out.dtype)],
                                     axis=-1)
            score = (score + eps) / (score + eps).sum(axis=1, keepdims=True)
            output = (output.astype(jnp.float32)
                      * score.astype(jnp.float32)).sum(axis=1)  # B Tp Hd Wd C+1
        return output, raw_output

    # ---- per-layer flow extraction for MAT propagation (lvd.py:575-600) ----

    def grid_to_bg_flow_from_ref_to_pred(self, grids: WarpGrids, ctx_len, ref):
        bg_flow = grids.tgt_bg[:, ref][:, None] - grids.tgt_bg[:, ctx_len:]  # B Tp H W 2
        g = WarpGrids(None, None, None, grids.src_bg[:, ctx_len:])
        out = self.bg_to_output(bg_flow, g, delta=0.0)[:, :, 0]
        if self.scale_hd != 1:
            out = resize(out, self.scale_hd)
        return out  # B Tp Hd Wd 2

    def grid_to_obj_flow_from_ref_to_pred(self, grids: WarpGrids, ctx_len, ref, obj_id):
        of = grids.tgt_obj[:, ref, obj_id][:, None] - grids.tgt_obj[:, ctx_len:, obj_id]
        g = WarpGrids(None, grids.src_obj[:, ctx_len:, obj_id][:, :, None], None, None)
        out = self.obj_to_output(of[:, :, None], g, delta=0.0)[:, :, 0]
        if self.scale_hd != 1:
            out = resize(out, self.scale_hd)
        return out  # B Tp Hd Wd 2

    def grid_to_bg_flow_from_ctx_to_ref(self, grids: WarpGrids, ctx_len, ref):
        bg_flow = grids.tgt_bg[:, :ctx_len] - grids.tgt_bg[:, ref][:, None]  # B Tc H W 2
        src = jnp.repeat(grids.src_bg[:, ref][:, None], ctx_len, axis=1)
        g = WarpGrids(None, None, None, src)
        out = self.bg_to_output(bg_flow, g, delta=0.0)[:, :, 0]
        if self.scale_hd != 1:
            out = resize(out, self.scale_hd)
        return out  # B Tc Hd Wd 2
