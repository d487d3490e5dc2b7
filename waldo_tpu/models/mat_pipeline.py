"""MAT-based inpainting post-processing for vid_prediction (test_mat/demo path).

Re-design of reference models/nets/wif.py:59-225: build disocclusion masks
from warped per-layer alphas, inpaint a reference (last) frame once with
background propagated from context frames along bg flow, optionally detect
soft shadows and complete off-screen objects entering from the left/right
border (polygon masks — jnp ray-casting instead of the reference's
matplotlib/CPU round-trip, wif.py:228-235), then forward-warp the inpainted
reference to every predicted frame with residual inpainting.

Runs at host level (batch 1 inference); the per-frame loop is a static
python loop, inner math is jnp.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import grid_sample
from .mat.inpainter import expand_mask


def soft_expand(mask, num=1, alpha=0.97):
    """Soft directional max-dilation (reference tools/utils.py:300-311)."""
    for _ in range(num):
        south = jnp.pad(mask, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]
        north = jnp.pad(mask, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]
        east = jnp.pad(mask, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]
        west = jnp.pad(mask, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]
        mask = jnp.maximum(mask, alpha * jnp.maximum(jnp.maximum(south, north),
                                                     jnp.maximum(east, west)))
    return mask


def point_in_polygon(pts, corners):
    """Ray-casting point-in-polygon, jnp (replaces wif.py:228-235 CPU path).

    pts (B,H,W,2) pixel coords; corners list of (x, y). Returns (B,H,W,1)."""
    x, y = pts[..., 0], pts[..., 1]
    inside = jnp.zeros(x.shape, bool)
    n = len(corners)
    for i in range(n):
        x1, y1 = corners[i]
        x2, y2 = corners[(i + 1) % n]
        cond = ((y1 > y) != (y2 > y)) & (
            x < (x2 - x1) * (y - y1) / (y2 - y1 + 1e-12) + x1
        )
        inside = inside ^ cond
    return inside[..., None].astype(pts.dtype)


def _warp(img, flow, src_grid):
    return grid_sample(img, flow + src_grid[None])


def inpaint_with_mat(cfg, warper, wif_apply, inpainter, raw_output, alpha,
                     alpha_ctx, real_vid, pred_flow, ctx_len, grids):
    """Full reference chain (wif.py:59-225). All videos channel-last.

    raw_output (B,Tc',Tp,Hd,Wd,C'), alpha (B,Tp,Hd,Wd,No+1),
    alpha_ctx (B,Tc,Tp,Hd,Wd,No+1), real_vid (B,T,Hd,Wd,3),
    pred_flow (B,Tc,Tp,Hd,Wd,2). Returns inp_pred_vid (B,T,Hd,Wd,3).
    """
    m = cfg.model
    src_grid = warper.src_grid_hd
    hd, wd = src_grid.shape[:2]
    b, _, tp = raw_output.shape[:3]
    mask_thresh = 0.1
    shadow_mask = None

    a01 = (alpha_ctx + 1) / 2  # B Tc Tp Hd Wd L

    if m.use_inpainter:
        cov = a01.sum(-1, keepdims=False)  # B Tc Tp Hd Wd
        if m.ii_last_only:
            mask = 1 - cov[:, -1]
        else:
            mask = 1 - cov.max(axis=1)
        mask = mask[..., None]
        mask = (
            (mask > mask_thresh) if m.fix_thresh else (mask > 1 - mask_thresh)
        ).astype(jnp.float32)
        obj_cov = a01[..., 1:].sum(-1)
        obj_mask = (obj_cov[:, -1] if m.ii_last_only else obj_cov.max(axis=1))[..., None]
        obj_mask = (obj_mask > 0.9).astype(jnp.float32)
        if m.use_expansion:
            mask = expand_mask(mask, num=m.num_expansion)
            mask = mask * (1 - obj_mask)

    if not m.loop_ii:
        inp = wif_apply(raw_output)
        if m.use_inpainter:
            frames = []
            for t in range(tp):
                if m.inpaint_obj:
                    hole = 1 - (1 - mask[:, t]) * (1 - obj_mask[:, t])
                    masked = (1 - hole) * inp[:, t]
                    fill = inpainter(masked, hole)
                    frames.append((1 - mask[:, t]) * inp[:, t] + mask[:, t] * fill)
                else:
                    masked = (1 - mask[:, t]) * inp[:, t]
                    frames.append(inpainter(masked, mask[:, t]))
            inp = jnp.stack(frames, axis=1)
        return jnp.concatenate([real_vid[:, :ctx_len], inp], axis=1)

    # loop_ii path: per-frame fusion + reference-frame propagation
    inp_frames = [wif_apply(raw_output[:, :, t: t + 1])[:, 0] for t in range(tp)]
    if not m.use_inpainter:
        inp = jnp.stack(inp_frames, axis=1)
        return jnp.concatenate([real_vid[:, :ctx_len], inp], axis=1)

    assert m.inpaint_obj and m.propagate_unique
    ref = -1
    ref_to_pred_bg = warper.grid_to_bg_flow_from_ref_to_pred(grids, ctx_len, ref)
    ctx_to_ref_bg = warper.grid_to_bg_flow_from_ctx_to_ref(grids, ctx_len, ref)
    ref_img = inp_frames[ref]
    obj_mask_ref = obj_mask[:, ref]
    ref_left = ref_right = None

    # gather background from context (wif.py:101-123)
    for t2 in range(ctx_len - 1, -1, -1):
        ctx_img = real_vid[:, t2]
        ctx_mask = (alpha[..., :1][:, t2] > 1 - mask_thresh).astype(jnp.float32)
        warped_img = _warp(ctx_img, ctx_to_ref_bg[:, t2], src_grid)
        warped_mask = _warp(ctx_mask, ctx_to_ref_bg[:, t2], src_grid)
        warped_mask = (warped_mask > 1 - mask_thresh).astype(jnp.float32)
        if m.use_shadows and t2 == ctx_len - 1:
            sm = (jnp.abs(warped_img - ref_img).mean(-1, keepdims=True) > 0.25)
            sm = sm.astype(jnp.float32) * warped_mask * (1 - obj_mask_ref)
            sm = 1 - expand_mask(1 - sm, num=5)
            sm = expand_mask(sm, num=5)
            sm = sm.at[:, : int(sm.shape[1] * 0.4)].set(0.0)
            shadow_mask = soft_expand(sm, num=30) if m.soft_shadow else expand_mask(sm, num=30)
        inter = obj_mask_ref * warped_mask
        ref_img = inter * warped_img + (1 - inter) * ref_img
        obj_mask_ref = (1 - inter) * obj_mask_ref
        if m.ii_last_only:
            break

    # inpaint the reference frame (wif.py:125-132)
    if m.fix_mask:
        ref_mask = 1 - (1 - mask[:, ref]) * (1 - obj_mask_ref)
        ref_img = inpainter(ref_img, ref_mask, is_masked=False)
    else:
        ref_mask = 1 - (1 - mask[:, ref]) * (1 - obj_mask_ref)
        masked_ref = (1 - mask[:, ref]) * (1 - obj_mask_ref) * ref_img
        ref_img = inpainter(masked_ref, ref_mask)

    # off-screen object completion (wif.py:134-177), host-level decisions
    if m.propagate_obj:
        border = 3
        pred_grid = np.asarray(pred_flow[:, -1, -1] + src_grid[None])
        pred_grid[..., 0] = (pred_grid[..., 0] * wd + wd - 1) / 2
        pred_grid[..., 1] = (pred_grid[..., 1] * hd + hd - 1) / 2
        orig = np.asarray(src_grid).copy()[None]
        orig[..., 0] = (orig[..., 0] * wd + wd - 1) / 2
        orig[..., 1] = (orig[..., 1] * hd + hd - 1) / 2
        is_left = pred_grid[..., 0] < border
        is_right = pred_grid[..., 0] >= wd - border
        all_obj = np.asarray(((alpha_ctx[:, :, -1, :, :, 1:] + 1) / 2).max(axis=1) > 0.9)
        is_left_obj = is_left[..., None] & all_obj
        is_right_obj = is_right[..., None] & all_obj

        def complete(side_obj, side):
            oid = int(side_obj.reshape(b, -1, side_obj.shape[-1]).sum(1).argmax(1)[0])
            sel = side_obj[..., oid]
            bv = pred_grid[sel]
            ov = orig[np.broadcast_to(sel[..., None], orig.shape[:3] + (1,))[..., 0]].reshape(-1, 2) if sel.any() else None
            ovs = orig[0][sel[0]]
            if side == "left":
                corners = [(0, float(bv[:, 1].min())), (0, float(bv[:, 1].max())),
                           (float(ovs[:, 0].max()), float(ovs[:, 1].max())),
                           (float(ovs[:, 0].max()), float(ovs[:, 1].min()))]
            else:
                corners = [(float(ovs[:, 0].min()), float(ovs[:, 1].min())),
                           (float(ovs[:, 0].min()), float(ovs[:, 1].max())),
                           (wd - 1, float(bv[:, 1].max())), (wd - 1, float(bv[:, 1].min()))]
            pmask = point_in_polygon(jnp.asarray(orig), corners)
            masked = (1 - pmask) * raw_output[:, -1, -1, :, :, :3]
            obj_fill = inpainter(masked, pmask)
            flow = warper.grid_to_obj_flow_from_ref_to_pred(grids, ctx_len, ref, oid)
            return pmask, obj_fill, flow

        if is_left_obj.sum() > 0:
            ref_left = complete(is_left_obj, "left")
        if is_right_obj.sum() > 0:
            ref_right = complete(is_right_obj, "right")

    # per-frame forward warp of the inpainted reference (wif.py:179-211)
    out_frames = []
    for t in range(tp):
        img = inp_frames[t]
        curr_mask = mask[:, t]
        warped_img = _warp(ref_img, ref_to_pred_bg[:, t], src_grid)
        warped_mask = _warp(ref_mask, ref_to_pred_bg[:, t], src_grid)
        warped_mask = (warped_mask > 1 - mask_thresh).astype(jnp.float32)
        for side in (ref_left, ref_right):
            if side is None:
                continue
            smask, sobj, sflow = side
            w_obj = _warp(sobj, sflow[:, t], src_grid)
            w_m = (_warp(smask, sflow[:, t], src_grid) > 1 - mask_thresh).astype(jnp.float32)
            warped_mask = 1 - (1 - warped_mask) * (1 - w_m)
            curr_mask = 1 - (1 - curr_mask) * (1 - w_m)
            warped_img = (1 - w_m) * warped_img + w_m * w_obj
        obj_mask_t = obj_mask[:, t]
        if m.use_shadows and shadow_mask is not None:
            wsm = _warp(shadow_mask, ref_to_pred_bg[:, t], src_grid)
            if not m.soft_shadow:
                wsm = (wsm > 1 - mask_thresh).astype(jnp.float32)
            curr_mask = curr_mask * (1 - wsm * (1 - obj_mask_t))
        inter = curr_mask * warped_mask
        img = inter * warped_img + (1 - inter) * img
        curr_mask = (1 - inter) * curr_mask
        if m.fix_mask:
            hole = expand_mask(1 - (1 - curr_mask) * (1 - obj_mask_t), 3)
            fill = inpainter(img, hole, exp=False, is_masked=False)
        else:
            hole = 1 - (1 - curr_mask) * (1 - obj_mask_t)
            masked = (1 - curr_mask) * (1 - obj_mask_t) * img
            fill = inpainter(masked, hole)
        out_frames.append((1 - curr_mask) * img + curr_mask * fill)

    inp = jnp.stack(out_frames, axis=1)
    return jnp.concatenate([real_vid[:, :ctx_len], inp], axis=1)
