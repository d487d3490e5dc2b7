"""LVD — Layered Video Decomposition network.

Re-design of reference models/nets/lvd.py:11-950. The learned submodules
(encoder, layer estimator, pose estimator, alpha decoder) live in one flax
module with method dispatch; the parameterless geometry (TPS warps, grid
inversion, flow synthesis) lives in `Warper` (warper.py) so the hot path is
pure jnp ops outside the parameter tree.

Channel-last layouts:
  input video   (B, T, H, W, C)        tokens x       (B, T, L, C)
  x_obj         (B, No, Lo, C)         x_bg           (B, L, C)
  obj_pose      (B, T, No, Lo, 2)      bg_pose        (B, T, 1, L, 2)
  occ_score     (B, T, No)             obj_alpha      (B, No, Ho, Wo, 1)
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..nn import ConvPatchProj, CustomNorm, MultiBlocks
from ..nn.init import dense_kwargs, trunc_normal_init
from ..ops import get_grid, get_circle, resize
from ..parallel.sharding import shard_batch_only, shard_tokens


def get_num_channels(dtype: str, num_lyt: int) -> int:
    """Channel count from modality string (reference lvd.py:158-172)."""
    n = 0
    if "A" in dtype:
        n += 1
    if "L" in dtype:
        n += num_lyt
    if "M" in dtype:
        n += 1
    if "S" in dtype:
        n += 2
    if "RGB" in dtype:
        n += 3
    if "F" in dtype:
        n += 2
    return n


def input_dtype_string(m) -> str:
    return ("RGB" if m.input_rgb else "") + ("L" if m.input_lyt else "") + ("F" if m.input_flow else "")


class ImageEncoder(nn.Module):
    """(B,T,H,W,C) -> (B,T,L,C) tokens (reference lvd.py:182-199)."""

    cfg: Any
    dtype_str: str

    @nn.compact
    def __call__(self, vid):
        cfg, m = self.cfg, self.cfg.model
        scale = cfg.load_dim / cfg.dim if cfg.load_dim > 0 else m.scale_factor
        lead = vid.shape[:-3]
        img = vid.reshape((-1,) + vid.shape[-3:])
        if scale != 1:
            img = resize(img, 1.0 / scale)
        # Pin the conv stack to pure data-parallel sharding on both sides.
        # Without this, the `seq` constraint on the downstream attention
        # tokens propagates back through the (B*T, L, C) reshape into the
        # conv's spatial axis, and the partitioner resolves the transpose
        # (input-grad) conv with an involuntary full rematerialization
        # ({data,seq} -> flattened-batch reshard of an activation-sized
        # tensor per step; MULTICHIP_r04.json). Constraining here makes the
        # reshard an explicit cheap token all-to-all at the attention
        # boundary instead.
        img = shard_batch_only(img)
        proj = ConvPatchProj(
            patch_size=m.patch_size,
            embed_dim=m.embed_dim,
            norm_layer=m.norm_layer_patch,
            num_channels=get_num_channels(self.dtype_str, cfg.data.num_lyt),
            from_patch=True,
        )
        tokens = shard_batch_only(proj(img))
        return tokens.reshape(lead + tokens.shape[1:])


class ImageDecoder(nn.Module):
    """Tokens -> image; tanh alpha head (reference lvd.py:212-255)."""

    cfg: Any
    dtype_str: str = "A"
    init_mode: str = ""
    use_prior: bool = False

    @nn.compact
    def __call__(self, x, drop_alpha=False):
        cfg, m = self.cfg, self.cfg.model
        lead = x.shape[:-2]
        x = x.reshape((-1,) + x.shape[-2:])
        lat_obj = m.obj_shape[0] * m.obj_shape[1]
        lat = m.latent_shape[0] * m.latent_shape[1]
        latent_shape = {lat: m.latent_shape, lat_obj: m.obj_shape}[x.shape[1]]
        x = CustomNorm(m.norm_layer)(x)
        img = ConvPatchProj(
            patch_size=m.patch_size,
            embed_dim=m.embed_dim,
            norm_layer=m.norm_layer_patch,
            num_channels=get_num_channels(self.dtype_str, cfg.data.num_lyt),
            from_patch=False,
            zero_init_proj=self.init_mode in ("zero", "five"),
        )(x, latent_shape=latent_shape)
        img = img + (5.0 if self.init_mode == "five" else 0.0)
        if "A" in self.dtype_str:
            alpha = jnp.tanh(img[..., -1:])
            if self.use_prior:
                h, w = img.shape[-3], img.shape[-2]
                circle = get_circle((h, w), p=0.75)[..., None]
                alpha = circle * 1.0 + (1 - circle) * alpha
            img = jnp.concatenate([img[..., :-1], alpha], axis=-1)
            if drop_alpha:
                img = img[..., :-1]
        if m.scale_factor != 1:
            img = resize(img, m.scale_factor)
        return img.reshape(lead + img.shape[1:])


def _obj_bias_and_mul(m, aspect_ratio):
    """Per-object pose bias + multiplier table (reference lvd.py:296-330)."""
    s = m.init_scale_obj
    if m.rd_translate_bias:
        rng = np.random.RandomState(0)
        mu = m.translate_bias_mul
        rows = [[0, 0, s, 0, 0, aspect_ratio * s, mu * rng.rand(), mu * rng.rand()] for _ in range(m.num_obj)]
    elif m.circle_translate_bias:
        r = m.circle_translate_radius
        theta = [i * 2 * math.pi / (m.num_obj + 1) for i in range(m.num_obj)]
        rows = [[0, 0, s, 0, 0, aspect_ratio * s, r * math.cos(t), r * math.sin(t)] for t in theta]
    else:
        rows = [[0, 0, s, 0, 0, aspect_ratio * s, 0, 0]]
    bias = np.asarray(rows, np.float32).reshape(1, -1, 1, 8)
    mul = np.asarray(
        [m.mul_delta_obj, m.mul_delta_obj, m.mul_scale_obj, m.mul_scale_obj,
         m.mul_scale_obj, m.mul_scale_obj, 1.0, 1.0], np.float32
    ).reshape(1, 1, 1, 8)
    return bias, mul


class PoseEstimator(nn.Module):
    """Per-frame 8-dof pose + occ score per object, TPS bg pose
    (reference lvd.py:258-460, pts_mode='prior')."""

    cfg: Any

    @nn.compact
    def __call__(self, x, x_obj, x_bg, eps=1e-6, deterministic=True):
        cfg, m = self.cfg, self.cfg.model
        ar = cfg.aspect_ratio
        b, t, l, c = x.shape
        no, lo = m.num_obj, m.obj_shape[0] * m.obj_shape[1]

        obj_embed = self.param("obj_embed", trunc_normal_init(), (1, 1, lo, c))
        pos_embed = self.param("pos_embed", trunc_normal_init(), (1, 1, l, c))

        x = x + pos_embed
        xo = (x_obj + obj_embed).reshape(b, 1, no * lo, c)
        xo = jnp.broadcast_to(xo, (b, t, no * lo, c))
        if m.has_bg:
            xb = (x_bg + pos_embed[:, 0]).reshape(b, 1, l, c)
            xb = jnp.broadcast_to(xb, (b, t, l, c))
            x = jnp.concatenate([xb, xo, x], axis=2)
        else:
            x = jnp.concatenate([xo, x], axis=2)

        x = shard_tokens(x.reshape(b * t, -1, c))
        x = MultiBlocks(depth=m.pe_depth, dim=m.embed_dim, num_heads=m.num_heads,
                        block_type="full", norm_layer=m.norm_layer,
                        dropout=m.dropout)(x, deterministic=deterministic)
        keep = l + no * lo if m.has_bg else no * lo
        x = x[:, :keep]
        x_for_head = x[:, l:] if (m.has_bg and m.fix_bg) else x
        pose_size, scale_size, occ_size = 8, (1 if m.bound_scale else 0), 1
        head_kw = dense_kwargs()
        if m.pe_estimator_init_mode == "zero":
            head_kw["kernel_init"] = nn.initializers.zeros
        out = nn.Dense(pose_size + scale_size + occ_size, **head_kw)(
            CustomNorm(m.norm_layer)(x_for_head)
        )
        p, s = pose_size, scale_size
        pose, scale, occ = out[..., :p], out[..., p:p + s], out[..., p + s:]
        bg_pose_raw = None
        if m.has_bg and not m.fix_bg:
            bg_pose_raw = pose[:, :l]
            pose = pose[:, -no * lo:]
            scale = scale[:, -no * lo:]
            occ = occ[:, -no * lo:]

        # ---- object pose (lvd.py:379-417) ----
        bias, mul = _obj_bias_and_mul(m, ar)
        pose = jnp.tanh(pose)
        if m.bound_rest:
            min_bound = jnp.asarray(
                [0, 0, m.min_scale_bound, 0, 0, ar * m.min_scale_bound,
                 -m.max_translate_bound, -m.max_translate_bound], jnp.float32)
            max_bound = jnp.asarray(
                [0, 0, m.max_scale_bound, 0, 0, ar * m.max_scale_bound,
                 m.max_translate_bound, m.max_translate_bound], jnp.float32)
            if m.soft_bound_rest:
                rest = (
                    (pose < min_bound) * (pose - min_bound) ** 2
                    + (pose > max_bound) * (pose - max_bound) ** 2
                )
            else:
                rest = pose ** 2 * ((pose < min_bound) | (pose > max_bound))
        else:
            rest = pose ** 2
        rest = rest.reshape(b * t, -1).mean(-1)
        pose = pose.reshape(b * t, no, lo, 8) * mul + bias
        delta_pts = pose[..., :2]
        if not m.use_delta:
            delta_pts = delta_pts * 0
        transform = pose[..., 2:].reshape(b * t, no, lo, 3, 2).mean(axis=2)  # (B',No,3,2)
        if m.norm_scale:
            linear = transform[:, :, :2]
            det = jnp.abs(
                linear[:, :, 0, 0] * linear[:, :, 1, 1] - linear[:, :, 1, 0] * linear[:, :, 0, 1]
            ) + eps
            linear = linear * m.tgt_scale / jnp.sqrt(det[..., None, None] + eps)
            transform = jnp.concatenate([linear, transform[:, :, 2:]], axis=2)
        if m.bound_scale:
            sc = (jnp.tanh(scale) + 1) / 2
            sc = sc.reshape(b * t, no, lo, 1, 1).mean(axis=2)
            sc = m.min_scale + sc * (m.max_scale - m.min_scale)
            linear = transform[:, :, :2]
            det = jnp.abs(
                linear[:, :, 0, 0] * linear[:, :, 1, 1] - linear[:, :, 1, 0] * linear[:, :, 0, 1]
            ) + eps
            linear = linear * sc / jnp.sqrt(det[..., None, None] + eps)
            transform = jnp.concatenate([linear, transform[:, :, 2:]], axis=2)
        last_obj = None
        if m.use_last_pose_decoder:
            last_obj = jnp.concatenate(
                [
                    transform.reshape(b, t, no, 6)[:, m.ctx_len - 1],
                    delta_pts.reshape(b, t, no, lo * 2)[:, m.ctx_len - 1],
                ],
                axis=2,
            )  # (B, No, 6+2Lo)
        tgt_pts = get_grid(*m.obj_shape).reshape(1, 1, lo, 2)
        pts = tgt_pts + delta_pts
        pts = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
        obj_pose = (pts @ transform).reshape(b, t, no, lo, 2)
        rest = rest.reshape(b, t)

        # ---- occ score (lvd.py:422-433) ----
        occ = occ.reshape(b * t, no, lo).mean(axis=2)
        if m.occ_mode == "normalize":
            mn, mx = occ.min(axis=1, keepdims=True), occ.max(axis=1, keepdims=True)
            occ_score = (occ - mn) / (mx - mn + eps) * 4 * no
        elif m.occ_mode == "bias":
            occ_score = occ + jnp.asarray([2.0 * i for i in range(no)])[None]
        elif m.occ_mode == "freeze":
            occ_score = jnp.ones_like(occ)
        else:
            occ_score = occ
        occ_score = occ_score.reshape(b, t, no)

        # ---- bg pose (lvd.py:436-459) ----
        bg_pose, bg_rest, last_bg = None, None, None
        tgt_pts_bg = get_grid(*m.latent_shape).reshape(1, 1, l, 2)
        if m.has_bg:
            if not m.fix_bg:
                bg_bias = jnp.asarray([0, 0, 1, 0, 0, 1, 0, 0], jnp.float32)
                bgp = jnp.tanh(bg_pose_raw)
                bg_rest = (bgp ** 2).reshape(b * t, -1).mean(-1).reshape(b, t)
                bgp = bgp.reshape(b * t, 1, l, 8) + bg_bias
                delta_bg = bgp[..., :2]
                transform_bg = bgp[..., 2:].reshape(b * t, 1, l, 3, 2).mean(axis=2)
                if m.use_last_pose_decoder:
                    last_bg = jnp.concatenate(
                        [
                            transform_bg.reshape(b, t, 1, 6)[:, m.ctx_len - 1],
                            delta_bg.reshape(b, t, 1, l * 2)[:, m.ctx_len - 1],
                        ],
                        axis=2,
                    )  # (B, 1, 6+2L)
                pts = m.bg_mul * tgt_pts_bg + delta_bg
                pts = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
                bg_pose = (pts @ transform_bg).reshape(b, t, 1, l, 2)
            else:
                bg_pose = jnp.broadcast_to(tgt_pts_bg[:, None], (b, t, 1, l, 2))
            if m.fix_bg1:
                first = jnp.broadcast_to(tgt_pts_bg[:, None], (b, 1, 1, l, 2))
                bg_pose = jnp.concatenate([first, bg_pose[:, 1:]], axis=1)

        return obj_pose, bg_pose, occ_score, rest, bg_rest, last_obj, last_bg


class LayerEstimator(nn.Module):
    """Object queries cross-attending into all frame tokens
    (reference lvd.py:873-950)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg, m = self.cfg, self.cfg.model
        b, t, l, c = x.shape
        no, lo = m.num_obj, m.obj_shape[0] * m.obj_shape[1]

        if m.decompose_embed_oe:
            spatial = self.param("obj_spatial_embed", trunc_normal_init(), (1, 1, lo, c))
            num = self.param("obj_num_embed", trunc_normal_init(), (1, no, 1, c))
            obj_embed = spatial + num
        else:
            obj_embed = self.param("obj_embed", trunc_normal_init(), (1, no, lo, c))
        time_embed = self.param("time_embed", trunc_normal_init(), (1, m.oe_num_timesteps, 1, c))
        pos_embed = self.param("pos_embed", trunc_normal_init(), (1, 1, l, c))

        x = x + pos_embed + time_embed[:, :t]
        x_obj = jnp.broadcast_to(obj_embed, (b, no, lo, c)).reshape(b, no * lo, c)
        if m.has_bg:
            x_bg = jnp.broadcast_to(pos_embed, (b, 1, l, c)).reshape(b, l, c)
            x_obj = jnp.concatenate([x_bg, x_obj], axis=1)

        x = shard_tokens(CustomNorm(m.norm_layer)(x.reshape(b, t * l, c)))
        x_obj = MultiBlocks(depth=m.oe_depth, dim=m.embed_dim, num_heads=m.num_heads,
                            block_type="obj", norm_layer=m.norm_layer,
                            dropout=m.dropout)(x_obj, x_ctx=x, deterministic=deterministic)
        x_bg = x_obj[:, :l] if m.has_bg else None
        x_obj = x_obj[:, -no * lo:]

        cls = None
        if m.pred_cls:
            x_cls = x_obj.reshape(b, no, lo, c).mean(axis=2)
            cls = nn.Dense(cfg.data.num_lyt, **dense_kwargs())(CustomNorm(m.norm_layer)(x_cls))
            cls = jax.nn.softmax(cls, axis=-1)  # (B, No, Nl)

        return x_obj.reshape(b, no, lo, c), x_bg, cls


class LVDNet(nn.Module):
    """Learned LVD submodules with method dispatch (reference lvd.py:11-155).

    Geometry (warps/grids/flows) lives in models.warper.Warper.
    """

    cfg: Any

    def setup(self):
        cfg, m = self.cfg, self.cfg.model
        self.encoder = ImageEncoder(cfg, input_dtype_string(m))
        self.layer_estimator = LayerEstimator(cfg)
        self.pose_estimator = PoseEstimator(cfg)
        self.decoder = ImageDecoder(cfg, "A", init_mode=m.pe_decoder_init_mode,
                                    use_prior=m.pe_decoder_use_prior)

    def encode_input(self, vid, **kw):
        return self.encoder(vid)

    def estimate_layer(self, x, **kw):
        return self.layer_estimator(x, **kw)

    def estimate_pose(self, x, x_obj, x_bg, **kw):
        return self.pose_estimator(x, x_obj, x_bg, **kw)

    def decode_obj_alpha(self, x_obj, **kw):
        """x_obj (B,No,Lo,C) -> obj_alpha (B,No,Ho,Wo,1) in [-1,1]."""
        m = self.cfg.model
        alpha = self.decoder(x_obj)
        if m.remove_obj:
            alpha = 0 * alpha - 1
        if m.freeze_obj:
            alpha = 0 * alpha + 1
        mask = obj_alpha_border_mask(self.cfg)
        if mask is not None:
            alpha = mask * alpha + (1 - mask) * (-1.0)
        return alpha

    def __call__(self, vid):
        """Init-only path touching every submodule."""
        x = self.encode_input(vid)
        x_obj, x_bg, cls = self.estimate_layer(x[:, : self.cfg.model.ctx_len])
        poses = self.estimate_pose(x, x_obj, x_bg)
        alpha = self.decode_obj_alpha(x_obj)
        return poses, alpha, cls


# ---- parameterless LVD helpers ----


def obj_alpha_border_mask(cfg):
    """Border zeroing mask for object alpha (reference lvd.py:25-36)."""
    m = cfg.model
    if m.pad_obj_alpha <= 0:
        return None
    ho = int(m.obj_shape[0] * m.patch_size * m.scale_factor)
    wo = int(m.obj_shape[1] * m.patch_size * m.scale_factor)
    po = int(m.pad_obj_alpha * m.scale_factor)
    mask = np.ones((ho, wo), np.float32)
    mask[:po] = 0
    mask[:, :po] = 0
    mask[-po:] = 0
    mask[:, -po:] = 0
    return mask.reshape(1, 1, ho, wo, 1)


def bg_alpha_buffer(cfg):
    """Fixed background alpha with border -1 (reference lvd.py:37-44)."""
    m = cfg.model
    h, w = cfg.dim, int(cfg.dim * cfg.aspect_ratio)
    bg = np.ones((h, w), np.float32)
    if m.pad_bg_alpha > 0:
        p = int(m.pad_bg_alpha * m.scale_factor)
        bg[:p] = -1
        bg[:, :p] = -1
        bg[-p:] = -1
        bg[:, -p:] = -1
    return bg.reshape(1, h, w, 1)


def compute_occ(occ_score, eps=1e-6):
    """Pairwise occlusion matrix from per-object scores (reference lvd.py:59-68).

    occ_score (B,T,No) -> occ (B,T,No+1,No+1); occ[i,j] = how much layer i
    occludes layer j. Background is occluded by all, occludes none."""
    b, t, no = occ_score.shape
    e = jnp.exp(-(occ_score ** 2)) + eps
    occ = e[..., :, None] / (e[..., :, None] + e[..., None, :])
    occ = occ - 0.5 * jnp.eye(no)[None, None]
    occ = jnp.concatenate([jnp.ones((b, t, no, 1), occ.dtype), occ], axis=3)
    occ = jnp.concatenate([jnp.zeros((b, t, 1, no + 1), occ.dtype), occ], axis=2)
    return occ


def reduce_time(obj, bg, occ_obj_alpha, occ_bg_alpha, eps=1e-6, time_dropout_rng=None):
    """Occlusion-score-weighted temporal reduction of layer textures
    (reference lvd.py:70-98); channel-last, optional time dropout."""
    b, t, no = occ_obj_alpha.shape[:3]

    score_o = (occ_obj_alpha + 1) / 2 + eps  # B T No Ho Wo 1
    if time_dropout_rng is not None:
        k1, k2, k3, k4 = jax.random.split(time_dropout_rng, 4)
        ti = jax.random.randint(k1, (b, 1, 1), 0, t)
        rd = jax.random.uniform(k2, (b, t, no))
        e = jnp.take_along_axis(rd, jnp.broadcast_to(ti, (b, 1, no)), axis=1)
        score_o = score_o * (rd >= e).astype(score_o.dtype)[..., None, None, None]
    score_o = score_o / score_o.sum(axis=1, keepdims=True)
    occ_obj = jnp.concatenate([obj, occ_obj_alpha], axis=-1)
    obj = (occ_obj * score_o).sum(axis=1)  # B No Ho Wo C+1

    score_b = (occ_bg_alpha + 1) / 2 + eps  # B T H W 1
    if time_dropout_rng is not None:
        ti = jax.random.randint(k3, (b, 1), 0, t)
        rd = jax.random.uniform(k4, (b, t))
        e = jnp.take_along_axis(rd, ti, axis=1)
        score_b = score_b * (rd >= e).astype(score_b.dtype)[..., None, None, None]
    score_b = score_b / score_b.sum(axis=1, keepdims=True)
    occ_bg = jnp.concatenate([bg, occ_bg_alpha], axis=-1)
    bg = (occ_bg * score_b).sum(axis=1)  # B H W C+1
    return obj, bg


def reduce_comp(vid, occ, flow):
    """Alpha-composite per-layer videos (reference lvd.py:100-114);
    vid (B,T,No+1,H,W,C+1) in [-1,1], occ (B,T,No+1,No+1), flow (B,T-1?,No+1,H,W,2)."""
    b, t = vid.shape[:2]
    no = vid.shape[2] - 1
    vid = (vid + 1) / 2
    alpha = jnp.concatenate(
        [jnp.ones_like(vid[:, :, :1, ..., -1:]), vid[:, :, 1:, ..., -1:]], axis=2
    )  # B T No+1 H W 1
    a = alpha[:, :, :, None]
    o = occ[:, :, :, :, None, None, None]
    occp = jnp.prod(1 - a * o, axis=2)  # B T No+1 H W 1
    alpha = occp * alpha
    out = (alpha * vid[..., :-1]).sum(axis=2)
    flow = (alpha[:, :-1] * flow).sum(axis=2)
    return 2 * out - 1, 2 * alpha[..., 0] - 1, flow
