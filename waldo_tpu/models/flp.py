"""FLP — Future Layer Prediction transformer.

Re-design of reference models/nets/flp.py:8-314. The reference packs
variable-length context via boolean indexing and scatters predictions back
(flp.py:89-99, 276-284); here every tensor keeps its static (B, T[+1], No+1)
shape and context selection happens through attention key masks + where-
selects — identical values at every position that is read downstream.

Shapes: obj_pose (B,T,No,Lo,2), bg_pose (B,T,1,L,2), occ_score (B,T,No),
x_obj (B,No,Lo,C), x_bg (B,L,C), ctx_mask (B,T) bool (True = context).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn import CustomNorm, MultiBlocks, Block
from ..nn.init import dense_kwargs, trunc_normal_init
from ..ops import get_grid
from ..parallel.sharding import shard_tokens


class LatentCompressor(nn.Module):
    """CLS-token attention pooling per layer (reference flp.py:288-314)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, deterministic=True):
        m = self.cfg.model
        lead = x.shape[:-2]
        x = x.reshape((-1,) + x.shape[-2:])
        x = CustomNorm(m.norm_layer)(x)
        cls_embed = self.param("cls_embed", trunc_normal_init(), (1, 1, m.embed_dim))
        z = jnp.broadcast_to(cls_embed, (x.shape[0], 1, m.embed_dim))
        z = MultiBlocks(depth=m.pg_com_depth, dim=m.embed_dim, num_heads=m.num_heads,
                        block_type="cls", norm_layer=m.norm_layer,
                        dropout=m.dropout)(z, x_ctx=x, deterministic=deterministic)
        return z.reshape(lead + (m.embed_dim,))


class PoseEncoder(nn.Module):
    """Pose-token embedding + masked full attention over context slots
    (reference flp.py:32-100)."""

    cfg: Any

    @nn.compact
    def __call__(self, obj_pose, bg_pose, occ_score, z, ctx_mask, deterministic=True):
        m = self.cfg.model
        b, t, no, lo, _ = obj_pose.shape
        l = m.latent_shape[0] * m.latent_shape[1]
        c = m.embed_dim

        lay_embed = self.param("lay_embed", trunc_normal_init(), (1, 1, no + 1, c))
        time_embed = self.param("time_embed", trunc_normal_init(),
                                (1, m.pg_num_timesteps + 1, 1, c))

        xo = nn.Dense(c, **dense_kwargs())(
            jnp.concatenate([obj_pose.reshape(b, t, no, lo * 2), occ_score[..., None]], -1)
        )  # B T No C
        xb = nn.Dense(c, **dense_kwargs())(bg_pose.reshape(b, t, 1, l * 2))  # B T 1 C
        x = jnp.concatenate([xb, xo], axis=2)  # B T No+1 C

        z = z.reshape(b, 1, no + 1, c)
        if m.cat_z:
            x = jnp.concatenate([z, x], axis=1)  # B T+1 No+1 C
            ctx_mask = jnp.concatenate(
                [jnp.ones_like(ctx_mask[:, :1]), ctx_mask], axis=1
            )
            tt = t + 1
        else:
            tt = t
        x = x + time_embed[:, :tt] + lay_embed

        key_mask = jnp.repeat(ctx_mask, no + 1, axis=1)  # B tt*(No+1)
        x = MultiBlocks(depth=m.pg_enc_depth, dim=m.embed_dim, num_heads=m.num_heads,
                        block_type="full", norm_layer=m.norm_layer,
                        dropout=m.dropout)(
            shard_tokens(x.reshape(b, tt * (no + 1), c)), key_mask=key_mask,
            deterministic=deterministic,
        )
        x = CustomNorm(m.norm_layer)(x).reshape(b, tt, no + 1, c)

        x_init = jnp.broadcast_to(time_embed[:, :tt] + lay_embed, (b, tt, no + 1, c))
        if m.pg_embed_noise and not deterministic:
            x_init = x_init + jax.random.normal(self.make_rng("noise"), (b, 1, 1, c))
        x = jnp.where(ctx_mask[:, :, None, None], x, x_init)
        return x, ctx_mask  # ctx_mask now includes the z slot when cat_z


class PoseDecoder(nn.Module):
    """Interleaved self(pred)/cross(ctx) attention + pose heads
    (reference flp.py:174-285)."""

    cfg: Any

    @nn.compact
    def __call__(self, obj_pose, bg_pose, occ_score, x, ctx_mask_ext, deterministic=True,
                 last_obj=None, last_bg=None, eps=1e-6):
        m = self.cfg.model
        cfg = self.cfg
        b, tt, nlay, c = x.shape
        no = nlay - 1
        lo = m.obj_shape[0] * m.obj_shape[1]
        l = m.latent_shape[0] * m.latent_shape[1]
        t = obj_pose.shape[1]

        pred_mask_ext = ~ctx_mask_ext  # (B, tt)
        key_ctx = jnp.repeat(ctx_mask_ext, nlay, axis=1)
        key_pred = jnp.repeat(pred_mask_ext, nlay, axis=1)

        tokens = x.reshape(b, tt * nlay, c)
        z_cond = (
            jax.random.normal(self.make_rng("noise"), (b, 1, c))
            if m.pg_modulate_noise and not deterministic
            else None
        )
        block_type = "full_with_cond_norm" if m.pg_modulate_noise else "full"
        norm_layer = "ln_not_affine" if m.pg_modulate_noise else m.norm_layer
        x_pred = tokens
        for _ in range(m.pg_dec_depth):
            x_pred = Block(dim=c, num_heads=m.num_heads, block_type=block_type,
                           norm_layer=norm_layer, noise=m.pg_inject_noise)(
                x_pred, key_mask=key_pred, z_cond=z_cond, deterministic=deterministic)
            x_pred = Block(dim=c, num_heads=m.num_heads, block_type="cross",
                           norm_layer=m.norm_layer)(
                x_pred, x_ctx=tokens, key_mask=key_ctx, deterministic=deterministic)

        x_pred = CustomNorm(m.norm_layer)(x_pred).reshape(b, tt, nlay, c)
        x_obj = x_pred[:, :, 1:]  # B tt No C
        x_bg = x_pred[:, :, :1]  # B tt 1 C

        kw_obj = dense_kwargs()
        kw_bg = dense_kwargs()
        if m.zero_init_dec:
            kw_obj["kernel_init"] = nn.initializers.zeros
            kw_bg["kernel_init"] = nn.initializers.zeros
        out_obj = nn.Dense(6 + 2 * lo + 1, **kw_obj)(x_obj)
        out_bg = nn.Dense(6 + 2 * l, **kw_bg)(x_bg)
        pred_obj = jnp.tanh(out_obj[..., :-1])  # B tt No 6+2Lo
        pred_occ = out_obj[..., -1]  # B tt No
        pred_bg = jnp.tanh(out_bg)  # B tt 1 6+2L

        if m.use_last_pose_decoder:
            pred_obj = pred_obj + last_obj[:, None]
            pred_bg = pred_bg + last_bg[:, None]

        if m.unconstrained_pose_decoder:
            mul_delta, init_scale, mul_scale = 1.0, 1.0, 1.0
        else:
            mul_delta, init_scale, mul_scale = m.mul_delta_obj, m.init_scale_obj, m.mul_scale_obj
        ar = cfg.aspect_ratio
        bias_obj = 0.0 if m.use_last_pose_decoder else jnp.asarray(
            [init_scale, 0, 0, ar * init_scale, 0, 0], jnp.float32)
        bias_bg = 0.0 if m.use_last_pose_decoder else jnp.asarray(
            [1, 0, 0, 1, 0, 0], jnp.float32)
        mul_obj = jnp.asarray([mul_scale] * 4 + [1.0, 1.0], jnp.float32)

        transform = (mul_obj * pred_obj[..., :6] + bias_obj).reshape(b, tt, no, 3, 2)
        delta_pts = (mul_delta * pred_obj[..., 6:]).reshape(b, tt, no, lo, 2)
        tgt_pts_obj = get_grid(*m.obj_shape).reshape(1, 1, 1, lo, 2)
        pts = tgt_pts_obj + delta_pts
        pts = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
        pred_obj_pose = pts @ transform

        transform_bg = (pred_bg[..., :6] + bias_bg).reshape(b, tt, 1, 3, 2)
        delta_bg = pred_bg[..., 6:].reshape(b, tt, 1, l, 2)
        tgt_pts_bg = get_grid(*m.latent_shape).reshape(1, 1, 1, l, 2)
        pts = m.bg_mul_pose_decoder * tgt_pts_bg + delta_bg
        pts = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
        pred_bg_pose = pts @ transform_bg

        # drop the z slot, scatter into real poses at pred positions
        if m.cat_z:
            pred_obj_pose = pred_obj_pose[:, 1:]
            pred_bg_pose = pred_bg_pose[:, 1:]
            pred_occ = pred_occ[:, 1:]
            pred_mask = pred_mask_ext[:, 1:]
        else:
            pred_mask = pred_mask_ext
        obj_out = jnp.where(pred_mask[:, :, None, None, None], pred_obj_pose, obj_pose)
        bg_out = jnp.where(pred_mask[:, :, None, None, None], pred_bg_pose, bg_pose)
        occ_out = jnp.where(pred_mask[:, :, None], pred_occ, occ_score)
        return obj_out, bg_out, occ_out


class FLPNet(nn.Module):
    """compress -> encode -> decode (reference flp.py:8-29)."""

    cfg: Any

    def setup(self):
        self.compress = LatentCompressor(self.cfg)
        self.encode = PoseEncoder(self.cfg)
        self.decode = PoseDecoder(self.cfg)

    def __call__(self, obj_pose, bg_pose, occ_score, x_obj, x_bg, last_obj, last_bg,
                 ctx_mask, deterministic=True):
        z_obj = self.compress(x_obj, deterministic=deterministic)  # (B, No, C)
        z_bg = self.compress(x_bg[:, None], deterministic=deterministic)  # (B, 1, C)
        z = jnp.concatenate([z_bg, z_obj], axis=1)  # (B, No+1, C)
        x, ctx_mask_ext = self.encode(obj_pose, bg_pose, occ_score, z, ctx_mask,
                                      deterministic=deterministic)
        return self.decode(obj_pose, bg_pose, occ_score, x, ctx_mask_ext,
                           deterministic=deterministic, last_obj=last_obj, last_bg=last_bg)
