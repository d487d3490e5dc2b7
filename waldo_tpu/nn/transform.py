"""Transformer blocks and attention variants (flax.linen).

Re-design of the reference attention zoo (models/modules/transform.py:15-447)
for static shapes: the reference packs variable-length context with boolean
indexing (`to_ctx`/`from_ctx`, tools/utils.py:84-96) which cannot jit; here
every sequence keeps its full static length and variable context is expressed
with additive key masks — mathematically identical softmax outputs at the
positions that are read downstream.

All matmuls run through einsum in the default (fast) TPU precision; token
counts are small (<= a few thousand) so full attention maps cleanly onto the
MXU without flash/ring machinery.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .init import dense_kwargs

_NEG = -1e9  # large-negative instead of -inf: avoids NaN on fully-masked rows


def _split_heads(x, num_heads):
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads)


def _mha(q, k, v, num_heads, key_mask=None):
    """q (B,Nq,C), k/v (B,Nk,C), key_mask (B,Nk) True=attend -> (B,Nq,C)."""
    b, nq, c = q.shape
    d = c // num_heads
    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32) * (d ** -0.5)
    if key_mask is not None:
        attn = jnp.where(key_mask[:, None, None, :], attn, _NEG)
    attn = jax.nn.softmax(attn, axis=-1).astype(qh.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
    return out.reshape(b, nq, c)


class PixelNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.lax.rsqrt(jnp.mean(x ** 2, axis=-1, keepdims=True) + 1e-8)


class CustomNorm(nn.Module):
    """ln / ln_not_affine / pn / ln2d (reference transform.py:395-413)."""

    norm_type: str = "ln"

    @nn.compact
    def __call__(self, x):
        # epsilons pinned to the torch defaults (1e-5) for checkpoint parity
        if self.norm_type == "ln":
            return nn.LayerNorm(epsilon=1e-5)(x)
        if self.norm_type == "ln_not_affine":
            return nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-5)(x)
        if self.norm_type == "pn":
            return PixelNorm()(x)
        if self.norm_type == "ln2d":
            # per-channel norm over spatial dims (torch GroupNorm(C, C)), NHWC
            return nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5)(x)
        raise ValueError(self.norm_type)


class Mlp(nn.Module):
    dim: int
    mul: int = 4
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mul * self.dim, **dense_kwargs())(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim or self.dim, **dense_kwargs())(x)


class _NoiseMixin:
    def _add_noise(self, x, deterministic):
        strength = self.param("noise_strength", nn.initializers.zeros, ())
        if deterministic:
            return x
        noise = jax.random.normal(self.make_rng("noise"), (x.shape[0], x.shape[1], 1))
        return x + noise * strength


class FullAttention(nn.Module, _NoiseMixin):
    """Self-attention with optional key mask (reference transform.py:87-122)."""

    dim: int
    num_heads: int
    noise: bool = False

    @nn.compact
    def __call__(self, x, key_mask=None, deterministic=True, **_):
        if self.noise:
            x = self._add_noise(x, deterministic)
        qkv = nn.Dense(self.dim * 3, use_bias=False, **dense_kwargs())(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = _mha(q, k, v, self.num_heads, key_mask)
        return nn.Dense(self.dim, **dense_kwargs())(out)


class CrossAttention(nn.Module, _NoiseMixin):
    """Queries over x, keys/values over x_ctx (reference transform.py:125-158)."""

    dim: int
    num_heads: int
    noise: bool = False

    @nn.compact
    def __call__(self, x, x_ctx, key_mask=None, deterministic=True, **_):
        if self.noise:
            x = self._add_noise(x, deterministic)
        q = nn.Dense(self.dim, use_bias=False, **dense_kwargs())(x)
        kv = nn.Dense(self.dim * 2, use_bias=False, **dense_kwargs())(x_ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        out = _mha(q, k, v, self.num_heads, key_mask)
        return nn.Dense(self.dim, **dense_kwargs())(out)


class ObjAttention(nn.Module):
    """Object queries attending to themselves + frame tokens
    (reference transform.py:161-187)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, x_ctx, deterministic=True, **_):
        q = nn.Dense(self.dim, use_bias=False, **dense_kwargs())(x)
        kv_layer = nn.Dense(self.dim * 2, use_bias=False, **dense_kwargs())
        k_obj, v_obj = jnp.split(kv_layer(x), 2, axis=-1)
        k_ctx, v_ctx = jnp.split(kv_layer(x_ctx), 2, axis=-1)
        k = jnp.concatenate([k_obj, k_ctx], axis=1)
        v = jnp.concatenate([v_obj, v_ctx], axis=1)
        out = _mha(q, k, v, self.num_heads)
        return nn.Dense(self.dim, **dense_kwargs())(out)


class ClsAttention(nn.Module):
    """CLS-token pooling attention (reference transform.py:190-211)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, x_ctx, deterministic=True, **_):
        z = jnp.concatenate([x, x_ctx], axis=1)
        q = nn.Dense(self.dim, use_bias=False, **dense_kwargs())(x)
        kv = nn.Dense(self.dim * 2, use_bias=False, **dense_kwargs())(z)
        k, v = jnp.split(kv, 2, axis=-1)
        out = _mha(q, k, v, self.num_heads)
        return nn.Dense(self.dim, **dense_kwargs())(out)


class CtxAttention(nn.Module):
    """Context tokens attend to [cls; ctx] (reference transform.py:214-235)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, x_ctx, deterministic=True, **_):
        # naming mirrors the reference: `x` is z_cls, `x_ctx` the tokens;
        # queries come from the tokens
        z = jnp.concatenate([x, x_ctx], axis=1)
        q = nn.Dense(self.dim, use_bias=False, **dense_kwargs())(x_ctx)
        kv = nn.Dense(self.dim * 2, use_bias=False, **dense_kwargs())(z)
        k, v = jnp.split(kv, 2, axis=-1)
        out = _mha(q, k, v, self.num_heads)
        return nn.Dense(self.dim, **dense_kwargs())(out)


class SeedAttention(nn.Module):
    """Self-attention with an extra cls-derived key/value pair
    (reference transform.py:238-261)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, z_cls, deterministic=True, **_):
        qkv = nn.Dense(self.dim * 3, use_bias=False, **dense_kwargs())(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        kv_cls = nn.Dense(self.dim * 2, use_bias=False, **dense_kwargs())(z_cls)
        k_cls, v_cls = jnp.split(kv_cls, 2, axis=-1)
        k = jnp.concatenate([k_cls, k], axis=1)
        v = jnp.concatenate([v_cls, v], axis=1)
        out = _mha(q, k, v, self.num_heads)
        return nn.Dense(self.dim, **dense_kwargs())(out)


def get_causal_mask(causal_mask_sizes, mask_diag=False):
    """Block-causal mask (reference transform.py:440-447); True = masked."""
    import numpy as np

    cum = np.concatenate(
        [np.full(s, i) for i, s in enumerate(causal_mask_sizes)]
    )
    row, col = np.meshgrid(cum, cum, indexing="ij")
    return jnp.asarray((row <= col) if mask_diag else (row < col))


class BlockCausalAttention(nn.Module):
    """Self-attention under a block-causal mask (reference transform.py:264-289)."""

    dim: int
    num_heads: int
    causal_mask_sizes: tuple = ()
    noise: bool = False

    @nn.compact
    def __call__(self, x, deterministic=True, **_):
        n = x.shape[1]
        qkv = nn.Dense(self.dim * 3, use_bias=False, **dense_kwargs())(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b = x.shape[0]
        d = self.dim // self.num_heads
        qh, kh, vh = (_split_heads(t, self.num_heads) for t in (q, k, v))
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * (d ** -0.5)
        mask = get_causal_mask(self.causal_mask_sizes)[:n, :n]
        attn = jnp.where(mask[None, None], _NEG, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, n, self.dim)
        return nn.Dense(self.dim, **dense_kwargs())(out)


class SkipAttention(nn.Module):
    """Per-frame queries attending to delta-keyed context frames + themselves
    (reference transform.py:292-340; not exercised by released configs).

    x (B, T0*L, C) queries; x_ctx/dx_ctx (B, T, L, C) value/key streams.
    Attention spans (T+1) blocks of L: T context blocks keyed by dx_ctx plus
    a per-frame self block."""

    dim: int
    num_heads: int
    latent_size: int
    num_seeds: int = 0
    temporal_dropout: float = 0.0
    non_trivial: bool = False

    @nn.compact
    def __call__(self, x, x_ctx, dx_ctx, mode="inference", ctx_mask=None,
                 deterministic=True, **_):
        l = self.latent_size
        b, t, _, c = x_ctx.shape
        t0 = x.shape[1] // l
        hn = self.num_heads
        d = c // hn
        qkv = nn.Dense(self.dim * 3, use_bias=False, **dense_kwargs())(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        k_ctx = nn.Dense(self.dim, use_bias=False, **dense_kwargs())(dx_ctx)
        v_ctx = nn.Dense(self.dim, use_bias=False, **dense_kwargs())(x_ctx)
        qh = q.reshape(b, t0 * l, hn, d).transpose(0, 2, 1, 3)
        kc = k_ctx.reshape(b, t * l, hn, d).transpose(0, 2, 1, 3)
        vc = v_ctx.reshape(b, t * l, hn, d).transpose(0, 2, 1, 3)
        attn = (qh @ kc.transpose(0, 1, 3, 2)) * (d ** -0.5)
        attn = attn.reshape(b, hn, t0 * l, t, l)
        if ctx_mask is not None:
            attn = jnp.where(ctx_mask[:, None, None, :, None], attn, _NEG)
        if mode == "training" and self.non_trivial:
            idx = jnp.arange(t)
            m = (idx[:, None] + self.num_seeds) == idx[None, :]
            attn = jnp.where(m[:t0][None, None, :, None, :, None]
                             .reshape(1, 1, t0, 1, t, 1)
                             .repeat(l, 3).reshape(1, 1, t0 * l, t, 1), _NEG, attn)
        if mode == "training" and self.temporal_dropout > 0 and not deterministic:
            drop = jax.random.uniform(self.make_rng("noise"),
                                      attn.shape[:-1] + (1,)) < self.temporal_dropout
            attn = jnp.where(drop, _NEG, attn)
        kh = k.reshape(b, t0, l, hn, d).transpose(0, 3, 1, 2, 4)
        vh = v.reshape(b, t0, l, hn, d).transpose(0, 3, 1, 2, 4)
        qh2 = qh.reshape(b, hn, t0, l, d)
        self_attn = (qh2 @ kh.transpose(0, 1, 2, 4, 3)) * (d ** -0.5)
        self_attn = self_attn.reshape(b, hn, t0 * l, 1, l)
        full = jnp.concatenate([attn, self_attn], axis=3).reshape(
            b, hn, t0 * l, (t + 1) * l
        )
        full = jax.nn.softmax(full, axis=-1)
        out = full[..., : t * l] @ vc
        self_part = (
            full[..., t * l:].reshape(b, hn, t0, l, l) @ vh
        ).reshape(b, hn, t0 * l, d)
        out = (out + self_part).transpose(0, 2, 1, 3).reshape(b, t0 * l, c)
        return nn.Dense(self.dim, **dense_kwargs())(out)


class Skip2Attention(nn.Module):
    """SkipAttention variant with per-query-frame context keys
    (reference transform.py:343-392; unused by released configs).

    Unlike SkipAttention, the delta stream dx_ctx carries a distinct key per
    (context frame, query frame) pair: dx_ctx (B, T, T0*L, C), so queries of
    frame t0 attend to context frame t through key k(dx_ctx[:, t, t0*L:(t0+1)*L])."""

    dim: int
    num_heads: int
    latent_size: int
    num_seeds: int = 0
    temporal_dropout: float = 0.0
    non_trivial: bool = False

    @nn.compact
    def __call__(self, x, x_ctx, dx_ctx, mode="inference", ctx_mask=None,
                 deterministic=True, **_):
        l = self.latent_size
        b, t, n, c = dx_ctx.shape
        t0 = n // l
        hn = self.num_heads
        d = c // hn
        qkv = nn.Dense(self.dim * 3, use_bias=False, **dense_kwargs())(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        k_ctx = nn.Dense(self.dim, use_bias=False, **dense_kwargs())(dx_ctx)
        v_ctx = nn.Dense(self.dim, use_bias=False, **dense_kwargs())(x_ctx)
        # k_ctx: (B, T, T0, L, hn, d) -> (B, hn, T0, T, L, d)
        kc = k_ctx.reshape(b, t, t0, l, hn, d).transpose(0, 4, 2, 1, 3, 5)
        vc = v_ctx.reshape(b, t * l, hn, d).transpose(0, 2, 1, 3)  # B hn T*L d
        qh = q.reshape(b, t0, l, hn, d).transpose(0, 3, 1, 2, 4)  # B hn T0 L d
        attn = jnp.einsum("bhoqd,bhotkd->bhotqk", qh, kc) * (d ** -0.5)
        # (B, hn, T0, T, L, L) -> (B, hn, T0*L, T, L)
        attn = attn.transpose(0, 1, 2, 4, 3, 5).reshape(b, hn, t0 * l, t, l)
        if ctx_mask is not None:
            attn = jnp.where(ctx_mask[:, None, None, :, None], attn, _NEG)
        if mode == "training" and self.non_trivial:
            idx = jnp.arange(t)
            m = (idx[:, None] + self.num_seeds) == idx[None, :]
            m = jnp.repeat(m[:t0][:, None, :], l, axis=1).reshape(t0 * l, t)
            attn = jnp.where(m[None, None, :, :, None], _NEG, attn)
        if mode == "training" and self.temporal_dropout > 0 and not deterministic:
            drop = jax.random.uniform(self.make_rng("noise"),
                                      attn.shape[:-1] + (1,)) < self.temporal_dropout
            attn = jnp.where(drop, _NEG, attn)
        kh = k.reshape(b, t0, l, hn, d).transpose(0, 3, 1, 2, 4)
        vh = v.reshape(b, t0, l, hn, d).transpose(0, 3, 1, 2, 4)
        self_attn = (qh @ kh.transpose(0, 1, 2, 4, 3)) * (d ** -0.5)
        self_attn = self_attn.reshape(b, hn, t0 * l, 1, l)
        full = jnp.concatenate([attn, self_attn], axis=3).reshape(
            b, hn, t0 * l, (t + 1) * l)
        full = jax.nn.softmax(full, axis=-1)
        out = full[..., : t * l] @ vc
        self_part = (
            full[..., t * l:].reshape(b, hn, t0, l, l) @ vh
        ).reshape(b, hn, t0 * l, d)
        out = (out + self_part).transpose(0, 2, 1, 3).reshape(b, t0 * l, c)
        return nn.Dense(self.dim, **dense_kwargs())(out)


_ATTN = {
    "full": FullAttention,
    "full_with_cond_norm": FullAttention,
    "cross": CrossAttention,
    "obj": ObjAttention,
    "cls": ClsAttention,
    "ctx": CtxAttention,
    "seed": SeedAttention,
    "block_causal": BlockCausalAttention,
    "skip": SkipAttention,
    "skip2": Skip2Attention,
}


class Block(nn.Module):
    """Pre-norm transformer block (reference transform.py:26-58)."""

    dim: int
    num_heads: int
    block_type: str = "full"
    norm_layer: str = "ln"
    noise: bool = False
    dropout: float = 0.0
    causal_mask_sizes: tuple = ()

    @nn.compact
    def __call__(self, x, x_ctx=None, key_mask=None, z_cond=None, deterministic=True):
        cond_norm = self.block_type == "full_with_cond_norm"
        if cond_norm:
            ab = Mlp(self.dim, out_dim=4 * self.dim)(z_cond).reshape(
                x.shape[0], 1, 4, self.dim
            )
            a1, b1, a2, b2 = ab[:, :, 0], ab[:, :, 1], ab[:, :, 2], ab[:, :, 3]
        else:
            a1, b1, a2, b2 = 1.0, 0.0, 1.0, 0.0
        attn_cls = _ATTN[self.block_type]
        attn_kwargs = dict(dim=self.dim, num_heads=self.num_heads)
        if self.block_type in ("full", "full_with_cond_norm", "cross"):
            attn_kwargs["noise"] = self.noise
        if self.block_type == "block_causal":
            attn_kwargs["causal_mask_sizes"] = self.causal_mask_sizes
        attn = attn_cls(**attn_kwargs)

        h = a1 * CustomNorm(self.norm_layer)(x) + b1
        h = attn(h, x_ctx=x_ctx, key_mask=key_mask, deterministic=deterministic)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        h = Mlp(self.dim)(a2 * CustomNorm(self.norm_layer)(x) + b2)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class MultiBlocks(nn.Module):
    depth: int
    dim: int
    num_heads: int
    block_type: str = "full"
    norm_layer: str = "ln"
    noise: bool = False
    dropout: float = 0.0
    causal_mask_sizes: tuple = ()  # threaded to Block for block_causal stacks

    @nn.compact
    def __call__(self, x, **kwargs):
        for _ in range(self.depth):
            x = Block(
                dim=self.dim,
                num_heads=self.num_heads,
                block_type=self.block_type,
                norm_layer=self.norm_layer,
                noise=self.noise,
                dropout=self.dropout,
                causal_mask_sizes=self.causal_mask_sizes,
            )(x, **kwargs)
        return x
