"""Shape bookkeeping helpers.

Semantics mirror the reference helpers (reference tools/utils.py:54-96,
models/nets/lvd.py:462-467) but are written against static shapes so every
caller stays jit-compatible: the boolean-packing `to_ctx`/`from_ctx` pair of
the reference is deliberately NOT reproduced — masked fixed-shape compute is
used instead (see waldo_tpu/nn/transform.py).
"""
from __future__ import annotations

import math
from functools import reduce
from operator import mul

import jax.numpy as jnp


def flatten(x, ndim):
    """Collapse all leading axes so that x has `ndim` axes; returns (x, lead_shape)."""
    if x is None:
        return None, None
    dim = x.ndim - ndim + 1
    assert dim > 0
    lead = x.shape[:dim]
    size = reduce(mul, lead, 1)
    return x.reshape((size,) + x.shape[dim:]), lead


def unflatten(x, lead):
    if x is None:
        return None
    return x.reshape(tuple(lead) + x.shape[1:])


def flatten_vid(x, vid_ndim=5):
    """(B, T, ...) -> (B*T, ...) when x has vid_ndim axes."""
    if x.ndim == vid_ndim:
        return x.reshape((-1,) + x.shape[2:]), x.shape[:2]
    return x, None


def unflatten_vid(x, vid_size):
    if vid_size is None:
        return x
    b, t = vid_size
    return x.reshape((b, t) + x.shape[1:])


def gather_time(x, ts):
    """Gather per-(ctx, pred) time pairs: x is (B, T, ...), ts is (B, Tc, Tp) int.

    Returns (B, Tc, Tp, ...). Mirrors reference models/nets/lvd.py:462-467.
    """
    b = x.shape[0]
    flat = ts.reshape(b, -1)  # B, Tc*Tp
    out = jnp.take_along_axis(
        x.reshape((b, x.shape[1]) + x.shape[2:]),
        flat.reshape((b, -1) + (1,) * (x.ndim - 2)),
        axis=1,
    )
    return out.reshape(ts.shape + x.shape[2:])


def onehot(soft_code, straight_through=False):
    """Argmax one-hot with optional straight-through estimator
    (reference tools/utils.py:98-103)."""
    import jax

    eye = jnp.eye(soft_code.shape[-1], dtype=soft_code.dtype)
    hard = eye[jnp.argmax(soft_code, axis=-1)]
    if straight_through:
        hard = soft_code + jax.lax.stop_gradient(hard - soft_code)
    return hard


def soften(code, codebook_size):
    """Index -> one-hot (reference tools/utils.py:105-108)."""
    return jnp.eye(codebook_size, dtype=jnp.float32)[code]


def to_patch(x, patch_size):
    """(B,[T,]H,W,C) -> (B, N, P, P, C) non-overlapping patches
    (reference tools/utils.py:114-118, channel-last)."""
    x, _ = flatten_vid(x)
    b, h, w, c = x.shape
    p = patch_size
    x = x.reshape(b, h // p, p, w // p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, p, p, c)


def from_patch(x, tgt_size):
    """(B*?, N, P, P, C) -> tgt_size (reference tools/utils.py:120-123)."""
    b = tgt_size[0]
    h, w, c = tgt_size[-3:]
    p = x.shape[-2]
    x = x.reshape(b, -1, h // p, w // p, p, p, c)
    return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(tgt_size)
