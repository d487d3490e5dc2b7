"""LPIPS perceptual metric in flax (net-lin AlexNet, reference
tools/eval/lpips_tensorflow contract) + VGG16 variant for the training loss.

Weights must be converted from the public torch `lpips` package (this image
has no egress, so nothing is downloaded): run `convert_lpips_weights` on a
machine that has them and drop the .npz under WALDO_LPIPS_WEIGHTS (default
checkpoints/lpips/). Without weights, `LPIPS.maybe_load()` returns None and
callers fall back to L1-only objectives (documented deviation).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

ALEX_SPEC = [  # (features, kernel, stride, pad, pool_before)
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]

VGG16_SPEC = [2, 2, 3, 3, 3]  # conv counts per slice, 64*2^i channels (max 512)


class AlexFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        for i, (f, k, s, p, pool) in enumerate(ALEX_SPEC):
            if pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(f, (k, k), strides=s, padding=p, name=f"conv{i}")(x)
            x = nn.relu(x)
            feats.append(x)
        return feats


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        idx = 0
        for slice_i, n_convs in enumerate(VGG16_SPEC):
            ch = min(64 * (2 ** slice_i), 512)
            for _ in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            feats.append(x)
            if slice_i < len(VGG16_SPEC) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def _normalize_feat(f, eps=1e-10):
    norm = jnp.sqrt((f ** 2).sum(-1, keepdims=True) + eps)
    return f / norm


class LPIPS:
    """lpips(a, b): a, b (B,H,W,3) in [-1, 1] -> (B,) distances."""

    def __init__(self, net: str, params: Any, lin_weights: Sequence[np.ndarray]):
        self.module = AlexFeatures() if net == "alex" else VGG16Features()
        self.params = params
        self.lin = [jnp.asarray(w) for w in lin_weights]

    def __call__(self, a, b):
        lead = a.shape[:-3]
        a = a.reshape((-1,) + a.shape[-3:])
        b = b.reshape((-1,) + b.shape[-3:])
        a = (a - _SHIFT) / _SCALE
        b = (b - _SHIFT) / _SCALE
        fa = self.module.apply(self.params, a)
        fb = self.module.apply(self.params, b)
        dist = 0.0
        for f1, f2, w in zip(fa, fb, self.lin):
            d = (_normalize_feat(f1) - _normalize_feat(f2)) ** 2
            dist = dist + (d * w).sum(-1).mean(axis=(1, 2))
        return dist.reshape(lead)

    @staticmethod
    def weights_path(net="alex"):
        root = os.environ.get("WALDO_LPIPS_WEIGHTS", "checkpoints/lpips")
        return os.path.join(root, f"lpips_{net}.npz")

    @classmethod
    def maybe_load(cls, net="alex") -> Optional["LPIPS"]:
        path = cls.weights_path(net)
        if not os.path.exists(path):
            return None
        data = np.load(path)
        module = AlexFeatures() if net == "alex" else VGG16Features()
        n_conv = len(ALEX_SPEC) if net == "alex" else sum(VGG16_SPEC)
        params = {"params": {}}
        for i in range(n_conv):
            params["params"][f"conv{i}"] = {
                "kernel": jnp.asarray(data[f"conv{i}_kernel"]),
                "bias": jnp.asarray(data[f"conv{i}_bias"]),
            }
        n_lin = 5
        lin = [data[f"lin{i}"] for i in range(n_lin)]
        return cls(net, params, lin)


def convert_lpips_state_dict(state_dict) -> dict:
    """Flat torch `lpips` package state dict -> our npz arrays.

    Expected keys (lpips package layout): `net.slice{k}.{idx}.weight/bias`
    for the backbone convs (torchvision module indices preserved inside each
    slice) and `lin{i}.model.1.weight` (1x1 conv) for the linear heads.
    torch conv weight (O,I,kh,kw) -> flax kernel (kh,kw,I,O); lin layers ->
    per-channel weight vectors."""
    import re

    def npy(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    conv_pat = re.compile(r"^net\.slice(\d+)\.(\d+)\.weight$")
    convs = sorted(
        (
            (int(m.group(1)), int(m.group(2)), k)
            for k in state_dict
            if (m := conv_pat.match(k))
        )
    )
    arrays = {}
    for i, (_, _, k) in enumerate(convs):
        w = npy(state_dict[k])
        assert w.ndim == 4, (k, w.shape)
        arrays[f"conv{i}_kernel"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
        arrays[f"conv{i}_bias"] = npy(state_dict[k[:-len("weight")] + "bias"])
    i = 0
    while f"lin{i}.model.1.weight" in state_dict:
        w = npy(state_dict[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        arrays[f"lin{i}"] = w.reshape(-1)
        i += 1
    assert i == 5, f"expected 5 lin heads, got {i}"
    return arrays


def convert_lpips_weights(out_path: str, net: str = "alex", state_dict=None):
    """Convert torch `lpips` package weights to our npz (run where available).

    Pass `state_dict` (the flat torch state dict) when the lpips package is
    not importable here."""
    if state_dict is None:
        import lpips as torch_lpips  # noqa

        state_dict = torch_lpips.LPIPS(net=net).state_dict()
    arrays = convert_lpips_state_dict(state_dict)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **arrays)
    return out_path
