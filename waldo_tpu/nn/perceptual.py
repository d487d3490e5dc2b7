"""VGG19 5-slice perceptual loss (reference models/modules/perceptual.py:6-52).

Feature L1 with weights [1/32, 1/16, 1/8, 1/4, 1], feature taps at
relu1_1/2_1/3_1/4_1/5_1 (the reference's feature slices 0-2, 2-7, 7-12,
12-21, 21-30 of torchvision vgg19.features). Pretrained torchvision weights
must be converted offline (`convert_vgg19_weights`; no egress here); without
them `VGGLoss.maybe_load()` returns None and callers skip the term.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

# torchvision vgg19.features through relu5_1: 13 convs, 'P' = 2x2 maxpool.
# The reference taps relu1_1 (after conv 0), relu2_1 (conv 2), relu3_1
# (conv 4), relu4_1 (conv 8), relu5_1 (conv 12).
_VGG19_LAYOUT = [64, 64, "P", 128, 128, "P", 256, 256, 256, 256, "P",
                 512, 512, 512, 512, "P", 512]
_TAPS = (0, 2, 4, 8, 12)
# conv positions within the full torchvision features Sequential (for the
# offline converter: features.<idx>.weight)
VGG19_TORCH_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]
_WEIGHTS = [1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0]


class VGG19Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        idx = 0
        for item in _VGG19_LAYOUT:
            if item == "P":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(item, (3, 3), padding=1, name=f"conv{idx}")(x)
            x = nn.relu(x)
            if idx in _TAPS:
                feats.append(x)
            idx += 1
        return feats


class VGGLoss:
    def __init__(self, params):
        self.module = VGG19Features()
        self.params = params

    def __call__(self, x, y):
        """x, y (..., H, W, 3) in [-1, 1] -> scalar weighted feature L1."""
        x = x.reshape((-1,) + x.shape[-3:])
        y = y.reshape((-1,) + y.shape[-3:])
        fx = self.module.apply(self.params, x)
        fy = self.module.apply(self.params, y)
        loss = 0.0
        for w, a, b in zip(_WEIGHTS, fx, fy):
            loss = loss + w * jnp.abs(a - jax.lax.stop_gradient(b)).mean()
        return loss

    @staticmethod
    def weights_path():
        root = os.environ.get("WALDO_VGG_WEIGHTS", "checkpoints/vgg")
        return os.path.join(root, "vgg19_features.npz")

    @classmethod
    def maybe_load(cls) -> Optional["VGGLoss"]:
        path = cls.weights_path()
        if not os.path.exists(path):
            return None
        data = np.load(path)
        params = {"params": {}}
        i = 0
        while f"conv{i}_kernel" in data:
            params["params"][f"conv{i}"] = {
                "kernel": jnp.asarray(data[f"conv{i}_kernel"]),
                "bias": jnp.asarray(data[f"conv{i}_bias"]),
            }
            i += 1
        assert i == len(VGG19_TORCH_CONV_IDX), f"expected 13 convs, got {i}"
        return cls(params)


def convert_vgg19_state_dict(state_dict) -> dict:
    """torchvision vgg19 `features.<i>.weight/bias` state dict -> npz arrays.

    Accepts torch tensors or numpy arrays; only the 13 convs through relu5_1
    are used."""
    def npy(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    arrays = {}
    for i, idx in enumerate(VGG19_TORCH_CONV_IDX):
        w = npy(state_dict[f"features.{idx}.weight"])  # (O,I,kh,kw)
        b = npy(state_dict[f"features.{idx}.bias"])
        arrays[f"conv{i}_kernel"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
        arrays[f"conv{i}_bias"] = b
    return arrays


def convert_vgg19_weights(out_path: str, state_dict=None):
    """torchvision vgg19 -> npz. Pass `state_dict` (features.* keys) when the
    torchvision package/weights are not importable here; otherwise runs
    offline where they are."""
    if state_dict is None:
        import torchvision

        state_dict = torchvision.models.vgg19(pretrained=True).state_dict()
    arrays = convert_vgg19_state_dict(state_dict)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **arrays)
    return out_path
