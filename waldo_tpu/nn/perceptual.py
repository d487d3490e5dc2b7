"""VGG19 5-slice perceptual loss (reference models/modules/perceptual.py:6-52).

Feature L1 with weights [1/32, 1/16, 1/8, 1/4, 1]. Pretrained torchvision
weights must be converted offline (`convert_vgg19_weights`; no egress here);
without them `VGGLoss.maybe_load()` returns None and callers skip the term.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

# torchvision vgg19.features conv layout per slice (reference slices 0-2,2-7,7-12,12-21,21-30)
_SLICES = [1, 2, 2, 4, 4]
_CHANNELS = [64, 128, 256, 512, 512]
_WEIGHTS = [1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0]


class VGG19Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        idx = 0
        for s, (n_convs, ch) in enumerate(zip(_SLICES, _CHANNELS)):
            for k in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
                if s == 0 and k == 0:
                    feats.append(x)  # relu1_1 (slice1 = features[0:2])
            if s > 0:
                feats.append(x)
            if s < len(_SLICES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
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
        n = sum(_SLICES) + 4  # 16 convs in vgg19 features... use stored count
        i = 0
        while f"conv{i}_kernel" in data:
            params["params"][f"conv{i}"] = {
                "kernel": jnp.asarray(data[f"conv{i}_kernel"]),
                "bias": jnp.asarray(data[f"conv{i}_bias"]),
            }
            i += 1
        return cls(params)


def convert_vgg19_weights(out_path: str):
    """torchvision vgg19 -> npz (run offline where torchvision exists)."""
    import torchvision

    feats = torchvision.models.vgg19(pretrained=True).features
    arrays = {}
    i = 0
    for m in feats:
        if m.__class__.__name__ == "Conv2d":
            arrays[f"conv{i}_kernel"] = m.weight.detach().numpy().transpose(2, 3, 1, 0)
            arrays[f"conv{i}_bias"] = m.bias.detach().numpy()
            i += 1
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **arrays)
    return out_path
