"""InceptionV3 pool3 feature extractor (FID backbone) in flax, channel-last.

Mirrors torchvision `inception_v3` through `avgpool` (the 2048-d pool3
features pytorch-fid uses; reference computes FID that way,
tools/utils.py:131-190). Module/parameter names match torchvision exactly so
`convert_inception_state_dict` is a mechanical map: each BasicConv2d's
BatchNorm is folded into the conv (w' = w * g/sqrt(var+eps),
b' = beta - mean * g/sqrt(var+eps)), leaving conv+bias+relu blocks.

No egress here: without converted weights `maybe_load()` returns None and
callers may fall back to `random_extractor` — a seeded random-init network.
Distances from random features are usable for RELATIVE comparisons
(random-feature Frechet distances correlate with FID) but are NOT FID;
everything downstream labels them "rfid" to keep that honest.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


class BasicConv(nn.Module):
    """torchvision BasicConv2d with the BN folded in at conversion time."""

    features: int
    kernel: tuple
    stride: int = 1
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = [(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])]
        x = nn.Conv(self.features, self.kernel, strides=self.stride, padding=pad,
                    name="conv")(x)
        return nn.relu(x)


def _avgpool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv(192, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = BasicConv(192, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """x (B, 299, 299, 3) in [-1, 1] -> pool3 activations (B, 2048)."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # adaptive avgpool -> (B, 2048)


# ---------------------------------------------------------------------------
# extractor objects
# ---------------------------------------------------------------------------

class InceptionExtractor:
    """images (B,H,W,3) in [0,1] -> (B, 2048); resizes to 299 like pytorch-fid."""

    name = "fid"

    def __init__(self, params):
        self.module = InceptionV3Features()
        self.params = params
        self._apply = jax.jit(self.module.apply)

    def __call__(self, imgs):
        x = jnp.asarray(imgs, jnp.float32)
        if x.shape[1:3] != (299, 299):
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        return self._apply(self.params, x * 2.0 - 1.0)

    @staticmethod
    def weights_path():
        root = os.environ.get("WALDO_INCEPTION_WEIGHTS", "checkpoints/inception")
        return os.path.join(root, "inception_v3_features.npz")

    @classmethod
    def maybe_load(cls) -> Optional["InceptionExtractor"]:
        path = cls.weights_path()
        if not os.path.exists(path):
            return None
        data = np.load(path, allow_pickle=True)
        return cls(jax.tree.map(jnp.asarray, data["params"].item()))


def random_extractor(seed: int = 0) -> InceptionExtractor:
    """Seeded random-init extractor — relative comparisons only ('rfid')."""
    module = InceptionV3Features()
    params = module.init(jax.random.PRNGKey(seed), jnp.zeros((1, 299, 299, 3)))
    ex = InceptionExtractor(params)
    ex.name = "rfid"
    return ex


# ---------------------------------------------------------------------------
# conversion (run offline where torchvision weights exist, or pass state_dict)
# ---------------------------------------------------------------------------

def convert_inception_state_dict(state_dict) -> dict:
    """torchvision inception_v3 state dict -> flax tree with BN folded.

    Keys look like `Mixed_5b.branch1x1.conv.weight` + `...bn.{weight,bias,
    running_mean,running_var}`; fc/AuxLogits are ignored."""
    def npy(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    tree = {}
    for key in state_dict:
        if not key.endswith(".conv.weight") or key.startswith("AuxLogits"):
            continue
        base = key[: -len(".conv.weight")]
        w = npy(state_dict[key]).astype(np.float64)  # (O,I,kh,kw)
        g = npy(state_dict[base + ".bn.weight"]).astype(np.float64)
        beta = npy(state_dict[base + ".bn.bias"]).astype(np.float64)
        mean = npy(state_dict[base + ".bn.running_mean"]).astype(np.float64)
        var = npy(state_dict[base + ".bn.running_var"]).astype(np.float64)
        scale = g / np.sqrt(var + 1e-3)  # torchvision BasicConv2d bn eps
        w = w * scale[:, None, None, None]
        b = beta - mean * scale
        node = tree.setdefault("params", {})
        for p in base.split("."):
            node = node.setdefault(p, {})
        node["conv"] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)).astype(np.float32),
            "bias": b.astype(np.float32),
        }
    n = len(jax.tree.leaves(tree))
    assert n == 94 * 2, f"expected 94 folded convs, got {n // 2}"
    return tree


def convert_inception_weights(out_path: str, state_dict=None) -> str:
    if state_dict is None:
        import torchvision

        state_dict = torchvision.models.inception_v3(pretrained=True).state_dict()
    tree = convert_inception_state_dict(state_dict)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, params=np.asarray(tree, dtype=object))
    return out_path
