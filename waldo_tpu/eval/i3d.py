"""I3D (Inflated Inception-V1) video features for true FVD.

The published FVD protocol (Unterthiner et al.) embeds videos with a
Kinetics-400 I3D and takes the Frechet distance over its logits/pre-logits.
The reference repo never ships FVD code (its tools/eval/metrics.py covers
LPIPS/SSIM/PSNR/MS-SSIM only) but the WALDO paper reports FVD, so the
framework carries the extractor.

Flax NDHWC implementation of the standard pytorch-i3d layout
(Conv3d_1a..Mixed_5c, TF-SAME padding) with a BN-folding converter from that
port's state dicts (same recipe as eval/inception.py). No egress in this
image means no true weights: `maybe_load()` returns None without a converted
file and callers fall back to the seeded random extractor labeled
'rfvd_proxy'/'rfvd' (eval/frechet.py keeps the labels honest).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

# (b0, b1a, b1b, b2a, b2b, b3b) per inception module
_MIXED = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


class Unit3D(nn.Module):
    """conv3d + (folded) bias + relu; TF-SAME padding like pytorch-i3d."""

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    strides: Sequence[int] = (1, 1, 1)
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, tuple(self.kernel), strides=tuple(self.strides),
                    padding="SAME", name="conv3d")(x)
        return nn.relu(x) if self.relu else x


def _maxpool3d(x, kernel, strides):
    return nn.max_pool(x, tuple(kernel), strides=tuple(strides), padding="SAME")


class InceptionModule(nn.Module):
    specs: Sequence[int]

    @nn.compact
    def __call__(self, x):
        s = self.specs
        b0 = Unit3D(s[0], name="b0")(x)
        b1 = Unit3D(s[2], (3, 3, 3), name="b1b")(Unit3D(s[1], name="b1a")(x))
        b2 = Unit3D(s[4], (3, 3, 3), name="b2b")(Unit3D(s[3], name="b2a")(x))
        b3 = Unit3D(s[5], name="b3b")(_maxpool3d(x, (3, 3, 3), (1, 1, 1)))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class I3D(nn.Module):
    """x (B, T, H, W, 3) in [-1, 1] -> dict(logits (B,400), features (B,1024))."""

    num_classes: int = 400

    @nn.compact
    def __call__(self, x):
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = _maxpool3d(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = _maxpool3d(x, (1, 3, 3), (1, 2, 2))
        for name in ("Mixed_3b", "Mixed_3c"):
            x = InceptionModule(_MIXED[name], name=name)(x)
        x = _maxpool3d(x, (3, 3, 3), (2, 2, 2))
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = InceptionModule(_MIXED[name], name=name)(x)
        x = _maxpool3d(x, (2, 2, 2), (2, 2, 2))
        for name in ("Mixed_5b", "Mixed_5c"):
            x = InceptionModule(_MIXED[name], name=name)(x)
        feats = x.mean(axis=(1, 2, 3))  # (B, 1024) pre-logits
        logits = Unit3D(self.num_classes, relu=False, name="logits")(
            x.mean(axis=(1, 2, 3), keepdims=True))
        return {"features": feats, "logits": logits.reshape(x.shape[0], -1)}


class I3DExtractor:
    """(B, T, H, W, 3) videos in [0, 1] -> FVD embeddings (B, D)."""

    name = "i3d"

    def __init__(self, params, layer: str = "logits"):
        net = I3D()
        self.layer = layer
        self._fn = jax.jit(lambda v: net.apply({"params": params}, v)[layer])

    def __call__(self, vids):
        vids = jnp.asarray(vids) * 2.0 - 1.0  # I3D expects [-1, 1]
        return np.asarray(self._fn(vids))

    @staticmethod
    def weights_path():
        root = os.environ.get("WALDO_I3D_WEIGHTS", os.path.expanduser("~/.cache/waldo"))
        return os.path.join(root, "i3d_kinetics400.npz")

    @classmethod
    def maybe_load(cls, layer: str = "logits") -> Optional["I3DExtractor"]:
        path = cls.weights_path()
        if not os.path.exists(path):
            return None
        data = np.load(path, allow_pickle=True)
        params = data["params"].item() if "params" in data else None
        return cls(jax.tree.map(jnp.asarray, params), layer=layer)


def random_extractor(seed: int = 0, layer: str = "features") -> I3DExtractor:
    """Seeded random-init I3D — relative comparisons only ('rfvd')."""
    net = I3D()
    params = net.init(jax.random.PRNGKey(seed), jnp.zeros((1, 9, 64, 64, 3)))["params"]
    ex = I3DExtractor(params, layer=layer)
    ex.name = "rfvd"
    return ex


# ---------------------------------------------------------------------------
# pytorch-i3d state-dict conversion (BN folded into conv bias/scale)
# ---------------------------------------------------------------------------

_UNITS = (
    ["Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"]
    + [f"{m}.{b}" for m in _MIXED for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b")]
)


def convert_i3d_state_dict(sd, bn_eps: float = 1e-3) -> dict:
    """pytorch-i3d names (`X.conv3d.weight`, `X.bn.{weight,bias,running_*}`)
    -> flax tree with BatchNorm folded into the conv kernel/bias."""
    def npy(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def fold(prefix):
        w = npy(sd[f"{prefix}.conv3d.weight"])  # (O, I, kt, kh, kw)
        gamma = npy(sd[f"{prefix}.bn.weight"])
        beta = npy(sd[f"{prefix}.bn.bias"])
        mean = npy(sd[f"{prefix}.bn.running_mean"])
        var = npy(sd[f"{prefix}.bn.running_var"])
        scale = gamma / np.sqrt(var + bn_eps)
        kernel = (w * scale[:, None, None, None, None]).transpose(2, 3, 4, 1, 0)
        bias = beta - mean * scale
        return {"kernel": np.ascontiguousarray(kernel, np.float32),
                "bias": bias.astype(np.float32)}

    tree: dict = {}
    for unit in _UNITS:
        parts = unit.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(parts[-1], {})["conv3d"] = fold(unit)
    # logits conv has a real bias and no BN
    w = npy(sd["logits.conv3d.weight"]).transpose(2, 3, 4, 1, 0)
    tree["logits"] = {"conv3d": {
        "kernel": np.ascontiguousarray(w, np.float32),
        "bias": npy(sd["logits.conv3d.bias"]).astype(np.float32)}}
    return tree


def convert_i3d_weights(out_path: str, state_dict) -> str:
    tree = convert_i3d_state_dict(state_dict)
    # template shape check
    net = I3D()
    template = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 64, 64, 3)))["params"]
    t_leaves = jax.tree_util.tree_leaves_with_path(template)
    c_paths = {
        tuple(str(p.key) for p in path): leaf.shape
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
    }
    for path, leaf in t_leaves:
        key = tuple(str(p.key) for p in path)
        if key not in c_paths:
            raise ValueError(f"missing {key}")
        if tuple(c_paths[key]) != tuple(leaf.shape):
            raise ValueError(f"shape mismatch {key}: {c_paths[key]} vs {leaf.shape}")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, params=np.asarray(tree, dtype=object))
    return out_path


def fvd(extractor, real_vids, fake_vids, batch: int = 8):
    """True FVD when `extractor` is an I3DExtractor with converted weights;
    vids: list/array of (T, H, W, 3) in [0, 1]."""
    from .frechet import frechet_distance_from_acts

    def acts(vids):
        vids = np.stack([np.asarray(v) for v in vids])
        out = []
        for i in range(0, len(vids), batch):
            out.append(np.asarray(extractor(vids[i: i + batch])))
        return np.concatenate(out)

    return frechet_distance_from_acts(acts(real_vids), acts(fake_vids))
