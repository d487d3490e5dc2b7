"""MAT checkpoint conversion: reference torch pickles -> our flax trees.

Two halves:

1. `load_network_pkl` — a dependency-free reader for the reference's
   StyleGAN2-style persistence pickles (Places_512_FullData.pkl, written by
   models/modules/mat_utils/torch_utils/persistence.py and loaded in the
   reference via legacy.load_network_pkl, mat_utils/legacy.py:20-40). The
   pickle stores each @persistent_class module as a reduce-call to
   `torch_utils.persistence._reconstruct_persistent_obj(meta)` where
   meta.state is the module __dict__ (_parameters/_buffers/_modules). We
   intercept that global with a custom Unpickler, materialize lightweight
   nodes, and flatten them to a torch-style `name -> numpy` state dict —
   no reference code, no module execution (torch only decodes tensor
   storages).

2. `convert_state_dict` — maps torch names/layouts to our channel-last flax
   Generator tree (models/mat/mat.py): conv (O,I,kh,kw)->(kh,kw,I,O),
   modulated conv (1,O,I,kh,kw)->(kh,kw,I,O), dense (O,I)->(I,O); noise_const
   buffers -> the "noise_const" collection, mapping.w_avg -> "w_stats".
"""
from __future__ import annotations

import io
import math
import pickle
import re
from collections import OrderedDict
from typing import Any, Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# persistence-pickle reading
# ---------------------------------------------------------------------------

class _PersistentNode:
    """Shell for a @persistent_class module: holds its pickled __dict__."""

    def __setstate__(self, state):
        self.__dict__.update(state)


def _reconstruct_persistent_obj(meta):
    node = _PersistentNode()
    state = meta["state"] if isinstance(meta, dict) else meta.state
    node.__dict__.update(state)
    return node


class _EasyDict(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value


class _RefUnpickler(pickle.Unpickler):
    """Resolves the reference repo's globals without the reference repo."""

    def find_class(self, module, name):
        if name == "_reconstruct_persistent_obj":
            return _reconstruct_persistent_obj
        if name == "EasyDict":
            return _EasyDict
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            # unknown reference-internal class: a state-carrying shell is all
            # we need for weight extraction
            return type(name, (_PersistentNode,), {})


def _to_numpy(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _flatten_module(node, prefix: str, out: Dict[str, np.ndarray]):
    d = node if isinstance(node, dict) else node.__dict__
    for name, p in (d.get("_parameters") or {}).items():
        if p is not None:
            out[prefix + name] = _to_numpy(p)
    for name, b in (d.get("_buffers") or {}).items():
        if b is not None:
            out[prefix + name] = _to_numpy(b)
    for name, m in (d.get("_modules") or {}).items():
        if m is not None:
            _flatten_module(m, prefix + name + ".", out)


def load_network_pkl(path: str, key: str = "G_ema") -> Dict[str, np.ndarray]:
    """Read a reference persistence pickle -> flat torch-style state dict.

    `key` selects the entry of the pickled dict ('G', 'D', 'G_ema'); if the
    pickle is a bare network object, pass key=None."""
    with open(path, "rb") as f:
        data = _RefUnpickler(f).load()
    net = data if key is None else data[key]
    out: Dict[str, np.ndarray] = {}
    _flatten_module(net, "", out)
    return out


# ---------------------------------------------------------------------------
# name + layout mapping
# ---------------------------------------------------------------------------

_SKIP = re.compile(r"(resample_filter|attn_mask)$")
_RULES = [
    (re.compile(r"enc\.EncConv_Block_(\d+)x\1\."),
     lambda m: f"enc.b{int(math.log2(int(m.group(1))))}."),
    (re.compile(r"first_stage\.tran\.(\d+)\."), r"first_stage.tran\1."),
    # the reference assigns the resampler to `self.downsample` even in the
    # upsampling stages (tran3/tran4); our BasicLayer names it by direction
    (re.compile(r"first_stage\.tran([34])\.downsample\."),
     r"first_stage.tran\1.upsample."),
    (re.compile(r"\.blocks\.(\d+)\."), r".block\1."),
    (re.compile(r"\.mlp\.fc(\d)"), r".mlp_fc\1"),
    (re.compile(r"first_stage\.enc_conv\.(\d+)\."), r"first_stage.enc_conv\1."),
    (re.compile(r"first_stage\.down_conv\.(\d+)\."), r"first_stage.down_conv\1."),
    (re.compile(r"first_stage\.dec_conv\.(\d+)\."), r"first_stage.dec_conv\1."),
    (re.compile(r"to_style\.conv\.(\d+)\."), r"to_style.conv\1."),
]


def torch_key_to_flax(key: str):
    """(collection, path-tuple) for one torch state-dict key; None to skip."""
    if _SKIP.search(key):
        return None
    if key == "mapping.w_avg":
        return ("w_stats", ("mapping", "w_avg"))
    k = key
    for pat, rep in _RULES:
        k = pat.sub(rep, k)
    parts = k.split(".")
    if parts[-1] == "noise_const":
        return ("noise_const", tuple(parts[:-1]) + ("n",))
    return ("params", tuple(parts))


def _convert_leaf(name: str, arr: np.ndarray) -> np.ndarray:
    if name.endswith("weight"):
        if arr.ndim == 5:  # modulated conv (1,O,I,kh,kw)
            return np.ascontiguousarray(arr[0].transpose(2, 3, 1, 0))
        if arr.ndim == 4:  # conv (O,I,kh,kw)
            return np.ascontiguousarray(arr.transpose(2, 3, 1, 0))
        if arr.ndim == 2:  # dense (O,I)
            return np.ascontiguousarray(arr.T)
    return arr


def convert_state_dict(sd: Dict[str, np.ndarray],
                       template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Torch state dict -> flax variables {"params","noise_const","w_stats"}.

    With `template` (a tree from Generator.init) every converted leaf is
    shape-checked against it and missing/extra keys raise."""
    tree: Dict[str, Any] = {}
    for key, arr in sd.items():
        mapped = torch_key_to_flax(key)
        if mapped is None:
            continue
        col, path = mapped
        leaf = _convert_leaf(key, np.asarray(arr, np.float32))
        node = tree.setdefault(col, {})
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    if template is not None:
        import jax

        t_paths = {
            tuple(str(p.key) for p in path): leaf.shape
            for path, leaf in jax.tree_util.tree_flatten_with_path(template)[0]
        }
        c_paths = {
            tuple(str(p.key) for p in path): leaf.shape
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }
        missing = sorted(set(t_paths) - set(c_paths))
        extra = sorted(set(c_paths) - set(t_paths))
        if missing or extra:
            raise ValueError(f"key mismatch: missing={missing[:8]} extra={extra[:8]}")
        for p, shape in t_paths.items():
            if tuple(c_paths[p]) != tuple(shape):
                raise ValueError(f"shape mismatch at {p}: {c_paths[p]} vs {shape}")
    return tree


def convert_mat_weights(pkl_path: str, out_path: str,
                        img_resolution: int = 512, key: str = "G_ema") -> str:
    """Places_512_FullData.pkl (reference legacy pickle) -> our .npz.

    Output loads via MatInpainter (models/mat/inpainter.py): npz with a
    pickled `params` object holding the full flax variables dict."""
    import jax
    import jax.numpy as jnp

    from .mat import Generator

    sd = load_network_pkl(pkl_path, key=key)
    net = Generator(img_resolution=img_resolution)
    template = net.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, img_resolution, img_resolution, 3)),
        jnp.ones((1, img_resolution, img_resolution, 1)),
        jnp.zeros((1, 512)),
        noise_mode="const",
    )
    tree = convert_state_dict(sd, template=template)
    np.savez(out_path, params=np.asarray(tree, dtype=object))
    return out_path
