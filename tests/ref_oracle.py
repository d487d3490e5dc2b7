"""Shared helpers to use the reference torch modules as numerical oracles.

The reference repo (/root/reference) is importable with light stubbing:
timm/torchvision are absent in this image, and some modules call .cuda() at
construction time; `install_reference()` makes both safe on CPU.
`cfg_to_opt()` builds the reference's flat opt namespace from our typed
Config so both frameworks instantiate the *same* architecture.
"""
import sys
import types

import numpy as np

REF = "/root/reference"


def install_reference():
    """Stub timm/torchvision, neutralize .cuda(), add /root/reference to path."""
    import torch
    import torch.nn as tnn

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_m = types.ModuleType("timm.models")
        timm_l = types.ModuleType("timm.models.layers")

        class DropPath(tnn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                t.normal_(mean, std).clamp_(a, b)
            return t

        timm_l.DropPath = DropPath
        timm_l.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
        timm_l.trunc_normal_ = trunc_normal_
        sys.modules.update(
            {"timm": timm, "timm.models": timm_m, "timm.models.layers": timm_l}
        )
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        for sub in ("models", "transforms", "utils", "io"):
            m = types.ModuleType(f"torchvision.{sub}")
            setattr(tv, sub, m)
            sys.modules[f"torchvision.{sub}"] = m
        sys.modules["torchvision"] = tv
    # reference WIF calls .cuda() at construction (models/nets/wif.py:31)
    if not getattr(torch.Tensor.cuda, "_ref_oracle_patched", False):
        def _cuda_noop(self, *a, **k):
            return self

        _cuda_noop._ref_oracle_patched = True
        torch.Tensor.cuda = _cuda_noop
    if REF not in sys.path:
        sys.path.insert(0, REF)


def cfg_to_opt(cfg):
    """Our Config -> the reference's flat opt namespace (reference flag names)."""
    m, d = cfg.model, cfg.data
    o = types.SimpleNamespace()
    # base geometry
    o.dim = cfg.dim
    o.load_dim = cfg.load_dim
    o.aspect_ratio = cfg.aspect_ratio
    o.vid_len = d.vid_len
    o.num_lyt = d.num_lyt
    # copy every model field under its reference name
    import dataclasses

    for f in dataclasses.fields(type(m)):
        setattr(o, f.name, getattr(m, f.name))
    # fields the reference needs that our config does not carry (defaults from
    # reference tools/options.py)
    o.obj_shape = list(m.obj_shape)
    o.latent_shape = list(m.latent_shape)
    o.hr_ratio = None
    o.use_hr = False
    o.num_perm_grid = 1
    o.pe_repeat_border = False
    o.pe_use_refiner = False
    o.pe_use_post_refiner = False
    o.pe_use_edge_filter = False
    o.pe_refiner_blend_mode_obj = ""
    o.pe_refiner_blend_mode_bg = ""
    o.normalize_alpha = False
    o.ii_ft_hd = False
    o.ii_upmode = "deconv"
    o.use_inpainter = False
    o.ii_last_only = False
    o.fix_thresh = False
    o.fix_mask = False
    o.inpaint_obj = False
    o.propagate_unique = False
    o.propagate_obj = False
    o.use_shadows = False
    o.use_expansion = False
    o.soft_shadow = False
    o.num_expansion = 2
    return o


def t2n(x):
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def nhwc(x):
    """torch (..., C, H, W) numpy -> channel-last."""
    x = np.asarray(x)
    return np.moveaxis(x, -3, -1)


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = max(np.abs(b).max(), 1e-6)
    return np.abs(a - b).max() / scale
