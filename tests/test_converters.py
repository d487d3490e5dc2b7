"""Pretrained-weight converter proofs.

Three converters ship with the framework (MAT Places pkl, LPIPS, VGG19); in
this egress-free image the real pickles are absent, so these tests prove the
converters on (a) the reference's own torch modules as numerical oracles
(skipped when /root/reference is not mounted) and (b) schema-exact fixture
state dicts built from the published layouts.
"""
import os
import pickle
import sys
import types
from collections import OrderedDict

import numpy as np
import pytest
import jax
import jax.numpy as jnp

HAVE_REFERENCE = os.path.isdir("/root/reference/models/modules/mat_utils")


# ---------------------------------------------------------------------------
# reference-as-oracle helpers
# ---------------------------------------------------------------------------

def _load_reference_generator(img_resolution=128):
    """Import the reference torch MAT Generator with stubbed deps (timm,
    torchvision are absent here; only DropPath/to_2tuple/trunc_normal_ and
    module placeholders are needed to import)."""
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
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.modules.mat_utils.networks.mat import Generator

    return Generator(z_dim=512, c_dim=0, w_dim=512,
                     img_resolution=img_resolution, img_channels=3)


def _flax_generator_and_template(res=128):
    from waldo_tpu.models.mat.mat import Generator as FG

    fg = FG(img_resolution=res)
    template = fg.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, res, res, 3)), jnp.ones((1, res, res, 1)),
        jnp.zeros((1, 512)), noise_mode="const",
    )
    return fg, template


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference repo not mounted")
def test_mat_forward_parity_vs_reference_torch():
    """Convert the reference torch Generator's random-init weights and match
    its forward output to float32 precision (max rel err ~1e-5).

    Deterministic setup: noise_mode='const' with randomized noise_strength
    (exercises noise_const conversion), F.dropout patched to identity so the
    reference's always-stochastic mul_map (networks/mat.py:778-780) becomes
    the constant 0.5 our 'const' path uses, truncation_psi=0.5 (exercises
    w_avg conversion)."""
    import torch

    from waldo_tpu.models.mat.convert import convert_state_dict

    g = _load_reference_generator(128)
    g.eval()
    with torch.no_grad():
        for n, p in g.named_parameters():
            if n.endswith("noise_strength"):
                p.copy_(torch.randn(()) * 0.1)
        # nonzero w_avg so truncation is a real test
        g.mapping.w_avg.copy_(torch.randn(512) * 0.05)
    sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}

    import models.modules.mat_utils.networks.mat as refmat

    orig_dropout = refmat.F.dropout
    refmat.F.dropout = lambda x, *a, **k: x
    try:
        rng = np.random.RandomState(0)
        x = rng.randn(1, 3, 128, 128).astype(np.float32)
        m = (rng.rand(1, 1, 128, 128) > 0.3).astype(np.float32)
        z = rng.randn(1, 512).astype(np.float32)
        with torch.no_grad():
            y_ref = g(torch.from_numpy(x), torch.from_numpy(m),
                      torch.from_numpy(z), None, truncation_psi=0.5,
                      noise_mode="const").numpy()
    finally:
        refmat.F.dropout = orig_dropout

    fg, template = _flax_generator_and_template(128)
    tree = jax.tree.map(jnp.asarray, convert_state_dict(sd, template=template))
    y = fg.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)),
                 jnp.asarray(m.transpose(0, 2, 3, 1)), jnp.asarray(z),
                 truncation_psi=0.5, noise_mode="const")
    y = np.asarray(y).transpose(0, 3, 1, 2)
    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() < 1e-5 * max(scale, 1.0), (
        np.abs(y - y_ref).max(), scale)


# ---------------------------------------------------------------------------
# persistence-pickle reader (legacy.load_network_pkl equivalent)
# ---------------------------------------------------------------------------

class _FakePersistent:
    """Pickles exactly like a @persistent_class module (reference
    torch_utils/persistence.py): a reduce-call to
    torch_utils.persistence._reconstruct_persistent_obj(meta)."""

    def __init__(self, state):
        self.state = state

    def __reduce__(self):
        meta = dict(type="class", version=6, module_src="<src>",
                    class_name="Generator", state=self.state)
        return (sys.modules["torch_utils.persistence"]._reconstruct_persistent_obj,
                (meta,))


def _wrap_persistent(module):
    state = dict(module.__dict__)
    if "_modules" in state:
        state["_modules"] = OrderedDict(
            (k, _wrap_persistent(v) if v is not None else None)
            for k, v in state["_modules"].items()
        )
    return _FakePersistent(state)


def _write_fixture_pkl(g, path):
    tu = types.ModuleType("torch_utils")
    pers = types.ModuleType("torch_utils.persistence")

    def _reconstruct_persistent_obj(meta):  # never called at write time
        raise RuntimeError

    _reconstruct_persistent_obj.__module__ = "torch_utils.persistence"
    _reconstruct_persistent_obj.__qualname__ = "_reconstruct_persistent_obj"
    pers._reconstruct_persistent_obj = _reconstruct_persistent_obj
    tu.persistence = pers
    sys.modules["torch_utils"] = tu
    sys.modules["torch_utils.persistence"] = pers
    try:
        with open(path, "wb") as f:
            pickle.dump({"G": _wrap_persistent(g), "G_ema": _wrap_persistent(g)}, f)
    finally:
        del sys.modules["torch_utils"]
        del sys.modules["torch_utils.persistence"]


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference repo not mounted")
def test_mat_pkl_load_convert_and_inpaint(tmp_path, monkeypatch):
    """End-to-end recipe for Places_512_FullData.pkl on a schema-exact
    fixture: persistence pkl -> load_network_pkl -> convert_mat_weights npz
    -> MatInpainter forward."""
    from waldo_tpu.models.mat.convert import load_network_pkl, convert_mat_weights
    from waldo_tpu.models.mat.inpainter import MatInpainter

    g = _load_reference_generator(128)
    pkl = str(tmp_path / "fixture.pkl")
    _write_fixture_pkl(g, pkl)
    assert "torch_utils" not in sys.modules  # loader must not need it

    sd = load_network_pkl(pkl, key="G_ema")
    ref_sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}
    assert set(sd) == set(ref_sd), (
        sorted(set(sd) ^ set(ref_sd))[:8])
    for k in ref_sd:
        np.testing.assert_array_equal(sd[k], ref_sd[k], err_msg=k)

    out = str(tmp_path / "mat_128.npz")
    convert_mat_weights(pkl, out, img_resolution=128)
    inp = MatInpainter(weights_path=out, resolution=128)
    x = jnp.zeros((1, 128, 128, 3))
    mask = jnp.zeros((1, 128, 128, 1)).at[:, 40:80, 40:80].set(1.0)
    y = np.asarray(inp(x, mask))
    assert y.shape == (1, 128, 128, 3) and np.isfinite(y).all()


def test_torch_key_to_flax_mapping():
    """Name-map regression on keys hard-coded from the real state dict."""
    from waldo_tpu.models.mat.convert import torch_key_to_flax

    cases = {
        "mapping.fc0.weight": ("params", ("mapping", "fc0", "weight")),
        "mapping.w_avg": ("w_stats", ("mapping", "w_avg")),
        "synthesis.first_stage.conv_first.conv.weight":
            ("params", ("synthesis", "first_stage", "conv_first", "conv", "weight")),
        "synthesis.first_stage.enc_conv.0.conv.bias":
            ("params", ("synthesis", "first_stage", "enc_conv0", "conv", "bias")),
        "synthesis.first_stage.tran.1.downsample.conv.conv.weight":
            ("params", ("synthesis", "first_stage", "tran1", "downsample",
                        "conv", "conv", "weight")),
        "synthesis.first_stage.tran.3.downsample.conv.conv.weight":
            ("params", ("synthesis", "first_stage", "tran3", "upsample",
                        "conv", "conv", "weight")),
        "synthesis.first_stage.tran.0.blocks.1.mlp.fc1.weight":
            ("params", ("synthesis", "first_stage", "tran0", "block1",
                        "mlp_fc1", "weight")),
        "synthesis.first_stage.dec_conv.0.conv0.conv.affine.weight":
            ("params", ("synthesis", "first_stage", "dec_conv0", "conv0",
                        "conv", "affine", "weight")),
        "synthesis.enc.EncConv_Block_128x128.conv0.weight":
            ("params", ("synthesis", "enc", "b7", "conv0", "weight")),
        "synthesis.to_style.conv.2.bias":
            ("params", ("synthesis", "to_style", "conv2", "bias")),
        "synthesis.dec.Dec_32x32.conv1.noise_const":
            ("noise_const", ("synthesis", "dec", "Dec_32x32", "conv1", "n")),
        "synthesis.dec.Dec_16x16.toRGB.conv.weight":
            ("params", ("synthesis", "dec", "Dec_16x16", "toRGB", "conv", "weight")),
    }
    for k, want in cases.items():
        assert torch_key_to_flax(k) == want, k
    assert torch_key_to_flax("synthesis.first_stage.conv_first.conv.resample_filter") is None
    assert torch_key_to_flax("synthesis.first_stage.tran.0.blocks.1.attn_mask") is None


# ---------------------------------------------------------------------------
# LPIPS / VGG19 converters on schema-exact fixtures
# ---------------------------------------------------------------------------

def _alex_fixture_state_dict(rng):
    """lpips-package layout for net='alex' (slices keep torchvision indices)."""
    shapes = {  # (slice, idx) -> (O, I, k, k)
        (1, 0): (64, 3, 11, 11),
        (2, 3): (192, 64, 5, 5),
        (3, 6): (384, 192, 3, 3),
        (4, 8): (256, 384, 3, 3),
        (5, 10): (256, 256, 3, 3),
    }
    sd = {}
    for (s, i), shp in shapes.items():
        sd[f"net.slice{s}.{i}.weight"] = rng.randn(*shp).astype(np.float32) * 0.05
        sd[f"net.slice{s}.{i}.bias"] = rng.randn(shp[0]).astype(np.float32) * 0.05
    for i, c in enumerate([64, 192, 384, 256, 256]):
        sd[f"lin{i}.model.1.weight"] = np.abs(
            rng.randn(1, c, 1, 1).astype(np.float32))
    return sd


def test_lpips_converter_fixture(tmp_path, monkeypatch):
    from waldo_tpu.eval.lpips import LPIPS, convert_lpips_weights

    rng = np.random.RandomState(0)
    sd = _alex_fixture_state_dict(rng)
    monkeypatch.setenv("WALDO_LPIPS_WEIGHTS", str(tmp_path))
    convert_lpips_weights(str(tmp_path / "lpips_alex.npz"), net="alex",
                          state_dict=sd)
    lp = LPIPS.maybe_load("alex")
    assert lp is not None
    a = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    d_same = np.asarray(lp(a, a))
    d_diff = np.asarray(lp(a, jnp.clip(a + 0.5, -1, 1)))
    assert np.allclose(d_same, 0.0, atol=1e-5)
    assert (d_diff > 0).all()
    # converted kernel layout: first conv maps 3 -> 64 with 11x11 kernel
    data = np.load(tmp_path / "lpips_alex.npz")
    assert data["conv0_kernel"].shape == (11, 11, 3, 64)


def test_vgg19_converter_fixture(tmp_path, monkeypatch):
    from waldo_tpu.nn.perceptual import (
        VGGLoss, convert_vgg19_weights, VGG19_TORCH_CONV_IDX)

    rng = np.random.RandomState(1)
    chans = [64, 64, 128, 128, 256, 256, 256, 256, 512, 512, 512, 512, 512]
    in_ch = [3] + chans[:-1]
    sd = {}
    for idx, o, i in zip(VGG19_TORCH_CONV_IDX, chans, in_ch):
        sd[f"features.{idx}.weight"] = rng.randn(o, i, 3, 3).astype(np.float32) * 0.05
        sd[f"features.{idx}.bias"] = rng.randn(o).astype(np.float32) * 0.05
    monkeypatch.setenv("WALDO_VGG_WEIGHTS", str(tmp_path))
    convert_vgg19_weights(str(tmp_path / "vgg19_features.npz"), state_dict=sd)
    loss = VGGLoss.maybe_load()
    assert loss is not None
    a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    assert float(loss(a, a)) < 1e-6
    assert float(loss(a, a * 0.5)) > 0
