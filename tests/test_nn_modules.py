"""Transformer / conv module tests."""
import numpy as np
import jax
import jax.numpy as jnp

from waldo_tpu.nn import (
    Mlp,
    CustomNorm,
    MultiBlocks,
    FullAttention,
    CrossAttention,
    ObjAttention,
    ClsAttention,
    UNet,
    ConvPatchProj,
)


def _init_apply(mod, *args, **kwargs):
    params = mod.init(jax.random.PRNGKey(0), *args, **kwargs)
    return mod.apply(params, *args, **kwargs), params


def test_full_attention_key_mask_equivalence():
    """Masked full attention == attention computed over only the kept keys."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 32).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 0, 0]], bool))
    mod = FullAttention(dim=32, num_heads=4)
    params = mod.init(jax.random.PRNGKey(0), x, key_mask=mask)
    out_masked = mod.apply(params, x, key_mask=mask)

    # batch 0: only first 3 tokens kept — recompute densely on the packed slice
    x0 = x[:1, :3]
    out_dense = mod.apply(params, x0)
    assert np.allclose(np.asarray(out_masked[0, :3]), np.asarray(out_dense[0]), atol=1e-5)


def test_cross_attention_shapes():
    rng = np.random.RandomState(1)
    xq = jnp.asarray(rng.randn(2, 4, 32).astype(np.float32))
    xc = jnp.asarray(rng.randn(2, 10, 32).astype(np.float32))
    mask = jnp.asarray(np.ones((2, 10), bool))
    out, _ = _init_apply(CrossAttention(dim=32, num_heads=4), xq, xc, key_mask=mask)
    assert out.shape == (2, 4, 32)


def test_obj_and_cls_attention_shapes():
    rng = np.random.RandomState(2)
    x_obj = jnp.asarray(rng.randn(2, 8, 32).astype(np.float32))
    x_ctx = jnp.asarray(rng.randn(2, 20, 32).astype(np.float32))
    out, _ = _init_apply(ObjAttention(dim=32, num_heads=4), x_obj, x_ctx)
    assert out.shape == (2, 8, 32)
    z = jnp.asarray(rng.randn(2, 1, 32).astype(np.float32))
    out, _ = _init_apply(ClsAttention(dim=32, num_heads=4), z, x_ctx)
    assert out.shape == (2, 1, 32)


def test_multiblocks_full():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 12, 32).astype(np.float32))
    out, params = _init_apply(MultiBlocks(depth=2, dim=32, num_heads=4), x)
    assert out.shape == x.shape
    n_params = sum(p.size for p in jax.tree.leaves(params))
    # 2 blocks x (qkv 32*96 + proj 32*32+32 + mlp 32*128+128+128*32+32 + 2 ln)
    assert n_params > 10000


def test_custom_norms():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 5, 16).astype(np.float32))
    for nt in ["ln", "ln_not_affine", "pn"]:
        out, _ = _init_apply(CustomNorm(nt), x)
        assert out.shape == x.shape
    x2 = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    out, _ = _init_apply(CustomNorm("ln2d"), x2)
    assert out.shape == x2.shape
    # ln2d == per-channel spatial norm
    m = np.asarray(out).mean(axis=(1, 2))
    assert np.abs(m).max() < 1e-4


def test_unet_shape_and_zero_init():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 32, 64, 7).astype(np.float32))
    mod = UNet(num_channels_out=4, embed_dim=64, norm_layer="ln2d", depth=3, zero_init=True)
    out, params = _init_apply(mod, x)
    assert out.shape == (1, 32, 64, 4)
    assert np.allclose(np.asarray(out), 0)  # zero-init final conv


def test_conv_patch_proj_roundtrip_shapes():
    rng = np.random.RandomState(6)
    img = jnp.asarray(rng.randn(2, 32, 64, 7).astype(np.float32))
    enc = ConvPatchProj(patch_size=16, embed_dim=64, norm_layer="ln2d", num_channels=7)
    tokens, _ = _init_apply(enc, img)
    assert tokens.shape == (2, 2 * 4, 64)

    dec = ConvPatchProj(patch_size=16, embed_dim=64, norm_layer="ln2d", num_channels=3,
                        from_patch=False)
    out, _ = _init_apply(dec, tokens, latent_shape=(2, 4))
    assert out.shape == (2, 32, 64, 3)


def test_conv_patch_proj_alpha_channel_padding():
    # expects num_channels=4 but gets 3 -> alpha channel of ones appended
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    enc = ConvPatchProj(patch_size=4, embed_dim=32, norm_layer="ln2d", num_channels=4)
    tokens, _ = _init_apply(enc, img)
    assert tokens.shape == (1, 16, 32)


def test_config_roundtrip_and_cli():
    from waldo_tpu.config import Config, parse_cli, save_config, load_config, to_dict

    cfg = parse_cli(["--dataset", "cityscapes", "--s_num_obj", "8", "--dim", "128",
                     "--model.ctx_len", "4", "--vid_modes", "vid_object_extractor"])
    assert cfg.data.num_lyt == 20
    assert cfg.aspect_ratio == 2.0
    assert cfg.model.num_obj == 8
    assert cfg.width_size == 256

    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "config.json")
    save_config(cfg, path)
    cfg2 = load_config(path)
    assert to_dict(cfg2) == to_dict(cfg)


def test_multiblocks_threads_block_causal():
    """block_causal is reachable through the standard MultiBlocks stack
    (round-1 gap: causal_mask_sizes was dropped on the way to Block)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from waldo_tpu.nn.transform import MultiBlocks

    sizes = (4, 6)
    mb = MultiBlocks(depth=2, dim=32, num_heads=4, block_type="block_causal",
                     causal_mask_sizes=sizes)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 32).astype(np.float32))
    params = mb.init(jax.random.PRNGKey(0), x)
    out = mb.apply(params, x)
    assert out.shape == x.shape
    # causality: perturbing the last block must not change the first block
    x2 = x.at[:, sizes[0]:].add(1.0)
    out2 = mb.apply(params, x2)
    np.testing.assert_allclose(np.asarray(out2[:, : sizes[0]]),
                               np.asarray(out[:, : sizes[0]]), atol=1e-5)
