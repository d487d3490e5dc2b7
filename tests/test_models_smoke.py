"""End-to-end model smoke tests on a tiny config."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from waldo_tpu.config import Config, DataConfig, ModelConfig
from waldo_tpu.models import Synthesizer


def tiny_config(use_pg=True, use_ii=True):
    cfg = Config(
        dim=32,
        load_dim=0,
        aspect_ratio=2.0,
        data=DataConfig(
            num_lyt=6,
            fg_idx=[0, 1],
            bg_idx=[2, 3],
            other_idx=[4],
            vid_len=5,
        ),
        model=ModelConfig(
            patch_size=8,
            latent_shape=(4, 8),
            obj_shape=(2, 2),
            embed_dim=64,
            num_heads=4,
            num_obj=4,
            oe_depth=1,
            pe_depth=1,
            pg_com_depth=1,
            pg_enc_depth=1,
            pg_dec_depth=1,
            pg_num_timesteps=5,
            oe_num_timesteps=5,
            ii_depth=2,
            ii_embed_dim=32,
            ctx_len=2,
            min_ctx_length_vid=2,
            max_ctx_length_vid=2,
            edge_size=3,
            use_pe=True,
            use_pg=use_pg,
            use_ii=use_ii,
        ),
    )
    return cfg


def tiny_batch(cfg, b=2, seed=0):
    rng = np.random.RandomState(seed)
    t = cfg.data.vid_len
    h, w = cfg.dim, int(cfg.dim * cfg.aspect_ratio)
    return {
        "vid": jnp.asarray(rng.rand(b, t, h, w, 3).astype(np.float32) * 2 - 1),
        "lyt": jnp.asarray(
            5.0 * (2 * np.eye(cfg.data.num_lyt, dtype=np.float32)[
                rng.randint(0, cfg.data.num_lyt, (b, t, h, w))
            ] - 1)
        ),
        "flow": jnp.asarray(rng.randn(b, t, h, w, 2).astype(np.float32) * 0.05),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    syn = Synthesizer(cfg)
    params = syn.init_params(jax.random.PRNGKey(0))
    batch = tiny_batch(cfg)
    return cfg, syn, params, batch


def test_init_params(setup):
    cfg, syn, params, batch = setup
    assert set(params) == {"pe", "pg", "ii"}
    n = sum(p.size for p in jax.tree.leaves(params["pe"]))
    assert n > 100_000


def test_extract_object_loss_finite_and_grads(setup):
    cfg, syn, params, batch = setup

    def loss_fn(pe):
        return syn.extract_object_loss(pe, batch, jax.random.PRNGKey(1), 0)[0]

    loss, grads = jax.value_and_grad(loss_fn)(params["pe"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_extract_object_metrics(setup):
    cfg, syn, params, batch = setup
    loss, metrics = syn.extract_object_loss(params["pe"], batch, jax.random.PRNGKey(1), 0)
    for key in ["obj_flow", "ent_flt_edge", "l1_flow", "cell_dis", "reg_mov",
                "sharp_vid", "pts_reg_obj", "pts_rest_obj", "ce_lyt"]:
        assert key in metrics, key
        assert np.isfinite(float(metrics[key])), key


def test_generate_pose_loss(setup):
    cfg, syn, params, batch = setup

    def loss_fn(pg):
        return syn.generate_pose_loss(pg, params["pe"], batch, jax.random.PRNGKey(2), 0)[0]

    loss, grads = jax.value_and_grad(loss_fn)(params["pg"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_inpaint_loss(setup):
    cfg, syn, params, batch = setup

    def loss_fn(ii):
        return syn.inpaint_loss(ii, params["pe"], batch, jax.random.PRNGKey(3), 0)[0]

    loss, grads = jax.value_and_grad(loss_fn)(params["ii"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_predict_shapes(setup):
    cfg, syn, params, batch = setup
    out = syn.predict(params, batch)
    b, t = batch["vid"].shape[:2]
    h, w = cfg.dim, int(cfg.dim * cfg.aspect_ratio)
    assert out["rec_vid"].shape == (b, t, h, w, 3)
    assert out["pred_vid"].shape == (b, t, h, w, 3)
    assert out["inp_pred_vid"].shape == (b, t, h, w, 3)
    assert np.isfinite(np.asarray(out["pred_vid"])).all()
    # context frames of pred_vid are the real frames
    assert np.allclose(
        np.asarray(out["pred_vid"][:, : cfg.model.ctx_len]),
        np.asarray(batch["vid"][:, : cfg.model.ctx_len]),
    )


def test_predict_jits(setup):
    cfg, syn, params, batch = setup
    fn = jax.jit(lambda p, b: syn.predict(p, b)["pred_vid"])
    out = fn(params, batch)
    assert out.shape == batch["vid"].shape
