"""Trainer / checkpoint / sharded-step tests on the synthetic dataset.

Runs on the 8-virtual-device CPU mesh from conftest, exercising the real
data-parallel path (batch sharded over "data", params replicated).
"""
import os

import numpy as np
import pytest
import jax

from waldo_tpu.config import Config, DataConfig, ModelConfig


def train_cfg(tmp, use_pg=False, use_ii=False, vid_modes=None):
    return Config(
        name="t",
        datetime="now",
        save_path=str(tmp),
        dim=32,
        aspect_ratio=2.0,
        batch_size_vid=8,
        num_iter=3,
        save_latest_freq=2,
        log_freq=1,
        vid_modes=vid_modes or ["vid_object_extractor"],
        data=DataConfig(num_lyt=6, fg_idx=[1, 4], bg_idx=[0], other_idx=[2], vid_len=5,
                        dataset="synthetic", num_workers=2),
        model=ModelConfig(
            patch_size=8, latent_shape=(4, 8), obj_shape=(2, 2), embed_dim=32,
            num_heads=4, num_obj=4, oe_depth=1, pe_depth=1, pg_com_depth=1,
            pg_enc_depth=1, pg_dec_depth=1, pg_num_timesteps=5, oe_num_timesteps=5,
            ii_depth=2, ii_embed_dim=16, ctx_len=2, min_ctx_length_vid=2,
            max_ctx_length_vid=2, edge_size=3,
            use_pe=True, use_pg=use_pg, use_ii=use_ii,
        ),
    )


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_trainer_lvd_steps_and_checkpoints(tmp_path):
    from waldo_tpu.train import Trainer

    cfg = train_cfg(tmp_path)
    tr = Trainer(cfg)
    tr.run(num_iter=3)
    # latest checkpoint exists and restores
    assert tr.ckpt.exists("pe", "latest")
    params = tr.syn.init_params(jax.random.PRNGKey(0))
    restored = tr.ckpt.restore("pe", params["pe"], which="latest")
    trained = jax.device_get(tr.states["pe"].params)
    chex_ok = jax.tree.all(
        jax.tree.map(lambda a, b: np.allclose(a, b), restored, trained)
    )
    assert chex_ok


def test_trainer_loss_decreases_on_fixed_batch(tmp_path):
    """Optimizer sanity: repeated steps on one batch reduce the LVD loss."""
    from waldo_tpu.train import Trainer
    from waldo_tpu.parallel import shard_batch

    cfg = train_cfg(tmp_path)
    cfg.model.vid_object_extractor_losses = ["l1_flow"]
    cfg.model.lambda_l1_flow = 100.0
    tr = Trainer(cfg)
    from waldo_tpu.data import create_dataset, DataLoader

    ds = create_dataset(cfg, phase="valid")
    batch = next(iter(DataLoader(ds, 8, shuffle=False, num_workers=1)))
    batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    batch = shard_batch(batch, tr.mesh)
    net, step = tr._steps["vid_object_extractor"]
    losses = []
    rng = jax.random.PRNGKey(0)
    for it in range(8):
        tr.states[net], metrics = step(tr.states[net], tr.states, batch, rng,
                                       np.float32(it))
        losses.append(float(jax.device_get(metrics["loss"])))
    assert losses[-1] < losses[0], losses


def test_evaluator_predict_and_dump(tmp_path):
    from waldo_tpu.train import Trainer, Evaluator

    cfg = train_cfg(tmp_path, use_pg=True, use_ii=True)
    tr = Trainer(cfg)
    tr.save(0, name="latest")

    cfg2 = train_cfg(tmp_path, use_pg=True, use_ii=True)
    cfg2.data.eval_phase = "test"
    cfg2.batch_size_vid = 8
    cfg2.model.load_path = cfg.checkpoint_path
    cfg2.model.pg_load_path = cfg.checkpoint_path
    cfg2.model.ii_load_path = cfg.checkpoint_path
    ev = Evaluator(cfg2)
    metrics = ev.run(dump=True, max_batches=1)
    assert np.isfinite(metrics["l1_pred"])
    dumped = os.listdir(os.path.join(cfg2.result_path, "pred_vid"))
    assert len(dumped) >= 1


def test_trainer_emits_visuals(tmp_path):
    """TB event files must contain image/video summaries at log_freq
    (reference synthesizer.py:241-282 behavior, wired via
    Synthesizer.visuals -> Logger.log_visuals)."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)

    from waldo_tpu.train import Trainer

    cfg = train_cfg(tmp_path)
    tr = Trainer(cfg)
    tr.run(num_iter=1)
    tr.logger.close()
    acc = EventAccumulator(cfg.log_path, size_guidance={"images": 0})
    acc.Reload()
    img_tags = acc.Tags().get("images", [])
    # videos are logged as image summaries (grids) by add_video
    assert any("rec_vid" in t for t in img_tags), img_tags
    assert any("real_vid" in t for t in img_tags), img_tags
    assert any("rec_flow" in t for t in img_tags), img_tags
    assert any("rec_obj_lyt" in t for t in img_tags), img_tags
    assert any("/pts" in t or "/mot" in t for t in img_tags), img_tags


def test_nonstrict_restore_changed_head(tmp_path):
    """Reference models/__init__.py:27-45 semantics: restoring into a model
    with a changed head prunes the mismatched leaves and keeps everything
    else; brand-new leaves keep their init; named-slot fallback to the
    highest numbered checkpoint works."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from waldo_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path))
    saved = {
        "enc": {"kernel": np.ones((3, 3, 4, 8), np.float32),
                "bias": np.zeros((8,), np.float32)},
        "head": {"kernel": np.full((8, 5), 2.0, np.float32)},
    }
    ckpt.save("pe", saved, it=7)  # numbered slot only — no 'latest'

    template = {
        "enc": {"kernel": jnp.zeros((3, 3, 4, 8)),
                "bias": jnp.ones((8,))},
        "head": {"kernel": jnp.full((8, 9), -1.0)},   # changed head: 5 -> 9
        "new_block": {"w": jnp.full((2,), 3.0)},       # absent from ckpt
    }
    out = ckpt.restore("pe", template, which="latest")  # glob-by-iter fallback
    np.testing.assert_array_equal(np.asarray(out["enc"]["kernel"]), saved["enc"]["kernel"])
    np.testing.assert_array_equal(np.asarray(out["enc"]["bias"]), saved["enc"]["bias"])
    # mismatched head pruned -> template kept
    np.testing.assert_array_equal(np.asarray(out["head"]["kernel"]),
                                  np.full((8, 9), -1.0, np.float32))
    # new leaf keeps init
    np.testing.assert_array_equal(np.asarray(out["new_block"]["w"]),
                                  np.full((2,), 3.0, np.float32))
    # strict restore of an exact-match template still round-trips
    exact = jax.tree.map(jnp.zeros_like, saved)
    out2 = ckpt.restore("pe", exact, which="7", strict=True)
    np.testing.assert_array_equal(np.asarray(out2["head"]["kernel"]),
                                  saved["head"]["kernel"])


def test_checkpoint_iter_zero_is_not_latest(tmp_path):
    """`which_iter=0` must load the iter-0 checkpoint, not silently fall
    back to `latest` (a falsy-zero bug found by the real-data trend: eval
    at step "0" returned bit-identical metrics to "latest")."""
    import jax.numpy as jnp

    from waldo_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save("pe", {"w": np.zeros(3, np.float32)}, 0)
    ckpt.save("pe", {"w": np.ones(3, np.float32)}, 5, name="latest")

    # the shared normalization used by Trainer._maybe_restore and Evaluator
    from waldo_tpu.train.checkpoint import normalize_which

    for which, expect in [("0", 0.0), (0, 0.0), (None, 1.0), ("", 1.0),
                          ("latest", 1.0)]:
        out = ckpt.restore("pe", {"w": np.full(3, -1, np.float32)},
                           which=normalize_which(which))
        assert float(np.asarray(out["w"])[0]) == expect, (which, out)
