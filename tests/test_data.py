"""Data layer tests: flo roundtrip, synthetic dataset contract, loader sharding."""
import numpy as np

from waldo_tpu.config import Config, DataConfig, ModelConfig
from waldo_tpu.data import SyntheticDataset, DataLoader, InfiniteLoader, read_flo, write_flo


def small_cfg():
    return Config(
        dim=32,
        aspect_ratio=2.0,
        data=DataConfig(num_lyt=6, fg_idx=[1, 4], bg_idx=[0], other_idx=[2], vid_len=5,
                        dataset="synthetic"),
        model=ModelConfig(),
    )


def test_flo_roundtrip(tmp_path):
    flow = np.random.RandomState(0).randn(7, 9, 2).astype(np.float32)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    assert np.array_equal(read_flo(p), flow)


def test_synthetic_sample_contract():
    cfg = small_cfg()
    ds = SyntheticDataset(cfg, phase="valid")
    s = ds[0]
    t, h, w = 5, 32, 64
    assert s["vid"].shape == (t, h, w, 3)
    assert s["lyt"].shape == (t, h, w, 6)
    assert s["flow"].shape == (t, h, w, 2)
    assert s["vid"].min() >= -1 and s["vid"].max() <= 1
    assert set(np.unique(s["lyt"])) <= {-5.0, 5.0}
    # layout is one-hot: sums to one class per pixel
    assert np.allclose((s["lyt"] / 10 + 0.5).sum(-1), 1.0)
    # eval split deterministic
    s2 = SyntheticDataset(cfg, phase="valid")[0]
    assert np.array_equal(s["vid"], s2["vid"])


def test_loader_sharding_and_batching():
    cfg = small_cfg()
    ds = SyntheticDataset(cfg, phase="train")
    loaders = [
        DataLoader(ds, global_batch_size=8, num_hosts=2, host_id=i, seed=1, num_workers=2)
        for i in range(2)
    ]
    b0 = next(iter(loaders[0]))
    b1 = next(iter(loaders[1]))
    assert b0["vid"].shape == (4, 5, 32, 64, 3)
    assert b1["vid"].shape == (4, 5, 32, 64, 3)
    assert len(loaders[0]) == 8  # 64/2 hosts/4 per host


def test_infinite_loader_cycles():
    cfg = small_cfg()
    ds = SyntheticDataset(cfg, phase="valid")  # 8 clips
    it = InfiniteLoader(DataLoader(ds, global_batch_size=4, num_hosts=1, host_id=0,
                                   shuffle=False, num_workers=1))
    for _ in range(5):  # 2 batches/epoch -> crosses epochs
        batch = it.next()
        assert batch["vid"].shape[0] == 4
    assert it.epoch >= 2


import os as _os
import pytest as _pytest

_DEMO = "/root/reference/datasets/demo_cityscapes"


@_pytest.mark.skipif(not _os.path.isdir(_DEMO), reason="demo data not mounted")
def test_cityscapes_demo_data_loads_and_trains_one_step():
    """Real-data integration: the reference's in-repo demo clip (Munster
    sequence, 3 modalities) loads through our Cityscapes dataset with the
    test.sh geometry (dim 128 / load 512 / flow 128) and drives one finite
    LVD loss step."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from waldo_tpu.config import Config, DataConfig, ModelConfig, apply_dataset_defaults
    from waldo_tpu.data.cityscapes import CityscapesDataset

    cfg = Config(dim=128, load_dim=0, true_dim=512, flow_dim=128,
                 aspect_ratio=2.0,
                 data=DataConfig(dataset="cityscapes", dataroot=_DEMO,
                                 vid_len=6, skip_first=True, eval_phase="test"),
                 model=ModelConfig(patch_size=16, latent_shape=(8, 16),
                                   embed_dim=64, num_obj=4, oe_depth=1,
                                   pe_depth=1, oe_num_timesteps=6, ctx_len=3,
                                   edge_size=7))
    apply_dataset_defaults(cfg)
    cfg.dim, cfg.load_dim, cfg.true_dim, cfg.flow_dim = 128, 0, 512, 128
    cfg.data.dataroot = _DEMO
    cfg.data.vid_len = 6
    cfg.data.skip_first = True
    ds = CityscapesDataset(cfg, phase="test")
    assert len(ds) >= 1
    item = ds[0]
    t = cfg.data.vid_len
    assert item["vid"].shape == (t, 128, 256, 3)
    assert item["lyt"].shape == (t, 128, 256, 20)
    assert item["flow"].shape == (t, 128, 256, 2)
    assert -1.0 <= item["vid"].min() and item["vid"].max() <= 1.0
    # one-hot scaled 5*(2x-1); bilinear resize makes soft boundary values
    # (reference-faithful: base_dataset.py:179-181 one-hots before the
    # bilinear transform, NEAREST is commented out at :220)
    assert item["lyt"].min() >= -5.0 and item["lyt"].max() <= 5.0
    assert (np.abs(item["lyt"]) == 5.0).mean() > 0.9
    assert np.abs(item["flow"]).max() < 1.0  # normalized 2*px/size

    # one finite LVD loss step on the real clip
    from waldo_tpu.models import Synthesizer

    syn = Synthesizer(cfg)
    params = syn.init_params(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(item[k])[None] for k in ("vid", "lyt", "flow")}
    loss, metrics = syn.extract_object_loss(params["pe"], batch,
                                            jax.random.PRNGKey(1),
                                            jnp.float32(0))
    assert np.isfinite(float(loss)), float(loss)
