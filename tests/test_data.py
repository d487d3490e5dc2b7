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
