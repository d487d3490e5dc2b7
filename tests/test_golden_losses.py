"""Golden-value regression test: loss metrics on a fixed seed must not drift.

Goldens were recorded on CPU at framework version 0.1 (tests/golden_losses.json).
Any intentional semantic change to the loss graphs must regenerate them
(see the writer snippet in the json file's git history).
"""
import json
import os

import numpy as np
import pytest
import jax

from tests.test_models_smoke import tiny_config, tiny_batch
from waldo_tpu.models import Synthesizer

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_losses.json")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no goldens recorded")
def test_losses_match_golden():
    with open(GOLDEN) as f:
        golden = json.load(f)
    cfg = tiny_config()
    syn = Synthesizer(cfg)
    params = syn.init_params(jax.random.PRNGKey(0))
    batch = tiny_batch(cfg)

    _, m1 = syn.extract_object_loss(params["pe"], batch, jax.random.PRNGKey(1), 0)
    _, m2 = syn.generate_pose_loss(params["pg"], params["pe"], batch, jax.random.PRNGKey(2), 0)
    _, m3 = syn.inpaint_loss(params["ii"], params["pe"], batch, jax.random.PRNGKey(3), 0)

    for name, metrics in [("extract_object", m1), ("generate_pose", m2), ("inpaint", m3)]:
        for k, v in golden[name].items():
            got = float(metrics[k])
            assert np.isfinite(got), (name, k)
            assert abs(got - v) <= 1e-3 + 1e-2 * abs(v), (name, k, got, v)
