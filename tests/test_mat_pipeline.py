"""End-to-end MAT post-processing chain on a tiny model (random weights)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_models_smoke import tiny_config, tiny_batch
from waldo_tpu.models import Synthesizer
from waldo_tpu.models.mat.inpainter import MatInpainter
from waldo_tpu.models.mat_pipeline import inpaint_with_mat


@pytest.mark.parametrize("loop_ii", [False, True])
def test_inpaint_with_mat_chain(loop_ii, tmp_path):
    cfg = tiny_config()
    m = cfg.model
    m.use_inpainter = True
    m.use_mat_inpainter = True
    m.loop_ii = loop_ii
    m.inpaint_obj = True
    m.propagate_unique = True
    m.use_expansion = True
    m.use_shadows = loop_ii
    m.propagate_obj = False  # host-level branch needs real motion; off here
    m.restrict_to_ctx = True

    syn = Synthesizer(cfg)
    params = syn.init_params(jax.random.PRNGKey(0))
    batch = tiny_batch(cfg, b=1)
    out = syn.predict(params, batch)

    inpainter = MatInpainter(resolution=128)  # random init, structural test
    result = inpaint_with_mat(
        cfg, syn.warper,
        lambda r: syn.wif.apply(params["ii"], r),
        inpainter,
        out["pred_raw_output"], out["pred_alpha"], out["pred_alpha_ctx"],
        batch["vid"], out["pred_flow"], m.ctx_len, out["pred_grids"],
    )
    b, t = batch["vid"].shape[:2]
    assert result.shape == batch["vid"].shape
    assert np.isfinite(np.asarray(result)).all()
    # context frames pass through untouched
    assert np.allclose(np.asarray(result[:, : m.ctx_len]),
                       np.asarray(batch["vid"][:, : m.ctx_len]))
