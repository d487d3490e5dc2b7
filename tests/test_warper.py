"""Warper invariant tests: round trips, occlusion bounds, fusion identities."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from waldo_tpu.config import Config, DataConfig, ModelConfig
from waldo_tpu.models.warper import Warper, WarpGrids
from waldo_tpu.models.lvd import compute_occ
from waldo_tpu.ops import get_grid


def make_warper(num_obj=2):
    cfg = Config(
        dim=32,
        aspect_ratio=2.0,
        data=DataConfig(num_lyt=4, fg_idx=[1], bg_idx=[0], other_idx=[2], vid_len=3),
        model=ModelConfig(patch_size=8, latent_shape=(4, 8), obj_shape=(2, 2),
                          num_obj=num_obj, min_cls=0.1),
    )
    return Warper(cfg), cfg


def identity_poses(b, t, warper):
    lo = warper.latent_obj_size
    l = warper.latent_size
    obj_rest = get_grid(2, 2).reshape(1, 1, 1, lo, 2)
    obj_pose = np.broadcast_to(obj_rest, (b, t, warper.num_obj, lo, 2)).copy()
    # shrink objects so their textures land inside the frame
    obj_pose = obj_pose * 0.25
    bg_pose = np.broadcast_to(get_grid(4, 8).reshape(1, 1, l, 2), (b, t, l, 2)).copy()
    return jnp.asarray(obj_pose), jnp.asarray(bg_pose)


def test_identity_bg_roundtrip():
    """Identity bg pose: gather then scatter reproduces the input frame."""
    w, cfg = make_warper()
    b, t = 1, 2
    obj_pose, bg_pose = identity_poses(b, t, w)
    grids = w(obj_pose, bg_pose)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, t, 32, 64, 3).astype(np.float32))
    bg = w.bg_from_input(x, grids)           # frame -> bg texture
    back = w.bg_to_output(bg, grids, delta=0.0)[:, :, 0]  # texture -> frame
    # identity TPS: interior must match almost exactly (borders lose the
    # inverse-warp erosion margin)
    a = np.asarray(back)[:, :, 8:-8, 8:-8]
    bref = np.asarray(x)[:, :, 8:-8, 8:-8]
    assert np.abs(a - bref).max() < 1e-2, np.abs(a - bref).max()


def test_occlusion_product_bounds_and_bg_rule():
    """occ[i,0]=1 (bg occluded by all), occ[0,j]=0 (bg occludes none)."""
    occ_score = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4).astype(np.float32))
    occ = np.asarray(compute_occ(occ_score))
    assert occ.shape == (2, 3, 5, 5)
    assert np.allclose(occ[:, :, 0, :], 0)      # bg row
    assert np.allclose(occ[:, :, 1:, 0], 1)     # bg column
    assert (occ >= 0).all() and (occ <= 1 + 1e-6).all()

    w, _ = make_warper(num_obj=4)
    alpha = jnp.asarray(np.random.RandomState(1).rand(2, 3, 5, 8, 16, 1).astype(np.float32))
    prod = np.asarray(w.occlusion_product(alpha, jnp.asarray(occ)))
    assert (prod >= 0).all() and (prod <= 1 + 1e-6).all()
    # fully transparent layers never occlude
    prod0 = np.asarray(w.occlusion_product(jnp.zeros_like(alpha), jnp.asarray(occ)))
    assert np.allclose(prod0, 1.0)


def test_input_to_output_single_ctx_identity_flow():
    """Zero flow + full alpha: fused output equals the context frame."""
    w, cfg = make_warper()
    cfg.model.sample_precision = "float32"  # exact-identity check
    w = Warper(cfg)
    b, tc, tp = 1, 2, 3
    h, wd = 32, 64
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(b, 4, h, wd, 5).astype(np.float32))
    flow = jnp.zeros((b, tc, tp, h, wd, 2))
    alpha = jnp.ones((b, tc, tp, h, wd, 3))  # all layers opaque (in [-1,1]: 1)
    ctx_ts = jnp.broadcast_to(jnp.arange(tc)[None, :, None], (b, tc, tp))
    out, raw = w.input_to_output(x, alpha, flow, ctx_ts)
    # fused output = average of ctx frames 0 and 1 (equal scores)
    expected = (np.asarray(x)[:, 0] + np.asarray(x)[:, 1]) / 2
    assert np.allclose(np.asarray(out)[..., :5][:, 0], expected, atol=1e-5)
    assert raw.shape == (b, tc, tp, h, wd, 5 + 3)


def test_grid_to_flow_hd_window_is_exact():
    """hd_window slices per-frame HD work to the gathered frames; the
    gathered outputs (flow/alpha_ctx/disocc and the fused output) must be
    bit-identical to the full-window computation."""
    w, cfg = make_warper(num_obj=2)
    cfg.load_dim = 64  # exercise the HD upsample path (scale_hd = 2)
    w2 = Warper(cfg)
    rng = np.random.RandomState(0)
    b, t, tc, tp = 1, 3, 2, 2
    no = 2
    h, wd = 32, 64
    hd, wdd = 64, 128
    ho, wo = w2.tgt_shape
    grids = WarpGrids(
        jnp.asarray(rng.rand(b, t, no, ho, wo, 2) * 2 - 1, jnp.float32),
        jnp.asarray(rng.rand(b, t, no, h, wd, 2) * 2 - 1, jnp.float32),
        jnp.asarray(rng.rand(b, t, h, wd, 2) * 2 - 1, jnp.float32),
        jnp.asarray(rng.rand(b, t, h, wd, 2) * 2 - 1, jnp.float32),
    )
    x = jnp.asarray(rng.rand(b, t, hd, wdd, 3 + 4) * 2 - 1, jnp.float32)
    occ = jnp.asarray(rng.rand(b, t, no + 1, no + 1), jnp.float32)
    obj_alpha = jnp.asarray(rng.rand(b, no, ho, wo, 1) * 2 - 1, jnp.float32)
    bg_alpha = jnp.asarray(rng.rand(b, h, wd, 1) * 2 - 1, jnp.float32)
    cls = jnp.asarray(rng.rand(b, no, 4), jnp.float32)
    ctx_ts = jnp.broadcast_to(jnp.arange(tc)[None, :, None], (b, tc, tp))
    pred_ts = jnp.arange(t - tp, t)

    full = w2.grid_to_flow(x, grids, occ, obj_alpha, bg_alpha, cls,
                           ctx_ts, pred_ts)
    sliced = w2.grid_to_flow(x, grids, occ, obj_alpha, bg_alpha, cls,
                             ctx_ts, pred_ts, hd_window=tc)
    # flow, alpha_ctx, disocc identical (alpha/alpha_unflt legitimately
    # carry only tc frames in the sliced call)
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(sliced[0]))
    np.testing.assert_array_equal(np.asarray(full[3]), np.asarray(sliced[3]))
    np.testing.assert_array_equal(np.asarray(full[4]), np.asarray(sliced[4]))
    np.testing.assert_array_equal(np.asarray(full[1][:, :tc]),
                                  np.asarray(sliced[1]))


def _grid_to_flow_case(restrict_to_ctx, precision):
    w, cfg = make_warper(num_obj=2)
    cfg.load_dim = 64
    cfg.model.sample_precision = precision
    w2 = Warper(cfg)
    rng = np.random.RandomState(1)
    b, t, tc, tp = 1, 3, 2, 2
    no = 2
    h, wd = 32, 64
    hd, wdd = 64, 128
    ho, wo = w2.tgt_shape
    grids = WarpGrids(
        jnp.asarray(rng.rand(b, t, no, ho, wo, 2) * 2 - 1, jnp.float32),
        jnp.asarray(rng.rand(b, t, no, h, wd, 2) * 2 - 1, jnp.float32),
        jnp.asarray(rng.rand(b, t, h, wd, 2) * 2 - 1, jnp.float32),
        jnp.asarray(rng.rand(b, t, h, wd, 2) * 2 - 1, jnp.float32),
    )
    x = jnp.asarray(rng.rand(b, t, hd, wdd, 3 + 4) * 2 - 1, jnp.float32)
    occ = jnp.asarray(rng.rand(b, t, no + 1, no + 1), jnp.float32)
    obj_alpha = jnp.asarray(rng.rand(b, no, ho, wo, 1) * 2 - 1, jnp.float32)
    bg_alpha = jnp.asarray(rng.rand(b, h, wd, 1) * 2 - 1, jnp.float32)
    cls = jnp.asarray(rng.rand(b, no, 4), jnp.float32)
    ctx_ts = jnp.broadcast_to(jnp.arange(tc)[None, :, None], (b, tc, tp))
    pred_ts = jnp.arange(t - tp, t)
    return w2, (x, grids, occ, obj_alpha, bg_alpha, cls, ctx_ts, pred_ts)


@pytest.mark.parametrize("restrict_to_ctx", [False, True])
def test_grid_to_flow_ctx_uniform_matches_unfused(restrict_to_ctx):
    """ctx_uniform=True (the fused alpha_ctx warp; jnp composition fallback
    off-TPU) must match the standard gather+sample+occlude+reduce path.
    restrict_to_ctx=True additionally exercises the is_obj ghost masks."""
    w2, args = _grid_to_flow_case(restrict_to_ctx, "float32")
    base = w2.grid_to_flow(*args, restrict_to_ctx=restrict_to_ctx,
                           hd_window=2)
    fused = w2.grid_to_flow(*args, restrict_to_ctx=restrict_to_ctx,
                            hd_window=2, ctx_uniform=True)
    names = ("flow", "alpha_unflt", "alpha", "alpha_ctx", "disocc")
    for name, a, bb in zip(names, base, fused):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            atol=2e-5, rtol=1e-4, err_msg=name)


def test_grid_to_flow_ctx_uniform_fast_mode():
    """fast (bf16) sample precision: the fused path tracks the unfused one
    within the advertised bf16 tolerance."""
    w2, args = _grid_to_flow_case(False, "fast")
    base = w2.grid_to_flow(*args, hd_window=2)
    fused = w2.grid_to_flow(*args, hd_window=2, ctx_uniform=True)
    for name, a, bb in zip(("flow", "alpha_ctx", "disocc"),
                           (base[0], base[3], base[4]),
                           (fused[0], fused[3], fused[4])):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            atol=3e-2, rtol=1e-2, err_msg=name)
