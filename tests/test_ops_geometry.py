"""Geometry-core unit tests, cross-checked against torch CPU where possible."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from waldo_tpu.ops import (
    get_grid,
    get_gaussian_kernel,
    grid_sample,
    TPSWarp,
    InverseWarp,
    resize,
    gaussian_blur,
    EdgeExtractor,
    bias_act,
    upfirdn2d,
    setup_filter,
)


def test_get_grid_matches_reference_convention():
    g = np.asarray(get_grid(4, 8))
    assert g.shape == (4, 8, 2)
    # pixel centers: x_j = -1 + (2j+1)/W
    assert np.allclose(g[0, 0, 0], -1 + 1 / 8)
    assert np.allclose(g[0, -1, 0], 1 - 1 / 8)
    assert np.allclose(g[0, 0, 1], -1 + 1 / 4)
    assert np.allclose(g[-1, 0, 1], 1 - 1 / 4)


def test_grid_sample_matches_torch():
    rng = np.random.RandomState(0)
    img = rng.randn(2, 7, 9, 3).astype(np.float32)
    grid = (rng.rand(2, 5, 6, 2).astype(np.float32) * 2.4 - 1.2)  # incl. out of bounds

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    theirs = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    assert np.allclose(ours, theirs, atol=1e-5), np.abs(ours - theirs).max()


def test_grid_sample_identity():
    rng = np.random.RandomState(1)
    img = rng.randn(1, 8, 16, 2).astype(np.float32)
    grid = np.asarray(get_grid(8, 16))[None]
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    assert np.allclose(out, img, atol=1e-5)


def test_grid_sample_grad_flows():
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(1, 8, 8, 1).astype(np.float32))
    grid = jnp.asarray(rng.rand(1, 4, 4, 2).astype(np.float32) - 0.5)

    def loss(g):
        return grid_sample(img, g).sum()

    g = jax.grad(loss)(grid)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_tps_exact_at_control_points_identity():
    # identity control points -> identity mapping
    tgt_pts = np.asarray(get_grid(4, 4)).reshape(-1, 2)
    tps = TPSWarp(32, 32, tgt_pts)
    grid = np.asarray(tps(jnp.asarray(tgt_pts)[None]))
    ident = np.asarray(get_grid(32, 32))
    assert np.allclose(grid[0], ident, atol=1e-4), np.abs(grid[0] - ident).max()


def test_tps_interpolates_control_points_exactly():
    # when the dense output grid coincides with the control points, the
    # mapping must reproduce src_pts exactly (TPS interpolation property)
    tgt_pts = np.asarray(get_grid(4, 4)).reshape(-1, 2)
    tps = TPSWarp(4, 4, tgt_pts)
    rng = np.random.RandomState(0)
    src = (tgt_pts[None] + 0.1 * rng.randn(3, 16, 2)).astype(np.float32)
    out = np.asarray(tps(jnp.asarray(src))).reshape(3, -1, 2)
    assert np.allclose(out, src, atol=1e-4), np.abs(out - src).max()


def test_tps_matches_torch_reference():
    """Replicate the reference TPSWarp math in torch and compare."""
    def torch_tps(tgt_h, tgt_w, tgt_pts, src_pts):
        def kd(p1, p2, eps=1e-8):
            n, m = p1.size(0), p2.size(0)
            d = (p1 ** 2).sum(-1).view(n, 1) + (p2 ** 2).sum(-1).view(1, m) - 2 * p1 @ p2.t()
            return 0.5 * d * d.add(eps).log()

        n = tgt_pts.size(0)
        fk = torch.zeros(n + 3, n + 3)
        fk[:n, :n] = kd(tgt_pts, tgt_pts)
        fk[:n, -3] = 1
        fk[-3, :n] = 1
        fk[:n, -2:] = tgt_pts
        fk[-2:, :n] = tgt_pts.t()
        ik = torch.inverse(fk)
        x = torch.linspace(-1 + 1 / tgt_w, 1 - 1 / tgt_w, tgt_w)
        y = torch.linspace(-1 + 1 / tgt_h, 1 - 1 / tgt_h, tgt_h)
        gx = x.view(1, -1).expand(tgt_h, -1)
        gy = y.view(-1, 1).expand(-1, tgt_w)
        grid = torch.stack([gx, gy], -1).view(-1, 2)
        repr_ = torch.cat([kd(grid, tgt_pts), torch.ones(grid.size(0), 1), grid], 1)
        b = src_pts.size(0)
        xpad = torch.cat([src_pts, torch.zeros(b, 3, 2)], 1)
        mapping = ik @ xpad
        return (repr_ @ mapping).view(b, tgt_h, tgt_w, 2)

    rng = np.random.RandomState(3)
    tgt_pts = np.asarray(get_grid(4, 4)).reshape(-1, 2).astype(np.float32)
    src_pts = (tgt_pts[None] + 0.1 * rng.randn(2, 16, 2)).astype(np.float32)

    ours = np.asarray(TPSWarp(16, 24, tgt_pts)(jnp.asarray(src_pts)))
    theirs = torch_tps(16, 24, torch.from_numpy(tgt_pts), torch.from_numpy(src_pts)).numpy()
    assert np.allclose(ours, theirs, atol=1e-3), np.abs(ours - theirs).max()


def test_inverse_warp_roundtrip_translation():
    """A small constant translation should invert to (approximately) its negation."""
    h, w = 32, 32
    iw = InverseWarp(h, w, h, w)
    shift = 4 / (w / 2)  # 4 pixels in normalized units
    src = np.asarray(get_grid(h, w))[None] + np.array([shift, 0], np.float32)
    inv = np.asarray(iw(jnp.asarray(src)))
    ident = np.asarray(get_grid(h, w))
    # interior pixels that received scatter should have inverse displacement -shift
    interior = inv[0, 12:20, 12:20]
    assert np.allclose(interior - ident[12:20, 12:20], [-shift, 0], atol=1e-3)


def test_inverse_warp_iterative_roundtrip_and_unmapped():
    """Fixed-point (fast) inversion: constant translation inverts to its
    negation in the interior, and an all-off-grid warp marks every pixel
    far out of bounds via the last-step convergence mask (no separate
    residual sample)."""
    h, w = 32, 32
    iw = InverseWarp(h, w, h, w)
    shift = 4 / (w / 2)
    src = np.asarray(get_grid(h, w))[None] + np.array([shift, 0], np.float32)
    inv = np.asarray(iw.iterative(jnp.asarray(src)))
    ident = np.asarray(get_grid(h, w))
    interior = inv[0, 12:20, 12:20]
    assert np.allclose(interior - ident[12:20, 12:20], [-shift, 0], atol=1e-3)

    src = np.asarray(get_grid(h, w))[None] + 3.0
    inv = np.asarray(iw.iterative(jnp.asarray(src)))
    assert (np.abs(inv) > 1.5).all() and np.isfinite(inv).all()


def test_inverse_warp_iterative_mixed_precision_schedule():
    """precision="fast" (bf16 intermediate iterations, f32 final — the bench
    numerics since r5) must agree with the all-f32 schedule: exactly on CPU
    (matmuls are f32 either way), and within the fixed-point contraction
    bound generally. Also pins the Warper plumbing: sample_precision="fast"
    reaches the inversion."""
    rng = np.random.RandomState(3)
    h, w = 24, 40
    iw = InverseWarp(h, w, 32, 48)
    tgt_pts = np.asarray(get_grid(4, 4)).reshape(-1, 2).astype(np.float32)
    pose = tgt_pts[None] * 0.7 + 0.05 * rng.randn(3, 16, 2).astype(np.float32)
    src = jnp.asarray(np.asarray(TPSWarp(h, w, tgt_pts)(jnp.asarray(pose))))
    f32 = np.asarray(iw.iterative(src, precision="float32"))
    fast = np.asarray(iw.iterative(src, precision="fast"))
    both_valid = (np.abs(f32) <= 1.5) & (np.abs(fast) <= 1.5)
    mask_agree = ((np.abs(f32) > 1.5) == (np.abs(fast) > 1.5)).mean()
    assert mask_agree >= 0.995, mask_agree
    err = np.abs(np.where(both_valid, f32 - fast, 0.0))
    assert err.max() <= 5e-3, err.max()  # contraction bound; 0 on CPU


def test_inverse_warp_unmapped_is_out_of_bounds():
    h, w = 16, 16
    iw = InverseWarp(h, w, h, w)
    # translation pushing everything off-grid: no target pixel is ever hit,
    # so every output must be marked far out of bounds (reference warp.py:164-167)
    src = np.asarray(get_grid(h, w))[None] + 3.0
    inv = np.asarray(iw(jnp.asarray(src), erode=False))
    assert (np.abs(inv) > 1.5).all()
    assert np.isfinite(inv).all()


def test_resize_matches_torch_bilinear():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 8, 12, 3).astype(np.float32)
    ours = np.asarray(resize(jnp.asarray(x), scale_factor=0.5))
    theirs = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=0.5, mode="bilinear"
    ).permute(0, 2, 3, 1).numpy()
    assert np.allclose(ours, theirs, atol=1e-5), np.abs(ours - theirs).max()
    ours2 = np.asarray(resize(jnp.asarray(x), scale_factor=2))
    theirs2 = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="bilinear"
    ).permute(0, 2, 3, 1).numpy()
    assert np.allclose(ours2, theirs2, atol=1e-5)
    # integer-factor fast path (phase decomposition, no gathers): even and
    # odd factors, incl. the HD predict geometry's x4
    for f in (3, 4):
        ours_f = np.asarray(resize(jnp.asarray(x), scale_factor=f))
        theirs_f = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=f, mode="bilinear"
        ).permute(0, 2, 3, 1).numpy()
        assert np.allclose(ours_f, theirs_f, atol=1e-5), (
            f, np.abs(ours_f - theirs_f).max())
    # mixed: integer up on H, non-integer on W takes the generic path
    ours_m = np.asarray(resize(jnp.asarray(x), shape=(16, 18)))
    theirs_m = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(16, 18), mode="bilinear"
    ).permute(0, 2, 3, 1).numpy()
    assert np.allclose(ours_m, theirs_m, atol=1e-5)


def test_gaussian_blur_matches_torchvision_formula():
    # torchvision GaussianBlur: g(i) = exp(-0.5*((i-c)/sigma)^2), normalized,
    # applied separably with reflect padding — replicated here with torch conv2d
    rng = np.random.RandomState(5)
    k, sigma = 5, 2.0
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    ours = np.asarray(gaussian_blur(jnp.asarray(x), sigma=sigma, kernel_size=k))

    half = (k - 1) * 0.5
    g = np.exp(-0.5 * ((np.linspace(-half, half, k)) / sigma) ** 2)
    g = (g / g.sum()).astype(np.float32)
    k2 = np.outer(g, g)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    xt = F.pad(xt, [k // 2] * 4, mode="reflect")
    w2 = torch.from_numpy(np.tile(k2[None, None], (3, 1, 1, 1)))
    theirs = F.conv2d(xt, w2, groups=3).permute(0, 2, 3, 1).numpy()
    assert np.allclose(ours, theirs, atol=1e-5), np.abs(ours - theirs).max()


def test_edge_extractor_basic():
    # vertical motion boundary -> edge response along the boundary column
    flow = np.zeros((1, 16, 16, 2), np.float32)
    flow[:, :, 8:, 0] = 1.0
    edge, dominant = EdgeExtractor(kernel_size=3)(jnp.asarray(flow))
    edge = np.asarray(edge)[0, :, :, 0]
    assert edge[:, 7:9].mean() > 5 * edge[:, :4].mean()
    assert np.asarray(dominant).shape == (1, 16, 16, 1)


def test_bias_act_matches_reference_semantics():
    rng = np.random.RandomState(6)
    x = rng.randn(4, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    out = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), act="lrelu"))
    ref = F.leaky_relu(torch.from_numpy(x) + torch.from_numpy(b), 0.2).numpy() * np.sqrt(2)
    assert np.allclose(out, ref, atol=1e-5)
    out = np.asarray(bias_act(jnp.asarray(x), None, act="linear", clamp=0.5))
    assert np.abs(out).max() <= 0.5


def test_upfirdn2d_matches_torch_reference():
    def torch_upfirdn2d_ref(x, f, up=1, down=1, padding=(0, 0, 0, 0), gain=1, flip_filter=False):
        b, c, ih, iw = x.shape
        upx = upy = up
        downx = downy = down
        padx0, padx1, pady0, pady1 = padding
        x = x.reshape(b, c, ih, 1, iw, 1)
        x = F.pad(x, [0, upx - 1, 0, 0, 0, upy - 1])
        x = x.reshape(b, c, ih * upy, iw * upx)
        x = F.pad(x, [max(padx0, 0), max(padx1, 0), max(pady0, 0), max(pady1, 0)])
        x = x[:, :, max(-pady0, 0): x.shape[2] - max(-pady1, 0), max(-padx0, 0): x.shape[3] - max(-padx1, 0)]
        f = f * (gain ** (f.ndim / 2))
        if not flip_filter:
            f = f.flip(list(range(f.ndim)))
        f = f[None, None].repeat(c, 1, 1, 1)
        x = F.conv2d(x, f, groups=c)
        return x[:, :, ::downy, ::downx]

    rng = np.random.RandomState(7)
    x = rng.randn(2, 3, 9, 11).astype(np.float32)  # torch NCHW
    f = np.asarray(setup_filter([1, 3, 3, 1]))

    for up, down, pad in [(1, 1, (1, 1, 1, 1)), (2, 1, (2, 1, 2, 1)), (1, 2, (1, 1, 1, 1)), (2, 2, (1, 2, 3, 0)), (1, 1, (-1, 2, 0, -1))]:
        ours = np.asarray(
            upfirdn2d(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(f), up=up, down=down, padding=pad)
        ).transpose(0, 3, 1, 2)
        theirs = torch_upfirdn2d_ref(torch.from_numpy(x), torch.from_numpy(np.asarray(f)), up, down, pad).numpy()
        assert ours.shape == theirs.shape, (up, down, pad, ours.shape, theirs.shape)
        assert np.allclose(ours, theirs, atol=1e-4), (up, down, pad, np.abs(ours - theirs).max())


def test_pallas_grid_sample_matches_ref_multichannel():
    """v2 Pallas sampler (channel grid axis + row-chunk culling) must match
    the gather reference bit-closely, including zero padding outside, for
    C=1 and C>1 (interpret mode: runs on CPU)."""
    import numpy as np
    import jax.numpy as jnp
    from waldo_tpu.ops.grid_sample import grid_sample_ref
    from waldo_tpu.ops.pallas.grid_sample import grid_sample_pallas

    rng = np.random.RandomState(0)
    for b, h, w, c, gh, gw in [(2, 64, 96, 1, 17, 9), (1, 128, 64, 5, 33, 41),
                               (2, 64, 128, 3, 8, 16)]:
        img = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        # grid spanning in-bounds and far out-of-bounds coords
        grid = jnp.asarray((rng.rand(b, gh, gw, 2) * 3 - 1.5).astype(np.float32))
        want = np.asarray(grid_sample_ref(img, grid))
        got = np.asarray(grid_sample_pallas(img, grid, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4,
                                   err_msg=str((b, h, w, c)))


def test_pallas_bias_act_matches_jnp():
    """set_impl('pallas') hook is real: kernel matches the jnp path for every
    activation in the table (interpret mode: runs on CPU)."""
    import numpy as np
    import jax.numpy as jnp
    from waldo_tpu.ops.bias_act import bias_act, _ACTS
    from waldo_tpu.ops.pallas.bias_act import bias_act_pallas

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 7, 130).astype(np.float32) * 3)
    b = jnp.asarray(rng.randn(130).astype(np.float32))
    for act in _ACTS:
        want = np.asarray(bias_act(x, b, act=act, gain=1.3, clamp=2.5))
        got = np.asarray(bias_act_pallas(x, b, act=act, gain=1.3, clamp=2.5,
                                         interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5, err_msg=act)
    # no-bias + default gain path
    want = np.asarray(bias_act(x, None, act="lrelu"))
    got = np.asarray(bias_act_pallas(x, None, act="lrelu",
                                     gain=float(_ACTS["lrelu"][1]), interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_mxu_scan_path_grad_matches_vmap_path():
    """The group-scan branch of grid_sample_mxu must produce the same values
    AND gradients as the vmap branch — with jax.checkpoint on the scan body
    (without it, the scan saves the (P, W) hat matrices as grad residuals:
    32 GB at flagship LVD-training shapes)."""
    import sys

    import jax
    import jax.numpy as jnp

    import waldo_tpu.ops.grid_sample  # noqa: F401

    gs = sys.modules["waldo_tpu.ops.grid_sample"]
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(6, 16, 24, 2).astype(np.float32))
    grid = jnp.asarray(rng.rand(6, 10, 12, 2).astype(np.float32) * 1.6 - 0.8)

    def loss(im, gr):
        return (gs.grid_sample_mxu(im, gr) ** 2).sum()

    ref_val, ref_grads = jax.value_and_grad(loss, argnums=(0, 1))(img, grid)

    old = gs._SCAN_TRANSIENT_BYTES
    gs._SCAN_TRANSIENT_BYTES = 8192  # force group < b -> lax.map branch
    try:
        val, grads = jax.value_and_grad(loss, argnums=(0, 1))(img, grid)
    finally:
        gs._SCAN_TRANSIENT_BYTES = old

    assert np.allclose(float(val), float(ref_val), rtol=1e-5)
    for g, rg in zip(grads, ref_grads):
        assert np.allclose(np.asarray(g), np.asarray(rg), atol=1e-5)


def test_pallas_grid_sample_per_channel_grids():
    """The multigrid form (img (B,H,W,C), grids (B,C,Ho,Wo,2)) must match C
    independent single-channel samples — the alpha_ctx warp's layout."""
    import jax.numpy as jnp

    from waldo_tpu.ops.pallas.grid_sample import grid_sample_pallas
    from waldo_tpu.ops.grid_sample import grid_sample_ref

    rng = np.random.RandomState(3)
    b, h, w, c, gh, gw = 2, 64, 128, 5, 48, 70
    img = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    grids = jnp.asarray(rng.rand(b, c, gh, gw, 2).astype(np.float32) * 2 - 1)
    out = grid_sample_pallas(img, grids, interpret=True)
    ref = jnp.stack(
        [grid_sample_ref(img[..., k:k + 1], grids[:, k])[..., 0]
         for k in range(c)], -1)
    assert np.abs(np.asarray(out - ref)).max() < 1e-5


def test_pallas_shared_grid_kc_split(monkeypatch):
    """Shared grids with a channel-block size that does NOT divide C
    (nblk > 1 + clamped, overlapping tail block — the c > 32 even-split
    path): idempotent tail recompute must still match the reference."""
    import jax.numpy as jnp

    from waldo_tpu.ops.pallas.grid_sample import grid_sample_pallas
    from waldo_tpu.ops.grid_sample import grid_sample_ref

    monkeypatch.setenv("WALDO_PALLAS_KC", "2")
    rng = np.random.RandomState(11)
    b, h, w, c, gh, gw = 1, 64, 128, 5, 40, 66
    img = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    grid = jnp.asarray((rng.rand(b, gh, gw, 2) * 2.4 - 1.2).astype(np.float32))
    want = np.asarray(grid_sample_ref(img, grid))
    got = np.asarray(grid_sample_pallas(img, grid, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_pallas_shared_texture_tp_mapping():
    """tp_sz texture-row mapping (context fusion): grid row i sampling
    texture row i // tp_sz must equal the materialized-duplication path
    (interpret mode: runs on CPU). Covers kc>1 channel blocks and the
    sparsity skip (one texture is all-zero)."""
    import jax.numpy as jnp

    from waldo_tpu.ops.pallas.grid_sample import grid_sample_pallas
    from waldo_tpu.ops.grid_sample import grid_sample_ref

    rng = np.random.RandomState(7)
    f, tp, h, w, c, gh, gw = 2, 3, 64, 128, 5, 40, 66
    img = rng.rand(f, h, w, c).astype(np.float32)
    img[1] = 0.0  # exercises the all-zero-texture skip flags
    img = jnp.asarray(img)
    grid = jnp.asarray((rng.rand(f * tp, gh, gw, 2) * 2.4 - 1.2).astype(np.float32))
    got = np.asarray(grid_sample_pallas(img, grid, interpret=True, tp_sz=tp))
    want = np.asarray(grid_sample_ref(jnp.repeat(img, tp, axis=0), grid))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_grid_sample_ctx_fallback_matches():
    """grid_sample_ctx off-TPU falls back to repeat + plain sampling and
    must equal per-row reference sampling of the mapped texture."""
    import jax.numpy as jnp

    from waldo_tpu.ops.grid_sample import grid_sample_ctx, grid_sample_ref

    rng = np.random.RandomState(8)
    f, tp, h, w, c, gh, gw = 2, 4, 32, 48, 3, 20, 26
    img = jnp.asarray(rng.rand(f, h, w, c).astype(np.float32))
    grid = jnp.asarray(rng.rand(f * tp, gh, gw, 2).astype(np.float32) * 2 - 1)
    out = np.asarray(grid_sample_ctx(img, grid, tp_sz=tp))
    want = np.asarray(grid_sample_ref(jnp.repeat(img, tp, axis=0), grid))
    np.testing.assert_allclose(out, want, atol=1e-5, rtol=1e-4)


def test_grid_sample_multigrid_fallback_matches():
    """CPU fallback of grid_sample_multigrid folds channels into batch."""
    import jax.numpy as jnp

    from waldo_tpu.ops.grid_sample import grid_sample_multigrid, grid_sample_ref

    rng = np.random.RandomState(4)
    b, h, w, c, gh, gw = 2, 32, 48, 3, 20, 26
    img = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    grids = jnp.asarray(rng.rand(b, c, gh, gw, 2).astype(np.float32) * 2 - 1)
    out = grid_sample_multigrid(img, grids)
    ref = jnp.stack(
        [grid_sample_ref(img[..., k:k + 1], grids[:, k])[..., 0]
         for k in range(c)], -1)
    assert np.abs(np.asarray(out - ref)).max() < 1e-5


def test_grid_sample_dispatch_envelope():
    """Guard the measured Pallas/MXU/gather crossover constants: every shape
    class routes to a branch whose output matches the reference gather path,
    so drift outside the measured envelope can cost speed but never
    correctness (VERDICT r2 weak #7)."""
    from waldo_tpu.ops.grid_sample import (
        auto_impl, grid_sample_mxu, grid_sample_ref)
    from waldo_tpu.ops.pallas.grid_sample import grid_sample_pallas

    # dispatch decisions across the envelope (shapes as (img, grid, backend))
    mk = lambda b, h, w, c, gh, gw: ((b, h, w, c), (b, gh, gw, 2))
    cases = {
        # HD fusion: src*c >= 2^19, big grid -> pallas on tpu
        (mk(40, 512, 1024, 23, 512, 1024) + ("tpu",)): "pallas",
        # same shape on cpu -> never pallas (src == 2^19 fits the mxu path)
        (mk(40, 512, 1024, 23, 512, 1024) + ("cpu",)): "mxu",
        # small source -> mxu
        (mk(4, 64, 128, 8, 64, 128) + ("tpu",)): "mxu",
        # giant source beyond 2^22 -> gather
        (mk(1, 4096, 2048, 4, 256, 512) + ("tpu",)): "gather",
        # tiny target grid -> not pallas (falls back to mxu)
        (mk(8, 256, 512, 8, 32, 64) + ("tpu",)): "mxu",
        # huge fold-in batch -> not pallas (mxu handles it per-image)
        (mk(512, 256, 512, 8, 256, 512) + ("tpu",)): "mxu",
    }
    for (img_s, grid_s, backend), want in cases.items():
        got = auto_impl(img_s, grid_s, backend)
        assert got == want, (img_s, grid_s, backend, got, want)

    # every branch agrees numerically on awkward boundary shapes, including
    # non-(32,128)-multiple outputs (edge-replicated pad lanes) and C>1
    rng = np.random.RandomState(0)
    for (b, h, w, c, gh, gw) in [(2, 24, 40, 3, 24, 40), (1, 16, 16, 1, 33, 129),
                                 (1, 40, 72, 5, 17, 51)]:
        img = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
        grid = jnp.asarray((rng.rand(b, gh, gw, 2) * 2.4 - 1.2).astype(np.float32))
        ref = np.asarray(grid_sample_ref(img, grid))
        mxu = np.asarray(grid_sample_mxu(img, grid))
        pal = np.asarray(grid_sample_pallas(img, grid, interpret=True))
        np.testing.assert_allclose(mxu, ref, atol=2e-5)
        np.testing.assert_allclose(pal, ref, atol=2e-5)


def test_warp_alpha_ctx_pallas_matches_ref():
    """Fused alpha_ctx kernel (sample + ghost mask + disocc max + occlusion
    product + flow reduction in one pass) must match the jnp composition,
    with and without is_obj ghost masks, on non-tile-aligned output shapes
    (interpret mode: runs on CPU)."""
    import jax.numpy as jnp

    from waldo_tpu.ops.grid_sample import _warp_alpha_ctx_ref
    from waldo_tpu.ops.pallas.grid_sample import warp_alpha_ctx_pallas

    rng = np.random.RandomState(7)
    b, tc, tp, c = 1, 2, 2, 3
    f, n, tcp = b * tc, b * tc * tp, tc * tp
    for (h, w, gh, gw), with_io, sparse in [((32, 128, 40, 130), True, False),
                                            ((24, 96, 32, 128), False, False),
                                            ((32, 128, 64, 128), True, True)]:
        alpha = jnp.asarray(rng.rand(f, h, w, c).astype(np.float32))
        if sparse:
            # exercise the v10 sparsity skip: channel 1 zero outside a
            # small quad (an object's warped footprint), channel 2 all-zero
            a = np.asarray(alpha).copy()
            a[:, :, :, 1] = 0.0
            a[:, 8:20, 32:80, 1] = rng.rand(f, 12, 48)
            a[:, :, :, 2] = 0.0
            alpha = jnp.asarray(a)
        grids = jnp.asarray(
            (rng.rand(n, c, gh, gw, 2) * 2.4 - 1.2).astype(np.float32))
        if sparse:
            # a fully out-of-range per-layer grid (skips via empty footprint)
            grids = grids.at[:2, 0].add(4.0)
        occ = jnp.asarray(rng.rand(n, c, c).astype(np.float32))
        io = (jnp.asarray((rng.rand(b * tp, c, gh, gw) > 0.3)
                          .astype(np.float32)) if with_io else None)
        want = _warp_alpha_ctx_ref(alpha, grids, occ, io,
                                   tp_sz=tp, tcp=tcp, precision="float32")
        got = warp_alpha_ctx_pallas(alpha, grids, occ, io, tp_sz=tp, tcp=tcp,
                                    precision="float32", interpret=True)
        for name, a, bb in zip(("alpha_occ", "disocc", "flow"), want, got):
            np.testing.assert_allclose(
                np.asarray(bb), np.asarray(a), atol=2e-5, rtol=1e-4,
                err_msg=f"{name} {h}x{w}->{gh}x{gw} io={with_io} "
                        f"sparse={sparse}")


def test_warp_alpha_ctx_dispatch_envelope():
    """Pin the fused-warp routing decisions across the measured envelope
    (companion of test_grid_sample_dispatch_envelope: drift outside it may
    cost speed but must never silently change the numerics path)."""
    from waldo_tpu.ops.grid_sample import warp_auto_impl

    mk = lambda f, h, w, c, n, gh, gw: ((f, h, w, c), (n, c, gh, gw, 2))
    cases = {
        # flagship HD predict (c=17 layers, Tc*Tp=40) -> pallas on tpu
        (mk(4, 512, 1024, 17, 40, 512, 1024) + ("tpu",)): "pallas",
        # same shape off-tpu -> composition
        (mk(4, 512, 1024, 17, 40, 512, 1024) + ("cpu",)): "ref",
        # flagship 256x512 (src*c = 2.2M >= 2^19) -> pallas
        (mk(4, 256, 512, 17, 40, 256, 512) + ("tpu",)): "pallas",
        # small source batch -> composition (MXU path wins below 2^19)
        (mk(4, 64, 128, 8, 40, 64, 128) + ("tpu",)): "ref",
        # giant source plane -> composition (gather territory)
        (mk(4, 4096, 2048, 4, 40, 256, 512) + ("tpu",)): "ref",
        # tiny output grid -> composition (tiles can't amortize)
        (mk(4, 512, 1024, 17, 40, 64, 128) + ("tpu",)): "ref",
        # too many programs for the SMEM bounds table -> composition
        (mk(130, 512, 1024, 17, 260, 512, 1024) + ("tpu",)): "ref",
    }
    for (a_s, g_s, backend), want in cases.items():
        got = warp_auto_impl(a_s, g_s, backend)
        assert got == want, (a_s, g_s, backend, got, want)
