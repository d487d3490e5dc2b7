"""MAT generator + inpainting pipeline tests (tiny resolutions, CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_mat_generator_smoke():
    from waldo_tpu.models.mat import Generator

    net = Generator(img_resolution=128)
    x = jnp.zeros((1, 128, 128, 3))
    m = jnp.ones((1, 128, 128, 1))
    z = jnp.zeros((1, 512))
    params = net.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                      x, m, z, noise_mode="const")
    out = net.apply(params, x, m, z, noise_mode="const")
    assert out.shape == (1, 128, 128, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_mat_keeps_valid_pixels():
    """Ensemble constraint: img = gen*(1-mask) + input*mask (mat.py:793,856)."""
    from waldo_tpu.models.mat import Generator

    net = Generator(img_resolution=128)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32) * 2 - 1)
    mask = np.ones((1, 128, 128, 1), np.float32)
    mask[:, 40:80, 40:80] = 0  # hole
    mask = jnp.asarray(mask)
    z = jnp.zeros((1, 512))
    params = net.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                      x, mask, z, noise_mode="const")
    out = np.asarray(net.apply(params, x, mask, z, noise_mode="const"))
    keep = np.asarray(mask)[0, :, :, 0] > 0.5
    assert np.allclose(out[0][keep], np.asarray(x)[0][keep], atol=1e-5)


def test_point_in_polygon_matches_matplotlib_semantics():
    from waldo_tpu.models.mat_pipeline import point_in_polygon

    h, w = 16, 16
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    pts = jnp.asarray(np.stack([xx, yy], -1)[None])
    corners = [(3, 3), (3, 12), (12, 12), (12, 3)]
    mask = np.asarray(point_in_polygon(pts, corners))[0, :, :, 0]
    assert mask[8, 8] == 1
    assert mask[0, 0] == 0
    assert mask[14, 8] == 0
    # interior fraction roughly matches polygon area
    assert 0.2 < mask.mean() < 0.4


def test_expand_mask():
    from waldo_tpu.models.mat.inpainter import expand_mask

    m = np.zeros((1, 9, 9, 1), np.float32)
    m[0, 4, 4] = 1
    out = np.asarray(expand_mask(jnp.asarray(m), num=2))
    assert out[0, 4, 4, 0] == 1 and out[0, 2, 4, 0] == 1 and out[0, 4, 2, 0] == 1
    # note: sequential directional dilation fills the full (2k+1)^2 square
    assert out[0, 3, 3, 0] == 1
    assert out[0, 1, 4, 0] == 0
