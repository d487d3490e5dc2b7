"""Metric tests: self-identity, degradation ordering, torch-free references."""
import numpy as np
import jax.numpy as jnp

from waldo_tpu.eval import ssim, psnr, ms_ssim


def _imgs():
    rng = np.random.RandomState(0)
    a = rng.rand(2, 64, 64, 3).astype(np.float32)
    noise = rng.randn(2, 64, 64, 3).astype(np.float32)
    b_small = np.clip(a + 0.02 * noise, 0, 1)
    b_big = np.clip(a + 0.2 * noise, 0, 1)
    return jnp.asarray(a), jnp.asarray(b_small), jnp.asarray(b_big)


def test_ssim_identity_and_ordering():
    a, b_small, b_big = _imgs()
    assert np.allclose(np.asarray(ssim(a, a)), 1.0, atol=1e-4)
    s_small = np.asarray(ssim(b_small, a))
    s_big = np.asarray(ssim(b_big, a))
    assert (s_small > s_big).all()
    assert (s_small > 0.8).all() and (s_big < s_small.min()).all()


def test_psnr_values():
    a, b_small, b_big = _imgs()
    p_small = np.asarray(psnr(b_small, a))
    p_big = np.asarray(psnr(b_big, a))
    assert (p_small > p_big).all()
    # psnr for known mse
    mse = float(((b_small - a) ** 2).mean())
    expected = 10 * np.log10(1.0 / (((np.asarray(b_small) - np.asarray(a)) ** 2).mean(axis=(1, 2, 3))))
    assert np.allclose(p_small, expected, atol=1e-3)


def test_msssim_identity_and_ordering():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(1, 192, 192, 3).astype(np.float32))
    assert np.asarray(ms_ssim(a, a))[0] > 0.999
    noisy = jnp.clip(a + 0.1 * jnp.asarray(rng.randn(1, 192, 192, 3).astype(np.float32)), 0, 1)
    v = float(ms_ssim(noisy, a)[0])
    assert 0.0 < v < 0.999
