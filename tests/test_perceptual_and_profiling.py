"""Structure tests for perceptual modules and the profiling subsystem."""
import numpy as np
import jax
import jax.numpy as jnp


def test_alexnet_lpips_structure():
    from waldo_tpu.eval.lpips import AlexFeatures, LPIPS, _normalize_feat

    net = AlexFeatures()
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(params, x)
    assert len(feats) == 5
    assert [f.shape[-1] for f in feats] == [64, 192, 384, 256, 256]
    # distance with random lin weights: zero for identical inputs
    lin = [np.ones(f.shape[-1], np.float32) for f in feats]
    lp = LPIPS("alex", params, lin)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    assert np.allclose(np.asarray(lp(a, a)), 0.0, atol=1e-5)
    b = jnp.clip(a + 0.5, -1, 1)
    assert (np.asarray(lp(a, b)) > 0).all()


def test_vgg19_feature_slices():
    from waldo_tpu.nn.perceptual import VGG19Features, VGGLoss

    net = VGG19Features()
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(params, x)
    assert len(feats) == 5
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512, 512]
    loss = VGGLoss(params)
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    assert float(loss(a, a)) < 1e-6
    assert float(loss(a, a * 0.5)) > 0


def test_profiling_memory_stats():
    from waldo_tpu.utils.profiling import memory_stats, annotate

    with annotate("test_region"):
        _ = jnp.ones((8, 8)).sum()
    stats = memory_stats()
    assert isinstance(stats, dict)  # may be empty on CPU backend
