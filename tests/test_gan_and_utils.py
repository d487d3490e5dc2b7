"""GAN losses, utils parity helpers, discriminator training mode."""
import numpy as np
import jax
import jax.numpy as jnp


def test_gan_losses():
    from waldo_tpu.nn.gan import hinge_d_loss, hinge_g_loss, original_d_loss, logistic_g_loss

    d_real = jnp.asarray([2.0, 3.0])
    d_fake = jnp.asarray([-2.0, -3.0])
    # confident discriminator -> near-zero hinge loss
    assert float(hinge_d_loss(d_real, d_fake)) < 1e-3
    # generator wants high fake scores
    assert float(hinge_g_loss(d_fake)) > 0
    assert float(original_d_loss(d_real, d_fake)) < 0.2
    assert float(logistic_g_loss(jnp.asarray([10.0]))) < 1e-3
    # multi-scale list support
    assert np.isfinite(float(hinge_d_loss([d_real, d_real], [d_fake, d_fake])))


def test_patch_roundtrip():
    from waldo_tpu.utils.shapes import to_patch, from_patch

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 16, 3).astype(np.float32))
    p = to_patch(x, 4)
    assert p.shape == (2, 8, 4, 4, 3)
    back = from_patch(p, (2, 8, 16, 3))
    assert np.allclose(np.asarray(back), np.asarray(x))


def test_onehot_soften():
    from waldo_tpu.utils.shapes import onehot, soften

    soft = jnp.asarray([[0.1, 0.7, 0.2], [0.9, 0.05, 0.05]])
    hard = np.asarray(onehot(soft))
    assert np.array_equal(hard, [[0, 1, 0], [1, 0, 0]])
    st = onehot(soft, straight_through=True)
    g = jax.grad(lambda s: onehot(s, straight_through=True).sum())(soft)
    assert np.allclose(np.asarray(g), 1.0)  # straight-through gradient
    assert np.array_equal(np.asarray(soften(jnp.asarray([2, 0]), 3)),
                          [[0, 0, 1], [1, 0, 0]])


def test_discriminator_train_mode(tmp_path):
    from tests.test_train import train_cfg
    from waldo_tpu.train import Trainer

    cfg = train_cfg(tmp_path, use_ii=True, vid_modes=["vid_inpainting"])
    cfg.model.vid_inpainting_losses = ["sharp_vid", "adv", "dis"]
    tr = Trainer(cfg)
    assert "id" in tr.states
    assert "vid_inpainting_dis" in tr._steps
    tr.run(num_iter=2)  # generator + discriminator steps both execute
