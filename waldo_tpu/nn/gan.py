"""GAN losses, spectral norm, and the inpainting discriminator.

Re-design of reference models/modules/gan_loss.py:8-284 (original/hinge/
logistic/wgan/wgan-eps over logits or lists of logits) and spectral.py
(power-iteration spectral norm; flax SpectralNorm covers the "sn" variant,
the "improved" isn variant of arXiv:2107.04589 is implemented here).

The reference references `net_id` without ever constructing it
(synthesizer.py:161-167 — a release defect); here `Discriminator` is a
concrete conv stack with hinge loss as the default (options.py:588).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .init import conv_kwargs
from .transform import CustomNorm


# ---------------------------------------------------------------------------
# losses on logits (pure functions; lists of multi-scale logits supported)
# ---------------------------------------------------------------------------

def _map_logits(fn, d):
    if isinstance(d, (list, tuple)):
        return jnp.stack([fn(x) for x in d]).mean()
    return fn(d)


def _bce_with_logits(logits, target):
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def original_g_loss(d_fake):
    return _map_logits(lambda d: _bce_with_logits(d, jnp.ones_like(d)).mean(), d_fake)


def original_d_loss(d_real, d_fake):
    lr = _map_logits(lambda d: _bce_with_logits(d, jnp.ones_like(d)).mean(), d_real)
    lf = _map_logits(lambda d: _bce_with_logits(d, jnp.zeros_like(d)).mean(), d_fake)
    return lr + lf


def hinge_g_loss(d_fake):
    return _map_logits(lambda d: (-d).mean(), d_fake)


def hinge_d_loss(d_real, d_fake):
    lr = _map_logits(lambda d: jax.nn.relu(1.0 - d).mean(), d_real)
    lf = _map_logits(lambda d: jax.nn.relu(1.0 + d).mean(), d_fake)
    return lr + lf


def logistic_g_loss(d_fake):
    return _map_logits(lambda d: jax.nn.softplus(-d).mean(), d_fake)


def logistic_d_loss(d_real, d_fake):
    lr = _map_logits(lambda d: jax.nn.softplus(-d).mean(), d_real)
    lf = _map_logits(lambda d: jax.nn.softplus(d).mean(), d_fake)
    return lr + lf


def wgan_g_loss(d_fake):
    return _map_logits(lambda d: (-d).mean(), d_fake)


def wgan_d_loss(d_real, d_fake, gradient_penalty=0.0, lambda_gp=10.0, eps_penalty=0.0):
    lr = _map_logits(lambda d: (-d).mean(), d_real)
    lf = _map_logits(lambda d: d.mean(), d_fake)
    return lr + lf + lambda_gp * gradient_penalty + eps_penalty


def wgan_gradient_penalty(disc_apply, params, x_real, x_fake, rng):
    """Standard WGAN-GP interpolate-and-norm penalty (gan_loss.py wgan variant)."""
    eps = jax.random.uniform(rng, (x_real.shape[0],) + (1,) * (x_real.ndim - 1))
    x_hat = eps * x_real + (1 - eps) * x_fake

    def score(x):
        d = disc_apply(params, x)
        return d.sum() if not isinstance(d, (list, tuple)) else sum(di.sum() for di in d)

    g = jax.grad(score)(x_hat)
    norms = jnp.sqrt((g.reshape(g.shape[0], -1) ** 2).sum(-1) + 1e-12)
    return ((norms - 1.0) ** 2).mean()


GAN_LOSSES = {
    "original": (original_g_loss, original_d_loss),
    "hinge": (hinge_g_loss, hinge_d_loss),
    "logistic": (logistic_g_loss, logistic_d_loss),
    "wgan": (wgan_g_loss, wgan_d_loss),
    "wgan-eps": (wgan_g_loss, wgan_d_loss),
}


def get_gan_loss(name: str):
    return GAN_LOSSES[name]


# ---------------------------------------------------------------------------
# spectral norm
# ---------------------------------------------------------------------------

class ImprovedSpectralDense(nn.Module):
    """Dense layer with improved spectral normalization (arXiv:2107.04589):
    weight scaled by its spectral norm at init relative to the running one,
    approximated with one power iteration per call (reference spectral.py)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        in_f = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.truncated_normal(0.02),
                            (in_f, self.features))
        u = self.variable("spectral", "u", nn.initializers.normal(1.0),
                          self.make_rng("params") if self.is_initializing() else None,
                          (self.features,))
        sigma_init = self.variable("spectral", "sigma_init", lambda *_: jnp.ones(()), None)

        v = kernel @ u.value
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = kernel.T @ v
        u_norm = jnp.linalg.norm(u_new) + 1e-12
        sigma = u_norm
        if update_stats and not self.is_initializing():
            u.value = u_new / u_norm
        if self.is_initializing():
            sigma_init.value = jax.lax.stop_gradient(sigma)
        w = kernel / sigma * sigma_init.value
        y = x @ w
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


def spectral_dense(kind: str, features: int, **kw):
    """Factory matching reference get_spectral_norm semantics (spectral.py:17-23)."""
    if kind == "sn":
        return nn.SpectralNorm(nn.Dense(features, **kw))
    if kind == "isn":
        return ImprovedSpectralDense(features)
    return nn.Dense(features, **kw)


# ---------------------------------------------------------------------------
# discriminator (net_id)
# ---------------------------------------------------------------------------

class Discriminator(nn.Module):
    """Patch-style conv discriminator for the adversarial inpainting path.

    The reference never ships a concrete net_id (defect, synthesizer.py:165);
    this is a standard stride-2 LeakyReLU conv stack emitting patch logits.
    """

    base_dim: int = 64
    depth: int = 4

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = nn.Conv(self.base_dim * (2 ** i), (4, 4), strides=2, padding=1,
                        **conv_kwargs())(x)
            if i > 0:
                x = CustomNorm("ln2d")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (4, 4), strides=1, padding=1, **conv_kwargs())(x)
