"""MatInpainter — 512-crop blended MAT inference + checkpoint conversion.

Re-design of reference models/modules/mat.py:33-91: square inputs resize to
512x512; non-square inputs are processed as 3 overlapping 512-wide crops
blended with triangular weights. Mask semantics follow the reference: `mask`
is 1 where content must be SYNTHESIZED (the net receives 1-mask as its
keep-mask).

Pretrained Places_512_FullData.pkl weights can be converted offline with
`convert_mat_weights` (requires torch + the reference legacy loader on a
machine that has the pickle; no egress here). Without converted weights the
module runs with random init — structurally complete, visually meaningless.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.image import resize
from .mat import Generator


def expand_mask(mask, num=1):
    """Binary 4-neighborhood dilation of (..., H, W, 1) masks
    (reference tools/utils.py:300-323, hard path); any leading dims."""
    lead = mask.shape[:-3]
    h, w, c = mask.shape[-3:]
    m = (mask > 0.5).reshape((-1, h, w, c))
    for _ in range(num):
        m = (
            m
            | jnp.pad(m, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]
            | jnp.pad(m, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]
            | jnp.pad(m, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]
            | jnp.pad(m, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]
        )
    return m.reshape(lead + (h, w, c)).astype(mask.dtype)


class MatInpainter:
    def __init__(self, weights_path: Optional[str] = None, rng=None, resolution: int = 512):
        self.res = resolution
        self.net = Generator(img_resolution=resolution)
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        if weights_path and os.path.exists(weights_path):
            self.params = self._load(weights_path)
        else:
            dummy = jnp.zeros((1, resolution, resolution, 3))
            dmask = jnp.ones((1, resolution, resolution, 1))
            z = jnp.zeros((1, 512))
            self.params = self.net.init(
                {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                dummy, dmask, z, noise_mode="const",
            )
        self._apply = jax.jit(
            lambda p, x, m, z: self.net.apply(
                p, x, m, z, truncation_psi=0.5, noise_mode="const"
            )
        )

    def _load(self, path):
        data = np.load(path, allow_pickle=True)
        return jax.tree.map(jnp.asarray, data["params"].item())

    def _next_z(self, b):
        self.rng, sub = jax.random.split(self.rng)
        return jax.random.normal(sub, (b, 512))

    def __call__(self, x, mask, exp=True, is_masked=True):
        """x (B,H,W,3) in [-1,1]; mask (B,H,W,1) with 1 = hole to fill."""
        b, h, w, _ = x.shape
        if h == w:
            h0, w0 = self.res, self.res
            xi, mi = x, mask
            if (h, w) != (h0, w0):
                xi = resize(x, shape=(h0, w0))
                mi = (resize(mask, shape=(h0, w0)) > 0.5).astype(x.dtype)
            if not is_masked:
                xi = (1 - mi) * xi
            m = expand_mask(mi, 3) if exp else mi
            x2 = self._apply(self.params, xi, 1 - m, self._next_z(b))
            out = x2 * mi + xi * (1 - mi)
            if (h, w) != (h0, w0):
                out = resize(out, shape=(h, w))
            return out

        h0, w0 = self.res, self.res * 2
        xi, mi = x, mask
        if (h, w) != (h0, w0):
            xi = resize(x, shape=(h0, w0))
            mi = (resize(mask, shape=(h0, w0)) > 0.5).astype(x.dtype)
        if not is_masked:
            xi = (1 - mi) * xi
        x2 = jnp.zeros_like(xi)
        c = jnp.zeros_like(mi)
        half = self.res // 2
        tri = jnp.concatenate(
            [jnp.linspace(1, 100, half), jnp.linspace(100, 1, half)]
        ).reshape(1, 1, -1, 1)
        for i in range(3):
            s = half * i
            xs = xi[:, :, s: s + self.res]
            ms = mi[:, :, s: s + self.res]
            m = expand_mask(ms, 3) if exp else ms
            x2s = self._apply(self.params, xs, 1 - m, self._next_z(b))
            x2 = x2.at[:, :, s: s + self.res].add(x2s * tri)
            c = c.at[:, :, s: s + self.res].add(tri)
        x2 = x2 / c
        out = x2 * mi + xi * (1 - mi)
        if (h, w) != (h0, w0):
            out = resize(out, shape=(h, w))
        return out


# checkpoint conversion lives in convert.py (persistence-pickle reader +
# torch->flax name/layout map); re-exported here for the public API
from .convert import convert_mat_weights, load_network_pkl  # noqa: E402,F401
