"""WIF — Warping / Inpainting / Fusion network.

Re-design of reference models/nets/wif.py:9-57 (the UNet fusion path).
The MAT-based `inpaint` post-processing chain (wif.py:59-225) lives in
models/mat_pipeline.py and is only used at inference.

Input raw_output: (B, Tc', Tp, Hd, Wd, C') with C' = 3 + num_lyt + num_obj+1
(+1 disocc when use_disocc); Tc' = ctx_len (+1 when include_self fused).
Output: fused video (B, Tp, Hd, Wd, 3).

Note: the reference gates with `vid[..., 4:5]` — an *input* (layout) channel
(wif.py:53) — even though it allocates a 5th *output* channel for the gate
(wif.py:22). We implement the evident intent: the gate comes from the UNet's
5th output channel.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn import UNet


class WIFNet(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, vid):
        m = self.cfg.model
        extra_in = 1 if m.use_disocc else 0
        b, tc, tp, h, w, c = vid.shape
        vid = jnp.moveaxis(vid, 1, 2)  # B Tp Tc H W C

        if m.ii_score:
            x = vid.reshape(b * tp * tc, h, w, c)
            n_out = 5 if m.ii_ab else 4
            zero_init = m.ii_ab
        else:
            x = jnp.moveaxis(vid, 2, -2).reshape(b * tp, h, w, tc * c)
            n_out = 3
            zero_init = False

        out = UNet(
            num_channels_out=n_out,
            embed_dim=m.ii_embed_dim,
            norm_layer=m.norm_layer_patch,
            depth=m.ii_depth,
            zero_init=zero_init,
        )(x)

        if m.ii_score:
            out = out.reshape(b, tp, tc, h, w, n_out)
            beta = out[..., :3]
            score = jax.nn.softmax(out[..., 3:4], axis=2)
            if m.ii_ab:
                # ii_ref_gate replays the reference's input-channel gate
                # (wif.py:53) for converted-checkpoint compatibility
                gate = vid[..., 4:5] if m.ii_ref_gate else out[..., 4:5]
                alpha = jax.nn.sigmoid(gate + 5.0)
            else:
                alpha = 0.0
            fused = ((alpha * vid[..., :3] + beta) * score).sum(axis=2)
        else:
            fused = out.reshape(b, tp, h, w, 3)
        return fused
