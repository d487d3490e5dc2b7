"""TensorBoard observability (port of reference tools/logger.py essentials).

Scalars with NaN zeroing (logger.py:294-304), image/video grids with
[-1,1]->[0,1] normalization, layout colorization with the dataset palette
(logger.py:169-202), optical-flow HSV rendering (logger.py:265-318), and
red-border marking of predicted frames (logger.py:237-256).
"""
from __future__ import annotations

import colorsys
import math
import os
from typing import Optional

import numpy as np


def flow_to_rgb(flow: np.ndarray, max_norm: Optional[float] = None) -> np.ndarray:
    """flow (..., H, W, 2) -> rgb (..., H, W, 3) in [0, 1] via HSV angle/mag."""
    fx, fy = flow[..., 0], flow[..., 1]
    mag = np.sqrt(fx ** 2 + fy ** 2)
    ang = (np.arctan2(fy, fx) + math.pi) / (2 * math.pi)
    if max_norm is None:
        max_norm = max(mag.max(), 1e-6)
    val = np.clip(mag / max_norm, 0, 1)
    h6 = ang * 6.0
    i = np.floor(h6) % 6
    f = h6 - np.floor(h6)
    p = np.zeros_like(val)
    q = val * (1 - f)
    t = val * f
    r = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [val, q, p, p, t], val)
    g = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, val, val, q, p], p)
    b = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, val, val], q)
    return np.stack([r, g, b], axis=-1)


def colorize_layout(lyt: np.ndarray, palette: Optional[list] = None) -> np.ndarray:
    """lyt (..., H, W, C) channel scores -> rgb (..., H, W, 3) in [0, 1]."""
    idx = np.argmax(lyt, axis=-1)
    n = lyt.shape[-1]
    if palette is not None:
        pal = np.asarray(palette, np.float32).reshape(-1, 3) / 255.0
        pal = pal[:n] if len(pal) >= n else np.concatenate([pal, np.random.RandomState(0).rand(n - len(pal), 3)])
    else:
        pal = np.asarray(
            [colorsys.hsv_to_rgb(i / max(n, 1), 0.75, 0.9) for i in range(n)], np.float32
        )
    return pal[idx]


class Logger:
    def __init__(self, log_path: str, fps: int = 4):
        os.makedirs(log_path, exist_ok=True)
        from torch.utils.tensorboard import SummaryWriter

        self.writer = SummaryWriter(log_path)
        self.fps = fps

    def log_scalar(self, name, value, step):
        v = float(value)
        if not np.isfinite(v):
            v = 0.0  # NaN zeroing (reference logger.py:294-304)
        self.writer.add_scalar(name, v, step)

    def log_scalars(self, prefix, scalars, step):
        for k, v in scalars.items():
            try:
                self.log_scalar(f"{prefix}/{k}", v, step)
            except (TypeError, ValueError):
                pass

    @staticmethod
    def _to01(x, span=(-1, 1)):
        x = np.clip(np.asarray(x, np.float32), span[0], span[1])
        return (x - span[0]) / (span[1] - span[0])

    def log_img(self, name, img, step, span=(-1, 1)):
        """img (B, H, W, 3) in span -> grid."""
        img = self._to01(img, span)
        self.writer.add_images(name, img, step, dataformats="NHWC")

    def log_vid(self, name, vid, step, span=(-1, 1), ctx_mask=None):
        """vid (B, T, H, W, 3) in span; pred frames get a red border."""
        vid = self._to01(np.asarray(vid), span)
        if ctx_mask is not None:
            border = 2
            pred = ~np.asarray(ctx_mask)
            for b in range(vid.shape[0]):
                for t in range(vid.shape[1]):
                    if t < pred.shape[1] and pred[b, t]:
                        vid[b, t, :border] = [1, 0, 0]
                        vid[b, t, -border:] = [1, 0, 0]
                        vid[b, t, :, :border] = [1, 0, 0]
                        vid[b, t, :, -border:] = [1, 0, 0]
        import torch

        tv = torch.from_numpy(np.ascontiguousarray(vid.transpose(0, 1, 4, 2, 3)))
        self.writer.add_video(name, tv, step, fps=self.fps)

    def log_flow(self, name, flow, step):
        rgb = flow_to_rgb(np.asarray(flow))
        if rgb.ndim == 5:
            self.log_vid(name, rgb * 2 - 1, step)
        else:
            self.log_img(name, rgb * 2 - 1, step)

    def log_lyt(self, name, lyt, step, palette=None):
        rgb = colorize_layout(np.asarray(lyt), palette)
        if rgb.ndim == 5:
            self.log_vid(name, rgb * 2 - 1, step)
        else:
            self.log_img(name, rgb * 2 - 1, step)

    def close(self):
        self.writer.close()
