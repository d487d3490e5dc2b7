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

    @staticmethod
    def alpha_checkerboard(img, alpha, cell=8):
        """Compose rgb (.., H, W, 3) in [0,1] over a checkerboard using
        alpha (.., H, W, 1) in [0,1] (reference logger.py:224-263)."""
        h, w = img.shape[-3], img.shape[-2]
        yy, xx = np.mgrid[0:h, 0:w]
        board = (((yy // cell) + (xx // cell)) % 2 * 0.2 + 0.6)[..., None]
        return img * alpha + board * (1 - alpha)

    def log_img(self, name, img, step, span=(-1, 1)):
        """img (B, H, W, 3) in span -> grid."""
        img = self._to01(img, span)
        self.writer.add_images(name, img, step, dataformats="NHWC")

    def log_vid(self, name, vid, step, span=(-1, 1), ctx_mask=None):
        """vid (B, T, H, W, 3) in span; pred frames get a red border.

        Logged as a frame-strip image grid (T tiled along width): the
        torch SummaryWriter's add_video silently no-ops without moviepy
        (absent in this image), and a strip is scrubbable in TB anyway."""
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
        b, t, h, w, c = vid.shape
        strip = vid.transpose(0, 2, 1, 3, 4).reshape(b, h, t * w, c)
        self.writer.add_images(name, strip, step, dataformats="NHWC")

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

    def log_visuals(self, prefix, arrays, pts, step, palette=None, max_items=2,
                    pts_geometry=None, ctx_len=None):
        """Render a Synthesizer.visuals() payload (reference logging cadence,
        synthesizer.py:241-282): videos, HSV flows, layer/semantic layouts,
        and control-point scatter+motion."""
        for key, arr in arrays.items():
            kind, name = key.split("/", 1)
            a = np.asarray(arr)[:max_items]
            if a.ndim == 5 and a.shape[-1] == 1 and kind == "vid":
                a = np.repeat(a, 3, axis=-1)  # grayscale map
            ctx_mask = None
            if ctx_len is not None and kind == "vid" and a.ndim == 5:
                ctx_mask = np.arange(a.shape[1])[None, :] < ctx_len
                ctx_mask = np.broadcast_to(ctx_mask, a.shape[:2])
            try:
                if kind == "vid":
                    self.log_vid(f"{prefix}/{name}", a, step, ctx_mask=ctx_mask)
                elif kind == "img":
                    self.log_img(f"{prefix}/{name}", a, step)
                elif kind == "flow":
                    self.log_flow(f"{prefix}/{name}", a, step)
                elif kind == "obj_lyt":
                    self.log_lyt(f"{prefix}/{name}", a, step, palette=None)
                elif kind == "sem_lyt":
                    self.log_lyt(f"{prefix}/{name}", a, step, palette=palette)
            except Exception as e:  # rendering must never kill training
                print(f"[logger] could not render {prefix}/{name}: {e}")
        if pts and pts_geometry is not None:
            h, w = pts_geometry
            n = 1  # matplotlib rendering is per-frame; keep it cheap
            try:
                for src in ("", "pred_"):
                    if f"{src}obj_pts" not in pts:
                        continue
                    op = np.asarray(pts[f"{src}obj_pts"])[:n]
                    bp = np.asarray(pts.get(f"{src}bg_pts", pts["bg_pts"]))[:n]
                    self.log_vid(f"{prefix}/{src}pts", get_pts(op, bp, h, w, mul=2),
                                 step)
                    self.log_vid(f"{prefix}/{src}mot", get_mot(op, bp, h, w, mul=2),
                                 step)
            except Exception as e:
                print(f"[logger] could not render {prefix} pts: {e}")

    def close(self):
        self.writer.close()


def _render_figure(draw_fn, height, width, dpi=64):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(width / dpi, height / dpi), dpi=dpi)
    fig.patch.set_facecolor("#FFFFFF")
    draw_fn(plt)
    plt.xlim([-1, 1])
    plt.ylim([-1, 1])
    plt.axis("off")
    plt.tight_layout()
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return data.astype(np.float32) / 255 * 2 - 1


def _colormap(num):
    from matplotlib import cm

    colors = cm.get_cmap("jet")(np.linspace(0, 1, num + 2)[: num + 1])
    colors[0, :3] = 0.5
    return colors


def get_pts(obj_pts, bg_pts, height, width, mul=4, dpi=64):
    """Scatter rendering of control points (reference logger.py:56-86).

    obj_pts (B[,T],No,Lo,2), bg_pts (B[,T],1,L,2) -> (B[,T],H,W,3) in [-1,1]."""
    obj_pts = np.asarray(obj_pts)
    bg_pts = np.asarray(bg_pts)
    vid = obj_pts.ndim == 5
    if vid:
        bt = obj_pts.shape[:2]
        obj_pts = obj_pts.reshape((-1,) + obj_pts.shape[2:])
        bg_pts = bg_pts.reshape((-1,) + bg_pts.shape[2:])
    b, no = obj_pts.shape[:2]
    colors = _colormap(no)
    h, w = height * mul, width * mul
    frames = []
    for i in range(b):
        def draw(plt, i=i):
            plt.scatter(bg_pts[i, 0, :, 0], -bg_pts[i, 0, :, 1], marker="x",
                        color=colors[0], linewidths=mul, s=10 * mul)
            for j in range(no):
                plt.scatter(obj_pts[i, j, :, 0], -obj_pts[i, j, :, 1], marker="x",
                            color=colors[1 + j], linewidths=mul, s=10 * mul)
        frames.append(_render_figure(draw, h, w, dpi))
    out = np.stack(frames)
    return out.reshape(bt + out.shape[1:]) if vid else out


def get_mot(obj_pts, bg_pts, height, width, mul=4, dpi=64, forward=True):
    """Quiver rendering of control-point motion (reference logger.py:128-167).

    obj_pts (B,T,No,Lo,2), bg_pts (B,T,1,L,2) -> (B,T-1,H,W,3)."""
    obj_pts = np.asarray(obj_pts)
    bg_pts = np.asarray(bg_pts)
    b, t, no = obj_pts.shape[:3]
    colors = _colormap(no)
    h, w = height * mul, width * mul
    vid = np.zeros((b, t - 1, h, w, 3), np.float32)
    qkw = dict(angles="xy", scale_units="xy", scale=1, width=0.005,
               headwidth=2, headlength=2, headaxislength=2)
    for i in range(b):
        for k in range(t - 1):
            s, e = (k, k + 1) if forward else (k + 1, k)

            def draw(plt, i=i, s=s, e=e):
                x, y = bg_pts[i, s, 0, :, 0], -bg_pts[i, s, 0, :, 1]
                u = bg_pts[i, e, 0, :, 0] - bg_pts[i, s, 0, :, 0]
                v = -bg_pts[i, e, 0, :, 1] + bg_pts[i, s, 0, :, 1]
                plt.quiver(x, y, u, v, color=colors[0], **qkw)
                for j in range(no):
                    x, y = obj_pts[i, s, j, :, 0], -obj_pts[i, s, j, :, 1]
                    u = obj_pts[i, e, j, :, 0] - obj_pts[i, s, j, :, 0]
                    v = -obj_pts[i, e, j, :, 1] + obj_pts[i, s, j, :, 1]
                    plt.quiver(x, y, u, v, color=colors[1 + j], **qkw)

            vid[i, k] = _render_figure(draw, h, w, dpi)
    return vid


def get_delta_mot(obj_pts, bg_pts, ref_obj_pts, ref_bg_pts, height, width, mul=4, dpi=64):
    """Quiver of displacement from a reference pose (reference logger.py:88-126)."""
    obj_pts, bg_pts = np.asarray(obj_pts), np.asarray(bg_pts)
    ref_obj_pts, ref_bg_pts = np.asarray(ref_obj_pts), np.asarray(ref_bg_pts)
    b, t, no = obj_pts.shape[:3]
    colors = _colormap(no)
    h, w = height * mul, width * mul
    vid = np.zeros((b, t, h, w, 3), np.float32)
    qkw = dict(angles="xy", scale_units="xy", scale=1, width=0.005,
               headwidth=2, headlength=2, headaxislength=2)
    for i in range(b):
        for k in range(t):
            def draw(plt, i=i, k=k):
                plt.scatter(ref_bg_pts[i, 0, :, 0], -ref_bg_pts[i, 0, :, 1],
                            marker="x", color=colors[0], linewidths=mul, s=10 * mul)
                u = bg_pts[i, k, 0, :, 0] - ref_bg_pts[i, 0, :, 0]
                v = -bg_pts[i, k, 0, :, 1] + ref_bg_pts[i, 0, :, 1]
                plt.quiver(ref_bg_pts[i, 0, :, 0], -ref_bg_pts[i, 0, :, 1], u, v,
                           color=colors[0], **qkw)
                for j in range(no):
                    plt.scatter(ref_obj_pts[i, j, :, 0], -ref_obj_pts[i, j, :, 1],
                                marker="x", color=colors[1 + j], linewidths=mul, s=10 * mul)
                    u = obj_pts[i, k, j, :, 0] - ref_obj_pts[i, j, :, 0]
                    v = -obj_pts[i, k, j, :, 1] + ref_obj_pts[i, j, :, 1]
                    plt.quiver(ref_obj_pts[i, j, :, 0], -ref_obj_pts[i, j, :, 1],
                               u, v, color=colors[1 + j], **qkw)

            vid[i, k] = _render_figure(draw, h, w, dpi)
    return vid
