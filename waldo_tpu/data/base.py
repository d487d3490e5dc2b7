"""Base video dataset: clip index, loaders, host-side augmentation.

Torch-free re-design of reference data/base_dataset.py. Produces channel-last
float32 numpy arrays ready for device transfer:

  vid  (T, H, W, 3)   in [-1, 1]
  lyt  (T, H, W, Nl)  one-hot scaled 5*(2x-1) (base_dataset.py:173-183)
  flow (T, Hf, Wf, 2) normalized 2*px/width (base_dataset.py:185-208)

Augmentation follows base_dataset.py:113-165: random zoom-crop (zoom in
[max(1, ar/true_ratio), max_zoom]), optional flips (sign-corrected flow),
color jitter on RGB only. Deviation from the reference: color-jitter ops are
applied in a fixed order (brightness, saturation, hue) instead of a random
order — the released configs use contrast-free jitter where ordering has no
visible effect on training.
"""
from __future__ import annotations

import os
import random
from typing import Dict, List, Optional

import numpy as np
import PIL.Image

from .flo import read_flo

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".webp")


def make_dataset(directory: str, recursive: bool = True) -> List[str]:
    """Recursive image-file scan (reference data/folder_dataset.py:34-62).

    Follows directory symlinks (the trend harness builds symlink farms) but
    tracks visited realpaths so cycles terminate and no sample duplicates."""
    paths = []
    seen = set()
    for root, dirs, files in sorted(os.walk(directory, followlinks=True)):
        real = os.path.realpath(root)
        if real in seen:
            dirs[:] = []
            continue
        seen.add(real)
        for f in sorted(files):
            if f.lower().endswith(IMG_EXTENSIONS):
                paths.append(os.path.join(root, f))
        if not recursive:
            break
    return paths


class _RawFrameCache:
    """Bounded in-memory cache of RAW decoded frames (pre-augmentation).

    Decoding dominates host time when clips revisit frames (small datasets,
    repeated eval of one val clip, few-sequence corpora): PNG decode of a
    512-res frame costs ~40-75 ms/modality on one core while every
    augmented view reuses the same raw pixels. The reference reaches for
    the same remedy with its data pickle cache (base_dataset.py:29-37);
    here the cache is transparent and byte-bounded (WALDO_FRAME_CACHE_MB,
    default 512, 0 disables). FIFO eviction; entries are read-only by
    convention (every consumer copies via astype/multiply before mutating).
    Thread-safe under the GIL for the loader's thread pool (worst case a
    duplicate decode)."""

    def __init__(self):
        limit_mb = float(os.environ.get("WALDO_FRAME_CACHE_MB", "512"))
        self.limit = int(limit_mb * 1e6)
        self.store: Dict[str, np.ndarray] = {}
        self.bytes = 0

    def get(self, path: str, loader):
        path = os.path.realpath(path)  # symlink farms share one entry
        arr = self.store.get(path)
        if arr is None:
            arr = loader(path)
            if self.limit > 0 and arr.nbytes < self.limit:
                while self.bytes + arr.nbytes > self.limit and self.store:
                    old = self.store.pop(next(iter(self.store)))  # FIFO
                    self.bytes -= old.nbytes
                self.store[path] = arr
                self.bytes += arr.nbytes
        return arr


_FRAME_CACHE = _RawFrameCache()


def _resize(arr: np.ndarray, size, method=PIL.Image.BILINEAR) -> np.ndarray:
    """Resize (H, W, C) float array channel-by-channel via PIL bilinear."""
    h, w = size
    if arr.shape[:2] == (h, w):
        return arr
    chans = [
        np.asarray(
            PIL.Image.fromarray(arr[:, :, c], mode="F").resize((w, h), method)
        )
        for c in range(arr.shape[2])
    ]
    return np.stack(chans, axis=-1)


def _color_jitter(img: np.ndarray, brightness, contrast, saturation, hue) -> np.ndarray:
    """img (H, W, 3) in [0, 1]."""
    img = np.clip(img * brightness, 0, 1)
    if contrast != 1:
        mean = img.mean()
        img = np.clip(mean + contrast * (img - mean), 0, 1)
    if saturation != 1:
        gray = img.mean(axis=-1, keepdims=True)
        img = np.clip(gray + saturation * (img - gray), 0, 1)
    if hue != 0:
        import colorsys

        hsv = np.asarray(PIL.Image.fromarray((img * 255).astype(np.uint8)).convert("HSV"),
                         dtype=np.int16)
        hsv[..., 0] = (hsv[..., 0] + int(hue * 255)) % 256
        img = np.asarray(
            PIL.Image.fromarray(hsv.astype(np.uint8), mode="HSV").convert("RGB")
        ).astype(np.float32) / 255.0
    return img


class AugmentParams:
    def __init__(self, v_flip, h_flip, top_crop, left_crop, h_crop, w_crop, jitter, zoom):
        self.v_flip = v_flip
        self.h_flip = h_flip
        self.top_crop = top_crop
        self.left_crop = left_crop
        self.h_crop = h_crop
        self.w_crop = w_crop
        self.jitter = jitter
        self.zoom = zoom


class BaseVideoDataset:
    """Frame-folder video dataset with modality siblings."""

    def __init__(self, cfg, phase="train", rng: Optional[random.Random] = None,
                 fold: Optional[int] = None, num_folds: Optional[int] = None):
        self.cfg = cfg
        self.phase = phase
        self.rng = rng or random.Random(cfg.seed)
        self.dim = cfg.dim if cfg.load_dim == 0 else cfg.load_dim
        self.true_dim = cfg.true_dim
        self.true_ratio = getattr(cfg, "true_ratio", cfg.aspect_ratio)
        self.frame_folder = None
        self.layout_folder = None
        self.flow_folder = None
        # clip-index pickle cache (reference base_dataset.py:29-37): skip the
        # recursive path scan on reload when load_data is set
        data_path = self.serialized_path("data", phase, fold)
        if cfg.data.load_data and data_path and os.path.exists(data_path):
            import pickle

            with open(data_path, "rb") as f:
                blob = pickle.load(f)
            self.data = blob["data"]
            self.frame_folder = blob.get("frame_folder")
            self.layout_folder = blob.get("layout_folder")
            self.flow_folder = blob.get("flow_folder")
        else:
            self.data = self.get_data(cfg, phase)
            if cfg.data.save_data and data_path:
                import pickle

                os.makedirs(os.path.dirname(data_path) or ".", exist_ok=True)
                with open(data_path, "wb") as f:
                    pickle.dump({"data": self.data,
                                 "frame_folder": self.frame_folder,
                                 "layout_folder": self.layout_folder,
                                 "flow_folder": self.flow_folder}, f)
        self._full_clips = self.data["vid_frame_paths"]
        self.num_folds = num_folds
        if num_folds:
            self.set_fold(fold or 0)

    def serialized_path(self, kind: str, phase: str, fold=None) -> Optional[str]:
        """Cache-file naming (reference base_dataset.py:76-86)."""
        d = self.cfg.data
        if not d.dataroot:
            return None
        specs = f"{d.data_specs}_" if d.data_specs else ""
        if fold is not None:
            return os.path.join(d.dataroot, "folds",
                                f"{specs}{fold}_{phase}_{kind}.pkl")
        return os.path.join(d.dataroot, f"{specs}{phase}_{kind}.pkl")

    def set_fold(self, fold: int):
        """Select an interleaved shard of the clip index
        (reference fold cycling, helpers/__init__.py:12-21)."""
        assert self.num_folds
        self.fold = fold % self.num_folds
        self.data = dict(self.data)
        self.data["vid_frame_paths"] = self._full_clips[self.fold:: self.num_folds]

    def get_data(self, cfg, phase) -> Dict:
        raise NotImplementedError

    def __len__(self):
        return len(self.data["vid_frame_paths"])

    # -- augmentation parameter sampling (base_dataset.py:113-165) --

    def sample_augmentation(self) -> AugmentParams:
        cfg = self.cfg
        d = cfg.data
        train = self.phase == "train"
        rnd = self.rng.random
        v_flip = rnd() > 0.5 if train and not d.no_v_flip else False
        h_flip = rnd() > 0.5 if train and not d.no_h_flip else False
        h = int(self.true_dim)
        w = int(self.true_dim * self.true_ratio)
        min_zoom = max(1.0, cfg.aspect_ratio / self.true_ratio)
        max_zoom = max(d.max_zoom, min_zoom)
        zoom = min_zoom + rnd() * (max_zoom - min_zoom) if train else min_zoom
        h_crop = int(h / zoom)
        w_crop = int(h_crop * cfg.aspect_ratio)
        top_crop = int(rnd() * (h - h_crop)) if train else 0
        left_crop = int(rnd() * (w - w_crop)) if train else 0
        jitter = None
        if d.colorjitter is not None and train:
            cj = d.colorjitter
            b = max(0, 1 + (rnd() * 2 - 1) * cj)
            c = 1 if d.colorjitter_no_contrast else max(0, 1 + (rnd() * 2 - 1) * cj)
            s = max(0, 1 + (rnd() * 2 - 1) * cj)
            hh = 0.5 * (rnd() * 2 - 1) * cj
            jitter = (b, c, s, hh)
        return AugmentParams(v_flip, h_flip, top_crop, left_crop, h_crop, w_crop, jitter, zoom)

    # -- per-modality loaders --

    def _spatial(self, arr: np.ndarray, aug: AugmentParams) -> np.ndarray:
        """crop -> resize to (dim, dim*ar) -> flips, on (H, W, C) float."""
        cfg = self.cfg
        a = arr[aug.top_crop: aug.top_crop + aug.h_crop,
                aug.left_crop: aug.left_crop + aug.w_crop]
        size = (self.dim, int(self.dim * cfg.aspect_ratio))
        a = _resize(a, size)
        if aug.v_flip:  # reference v_flip = horizontal mirror (base_dataset.py:347-349)
            a = a[:, ::-1]
        if aug.h_flip:
            a = a[::-1]
        return np.ascontiguousarray(a)

    def rgb_from_array(self, raw: np.ndarray, aug: AugmentParams) -> np.ndarray:
        """uint8 (H, W, 3) -> augmented float (dim, dim*ar, 3) in [-1, 1]."""
        img = raw.astype(np.float32) / 255.0
        if aug.jitter is not None:
            img = _color_jitter(img, *aug.jitter)
        img = self._spatial(img, aug)
        return img * 2.0 - 1.0

    def load_rgb(self, path: str, aug: AugmentParams) -> np.ndarray:
        from . import native

        raw = _FRAME_CACHE.get(
            path, lambda p: np.asarray(PIL.Image.open(p).convert("RGB")))
        if aug.jitter is None and native.available():
            size = (self.dim, int(self.dim * self.cfg.aspect_ratio))
            out = native.rgb_transform(raw, aug.top_crop, aug.left_crop,
                                       aug.h_crop, aug.w_crop, size[0], size[1],
                                       flip_x=aug.v_flip, flip_y=aug.h_flip)
            return out
        return self.rgb_from_array(raw, aug)

    def load_layout(self, path: str, aug: AugmentParams) -> np.ndarray:
        from . import native

        d = self.cfg.data
        lyt = _FRAME_CACHE.get(
            path, lambda p: np.asarray(PIL.Image.open(p), np.int32))
        lyt = lyt.astype(np.int64)
        if lyt.ndim == 3:
            lyt = lyt[..., 0]
        size = (self.dim, int(self.dim * self.cfg.aspect_ratio))
        if native.available():
            return native.layout_onehot_resize(
                lyt, d.num_lyt, d.remap_lyt, aug.top_crop, aug.left_crop,
                aug.h_crop, aug.w_crop, size[0], size[1],
                flip_x=aug.v_flip, flip_y=aug.h_flip,
            )
        for i in range(len(d.remap_lyt) // 2):
            src, tgt = d.remap_lyt[2 * i], d.remap_lyt[2 * i + 1]
            lyt = np.where(lyt == src, tgt, lyt)
        onehot = np.zeros(lyt.shape + (d.num_lyt,), np.float32)
        valid = lyt < d.num_lyt
        np.put_along_axis(
            onehot, np.clip(lyt, 0, d.num_lyt - 1)[..., None], valid[..., None].astype(np.float32), axis=-1
        )
        onehot = self._spatial(onehot, aug)
        return 5.0 * (onehot * 2.0 - 1.0)

    def load_flow(self, path: str, aug: AugmentParams) -> np.ndarray:
        from . import native

        cfg = self.cfg
        flow = _FRAME_CACHE.get(path, read_flo)  # (H, W, 2) raw px
        h, w = flow.shape[:2]
        # flow files may live at their own resolution (flow_dim); crop in
        # their own pixel space, scaled from true_dim coordinates
        fh_scale = h / self.true_dim
        top = int(aug.top_crop * fh_scale)
        left = int(aug.left_crop * fh_scale)
        chs = int((aug.top_crop + aug.h_crop) * fh_scale) - top
        cws = int((aug.left_crop + aug.w_crop) * fh_scale) - left
        fdim = cfg.flow_dim if cfg.flow_dim > 0 else cfg.dim
        size = (fdim, int(fdim * cfg.aspect_ratio))
        if native.available():
            return native.flow_normalize_resize(
                flow, aug.zoom, aug.v_flip, aug.h_flip, top, left, chs, cws,
                size[0], size[1],
            )
        flow = flow * aug.zoom
        if aug.v_flip:
            flow = flow.copy()
            flow[..., 0] = -flow[..., 0]
        if aug.h_flip:
            flow = flow.copy()
            flow[..., 1] = -flow[..., 1]
        flow = flow.copy()
        flow[..., 0] = 2.0 * flow[..., 0] / w
        flow[..., 1] = 2.0 * flow[..., 1] / h
        a = flow[top: top + chs, left: left + cws]
        a = _resize(a, size)
        if aug.v_flip:
            a = a[:, ::-1]
        if aug.h_flip:
            a = a[::-1]
        return np.ascontiguousarray(a)

    # -- clip assembly (base_dataset.py:210-324, frame-folder path) --

    def _select_frames(self, frame_paths: List[str]) -> List[str]:
        cfg, d = self.cfg, self.cfg.data
        if d.skip_first:
            frame_paths = frame_paths[1:]
        per_clip = d.load_vid_len if d.load_vid_len is not None else d.vid_len
        assert len(frame_paths) >= per_clip, (len(frame_paths), per_clip)
        n = len(frame_paths) - (per_clip - 1) * d.one_every_n - 1
        idx = self.rng.randrange(n) if (self.phase == "train" and n > 0) else 0
        frame_paths = frame_paths[idx: idx + per_clip * d.one_every_n: d.one_every_n]
        if d.load_vid_len is not None:
            if d.load_n_plus_1:
                start = int(self.rng.random() * (d.load_vid_len - (d.vid_len - 1)))
                end = start + d.vid_len - 1
                last = int(self.rng.random() * (d.load_vid_len - end))
                frame_paths = frame_paths[start:end] + [frame_paths[end + last]]
            else:
                step = max(1, int(self.rng.random() * (d.load_vid_len - 1) / (d.vid_len - 1)))
                step = min(step, d.max_vid_step)
                start = int(self.rng.random() * (d.load_vid_len - (d.vid_len - 1) * step))
                frame_paths = frame_paths[start: start + step * (d.vid_len - 1) + 1: step]
        return frame_paths

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg, d = self.cfg, self.cfg.data
        aug = self.sample_augmentation()
        frame_paths = self._select_frames(self.data["vid_frame_paths"][index])

        out = {"path": frame_paths[0]}
        out["vid"] = np.stack([self.load_rgb(p, aug) for p in frame_paths])
        if d.load_lyt:
            lyt_paths = [p.replace(self.frame_folder, self.layout_folder) for p in frame_paths]
            out["lyt"] = np.stack([self.load_layout(p, aug) for p in lyt_paths])
        if d.load_flow:
            flow_paths = [
                p.replace(self.frame_folder, self.flow_folder).replace(".png", ".flo")
                for p in frame_paths
            ]
            out["flow"] = np.stack([self.load_flow(p, aug) for p in flow_paths])
        return out
