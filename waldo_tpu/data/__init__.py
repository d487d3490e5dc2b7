"""Dataset registry (reference data/__init__.py:8-42 semantics)."""
from __future__ import annotations

from .base import BaseVideoDataset, make_dataset
from .cityscapes import CityscapesDataset
from .kitti import KittiDataset
from .synthetic import SyntheticDataset
from .video_folder import VideoFolderDataset
from .video import write_mjpeg_avi, open_video, VideoClipIndex
from .loader import DataLoader, InfiniteLoader, collate
from .flo import read_flo, write_flo

_REGISTRY = {
    "cityscapes": CityscapesDataset,
    "kitti": KittiDataset,
    "synthetic": SyntheticDataset,
    "video_folder": VideoFolderDataset,
}


def register_dataset(name, cls):
    _REGISTRY[name] = cls


def create_dataset(cfg, phase="train", **kw):
    name = cfg.data.dataset
    if name not in _REGISTRY:
        raise KeyError(f"unknown dataset '{name}'; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](cfg, phase=phase, **kw)
