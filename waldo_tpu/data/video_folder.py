"""Video-file folder dataset — the reference's ``from_vid`` branch
(data/base_dataset.py:44-70): clips cut directly out of video files via a
VideoClips-style index with a metadata pickle cache; RGB-only (the layout /
flow modalities are per-frame sidecar files that only exist for the
frame-folder datasets)."""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from .base import BaseVideoDataset
from .video import VIDEO_EXTENSIONS, load_or_build_clip_index


class VideoFolderDataset(BaseVideoDataset):
    """Scans `dataroot/{split}` (fallback: `dataroot`) for video files."""

    def get_data(self, cfg, phase) -> Dict:
        root = cfg.data.dataroot
        split = {"train": "train", "valid": "valid", "test": "test"}[phase]
        base = os.path.join(root, split)
        if not os.path.isdir(base):
            base = root
        vids: List[str] = []
        for dirpath, _dirs, files in sorted(os.walk(base)):
            for f in sorted(files):
                if f.lower().endswith(VIDEO_EXTENSIONS):
                    vids.append(os.path.join(dirpath, f))
        # vid_frame_paths kept for the fold/set_fold machinery of the base
        return {"vid_paths": vids, "vid_frame_paths": [[p] for p in vids]}

    def __init__(self, cfg, phase="train", rng=None, fold=None, num_folds=None):
        assert not cfg.data.load_lyt and not cfg.data.load_flow, (
            "video-file datasets are RGB-only: layout/flow sidecars exist "
            "only for frame-folder datasets")
        super().__init__(cfg, phase=phase, rng=rng, fold=fold, num_folds=num_folds)
        d = cfg.data
        per_clip = d.load_vid_len if (d.load_vid_len is not None and phase == "train") else d.vid_len
        self._per_clip = per_clip
        cache = self.serialized_path("metadata", phase)
        self.vid_clips = load_or_build_clip_index(
            self.data["vid_paths"], per_clip, d.vid_skip, cache,
            force=d.force_compute_metadata)

    def __len__(self):
        return self.vid_clips.num_clips()

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        d = self.cfg.data
        aug = self.sample_augmentation()
        clip = self.vid_clips.get_clip(index)  # (per_clip, H, W, 3) uint8
        # frame sub-selection mirrors the frame-folder sampler
        # (_select_frames) on indices instead of paths
        idx = self._select_frames(list(range(clip.shape[0])))
        frames = [self.rgb_from_array(clip[i], aug) for i in idx]
        vi, start = self.vid_clips.clips[index]
        return {"path": f"{self.data['vid_paths'][vi]}#{start}",
                "vid": np.stack(frames)}

    def _select_frames(self, frame_ids):
        # the base sampler is path-agnostic (pure slicing); reuse it, but a
        # whole-clip read means skip_first/one_every_n already applied by the
        # clip cut in the reference — keep window selection only
        d = self.cfg.data
        if d.load_vid_len is None or self.phase != "train":
            return frame_ids[: d.vid_len]
        return super()._select_frames(frame_ids)
