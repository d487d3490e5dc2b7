"""Frechet distances (FID/FVD scaffolding).

The reference computes FID via pytorch-fid Inception activations
(tools/utils.py:131-190) and exposes --compute_fid/--compute_fvd flags.
Pretrained Inception/I3D feature extractors cannot be downloaded here (no
egress), so this module implements the distance math + a feature-extractor
protocol; plug any (B, D) activation function in.
"""
from __future__ import annotations

import numpy as np
from scipy import linalg


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """d^2 = |mu1-mu2|^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)) (Dougal Sutherland's
    numerically stable form)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def frechet_distance_from_acts(acts1, acts2):
    m1, m2 = acts1.mean(0), acts2.mean(0)
    s1 = np.cov(acts1, rowvar=False)
    s2 = np.cov(acts2, rowvar=False)
    return frechet_distance(m1, s1, m2, s2)


def fid(feature_fn, real_batches, fake_batches):
    """feature_fn: images (B,H,W,3) -> activations (B,D)."""
    acts_r = np.concatenate([np.asarray(feature_fn(b)) for b in real_batches])
    acts_f = np.concatenate([np.asarray(feature_fn(b)) for b in fake_batches])
    return frechet_distance_from_acts(acts_r, acts_f)


def _frame_acts(extractor, vids, batch=16):
    """vids: list of (T,H,W,3) in [0,1] -> stacked frame activations (N,D)."""
    frames = np.concatenate([np.asarray(v) for v in vids])
    acts = []
    for i in range(0, len(frames), batch):
        acts.append(np.asarray(extractor(frames[i: i + batch])))
    return np.concatenate(acts)


def fid_videos(extractor, real_vids, fake_vids, batch=16):
    """FID over all frames of two video sets (reference tools/utils.py:131-190
    protocol: pool3 Inception activations; see eval/inception.py)."""
    return frechet_distance_from_acts(
        _frame_acts(extractor, real_vids, batch),
        _frame_acts(extractor, fake_vids, batch),
    )


def fvd_proxy(extractor, real_vids, fake_vids, batch=16):
    """Frechet distance over per-video temporal feature statistics.

    True FVD uses I3D spatiotemporal features (no weights reachable here);
    this proxy uses [mean_t, std_t] of per-frame Inception features per
    video — distributional and motion-sensitive, but NOT comparable to
    published FVD numbers. Callers must label it 'fvd_proxy'."""
    def per_video(vids):
        feats = []
        for v in vids:
            a = _frame_acts(extractor, [v], batch)
            feats.append(np.concatenate([a.mean(0), a.std(0)]))
        return np.stack(feats)

    return frechet_distance_from_acts(per_video(real_vids), per_video(fake_vids))
