"""Video quality metrics in jnp: SSIM / PSNR / MS-SSIM (+ optional LPIPS).

Replaces the reference's TF1-session metrics tool (tools/eval/metrics.py:
57-113) with TPU-jittable jnp implementations following the same protocol:
per-timestep metrics over real_vid vs inp_pred_vid mp4 dumps, reported per-t
and cumulatively past the context. SSIM matches tf.image.ssim (11x11
gaussian, sigma 1.5, k1=0.01, k2=0.03, max_val=1); MS-SSIM uses the standard
5-scale power weights.

CLI (reference README.md:129-132 contract):
  python -m waldo_tpu.eval.metrics VID_TAG VID_LENGTH VID_CONTEXT \
      [--results_root results] [--metrics ssim psnr msssim] ...
"""
from __future__ import annotations

import argparse
import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _fspecial_gauss(size: int, sigma: float):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = np.outer(g, g)
    return (g / g.sum()).astype(np.float32)


def _filter2(img, kernel):
    """img (B,H,W,C), kernel (k,k): depthwise valid conv."""
    c = img.shape[-1]
    k = jnp.tile(jnp.asarray(kernel)[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )


def _ssim_per_channel(a, b, max_val=1.0, filter_size=11, filter_sigma=1.5,
                      k1=0.01, k2=0.03):
    kernel = _fspecial_gauss(filter_size, filter_sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_a = _filter2(a, kernel)
    mu_b = _filter2(b, kernel)
    sigma_aa = _filter2(a * a, kernel) - mu_a ** 2
    sigma_bb = _filter2(b * b, kernel) - mu_b ** 2
    sigma_ab = _filter2(a * b, kernel) - mu_a * mu_b
    luminance = (2 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)
    cs = (2 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    return (luminance * cs).mean(axis=(1, 2)), cs.mean(axis=(1, 2))


def ssim(a, b, max_val=1.0):
    """a, b (B,H,W,C) in [0, max_val] -> (B,) (tf.image.ssim semantics)."""
    s, _ = _ssim_per_channel(a, b, max_val)
    return s.mean(-1)


def psnr(a, b, max_val=1.0):
    mse = ((a - b) ** 2).mean(axis=(1, 2, 3))
    return 10.0 * jnp.log10(max_val ** 2 / mse)


def ms_ssim(a, b, max_val=1.0, weights=_MSSSIM_WEIGHTS):
    """Multi-scale SSIM (B,H,W,C) -> (B,).

    tf.image.ssim_multiscale parity for inputs >= 176px (11px filter x 2^4);
    smaller inputs clamp the number of scales (renormalized weights) instead
    of erroring — tf itself refuses such inputs."""
    max_levels = 1
    size = min(a.shape[1], a.shape[2])
    while max_levels < len(weights) and (size >> max_levels) >= 11:
        max_levels += 1
    weights = weights[:max_levels]
    levels = len(weights)
    w = jnp.asarray(weights)
    w = w / w.sum() if levels < len(_MSSSIM_WEIGHTS) else w
    mcs = []
    for i in range(levels):
        s, cs = _ssim_per_channel(a, b, max_val)
        if i < levels - 1:
            mcs.append(jnp.maximum(cs.mean(-1), 0.0))
            pad_h, pad_w = a.shape[1] % 2, a.shape[2] % 2
            if pad_h or pad_w:
                a = a[:, : a.shape[1] - pad_h, : a.shape[2] - pad_w]
                b = b[:, : b.shape[1] - pad_h, : b.shape[2] - pad_w]
            a = jax.lax.reduce_window(a, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4
            b = jax.lax.reduce_window(b, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4
    vals = jnp.stack(mcs + [jnp.maximum(s.mean(-1), 0.0)], axis=-1)  # (B, levels)
    return jnp.prod(vals ** w, axis=-1)


def load_video(path):
    """mp4/avi (or frame folder) -> (T, H, W, 3) float in [0, 1]."""
    if os.path.isdir(path):
        import PIL.Image

        frames = [
            np.asarray(PIL.Image.open(p).convert("RGB"))
            for p in sorted(glob(os.path.join(path, "*.png")))
        ]
        return np.stack(frames) / 255.0
    if path.lower().endswith(".avi"):
        from ..data.video import open_video

        r = open_video(path)
        return r.read(0, r.num_frames) / 255.0
    import imageio.v2 as imageio

    return np.stack(imageio.mimread(path, memtest=False)) / 255.0


METRICS = {"ssim": ssim, "psnr": psnr, "msssim": ms_ssim}


def get_lpips():
    """Optional LPIPS (requires converted weights, see eval/lpips.py)."""
    try:
        from .lpips import LPIPS

        return LPIPS.maybe_load()
    except Exception:
        return None


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("vid_tag", type=str)
    parser.add_argument("vid_length", type=int)
    parser.add_argument("vid_context", type=int)
    parser.add_argument("--results_root", type=str, default="results")
    parser.add_argument("--real_folder", type=str, default="real_vid")
    parser.add_argument("--fake_folder", type=str, default="inp_pred_vid")
    parser.add_argument("--metrics", type=str, nargs="+",
                        default=["lpips", "msssim"])
    parser.add_argument("--batch_size", type=int, default=16)
    args = parser.parse_args(argv)

    lpips_fn = None
    if "lpips" in args.metrics:
        lpips_fn = get_lpips()
        if lpips_fn is None:
            import sys

            from .lpips import LPIPS

            print(
                "WARNING: LPIPS requested (the reference's default metric, "
                "tools/eval/metrics.py:127) but no converted weights at "
                f"{LPIPS.weights_path()} — falling back to ssim. Convert with "
                "waldo_tpu.eval.lpips.convert_lpips_weights.",
                file=sys.stderr, flush=True,
            )
            args.metrics = [m for m in args.metrics if m != "lpips"]
            if not args.metrics:
                args.metrics = ["ssim", "msssim"]
            elif "ssim" not in args.metrics:
                args.metrics.insert(0, "ssim")

    folders = glob(os.path.join(args.results_root, f"*{args.vid_tag}"))
    assert len(folders) == 1, f"ambiguous tag {args.vid_tag}: {folders}"
    root = folders[0]

    def vid_files(folder):
        files = sorted(glob(os.path.join(root, folder, "*.mp4"))
                       + glob(os.path.join(root, folder, "*.avi")))
        return files or sorted(
            p for p in glob(os.path.join(root, folder, "*")) if os.path.isdir(p)
        )

    real_files, fake_files = vid_files(args.real_folder), vid_files(args.fake_folder)
    assert len(real_files) == len(fake_files) and real_files, (root, len(real_files))

    # distributional metrics (whole-set, not per-timestep)
    dist_metrics = [m for m in args.metrics if m in ("fid", "fvd")]
    args.metrics = [m for m in args.metrics if m not in ("fid", "fvd")]
    dist_results = {}
    if dist_metrics:
        import sys

        from .frechet import fid_videos, fvd_proxy
        from .inception import InceptionExtractor, random_extractor

        real_vids = [load_video(p) for p in real_files]
        fake_vids = [load_video(p) for p in fake_files]
        if "fid" in dist_metrics:
            ex = InceptionExtractor.maybe_load()
            if ex is None:
                print(
                    "WARNING: no converted Inception weights at "
                    f"{InceptionExtractor.weights_path()} — using a seeded "
                    "random-init extractor. Distances are RELATIVE-ONLY and "
                    "reported as rfid, not FID. Convert with "
                    "waldo_tpu.eval.inception.convert_inception_weights.",
                    file=sys.stderr, flush=True,
                )
                ex = random_extractor()
            prefix = "" if ex.name == "fid" else "r"
            dist_results[f"{prefix}fid"] = fid_videos(ex, real_vids, fake_vids)
        if "fvd" in dist_metrics:
            # true FVD via I3D video features when converted weights exist
            # (eval/i3d.py); honest frame-Inception proxy otherwise
            from .i3d import I3DExtractor, fvd as i3d_fvd

            vex = I3DExtractor.maybe_load()
            if vex is not None:
                dist_results["fvd"] = i3d_fvd(vex, real_vids, fake_vids)
            else:
                print(
                    "WARNING: no converted I3D weights at "
                    f"{I3DExtractor.weights_path()} — reporting the "
                    "frame-Inception proxy rfvd_proxy, NOT comparable to "
                    "published FVD. Convert with "
                    "waldo_tpu.eval.i3d.convert_i3d_weights.",
                    file=sys.stderr, flush=True,
                )
                ex = InceptionExtractor.maybe_load() or random_extractor()
                prefix = "" if ex.name == "fid" else "r"
                dist_results[f"{prefix}fvd_proxy"] = fvd_proxy(ex, real_vids, fake_vids)
        for k, v in dist_results.items():
            print(f"[{k}] : {v:.4f}")

    fns = {m: jax.jit(METRICS[m]) for m in args.metrics if m != "lpips"}
    if "lpips" in args.metrics:
        # our LPIPS takes [-1,1]; videos load in [0,1]
        fns["lpips"] = jax.jit(lambda a, b: lpips_fn(a * 2 - 1, b * 2 - 1))
    per_t = {m: [[] for _ in range(args.vid_length)] for m in args.metrics}
    for rf, ff in zip(real_files, fake_files):
        real, fake = load_video(rf), load_video(ff)
        t_max = min(args.vid_length, real.shape[0], fake.shape[0])
        for t in range(t_max):
            a = jnp.asarray(real[None, t], jnp.float32)
            bb = jnp.asarray(fake[None, t], jnp.float32)
            for m in args.metrics:
                per_t[m][t].append(float(fns[m](bb, a)[0]))

    results = dict(dist_results)
    for m in args.metrics:
        for t in range(args.vid_length):
            vals = per_t[m][t]
            if vals:
                print(f"[{m}:{t}] : {np.mean(vals):.4f} +- {np.std(vals):.4f}")
            if t >= args.vid_context:
                cum = [v for tt in range(args.vid_context, t + 1) for v in per_t[m][tt]]
                print(f"[cum {m}:{t}] : {np.mean(cum):.4f} +- {np.std(cum):.4f}")
                results[f"cum_{m}"] = float(np.mean(cum))
    return results


if __name__ == "__main__":
    main()
