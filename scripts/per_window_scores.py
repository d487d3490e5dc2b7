"""Per-window rescoring of the trend run's dumped eval videos (CPU-only).

The trend evidence scores each checkpoint as a MEAN over the 4 eval windows
(win00/05/10/14). That mean hides a confound for pred_vid: with use_last
residual decoding and zero-init, the UNTRAINED FLP copies the last context
pose, and on the later (more static) windows that copy-baseline scores high
— so "latest vs init" on the mean no longer measures whether the pre-fusion
prediction learns. Window 0 is the r4 protocol (the only window scored
then: init 18.66 dB -> 21.37 dB at 1000 iters), so this script re-scores
the SAME dumped videos per window and appends a `per_window` section to the
evidence JSON.

  python scripts/per_window_scores.py [--root /tmp/waldo_real_trend]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platform_name", "cpu")  # chip-free: reads mp4 dumps

import numpy as np


def score_pair(real, fake, ctx):
    import jax.numpy as jnp

    from waldo_tpu.eval.metrics import ms_ssim, psnr, ssim

    t = min(real.shape[0], fake.shape[0])
    vals = {"psnr": [], "ssim": [], "msssim": []}
    for k in range(ctx, t):
        a = jnp.asarray(real[None, k], jnp.float32)
        b = jnp.asarray(fake[None, k], jnp.float32)
        vals["psnr"].append(float(psnr(b, a)[0]))
        vals["ssim"].append(float(ssim(b, a)[0]))
        vals["msssim"].append(float(ms_ssim(b, a)[0]))
    return {f"cum_{k}": float(np.mean(v)) for k, v in vals.items()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default="/tmp/waldo_real_trend")
    ap.add_argument("--ctx", type=int, default=4)
    ap.add_argument("--evidence", type=str, default=None,
                    help="evidence JSON to append to (default root/real_data_trend.json)")
    args = ap.parse_args(argv)
    results_root = os.path.join(args.root, "run", "results")

    from waldo_tpu.eval.metrics import load_video

    per_window = {}
    for d in sorted(glob(os.path.join(results_root, "*real_eval_*"))):
        step = d.rsplit("real_eval_", 1)[1]
        entry = {}
        def vids(folder):
            return sorted(glob(os.path.join(d, folder, "*.mp4"))
                          + glob(os.path.join(d, folder, "*.avi")))

        for folder in ("pred_vid", "inp_pred_vid", "rec_vid"):
            reals = vids("real_vid")
            fakes = vids(folder)
            if not reals or len(reals) != len(fakes):
                continue
            # dataset order is deterministic (shuffle=False): vid id i is
            # window i of (win00, win05, win10, win14)
            entry[folder] = {
                f"win{i}": score_pair(load_video(r), load_video(f), args.ctx)
                for i, (r, f) in enumerate(zip(reals, fakes))
            }
        if entry:
            per_window[step] = entry
            print(f"[per-window] {step}: " + json.dumps(
                {f: {w: round(m["cum_psnr"], 2) for w, m in v.items()}
                 for f, v in entry.items()}), flush=True)

    ev_path = args.evidence or os.path.join(args.root, "real_data_trend.json")
    with open(ev_path) as f:
        ev = json.load(f)
    ev["per_window"] = per_window
    ev["per_window_note"] = (
        "win0 is the r4 protocol window (the only one scored then); the "
        "top-level curve is the mean over 4 windows")
    tmp = ev_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ev, f, indent=2)
    os.replace(tmp, ev_path)
    print(f"appended per_window to {ev_path}")
    return per_window


if __name__ == "__main__":
    main()
