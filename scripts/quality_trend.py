"""Offline quality-trend evidence: train the 3 stages on the synthetic
dataset with periodic checkpoints, then score the FULL pipeline at each
checkpoint step on *predicted* frames only (per-timestep + cumulative past
context, protocol of reference tools/eval/metrics.py:109-113).

  python scripts/quality_trend.py [--iters 1500] [--root /tmp/waldo_trend]

Writes <root>/quality_trend.json and prints the curve table. The curve
(cum_ssim/cum_psnr/cum_msssim on inp_pred_vid vs real_vid, frames t>=ctx)
must improve monotonically with training for the pipeline to be learning.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/waldo_jax"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def common_flags(root, iters, save_freq):
    return [
        "--dataset", "synthetic", "--dim", "64", "--aspect_ratio", "2.0",
        "--true_dim", "64",
        "--data.num_lyt", "8", "--data.fg_idx", "1,4,5", "--data.bg_idx", "0,3",
        "--data.other_idx", "2", "--data.vid_len", "6", "--data.num_workers", "4",
        "--save_path", root,
        "--s_patch_size", "8", "--s_latent_shape", "8,16", "--s_obj_shape", "4,4",
        "--s_embed_dim", "128", "--s_num_heads", "8", "--s_num_obj", "8",
        "--s_oe_depth", "2", "--s_pe_depth", "2",
        "--s_oe_num_timesteps", "6", "--s_pg_num_timesteps", "6",
        "--s_pg_com_depth", "1", "--s_pg_enc_depth", "2", "--s_pg_dec_depth", "2",
        "--s_ii_depth", "3", "--s_ii_embed_dim", "64",
        "--s_ctx_len", "3", "--s_min_ctx_length_vid", "3",
        "--s_max_ctx_length_vid", "3", "--s_edge_size", "7",
        "--num_iter", str(iters), "--save_latest_freq", str(save_freq),
        "--save_freq", str(save_freq), "--log_freq", "100",
        "--batch_size_vid", "8",
    ]


def latest_tag(root, prefix):
    ckpts = sorted(
        d for d in os.listdir(os.path.join(root, "checkpoints")) if prefix in d
    )
    return ckpts[-1]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--root", type=str, default="/tmp/waldo_trend")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse existing checkpoints under --root")
    args = ap.parse_args(argv)
    root, iters = args.root, args.iters
    save_freq = max(iters // 4, 1)
    common = common_flags(root, iters, save_freq)

    from waldo_tpu.cli import train as train_cli
    from waldo_tpu.cli import test as test_cli
    from waldo_tpu.eval import metrics as metrics_cli

    if not args.skip_train:
        print("=== stage 1: LVD ===", flush=True)
        train_cli.main(["--name", "trend_lvd", *common,
                        "--vid_modes", "vid_object_extractor"])
        lvd = latest_tag(root, "trend_lvd")
        print(f"=== stage 2: FLP (frozen {lvd}) ===", flush=True)
        train_cli.main(["--name", "trend_flp", *common,
                        "--vid_modes", "vid_pose_generator", "--s_use_pg", "true",
                        "--s_load_path", f"{root}/checkpoints/{lvd}"])
        print("=== stage 3: WIF ===", flush=True)
        train_cli.main(["--name", "trend_wif", *common,
                        "--vid_modes", "vid_inpainting", "--s_use_ii", "true",
                        "--s_vid_inpainting_losses", "sharp_vid",
                        "--s_load_path", f"{root}/checkpoints/{lvd}"])
    lvd = latest_tag(root, "trend_lvd")
    flp = latest_tag(root, "trend_flp")
    wif = latest_tag(root, "trend_wif")

    steps = [str(s) for s in range(0, iters, save_freq)] + ["latest"]
    curve = {}
    for s in steps:
        name = f"trend_eval_{s}"
        print(f"=== eval checkpoint {s} ===", flush=True)
        test_cli.main(["--name", name, *common,
                       "--vid_modes", "vid_prediction",
                       "--s_use_pg", "true", "--s_use_ii", "true",
                       "--data.eval_phase", "test", "--batch_size_vid", "4",
                       "--s_load_path", f"{root}/checkpoints/{lvd}",
                       "--s_which_iter", s,
                       "--s_pg_load_path", f"{root}/checkpoints/{flp}",
                       "--s_pg_iter", s,
                       "--s_ii_load_path", f"{root}/checkpoints/{wif}",
                       "--s_ii_iter", s])
        entry = {}
        for folder in ("pred_vid", "inp_pred_vid"):
            res = metrics_cli.main([name, "6", "3",
                                    "--results_root", f"{root}/results",
                                    "--metrics", "ssim", "psnr", "msssim",
                                    "--fake_folder", folder])
            entry[folder] = res
        curve[s] = entry
        print(f"[trend] step {s}: {json.dumps(entry)}", flush=True)

    out_path = os.path.join(root, "quality_trend.json")
    from waldo_tpu.utils.profiling import provenance

    with open(out_path, "w") as f:
        json.dump({"iters": iters, "save_freq": save_freq, "curve": curve,
                   "provenance": provenance(
                       wif_objective="L1-only (no LPIPS weights in this env)")},
                  f, indent=2)
    print(f"\n=== quality trend (cum past ctx, predicted frames only) ===")
    hdr = f"{'step':>8} | {'ssim':>7} {'psnr':>7} {'msssim':>7} (inp_pred_vid)"
    print(hdr)
    for s in steps:
        e = curve[s]["inp_pred_vid"]
        print(f"{s:>8} | {e.get('cum_ssim', float('nan')):7.4f} "
              f"{e.get('cum_psnr', float('nan')):7.2f} "
              f"{e.get('cum_msssim', float('nan')):7.4f}")
    print(f"written: {out_path}")
    return curve


if __name__ == "__main__":
    main()
