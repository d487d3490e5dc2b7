"""FLP pose-prediction ablation (VERDICT r4 #6: the ~2.4 dB pred-vs-rec gap).

The trend evidence shows rec_vid (true poses) beating pred_vid (FLP-rolled
poses) by ~2.4 dB — pose-prediction error is the bottleneck. This script
ablates the knobs the reference exposes for it, each trained against the
SAME frozen LVD as the trend run and scored by the same full-pipeline
protocol (pred_vid = pre-fusion prediction, isolates FLP quality):

  baseline : the trend's real_flp (use_last residual decoding ON, ctx 4/4 —
             the reference train_flp.sh:36-38 settings)
  nolast   : --s_use_last_pose_decoder false (reference flp.py:255-257
             residual decoding ablated OFF)
  ctxvar   : --s_min_ctx_length_vid 2 --s_max_ctx_length_vid 6 (train-time
             ctx-length diversity vs the fixed 4-ctx eval)

Usage (after scripts/real_data_trend.py has trained real_lvd/real_wif):
  python scripts/flp_ablation.py [--iters 2500] [--root /tmp/waldo_real_trend]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/waldo_jax"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_data_trend import common_flags, latest_tag, provenance  # noqa: E402

VARIANTS = {
    "nolast": ["--s_use_last_pose_decoder", "false"],
    "ctxvar": ["--s_min_ctx_length_vid", "2", "--s_max_ctx_length_vid", "6"],
}


def flp_flags(name, common, save_path, lvd, batch, extra):
    base = ["--name", name, *common,
            "--vid_modes", "vid_pose_generator",
            "--s_use_pg", "true",
            "--s_vid_pose_generator_losses",
            "rec_obj_pose rec_bg_pose rec_occ_score",
            "--s_pe_estimator_init_mode", "zero",
            "--s_min_ctx_length_vid", "4", "--s_max_ctx_length_vid", "4",
            "--s_unconstrained_pose_decoder", "true",
            "--s_lambda_rec_occ_score", "0.01",
            "--s_use_last_pose_decoder", "true",
            "--s_bg_mul_pose_decoder", "1.2",
            "--s_which_iter", "latest",
            "--s_load_path", f"{save_path}/checkpoints/{lvd}",
            "--batch_size_vid", str(batch)]
    return base + extra  # later flags override earlier ones (config parser)


def run(module, argv, env, repo, hb_file, stall_s=2400, retries=2):
    """Subprocess with the trend harness's heartbeat watchdog."""
    for attempt in range(retries + 1):
        if os.path.exists(hb_file):
            os.remove(hb_file)
        child = subprocess.Popen(
            [sys.executable, "-u", "-m", module, *argv],
            env=dict(env, WALDO_HEARTBEAT_FILE=hb_file), cwd=repo)
        launched = time.time()
        while True:
            rc = child.poll()
            if rc is not None:
                break
            try:
                last = os.path.getmtime(hb_file)
            except OSError:
                last = launched
            if time.time() - last > stall_s:
                print(f"[ablation] WATCHDOG: killing stalled {module}",
                      flush=True)
                child.kill()
                child.wait()
                rc = 1
                break
            time.sleep(15)
        if rc == 0:
            return
        if attempt == retries:
            raise subprocess.CalledProcessError(rc, module)
        print(f"[ablation] {module} rc={rc}, retry in 120s", flush=True)
        time.sleep(120)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2500)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--root", type=str, default="/tmp/waldo_real_trend")
    ap.add_argument("--variants", type=str, default="nolast,ctxvar")
    ap.add_argument("--skip_train", action="store_true")
    args = ap.parse_args(argv)
    dataroot = os.path.join(args.root, "data")
    save_path = os.path.join(args.root, "run")
    common = common_flags(dataroot, save_path, args.iters,
                          max(args.iters // 4, 1))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, PYTHONPATH=pypath.rstrip(os.pathsep),
               JAX_COMPILATION_CACHE_DIR=os.path.expanduser("~/.cache/waldo_jax"))

    lvd = latest_tag(save_path, "real_lvd")
    wif = latest_tag(save_path, "real_wif")
    names = args.variants.split(",")

    if not args.skip_train:
        # the two variants are independent; overlap them on the chip like the
        # trend's FLP||WIF stage
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(len(names)) as ex:
            futs = {
                n: ex.submit(
                    run, "waldo_tpu.cli.train",
                    flp_flags(f"abl_flp_{n}", common, save_path, lvd,
                              args.batch, VARIANTS[n]),
                    env, repo, os.path.join(args.root, f"heartbeat_abl_{n}"))
                for n in names
            }
            for n, f in futs.items():
                f.result()
                print(f"[ablation] {n} trained", flush=True)

    from waldo_tpu.eval import metrics as metrics_cli

    results = {}
    # score the trend's real_flp (use_last ON, ctx 4/4) through the SAME
    # eval protocol as the variants: with shortened-iteration ablations the
    # landed trend curve (trained for a different iteration count) is not a
    # comparable baseline, so re-measure it here
    for n in ["baseline"] + names:
        if n == "baseline":
            flp = latest_tag(save_path, "real_flp")
        else:
            flp = latest_tag(save_path, f"abl_flp_{n}")
        ev = f"abl_eval_{n}"
        import glob as _glob
        import shutil as _shutil

        for stale in _glob.glob(f"{save_path}/results/*{ev}"):
            _shutil.rmtree(stale, ignore_errors=True)
        run("waldo_tpu.cli.test",
            ["--name", ev, *common,
             "--vid_modes", "vid_prediction",
             "--s_use_pg", "true", "--s_use_ii", "true",
             "--s_ii_depth", "6", "--s_ii_score", "true", "--s_ii_ab", "true",
             "--s_pe_estimator_init_mode", "zero",
             "--s_unconstrained_pose_decoder", "true",
             "--s_use_last_pose_decoder",
             "false" if n == "nolast" else "true",
             "--s_bg_mul_pose_decoder", "1.2",
             "--s_restrict_to_ctx", "true",
             "--data.eval_phase", "test", "--batch_size_vid", "1",
             "--max_batch_eval_vid", "4",
             "--s_load_path", f"{save_path}/checkpoints/{lvd}",
             "--s_which_iter", "latest",
             "--s_pg_load_path", f"{save_path}/checkpoints/{flp}",
             "--s_pg_iter", "latest",
             "--s_ii_load_path", f"{save_path}/checkpoints/{wif}",
             "--s_ii_iter", "latest"],
            env, repo, os.path.join(args.root, f"heartbeat_abl_eval_{n}"))
        entry = {}
        for folder in ("pred_vid", "inp_pred_vid"):
            entry[folder] = metrics_cli.main(
                [ev, "14", "4", "--results_root", f"{save_path}/results",
                 "--metrics", "ssim", "psnr", "msssim",
                 "--fake_folder", folder])
        results[n] = entry
        print(f"[ablation] {n}: {json.dumps(entry)}", flush=True)

    out = {"iters": args.iters, "variants": results,
           "baseline_note": "compare against evidence_real_data_trend.json "
                            "curve.latest (use_last ON, ctx 4/4)",
           "provenance": provenance()}
    out_path = os.path.join(args.root, "flp_ablation.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"written: {out_path}")
    return out


if __name__ == "__main__":
    main()
