"""Real-data quality-trend evidence on the reference's in-repo demo clip.

The only real Cityscapes data available offline is the demo Munster sequence
(reference datasets/demo_cityscapes: 29 frames x {RGB 512, deeplabv3 layout
512, RAFT flow 128}). This script builds a train/val split out of it
(pseudo-sequence symlinks), trains all three stages (LVD -> FLP -> WIF) at a
reduced-width flagship geometry, then scores the FULL vid_prediction
pipeline at each checkpoint on *predicted* frames only (protocol of
reference tools/eval/metrics.py:109-113).

Overfitting one clip is the point: it demonstrates the training path moves
real-data prediction quality, which synthetic-only evidence cannot.

  python scripts/real_data_trend.py [--iters 600] [--root /tmp/waldo_real_trend]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/waldo_jax"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEMO = "/root/reference/datasets/demo_cityscapes"
MODALITIES = (
    "leftImg8bit_sequence_512",
    "leftImg8bit_sequence_deeplabv3_512",
    "leftImg8bit_sequence_raft_128",
)


VAL_OFFSETS = (0, 5, 10, 14)


def prepare_root(dataroot: str, n_train: int = 8) -> None:
    """Symlink farm: N pseudo-sequences for train, multiple eval WINDOWS for
    val (VERDICT r4 #5: score more than one clip).

    Sequence identity is the first two '_'-separated basename tokens
    (data/cityscapes.py:29), so renaming 'munster_000037_...' to
    'demoK_000037_...' yields distinct contiguous sequences over the same
    frames; random clip offsets at vid_len 14 give the loader variety.

    Val: eval reads each sequence's FIRST window (data/base.py:_select_frames
    picks idx 0 off-train), so one 29-frame munster sequence scores one
    window. To score several, build win{k} pseudo-sequences whose frame
    numbering starts at real offset k. The loader only keeps sequences of
    29/30 contiguous entries (data/cityscapes.py repair drops trailing
    runs, reference parity), so each window sequence is padded back to 29
    entries by re-linking the last real frame under successive frame
    numbers — the pad is beyond the 15 frames eval reads (skip_first + 14)
    and never loaded."""
    import glob
    import shutil

    for mod in MODALITIES:
        src_dir = os.path.join(DEMO, mod, "val", "munster")
        files = sorted(glob.glob(os.path.join(src_dir, "*")))
        assert files, src_dir
        val_dst = os.path.join(dataroot, mod, "val")
        os.makedirs(val_dst, exist_ok=True)
        legacy = os.path.join(val_dst, "munster")
        if os.path.islink(legacy):  # pre-r5 single-window layout
            os.remove(legacy)

        def frame_num(path):
            return int(os.path.basename(path).split("_")[2])

        lo = min(frame_num(f) for f in files)

        def named_as(src, k, num):
            toks = os.path.basename(src).split("_")
            toks[0], toks[2] = f"win{k:02d}", f"{num:06d}"
            return "_".join(toks)

        for k in VAL_OFFSETS:
            win = os.path.join(val_dst, f"win{k:02d}")
            os.makedirs(win, exist_ok=True)
            real = [f for f in files if frame_num(f) >= lo + k]
            pad = [files[-1]] * (len(files) - len(real))
            for i, src in enumerate(real + pad):
                dst = os.path.join(win, named_as(src, k, lo + k + i))
                if not os.path.islink(dst):
                    os.symlink(src, dst)
        for k in range(n_train):
            tr = os.path.join(dataroot, mod, "train", f"seq{k}")
            os.makedirs(tr, exist_ok=True)
            for f in files:
                base = os.path.basename(f).replace("munster", f"demo{k}")
                dst = os.path.join(tr, base)
                if not os.path.islink(dst):
                    os.symlink(f, dst)


def common_flags(dataroot, save_path, iters, save_freq):
    """Reference scripts/cityscapes/train_*.sh flags at reduced width
    (embed 256) so the 3-stage run fits in a background TPU session."""
    return [
        "--dataset", "cityscapes", "--dataroot", dataroot,
        "--dim", "128", "--true_dim", "512", "--flow_dim", "128",
        "--data.vid_len", "14", "--data.num_workers", "4",
        "--save_path", save_path,
        "--s_patch_size", "16", "--s_latent_shape", "8,16",
        "--s_embed_dim", "256", "--s_num_obj", "16",
        "--s_oe_depth", "2", "--s_pe_depth", "2",
        "--s_bound_rest", "true", "--s_soft_bound_rest", "true",
        "--s_pe_decoder_init_mode", "five", "--s_has_bg", "true",
        "--s_pad_obj_alpha", "3", "--s_pad_bg_alpha", "3",
        "--s_init_scale_obj", "0.25", "--s_mul_scale_obj", "0.25",
        "--s_mul_delta_obj", "0.2",
        "--s_circle_translate_bias", "true", "--s_circle_translate_radius", "0.2",
        "--data.skip_first", "true", "--s_ctx_len", "4",
        "--data.load_lyt", "true", "--data.load_flow", "true",
        "--s_input_lyt", "true", "--s_input_flow", "true", "--s_input_rgb", "false",
        "--data.remap_lyt", "13 19 18 19 7 6 8 6",
        "--s_pred_cls", "true", "--s_weight_cls", "true", "--s_min_cls", "0.1",
        "--s_ctx_mode", "prev", "--s_bg_mul", "1.2",
        "--s_edge_size", "15", "--s_flow_thresh", "0.02",
        "--s_oe_num_timesteps", "5", "--s_pg_num_timesteps", "14",
        "--num_iter", str(iters), "--num_iter_eval", "0",
        "--save_latest_freq", str(save_freq), "--save_freq", str(save_freq),
        "--log_freq", "50",
        # the demo clip is one sequence: keep augmentation mild
        "--data.max_zoom", "1.1", "--data.colorjitter", "0",
    ]


def provenance() -> dict:
    """Self-describing evidence stamp (VERDICT r3 weak #6); shared helper in
    utils/profiling.py, specialized with this harness's objective deviation."""
    from waldo_tpu.utils.profiling import provenance as _prov

    return _prov(
        # without converted LPIPS weights in this image, WIF optimizes
        # sharp_vid (L1) only — NOT the reference's L1+LPIPS objective
        wif_objective="L1-only (no LPIPS weights in this env)",
        compute_dtype="bfloat16 matmul passes (f32 pinned in geometry)",
        # the harness never passes --s_fast_inverse_warp, so training AND
        # eval run the exact f32 scatter inversion (config default False).
        # Pre-r5 stamps hardcoded True here — wrong; r4/r3 trend evidence
        # actually used the scatter path too (same harness).
        fast_inverse_warp=False,
        ctx_tpsz_sampler=os.environ.get("WALDO_CTX_TPSZ", "1") == "1",
        chip_shared=os.environ.get("WALDO_CHIP_SHARED",
                                   "exclusive (no concurrent jobs launched)"),
    )


def _write_evidence(root, iters, save_freq, curve):
    """Incremental write: a trend run killed mid-eval still leaves every
    checkpoint scored so far in the evidence JSON."""
    out_path = os.path.join(root, "real_data_trend.json")
    # atomic: write a temp file then os.replace, so a kill landing mid-dump
    # never truncates evidence already on disk (ADVICE r3)
    tmp_path = out_path + ".tmp"
    with open(tmp_path, "w") as f:
        json.dump({"iters": iters, "save_freq": save_freq, "curve": curve,
                   "provenance": provenance(),
                   "warper_fix": "alpha_to_alpha occ-product gather "
                                 "(round-3 parity fix) active"}, f,
                  indent=2)
    os.replace(tmp_path, out_path)
    return out_path


def latest_tag(save_path, prefix):
    ckpts = sorted(
        d for d in os.listdir(os.path.join(save_path, "checkpoints")) if prefix in d
    )
    assert ckpts, (save_path, prefix)
    return ckpts[-1]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=600)
    # batch 2 at true_dim 512 OOMs (17.6G/15.75G, CLAUDE.md) — 1 is the
    # known-good flagship-geometry batch for the single v5e chip
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--root", type=str, default="/tmp/waldo_real_trend")
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_eval", action="store_true",
                    help="train checkpoints only (e.g. to feed the "
                         "acceptance loop); leave the landed trend "
                         "evidence untouched")
    ap.add_argument("--concurrent", action="store_true",
                    help="train FLP and WIF concurrently (both depend only "
                         "on the frozen LVD)")
    ap.add_argument("--stages", type=str, default="lvd,flp,wif",
                    help="comma list of train stages to (re)run")
    args = ap.parse_args(argv)
    dataroot = os.path.join(args.root, "data")
    save_path = os.path.join(args.root, "run")
    prepare_root(dataroot)
    iters = args.iters
    save_freq = max(iters // 4, 1)
    common = common_flags(dataroot, save_path, iters, save_freq)

    import subprocess

    from waldo_tpu.eval import metrics as metrics_cli

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # PREPEND to PYTHONPATH: clobbering it drops /root/.axon_site, the site
    # hook that registers the axon TPU platform — subprocesses then die with
    # "Unable to initialize backend 'axon'"
    pypath = repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, PYTHONPATH=pypath.rstrip(os.pathsep),
               JAX_COMPILATION_CACHE_DIR=os.path.expanduser("~/.cache/waldo_jax"))

    def run_cli(module, argv, retries=3, pre=None, stall_s=1800):
        """Each train/test run gets a FRESH process: the axon tunnel client
        leaks host buffers per dispatch (~10 GB/h) and iteration time
        degrades 2x-6x over a long in-process multi-stage run.

        Transient tunnel outages (axon backend briefly unregistered) kill a
        subprocess at startup or mid-run; retry after a cooldown. Train runs
        resume in place via --cont_train when the crashed attempt already
        wrote checkpoints.

        Stall watchdog (VERDICT r3 weak #2 — a run once hung at iteration 0
        for 5.5h): the child writes its iteration counter to a heartbeat
        file each loop; if that file goes stale for `stall_s` (generous —
        first-iteration XLA compiles take many minutes) the child is killed
        and the attempt retried."""
        import glob as _glob
        import time as _time

        name = argv[argv.index("--name") + 1]
        hb_file = os.path.join(args.root, f"heartbeat_{name}")

        for attempt in range(retries + 1):
            extra = []
            if attempt and module.endswith(".train"):
                if _glob.glob(f"{save_path}/checkpoints/*-{name}"):
                    extra = ["--cont_train"]
            if pre is not None:
                pre()
            if os.path.exists(hb_file):
                os.remove(hb_file)
            child = subprocess.Popen(
                [sys.executable, "-u", "-m", module, *argv, *extra],
                env=dict(env, WALDO_HEARTBEAT_FILE=hb_file), cwd=repo)
            launched = _time.time()
            stalled = False
            while True:
                rc = child.poll()
                if rc is not None:
                    break
                try:
                    last = os.path.getmtime(hb_file)
                except OSError:
                    last = launched  # no heartbeat yet: count from launch
                if _time.time() - last > stall_s:
                    print(f"[trend] WATCHDOG: {module} heartbeat stale "
                          f">{stall_s}s — killing pid {child.pid}", flush=True)
                    child.kill()
                    child.wait()
                    rc, stalled = 1, True
                    break
                _time.sleep(15)
            if rc == 0:
                return
            if attempt == retries:
                raise subprocess.CalledProcessError(
                    rc, module, "stalled" if stalled else None)
            print(f"[trend] {module} failed rc={rc} (attempt {attempt + 1}/"
                  f"{retries + 1}); retrying in 120s", flush=True)
            _time.sleep(120)

    class train_cli:
        main = staticmethod(lambda argv: run_cli("waldo_tpu.cli.train", argv))

    class test_cli:
        main = staticmethod(
            lambda argv, pre=None: run_cli("waldo_tpu.cli.test", argv, pre=pre))

    stages = set(args.stages.split(","))
    if not args.skip_train and "lvd" in stages:
        print("=== stage 1: LVD (real demo clip) ===", flush=True)
        train_cli.main(["--name", "real_lvd", *common,
                        "--vid_modes", "vid_object_extractor",
                        "--s_vid_object_extractor_losses",
                        "ent_flt_edge l1_flow cell_dis reg_mov",
                        "--s_blur_pxl", "true", "--s_blur_sigma", "2.0",
                        "--s_lambda_pts_rest", "20", "--s_l1_pxl", "true",
                        "--s_lambda_cell_dis", "10", "--s_lambda_l1_flow", "1000",
                        "--s_lambda_reg_mov", "10", "--s_use_lyt_filtering", "true",
                        "--s_use_fg", "true", "--s_use_lyt_opacity", "true",
                        "--s_swap_flt", "true", "--s_mov_obj_thresh", "0.005",
                        "--s_use_dominant_flow_other", "true",
                        "--s_include_self", "true", "--s_reg_bg_mul", "0.25",
                        "--batch_size_vid", str(args.batch)])
    flp_argv = wif_argv = None
    if not args.skip_train and "flp" in stages:
        lvd = latest_tag(save_path, "real_lvd")
        flp_argv = (["--name", "real_flp", *common,
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
                        "--batch_size_vid", str(args.batch)])
    if not args.skip_train and "wif" in stages:
        lvd = latest_tag(save_path, "real_lvd")
        wif_argv = (["--name", "real_wif", *common,
                     "--vid_modes", "vid_inpainting",
                     "--s_use_ii", "true", "--s_ii_depth", "6",
                     "--s_ii_score", "true", "--s_ii_ab", "true",
                     "--s_vid_inpainting_losses", "sharp_vid",
                     "--s_which_iter", "latest",
                     "--s_load_path", f"{save_path}/checkpoints/{lvd}",
                     "--batch_size_vid", str(args.batch)])
    if flp_argv and wif_argv and args.concurrent:
        # FLP and WIF both train against the SAME frozen LVD and are
        # independent of each other; running both on the chip at once
        # overlaps their dispatch/host gaps (distinct names -> distinct
        # checkpoint slots and heartbeat files)
        from concurrent.futures import ThreadPoolExecutor

        print("=== stages 2+3: FLP || WIF (concurrent) ===", flush=True)
        with ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(train_cli.main, flp_argv),
                    ex.submit(train_cli.main, wif_argv)]
            for f in futs:
                f.result()
    else:
        if flp_argv:
            print("=== stage 2: FLP ===", flush=True)
            train_cli.main(flp_argv)
        if wif_argv:
            print("=== stage 3: WIF ===", flush=True)
            train_cli.main(wif_argv)
    lvd = latest_tag(save_path, "real_lvd")
    flp = latest_tag(save_path, "real_flp")
    wif = latest_tag(save_path, "real_wif")
    if args.skip_eval:
        print(f"[real trend] checkpoints ready ({lvd} / {flp} / {wif}); "
              "--skip_eval set, stopping before the curve eval", flush=True)
        return

    steps = [str(s) for s in range(0, iters, save_freq)] + ["latest"]
    # score the most informative checkpoints first ("latest", then init) so
    # a run cut short by round end still lands the trained-vs-init contrast
    eval_order = ["latest", "0"] + [s for s in steps if s not in ("latest", "0")]
    curve = {}
    for s in eval_order:
        name = f"real_eval_{s}"
        # each run stamps a fresh datetime signature: drop stale result dirs
        # (also before each retry) or the metrics CLI's ambiguous-tag assert
        # fires on re-runs
        import glob as _glob
        import shutil as _shutil

        def _clean(name=name):
            for stale in _glob.glob(f"{save_path}/results/*{name}"):
                _shutil.rmtree(stale, ignore_errors=True)

        print(f"=== eval checkpoint {s} ===", flush=True)
        test_cli.main(pre=_clean, argv=["--name", name, *common,
                       "--vid_modes", "vid_prediction",
                       "--s_use_pg", "true", "--s_use_ii", "true",
                       "--s_ii_depth", "6", "--s_ii_score", "true",
                       "--s_ii_ab", "true",
                       "--s_pe_estimator_init_mode", "zero",
                       "--s_unconstrained_pose_decoder", "true",
                       "--s_use_last_pose_decoder", "true",
                       "--s_bg_mul_pose_decoder", "1.2",
                       "--s_restrict_to_ctx", "true",
                       "--data.eval_phase", "test", "--batch_size_vid", "1",
                       "--max_batch_eval_vid", "4",
                       "--s_load_path", f"{save_path}/checkpoints/{lvd}",
                       "--s_which_iter", s,
                       "--s_pg_load_path", f"{save_path}/checkpoints/{flp}",
                       "--s_pg_iter", s,
                       "--s_ii_load_path", f"{save_path}/checkpoints/{wif}",
                       "--s_ii_iter", s])
        entry = {}
        # rec_vid (reconstruction with TRUE poses) separates the failure
        # modes VERDICT r3 #3 asks about: rec improving while pred stalls
        # means FLP pose prediction / eval ctx handling is the bottleneck;
        # rec stalling too means the LVD decomposition itself is weak
        for folder in ("pred_vid", "inp_pred_vid", "rec_vid"):
            res = metrics_cli.main([name, "14", "4",
                                    "--results_root", f"{save_path}/results",
                                    "--metrics", "ssim", "psnr", "msssim",
                                    "--fake_folder", folder])
            entry[folder] = res
        curve[s] = entry
        print(f"[real trend] step {s}: {json.dumps(entry)}", flush=True)
        _write_evidence(args.root, iters, save_freq, curve)

    out_path = _write_evidence(args.root, iters, save_freq, curve)
    print("\n=== real-data trend (cum past ctx, predicted frames only) ===")
    print(f"{'step':>8} | {'ssim':>7} {'psnr':>7} {'msssim':>7} (inp_pred_vid)")
    for s in steps:
        e = curve[s]["inp_pred_vid"]
        print(f"{s:>8} | {e.get('cum_ssim', float('nan')):7.4f} "
              f"{e.get('cum_psnr', float('nan')):7.2f} "
              f"{e.get('cum_msssim', float('nan')):7.4f}")
    print(f"written: {out_path}")
    return curve


if __name__ == "__main__":
    main()
