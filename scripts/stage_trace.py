"""Capture a jax.profiler trace of the flagship predict and summarize
per-stage device time by the pipeline's annotate() scopes.

Validates the stage-cost table in CLAUDE.md with a real captured trace
(the annotations from waldo_tpu/utils/profiling.py propagate into HLO op
metadata via named_scope, so device ops carry their stage name).

  python scripts/stage_trace.py [--load_dim 256] [--out /tmp/stage_trace.json]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/waldo_jax"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = (
    # leaf scopes first: the matcher takes the FIRST substring hit, and HLO
    # metadata carries the full nested named_scope path, so parents must
    # come after every leaf they contain
    "warper/tps_obj", "warper/invert_obj", "warper/tps_bg", "warper/invert_bg",
    "warper/flow_warp", "warper/alpha_ctx_sample", "warper/alpha_ctx_fused",
    "warper/context_fusion_sample",
    "warper/occ_product_frame", "warper/occ_product_pred", "warper/flow_reduce",
    "warper/flow_upsample", "warper/alpha_upsample", "warper/lyt_refine",
    "warper/fuse_score",
    "lvd/encode_input", "lvd/estimate_layer", "lvd/estimate_pose",
    "lvd/decode_alpha", "wif/fuse_rec", "wif/fuse_pred", "flp/rollout",
    # parent buckets: whatever their leaves didn't claim
    "warper/grids", "warper/grid_to_flow", "warper/input_to_output",
    "decode_output",
)


def summarize_trace(trace_dir):
    """Aggregate device-op durations by stage scope from the perfetto dump."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace.json.gz under {trace_dir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    # device tracks only: host threads double-count the annotation spans
    device_pids = {
        e["pid"] for e in trace["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    per_stage = defaultdict(float)
    total = 0.0
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        total += dur
        name = e.get("name", "") + " " + str(e.get("args", {}))
        for s in STAGES:
            if s in name:
                per_stage[s] += dur
                break
    return {"total_device_ms": round(total, 1),
            "per_stage_ms": {k: round(v, 1) for k, v in sorted(per_stage.items())}}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--load_dim", type=int, default=256)
    ap.add_argument("--out", type=str, default="/tmp/stage_trace.json")
    ap.add_argument("--trace_dir", type=str, default="/tmp/waldo_trace")
    args = ap.parse_args(argv)

    import jax

    from __graft_entry__ import _flagship_cfg, _batch_for
    from waldo_tpu.models import Synthesizer
    from waldo_tpu.utils.profiling import trace

    cfg = _flagship_cfg(dim=128, load_dim=args.load_dim, vid_len=14)
    cfg.compute_dtype = "bfloat16"
    cfg.model.fast_inverse_warp = True  # bench.py numerics
    syn = Synthesizer(cfg)
    params = syn.init_params(jax.random.PRNGKey(0))
    batch = _batch_for(cfg, b=1)
    fn = jax.jit(lambda p, b: syn.predict(p, b)["pred_vid"])
    fn(params, batch).block_until_ready()  # compile outside the trace

    with trace(args.trace_dir):
        # fetch a scalar INSIDE the trace: under the axon tunnel
        # block_until_ready() does not synchronize (CLAUDE.md), so without a
        # value fetch the trace can close before the device work runs
        acc = 0.0
        for _ in range(3):
            acc += float(fn(params, batch).mean())
        assert acc == acc

    report = summarize_trace(args.trace_dir)
    report["geometry"] = f"{args.load_dim}x{args.load_dim * 2}"
    report["steps_traced"] = 3
    from waldo_tpu.utils.profiling import provenance

    report["provenance"] = provenance(
        compute_dtype="bfloat16", fast_inverse_warp=True,
        sample_precision=str(cfg.model.sample_precision),
        chip_shared=os.environ.get("WALDO_CHIP_SHARED", "unknown"))
    print(json.dumps(report, indent=2))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"written: {args.out}")


if __name__ == "__main__":
    main()
