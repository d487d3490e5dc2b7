"""Quantify the accuracy cost of the bench's fast numerics (VERDICT item 4).

Runs the full flagship-shaped `predict` on structured synthetic clips under:
  golden : float32 compute, float32 sampling, scatter inversion
  bench  : bfloat16 compute, fast (bf16 MXU) alpha/fusion sampling
  +fiw   : bench + iterative (fixed-point) inverse warp
and reports PSNR/SSIM of each variant's pred_vid against golden — the error
bar that belongs next to the judged frames/sec number.

  python scripts/precision_audit.py [--dim 128] [--load_dim 256] [--out ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/waldo_jax"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_batch(cfg, b=1, seed=0):
    """Structured synthetic clips (moving shapes, exact flow) at cfg geometry."""
    from waldo_tpu.data.synthetic import SyntheticDataset

    cfg.data.dataset = "synthetic"
    ds = SyntheticDataset(cfg, phase="valid")
    items = [ds[i] for i in range(b)]
    import jax.numpy as jnp

    return {
        k: jnp.asarray(np.stack([it[k] for it in items]))
        for k in ("vid", "lyt", "flow")
    }


def run_variant(cfg_kwargs, batch_np, name):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from waldo_tpu.models import Synthesizer

    cfg = _flagship_cfg(**{k: v for k, v in cfg_kwargs.items()
                           if k in ("dim", "load_dim", "vid_len")})
    cfg.compute_dtype = cfg_kwargs["compute_dtype"]
    cfg.model.sample_precision = cfg_kwargs["sample_precision"]
    cfg.model.fast_inverse_warp = cfg_kwargs["fast_inverse_warp"]
    syn = Synthesizer(cfg)
    params = syn.init_params(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    out = jax.jit(lambda p, b: syn.predict(p, b))(params, batch)
    pred = np.asarray(jax.device_get(out["pred_vid"]), np.float32)
    inp_pred = np.asarray(jax.device_get(out.get("inp_pred_vid", out["pred_vid"])),
                          np.float32)
    print(f"[variant {name}] done", flush=True)
    return {"pred_vid": pred, "inp_pred_vid": inp_pred}


def psnr_ssim(a, b, ctx_len):
    """Metrics on predicted frames only, [0,1] range."""
    import jax.numpy as jnp

    from waldo_tpu.eval.metrics import psnr, ssim

    a = jnp.asarray((a[:, ctx_len:] + 1) / 2).reshape((-1,) + a.shape[2:])
    b = jnp.asarray((b[:, ctx_len:] + 1) / 2).reshape((-1,) + b.shape[2:])
    return (float(np.asarray(psnr(a, b)).mean()),
            float(np.asarray(ssim(a, b)).mean()))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--load_dim", type=int, default=256)
    ap.add_argument("--vid_len", type=int, default=14)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--out", type=str, default="/tmp/precision_audit.json")
    args = ap.parse_args(argv)

    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg(dim=args.dim, load_dim=args.load_dim, vid_len=args.vid_len)
    batch = build_batch(cfg, b=args.batch)
    batch_np = {k: np.asarray(v) for k, v in batch.items()}

    base = dict(dim=args.dim, load_dim=args.load_dim, vid_len=args.vid_len)
    variants = {
        "golden_f32": dict(base, compute_dtype="float32",
                           sample_precision="float32", fast_inverse_warp=False),
        "bench_bf16_fast": dict(base, compute_dtype="bfloat16",
                                sample_precision="fast", fast_inverse_warp=False),
        "bench_bf16_fast_fiw": dict(base, compute_dtype="bfloat16",
                                    sample_precision="fast",
                                    fast_inverse_warp=True),
    }
    outs = {k: run_variant(v, batch_np, k) for k, v in variants.items()}

    ctx = cfg.model.ctx_len
    from waldo_tpu.utils.profiling import provenance

    report = {"geometry": f"{args.load_dim}x{int(args.load_dim * cfg.aspect_ratio)}",
              "vid_len": args.vid_len,
              "provenance": provenance(
                  chip_shared=os.environ.get("WALDO_CHIP_SHARED", "unknown")),
              "vs_golden": {}}
    for k in ("bench_bf16_fast", "bench_bf16_fast_fiw"):
        entry = {}
        for field in ("pred_vid", "inp_pred_vid"):
            p, s = psnr_ssim(outs["golden_f32"][field], outs[k][field], ctx)
            entry[field] = {"psnr": round(p, 2), "ssim": round(s, 5)}
        report["vs_golden"][k] = entry
        print(f"{k}: {json.dumps(entry)}", flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"written: {args.out}")
    return report


if __name__ == "__main__":
    main()
