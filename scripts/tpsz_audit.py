"""On-chip error audit of the tp_sz context-fusion sampler (VERDICT r4 #1).

The tp_sz row mapping (ops/grid_sample.py:grid_sample_ctx) and the fused
alpha_ctx kernel (ops/grid_sample.py:warp_alpha_ctx) are the default predict
dispatch; their on-chip verification previously existed only in a commit
message. This script measures, ON HARDWARE (Mosaic, not interpret mode),
max|err| of the Pallas paths against the exact f32 gather composition at the
real flagship and HD fusion shapes, and writes the JSON artifact the round-4
verdict asked for.

Error is contention-immune, so this audit may run while training shares the
chip (stamped in provenance).

  python scripts/tpsz_audit.py [--out evidence_tpsz_sampler.json]
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


def make_case(h, w, c, b=1, tc=4, tp=10, seed=0):
    """Fusion-shaped inputs: textures in [-1,1], grids = identity + smooth
    flow with out-of-bounds bands (exercises the zero-padding edge)."""
    rng = np.random.RandomState(seed)
    f = b * tc
    n = f * tp
    img = (rng.rand(f, h, w, c).astype(np.float32) * 2 - 1)
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    base = np.stack([xx, yy], -1).astype(np.float32)[None]
    flow = rng.randn(n, 1, 1, 2).astype(np.float32) * 0.15
    wave = 0.05 * np.sin(3 * np.pi * (base[..., :1] + base[..., 1:]))
    grid = base + flow + np.concatenate([wave, -wave], -1)
    return img, grid


def audit_ctx(h, w, c, tp):
    import jax
    import jax.numpy as jnp

    from waldo_tpu.ops.grid_sample import grid_sample_ctx, grid_sample_ref

    img, grid = make_case(h, w, c, tp=tp)
    img_j, grid_j = jnp.asarray(img), jnp.asarray(grid)
    golden = jax.jit(
        lambda i, g: grid_sample_ref(jnp.repeat(i, tp, axis=0), g)
    )(img_j, grid_j)
    golden = np.asarray(jax.device_get(golden), np.float64)
    out = {}
    for prec in ("float32", "fast"):
        got = jax.jit(
            lambda i, g, p=prec: grid_sample_ctx(i, g, tp_sz=tp, precision=p)
        )(img_j, grid_j)
        got = np.asarray(jax.device_get(got), np.float64)
        out[prec] = {
            "max_abs_err": float(np.abs(got - golden).max()),
            "mean_abs_err": float(np.abs(got - golden).mean()),
        }
    return out


def audit_warp(h, w, c_layers, tp, tc=4):
    import jax
    import jax.numpy as jnp

    from waldo_tpu.ops.grid_sample import (_warp_alpha_ctx_ref, set_impl,
                                           warp_alpha_ctx)

    rng = np.random.RandomState(1)
    f = tc
    n = f * tp
    alpha = rng.rand(f, h, w, c_layers).astype(np.float32)
    _, grid1 = make_case(h, w, 1, tc=tc, tp=tp, seed=2)
    grids = np.repeat(grid1[:, None], c_layers, axis=1) + (
        rng.randn(n, c_layers, 1, 1, 2).astype(np.float32) * 0.02)
    occ = (rng.rand(n, c_layers, c_layers) > 0.5).astype(np.float32)
    is_obj = (rng.rand(tp, c_layers, h, w) > 0.1).astype(np.float32)
    args = (jnp.asarray(alpha), jnp.asarray(grids), jnp.asarray(occ),
            jnp.asarray(is_obj))

    # golden: the jnp composition with exact f32 sampling (gather impl)
    set_impl("gather")
    try:
        gold = jax.jit(lambda a, g, o, i: _warp_alpha_ctx_ref(
            a, g, o, i, tp_sz=tp, tcp=tc * tp, precision="float32"))(*args)
        gold = [np.asarray(jax.device_get(x), np.float64) for x in gold]
    finally:
        set_impl("auto")
    out = {}
    for prec in ("float32", "fast"):
        got = jax.jit(lambda a, g, o, i, p=prec: warp_alpha_ctx(
            a, g, o, i, tp_sz=tp, tcp=tc * tp, precision=p))(*args)
        got = [np.asarray(jax.device_get(x), np.float64) for x in got]
        out[prec] = {
            name: {"max_abs_err": float(np.abs(gv - xv).max()),
                   "mean_abs_err": float(np.abs(gv - xv).mean())}
            for name, gv, xv in zip(("alpha_occ", "disocc", "flow"), gold, got)
        }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="evidence_tpsz_sampler.json")
    args = ap.parse_args(argv)

    import jax

    from waldo_tpu.ops.grid_sample import auto_impl, warp_auto_impl
    from waldo_tpu.utils.profiling import provenance

    backend = jax.default_backend()
    # trend-eval fusion: (B*Tc=4, 128, 256, 23) x 40 grids (dim-128 predict,
    # load_dim 0 — the real_data_trend eval shape); flagship: 256x512;
    # HD: 512x1024
    cases = {"trend_eval_128x256": (128, 256, 23, 10),
             "flagship_256x512": (256, 512, 23, 10),
             "hd_512x1024": (512, 1024, 23, 10)}
    report = {"backend": backend, "cases": {}}
    for name, (h, w, c, tp) in cases.items():
        route = auto_impl((4, h, w, c), (4 * tp, h, w, 2), backend)
        wroute = warp_auto_impl((4, h, w, 17), (4 * tp, 17, h, w, 2), backend)
        print(f"[{name}] ctx route={route} warp route={wroute}", flush=True)
        entry = {"ctx_sampler_route": route, "warp_kernel_route": wroute,
                 "grid_sample_ctx_vs_exact_gather": audit_ctx(h, w, c, tp),
                 "warp_alpha_ctx_vs_jnp_f32": audit_warp(h, w, 17, tp)}
        report["cases"][name] = entry
        print(json.dumps(entry, indent=1), flush=True)
    report["provenance"] = provenance(
        chip_shared=os.environ.get("WALDO_CHIP_SHARED", "unknown"))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"written: {args.out}")
    return report


if __name__ == "__main__":
    main()
