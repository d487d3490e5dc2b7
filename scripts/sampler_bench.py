"""Microbenchmark the grid_sample impls at the pipeline's hot shapes.

The flagship predict's sampling cost concentrates in three call sites
(waldo_tpu/models/warper.py): the flow warp (obj 64x64 textures, Tc*2
channels), the alpha_ctx sample (C=1, load-res sources), and the
context-fusion sample (C=3+Nl, load-res sources). This times mxu / gather /
pallas on the real chip at those exact shapes so dispatch defaults are
data-driven rather than asserted.

  python scripts/sampler_bench.py [--load_dim 256] [--iters 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/waldo_jax"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_impl(impl, img, grid, precision, iters):
    """Time `iters` applications inside ONE jit call (fori_loop) and fetch a
    scalar: under the axon TPU tunnel block_until_ready() does not
    synchronize and per-dispatch overhead is tens of ms, so naive
    dispatch-loop timing measures the wire, not the kernel. The grid is
    perturbed per iteration to defeat loop-invariant hoisting."""
    import jax
    import jax.numpy as jnp

    # the ops package re-exports the function under the same name, shadowing
    # the submodule attribute — fetch the module itself
    import waldo_tpu.ops.grid_sample  # noqa: F401
    gs = sys.modules["waldo_tpu.ops.grid_sample"]

    gs.set_impl(impl)
    try:
        def loop(i0, g0):
            def body(k, acc):
                g = g0 + (k.astype(g0.dtype) * 1e-6)
                out = gs.grid_sample(i0, g, precision=precision)
                return acc + out.mean()

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        fn = jax.jit(loop)
        float(fn(img, grid))  # compile + run once
        t0 = time.perf_counter()
        v = float(fn(img, grid))
        assert v == v, v
        return (time.perf_counter() - t0) / iters * 1e3
    except Exception as e:  # outside an impl's envelope
        return f"error: {type(e).__name__}: {e}"
    finally:
        gs.set_impl("auto")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--load_dim", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", type=str, default="/tmp/sampler_bench.json")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    hd, wd = args.load_dim, args.load_dim * 2
    b, tc, tp, no, nl = 1, 4, 10, 16, 20
    rng = np.random.RandomState(0)

    def mk(bb, h, w, c, smooth=True):
        """smooth=True builds pipeline-realistic grids (identity + small
        smooth flow, like the TPS/flow warps); False is the random worst
        case where block culling cannot help."""
        img = jnp.asarray(rng.rand(bb, h, w, c).astype(np.float32))
        if smooth:
            yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                                 indexing="ij")
            base = np.stack([xx, yy], -1)[None]
            phase = rng.rand(bb, 1, 1, 2) * 6.28
            flow = 0.05 * np.sin(3 * base[..., :1] * 3.14 + phase) \
                 + 0.03 * np.cos(2 * base[..., 1:] * 3.14 + phase)
            grid = jnp.asarray((base + flow).astype(np.float32))
        else:
            grid = jnp.asarray(rng.rand(bb, h, w, 2).astype(np.float32) * 2 - 1)
        return img, grid

    cases = {
        # flow warp: obj textures sampled to output res, ctx folded in channels
        "flow_warp_obj(64x64 src, Tc*2ch)": mk(b * tp * no, 64, 64, tc * 2)
        + ("float32",),
        # alpha_ctx: per-layer alphas at load res, C=1
        f"alpha_ctx({hd}x{wd} src, C=1)": mk(b * tc * tp * (no + 1) // 8, hd, wd, 1)
        + ("fast",),
        # context fusion: rgb+layout at load res
        f"ctx_fusion({hd}x{wd} src, C={3+nl})": mk(b * tc * tp, hd, wd, 3 + nl)
        + ("fast",),
    }
    # alpha_ctx true batch is b*tc*tp*(no+1)=680; divided by 8 above to keep
    # the bench quick — per-image cost is what matters for impl choice.

    report = {}
    for name, (img, grid, precision) in cases.items():
        row = {}
        for impl in ("mxu", "gather", "pallas"):
            ms = time_impl(impl, img, grid, precision, args.iters)
            row[impl] = round(ms, 2) if isinstance(ms, float) else ms
        report[name] = {"batch": img.shape[0], **row}
        print(f"{name}: {json.dumps(row)}", flush=True)

    # the alpha_ctx warp's REAL call-site shape since grid_sample_multigrid:
    # per-layer grids ride the channel axis (B*Tc*Tp, Hd, Wd, No+1)
    import jax
    import jax.numpy as jnp

    import waldo_tpu.ops.grid_sample  # noqa: F401
    gsm = sys.modules["waldo_tpu.ops.grid_sample"]
    nlay = no + 1
    mg_img = jnp.asarray(rng.rand(b * tc * tp, hd, wd, nlay).astype(np.float32))
    mg_grids = jnp.asarray(
        np.stack([np.asarray(mk(b * tc * tp, hd, wd, 1)[1]) for _ in range(nlay)],
                 axis=1))
    row = {}
    for impl in ("auto", "mxu"):
        gsm.set_impl(impl)
        try:
            def loop(i0, g0):
                def body(k, acc):
                    g = g0 + (k.astype(g0.dtype) * 1e-6)
                    return acc + gsm.grid_sample_multigrid(
                        i0, g, precision="fast").mean()
                return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

            fn = jax.jit(loop)
            float(fn(mg_img, mg_grids))
            t0 = time.perf_counter()
            v = float(fn(mg_img, mg_grids))
            assert v == v
            row["pallas_mg" if impl == "auto" else "folded_mxu"] = round(
                (time.perf_counter() - t0) / args.iters * 1e3, 2)
        except Exception as e:
            row[impl] = f"error: {type(e).__name__}: {e}"
        finally:
            gsm.set_impl("auto")
    name = f"alpha_ctx_multigrid({hd}x{wd} src, {nlay} per-grid planes)"
    report[name] = {"batch": mg_img.shape[0], **row}
    print(f"{name}: {json.dumps(row)}", flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"written: {args.out}")


if __name__ == "__main__":
    main()
