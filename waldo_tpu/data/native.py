"""ctypes bindings for the C++ data-path kernels (csrc/waldo_native.cpp).

ctypes releases the GIL during calls, so the loader's thread pool transforms
frames in parallel. Every function has a numpy fallback (the pure-python
path in base.py); `available()` gates usage.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.environ.get("WALDO_NATIVE_LIB", ""),
        os.path.join(here, "build", "libwaldo_native.so"),
    ):
        if cand and os.path.exists(cand):
            return cand
    return None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB if _LIB is not False else None
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as e:
        # a corrupt/truncated .so (e.g. interrupted build) must degrade to
        # the numpy fallback, not crash the loader's worker threads — this
        # hung a 5.5h round-3 training run at iteration 0
        import warnings

        warnings.warn(f"failed to load {path} ({e}); using numpy data path")
        _LIB = False
        return None
    i32 = ctypes.c_int32
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.layout_onehot_resize.argtypes = [i32p, i32, i32, i32, i32p, i32,
                                         i32, i32, i32, i32, i32, i32, i32, i32, f32p]
    lib.flow_normalize_resize.argtypes = [f32p, i32, i32, ctypes.c_float, i32, i32,
                                          i32, i32, i32, i32, i32, i32, f32p]
    lib.rgb_transform.argtypes = [u8p, i32, i32, i32, i32, i32, i32,
                                  i32, i32, i32, i32, f32p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def layout_onehot_resize(lyt: np.ndarray, num_lyt: int, remap, top, left, ch, cw,
                         out_h, out_w, flip_x=False, flip_y=False) -> np.ndarray:
    lib = _load()
    lyt = np.ascontiguousarray(lyt, np.int32)
    remap = np.ascontiguousarray(np.asarray(remap, np.int32).reshape(-1))
    out = np.empty((out_h, out_w, num_lyt), np.float32)
    lib.layout_onehot_resize(lyt, lyt.shape[0], lyt.shape[1], num_lyt,
                             remap, len(remap) // 2, top, left, ch, cw,
                             out_h, out_w, int(flip_x), int(flip_y), out)
    return out


def flow_normalize_resize(flow: np.ndarray, zoom, flip_x, flip_y, top, left, ch, cw,
                          out_h, out_w) -> np.ndarray:
    lib = _load()
    flow = np.ascontiguousarray(flow, np.float32)
    out = np.empty((out_h, out_w, 2), np.float32)
    lib.flow_normalize_resize(flow, flow.shape[0], flow.shape[1],
                              float(zoom), int(flip_x), int(flip_y),
                              top, left, ch, cw, out_h, out_w, out)
    return out


def rgb_transform(img: np.ndarray, top, left, ch, cw, out_h, out_w,
                  flip_x=False, flip_y=False) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((out_h, out_w, 3), np.float32)
    lib.rgb_transform(img, img.shape[0], img.shape[1], top, left, ch, cw,
                      out_h, out_w, int(flip_x), int(flip_y), out)
    return out
