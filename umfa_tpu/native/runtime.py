"""ctypes binding for libumfa_runtime.so.

Mirrors the reference's ctypes layer (examples/python-ffi/src/umfa/_ffi.py:
dylib discovery + signature declarations) — but the device compute path is
XLA/Pallas, so the native library only carries process-global runtime state
(dispatch stats, quantization-mode atomics, latency) and CPU reference
quantizers. Builds lazily with `make -C native` when the .so is missing and
a toolchain is present; everything degrades gracefully to pure Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

_ROUTE_NAMES = (
    "total",
    "fused_fwd",
    "fused_autograd",
    "quantized_fwd",
    "quantized_autograd",
    "rope_fused",
    "naive_fallback",
    "mask_all_true_skipped",
    "window_auto_tiled",
)
_ROUTE_IDS = {name: i for i, name in enumerate(_ROUTE_NAMES)}

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SO_PATH = os.path.join(_REPO_ROOT, "native", "build", "libumfa_runtime.so")

_lib = None
_load_lock = threading.Lock()
_load_attempted = False


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "native")],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    with _load_lock:
        if _load_attempted:
            return _lib
        _load_attempted = True
        if not os.path.exists(_SO_PATH):
            if os.environ.get("UMFA_NO_NATIVE_BUILD") == "1" or not _try_build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.umfa_version.restype = ctypes.c_char_p
        lib.umfa_record_dispatch.argtypes = [ctypes.c_int]
        lib.umfa_get_dispatch_stats.argtypes = [
            ctypes.POINTER(ctypes.c_uint64 * len(_ROUTE_NAMES))
        ]
        lib.umfa_set_quantization_mode.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.umfa_get_quantization_mode.argtypes = [
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.umfa_get_quantization_mode.restype = ctypes.c_int
        lib.umfa_record_latency_ns.argtypes = [ctypes.c_uint64]
        lib.umfa_get_last_latency_ns.restype = ctypes.c_uint64
        lib.umfa_get_mean_latency_ns.restype = ctypes.c_double

        f32p = ctypes.POINTER(ctypes.c_float)
        i8p = ctypes.POINTER(ctypes.c_int8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64 = ctypes.c_int64
        lib.umfa_quantize_int8_rowwise.argtypes = [f32p, i64, i64, i8p, f32p]
        lib.umfa_quantize_int8_rowwise.restype = ctypes.c_int
        lib.umfa_quantize_int8_rowwise_asym.argtypes = [
            f32p, i64, i64, i8p, f32p, i32p,
        ]
        lib.umfa_quantize_int8_rowwise_asym.restype = ctypes.c_int
        lib.umfa_quantize_int4_rowwise.argtypes = [f32p, i64, i64, i8p, f32p]
        lib.umfa_quantize_int4_rowwise.restype = ctypes.c_int
        lib.umfa_dequantize_int8_rowwise.argtypes = [i8p, f32p, i64, i64, f32p]
        lib.umfa_dequantize_int8_rowwise.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def version() -> str:
    lib = _load()
    return lib.umfa_version().decode() if lib else "unavailable"


def record_dispatch(route: str) -> None:
    lib = _load()
    lib.umfa_record_dispatch(_ROUTE_IDS.get(route, 0))


def get_dispatch_stats() -> Dict[str, int]:
    lib = _load()
    buf = (ctypes.c_uint64 * len(_ROUTE_NAMES))()
    lib.umfa_get_dispatch_stats(ctypes.byref(buf))
    return {name: int(buf[i]) for i, name in enumerate(_ROUTE_NAMES)}


def reset_dispatch_stats() -> None:
    _load().umfa_reset_dispatch_stats()


def record_latency_ns(ns: int) -> None:
    _load().umfa_record_latency_ns(ns)


def get_last_latency_ns() -> int:
    return int(_load().umfa_get_last_latency_ns())


def get_mean_latency_ns() -> float:
    return float(_load().umfa_get_mean_latency_ns())


def quantize_int8_rowwise(x):
    """CPU reference quantizer (numpy in / out). Used by tests to validate
    the on-device quantizer and for host-side data prep."""
    import numpy as np

    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    rows = int(np.prod(x.shape[:-1]))
    cols = x.shape[-1]
    out = np.empty((rows, cols), np.int8)
    scales = np.empty((rows,), np.float32)
    rc = lib.umfa_quantize_int8_rowwise(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows, cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"umfa_quantize_int8_rowwise failed: {rc}")
    return out.reshape(x.shape), scales.reshape(x.shape[:-1])
