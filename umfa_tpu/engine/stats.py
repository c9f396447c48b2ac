"""Dispatch-route statistics.

Parity with the reference's DispatchStats atomics
(metal_sdpa_backend.h:664-679, metal_sdpa_backend.cpp:3391-3417): every call
through the public `attention()` entrypoint records which route handled it.
When the native C++ runtime is built (umfa_tpu/native), counters live in
process-wide atomics there; otherwise a Python fallback dict is used.
"""

from __future__ import annotations

import threading
from typing import Dict

_ROUTES = (
    "total",
    "fused_fwd",            # Pallas fused kernel, inference
    "fused_autograd",       # differentiable custom_vjp path
    "quantized_fwd",        # quantized fused kernel, inference
    "quantized_autograd",   # quantized + STE backward
    "rope_fused",           # fused RoPE + attention
    "naive_fallback",       # jnp reference path (unsupported config)
    "mask_all_true_skipped",
    "window_auto_tiled",   # plain window= promoted to an auto-tiled walk
)

_lock = threading.Lock()
_counters: Dict[str, int] = {r: 0 for r in _ROUTES}


def _native():
    try:
        from umfa_tpu.native import runtime

        return runtime if runtime.available() else None
    except Exception:
        return None


def record_dispatch(route: str) -> None:
    nat = _native()
    if nat is not None:
        nat.record_dispatch(route)
        return
    with _lock:
        _counters["total"] += 1
        if route in _counters:
            _counters[route] += 1


def get_dispatch_stats() -> Dict[str, int]:
    nat = _native()
    if nat is not None:
        return nat.get_dispatch_stats()
    with _lock:
        return dict(_counters)


def reset_dispatch_stats() -> None:
    nat = _native()
    if nat is not None:
        nat.reset_dispatch_stats()
        return
    with _lock:
        for key in _counters:
            _counters[key] = 0
