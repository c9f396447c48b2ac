"""Profiling / latency observability.

Parity with the reference's GPU-true timing surface
(MFAContext.lastGPULatency + mfa_get_gpu_latency, MFABridge.swift:139-140,
1607-1612) and its benchmark reporting: a `timed()` context that records
wall latency into the native runtime's atomics, plus `trace()` wrapping
jax.profiler for XLA-level kernel timelines.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def timed(record: bool = True):
    """Time a block (host-observed, after block_until_ready of whatever the
    block returns is the caller's job). Records into the native runtime when
    available so `get_last_latency_ns()` works across the process."""
    t0 = time.perf_counter_ns()
    yield
    dt = time.perf_counter_ns() - t0
    if record:
        try:
            from umfa_tpu.native import runtime

            if runtime.available():
                runtime.record_latency_ns(dt)
        except Exception:
            pass


def get_last_latency_ms() -> Optional[float]:
    """Reference: mfa_get_gpu_latency (seconds there, ms here)."""
    try:
        from umfa_tpu.native import runtime

        if runtime.available():
            return runtime.get_last_latency_ns() / 1e6
    except Exception:
        pass
    return None


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/umfa_trace"):
    """XLA profiler trace (view with tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
