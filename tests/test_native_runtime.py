"""Native C++ runtime (native/libumfa_runtime.so via ctypes)."""

import numpy as np
import pytest

from umfa_tpu.native import runtime


pytestmark = pytest.mark.skipif(
    not runtime.available(), reason="native runtime not built"
)


def test_version():
    assert "umfa_tpu-native" in runtime.version()


def test_dispatch_stats_roundtrip():
    runtime.reset_dispatch_stats()
    runtime.record_dispatch("fused_fwd")
    runtime.record_dispatch("quantized_autograd")
    runtime.record_dispatch("quantized_autograd")
    stats = runtime.get_dispatch_stats()
    assert stats["total"] == 3
    assert stats["fused_fwd"] == 1
    assert stats["quantized_autograd"] == 2
    runtime.reset_dispatch_stats()
    assert runtime.get_dispatch_stats()["total"] == 0


def test_latency_bookkeeping():
    runtime.record_latency_ns(1000)
    runtime.record_latency_ns(3000)
    assert runtime.get_last_latency_ns() == 3000
    assert runtime.get_mean_latency_ns() > 0


def test_cpu_quantizer_matches_device_quantizer(rng):
    # The C++ CPU quantizer and the jnp on-device quantizer must agree
    # (same scale rule, same rounding).
    import jax.numpy as jnp

    from umfa_tpu.engine.config import Precision, QuantMode
    from umfa_tpu.ops.quant import quantize

    x = rng.normal(0, 1, (1, 1, 16, 64)).astype(np.float32)
    q_cpu, s_cpu = runtime.quantize_int8_rowwise(x)
    qt = quantize(jnp.asarray(x), Precision.INT8, QuantMode.ROW)
    np.testing.assert_allclose(
        s_cpu.reshape(-1), np.asarray(qt.scales).reshape(-1), rtol=1e-6
    )
    # Rounding ties can differ by 1 ulp between nearbyint and jnp.round.
    diff = np.abs(
        q_cpu.reshape(-1).astype(int) - np.asarray(qt.values).reshape(-1).astype(int)
    )
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_stats_flow_through_python_api(rng):
    # engine.stats routes through the native lib when available.
    from umfa_tpu.engine import stats

    stats.reset_dispatch_stats()
    stats.record_dispatch("naive_fallback")
    got = stats.get_dispatch_stats()
    assert got["naive_fallback"] == 1
    assert got["total"] == 1
