"""Quantizer round-trip bounds — parity with Tests/QuantizationTests
(QuantizationTests.swift:7-46: INT8 RMSE < 0.1 on ±5, INT4 RMSE < 0.2 on ±1,
symmetric zero-point == 0, packing ratios)."""

import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.engine.config import Precision, QuantMode, QuantStrategy
from umfa_tpu.ops.quant import (
    QuantizedTensor,
    dequantize,
    fake_quantize,
    pack_int4,
    quantize,
    unpack_int4,
)


def _rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def test_int8_roundtrip_rmse(rng):
    x = jnp.asarray(rng.uniform(-5, 5, (2, 4, 128, 64)), jnp.float32)
    for mode in (QuantMode.TENSOR, QuantMode.ROW, QuantMode.BLOCK):
        qt = quantize(x, Precision.INT8, mode)
        assert _rmse(dequantize(qt), x) < 0.1, mode


def test_int4_roundtrip_rmse(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (2, 4, 128, 64)), jnp.float32)
    for mode in (QuantMode.TENSOR, QuantMode.ROW, QuantMode.BLOCK):
        qt = quantize(x, Precision.INT4, mode)
        assert _rmse(dequantize(qt), x) < 0.2, mode


def test_symmetric_zero_point_is_none(rng):
    x = jnp.asarray(rng.normal(0, 1, (1, 1, 64, 64)), jnp.float32)
    qt = quantize(x, Precision.INT8, QuantMode.ROW, QuantStrategy.SYMMETRIC)
    assert qt.zero_points is None


def test_asymmetric_roundtrip(rng):
    # Strongly shifted distribution — asymmetric should beat symmetric.
    x = jnp.asarray(rng.uniform(3, 5, (1, 2, 64, 64)), jnp.float32)
    qt_a = quantize(x, Precision.INT8, QuantMode.ROW, QuantStrategy.ASYMMETRIC)
    qt_s = quantize(x, Precision.INT8, QuantMode.ROW, QuantStrategy.SYMMETRIC)
    assert qt_a.zero_points is not None
    assert qt_a.row_sums is not None
    assert _rmse(dequantize(qt_a), x) < _rmse(dequantize(qt_s), x)


def test_int4_packing_exact(rng):
    x = jnp.asarray(rng.integers(-8, 8, (4, 64)), jnp.int8)
    packed = pack_int4(x)
    assert packed.shape == (4, 32)
    np.testing.assert_array_equal(unpack_int4(packed), x)


def test_compression_ratio(rng):
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 256, 64)), jnp.float32)
    qt8 = quantize(x, Precision.INT8, QuantMode.TENSOR)
    qt4 = quantize(x, Precision.INT4, QuantMode.TENSOR)
    assert qt8.compression_ratio > 3.9  # ~4x vs fp32
    assert qt4.compression_ratio > 7.8  # ~8x vs fp32


def test_blockwise_scales_vary_per_block(rng):
    # Rows 0..63 tiny, rows 64..127 large — block scales must differ.
    lo = rng.normal(0, 0.01, (1, 1, 64, 64))
    hi = rng.normal(0, 10.0, (1, 1, 64, 64))
    x = jnp.asarray(np.concatenate([lo, hi], axis=2), jnp.float32)
    qt = quantize(x, Precision.INT8, QuantMode.BLOCK, block_size=64)
    scales = np.asarray(qt.scales)[0, 0, :, 0]
    assert scales[:64].max() < scales[64:].min() / 100
    # Blockwise roundtrip error on the small-magnitude block must be far
    # below tensorwise (where the large block's scale swamps the small one).
    qt_t = quantize(x, Precision.INT8, QuantMode.TENSOR)
    err_b = _rmse(dequantize(qt)[:, :, :64], x[:, :, :64])
    err_t = _rmse(dequantize(qt_t)[:, :, :64], x[:, :, :64])
    assert err_b < err_t / 10


def test_fake_quantize_dtype_preserved(rng):
    x = jnp.asarray(rng.normal(0, 1, (1, 1, 64, 64)), jnp.bfloat16)
    y = fake_quantize(x)
    assert y.dtype == jnp.bfloat16


def test_quantized_tensor_is_pytree(rng):
    import jax

    x = jnp.asarray(rng.normal(0, 1, (1, 1, 64, 64)), jnp.float32)
    qt = quantize(x)
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(qt.values, qt2.values)


def test_fused_row_quantizer_matches_jnp(rng):
    """ops/quant_fused.quantize_rows_fused ≈ quantize(x - mean, ROW, SYM).

    XLA rewrites divide-by-constant into reciprocal-multiply in the jnp
    path, so scales can differ by 1 ulp and values by ±1 at exact
    round-half ties; the STE contract only needs fwd/bwd to share the
    STORED values+scales (true by construction)."""
    import jax.numpy as jnp
    import numpy as np
    from umfa_tpu.engine.config import Precision, QuantMode, QuantStrategy
    from umfa_tpu.ops.quant import dequantize, quantize
    from umfa_tpu.ops.quant_fused import quantize_rows_fused

    x = jnp.asarray(rng.normal(0, 2, (2, 3, 300, 64)), jnp.float32)
    mean = jnp.mean(x, axis=2, keepdims=True)
    for prec in (Precision.INT8, Precision.INT4):
        qt_f = quantize_rows_fused(x, mean, precision=prec, interpret=True)
        qt_j = quantize(
            x - mean, prec, QuantMode.ROW, QuantStrategy.SYMMETRIC
        )
        np.testing.assert_allclose(
            np.asarray(qt_f.scales), np.asarray(qt_j.scales), rtol=1e-6
        )
        df = np.asarray(dequantize(qt_f, jnp.float32))
        dj = np.asarray(dequantize(qt_j, jnp.float32))
        np.testing.assert_allclose(df, dj, rtol=1e-5, atol=1e-6)


def test_fused_row_quantizer_no_mean(rng):
    import jax.numpy as jnp
    import numpy as np
    from umfa_tpu.engine.config import Precision, QuantMode, QuantStrategy
    from umfa_tpu.ops.quant import unpack_int4, quantize
    from umfa_tpu.ops.quant_fused import quantize_rows_fused

    x = jnp.asarray(rng.normal(0, 1, (1, 2, 256, 128)), jnp.bfloat16)
    qt_f = quantize_rows_fused(x, None, precision=Precision.INT8, interpret=True)
    qt_j = quantize(x, Precision.INT8, QuantMode.ROW, QuantStrategy.SYMMETRIC)
    diff = np.abs(
        np.asarray(qt_f.values, np.int32) - np.asarray(qt_j.values, np.int32)
    )
    assert diff.max() <= 1 and np.mean(diff != 0) < 2e-3
    assert qt_f.orig_dtype == jnp.bfloat16
    # INT4 packing layout matches unpack_int4.
    qt_4 = quantize_rows_fused(x, None, precision=Precision.INT4, interpret=True)
    vals = np.asarray(unpack_int4(qt_4.values))
    assert vals.min() >= -8 and vals.max() <= 7


def test_hybrid_warns_once_under_trace(rng):
    """HYBRID degrades to ROW under jit tracing (data is abstract); it must
    warn ONCE instead of silently pinning ROW in jitted training loops."""
    import warnings

    import jax
    import jax.numpy as jnp
    from umfa_tpu.ops import quant as quant_mod
    from umfa_tpu.ops.quant import choose_mode
    from umfa_tpu.engine.config import QuantMode

    x = jnp.asarray(rng.normal(0, 1, (1, 2, 64, 64)), jnp.float32)

    # Eager: concrete data, no warning, mode picked from statistics.
    quant_mod._hybrid_trace_warned = False
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert choose_mode(x) in (QuantMode.TENSOR, QuantMode.ROW, QuantMode.BLOCK)

    # Traced: warns exactly once across repeated traces.
    quant_mod._hybrid_trace_warned = False
    modes = []
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        for _ in range(2):
            jax.make_jaxpr(lambda x: (modes.append(choose_mode(x)), x)[1])(x)
    assert modes == [QuantMode.ROW, QuantMode.ROW]
    hybrid_warnings = [w for w in caught if "HYBRID" in str(w.message)]
    assert len(hybrid_warnings) == 1
