"""Quantized GEMM (weight quantization) tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.engine.config import Precision
from umfa_tpu.ops.gemm import (
    QuantizedWeight,
    dequantize_weight,
    quantize_weight,
    quantized_matmul,
)
from umfa_tpu.utils.testing import rel_err


def _wx(rng, k=128, n=256, m=64):
    w = jnp.asarray(rng.normal(0, 1, (k, n)), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.float32)
    return w, x


def test_w8a16_accuracy(rng):
    w, x = _wx(rng)
    qw = quantize_weight(w, Precision.INT8)
    got = quantized_matmul(x, qw)
    want = np.asarray(x) @ np.asarray(w)
    assert rel_err(got, want) < 0.01


def test_w8a8_accuracy(rng):
    w, x = _wx(rng)
    qw = quantize_weight(w, Precision.INT8)
    got = quantized_matmul(x, qw, activation_precision=Precision.INT8)
    want = np.asarray(x) @ np.asarray(w)
    assert rel_err(got, want) < 0.02


def test_w4a16_accuracy(rng):
    w, x = _wx(rng)
    qw = quantize_weight(w, Precision.INT4)
    assert qw.values.shape == (64, 256)  # packed along K
    got = quantized_matmul(x, qw)
    want = np.asarray(x) @ np.asarray(w)
    assert rel_err(got, want) < 0.12


def test_centering_helps_shifted_weights(rng):
    # Columns with large means — centering shrinks the quant range.
    k, n = 128, 128
    w = jnp.asarray(rng.normal(0, 0.1, (k, n)) + rng.normal(0, 3, (1, n)),
                    jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (32, k)), jnp.float32)
    want = np.asarray(x) @ np.asarray(w)
    err_plain = rel_err(quantized_matmul(x, quantize_weight(w, Precision.INT4)), want)
    err_center = rel_err(
        quantized_matmul(x, quantize_weight(w, Precision.INT4, center=True)), want
    )
    assert err_center < err_plain / 2


def test_weight_roundtrip(rng):
    w, _ = _wx(rng)
    for prec, tol in [(Precision.INT8, 0.01), (Precision.INT4, 0.13)]:
        qw = quantize_weight(w, prec, center=True)
        assert rel_err(dequantize_weight(qw), w) < tol


def test_batched_inputs(rng):
    w, _ = _wx(rng, k=64, n=64)
    x = jnp.asarray(rng.normal(0, 1, (2, 3, 16, 64)), jnp.float32)
    qw = quantize_weight(w, Precision.INT8)
    out = quantized_matmul(x, qw)
    assert out.shape == (2, 3, 16, 64)
    want = np.einsum("...k,kn->...n", np.asarray(x), np.asarray(w))
    assert rel_err(out, want) < 0.01
