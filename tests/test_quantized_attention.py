"""Quantized fused attention accuracy + STE backward acceptance.

Acceptance criteria from the reference (BASELINE.md): INT8 kernel-level
relative error small vs FP32; INT4 coarser; quantized backward
cosine ≥ 0.7 and relative error ≤ 30% vs the float reference
(docs/attic/QUANTIZED_TRAINING_BINDINGS.md:14)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.engine.config import (
    Precision,
    QuantMode,
    QuantStrategy,
    QuantizationConfig,
)
from umfa_tpu.ops.attention import reference_attention
from umfa_tpu.ops.quant_attention import quantized_flash_attention
from umfa_tpu.utils.testing import (
    BWD_COSINE_MIN,
    BWD_REL_ERR_MAX,
    INT4_REL_ERR,
    INT8_REL_ERR,
    cosine,
    make_qkv,
    rel_err,
)


def _cfg(precision, mode=QuantMode.ROW, strategy=QuantStrategy.SYMMETRIC,
         hadamard=False):
    return QuantizationConfig(
        q_precision=precision, k_precision=precision, v_precision=precision,
        mode=mode, strategy=strategy, hadamard=hadamard,
    )


@pytest.mark.parametrize("mode", [QuantMode.TENSOR, QuantMode.ROW, QuantMode.BLOCK])
def test_int8_accuracy(rng, mode):
    q, k, v = make_qkv(rng, 1, 4, 256, 256, 64)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT8, mode), interpret=True
    )
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT8_REL_ERR, mode


@pytest.mark.parametrize("strategy", [QuantStrategy.SYMMETRIC, QuantStrategy.ASYMMETRIC])
def test_int8_strategies(rng, strategy):
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT8, strategy=strategy), interpret=True
    )
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT8_REL_ERR, strategy


def test_int8_causal(rng):
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT8), causal=True, interpret=True
    )
    want = reference_attention(q, k, v, causal=True)
    assert rel_err(out, want) < INT8_REL_ERR


def test_int4_accuracy(rng):
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT4), interpret=True
    )
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT4_REL_ERR


def test_int4_blockwise_window_bias(rng):
    # BASELINE config 3 (reduced shape): INT4 block-wise + sliding window +
    # arbitrary bias.
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    bias = jnp.asarray(rng.normal(0, 0.5, (1, 1, 256, 256)), jnp.float32)
    win = (64, -1)
    out = quantized_flash_attention(
        q, k, v, bias, config=_cfg(Precision.INT4, QuantMode.BLOCK),
        window=win, interpret=True,
    )
    want = reference_attention(q, k, v, bias, window=win)
    # BLOCK granularity is coarser than ROW and windows shrink the softmax
    # support — slightly wider envelope on worst-case i.i.d. inputs.
    assert rel_err(out, want) < INT4_REL_ERR * 1.25


def test_mixed_precision_operands(rng):
    # Per-operand precision (reference: QuantizedAttention.Configuration).
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    cfg = QuantizationConfig(
        q_precision=Precision.INT8,
        k_precision=Precision.INT8,
        v_precision=Precision.INT4,
        mode=QuantMode.ROW,
    )
    out = quantized_flash_attention(q, k, v, config=cfg, interpret=True)
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT4_REL_ERR


def test_hadamard_rotation_path(rng):
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT4, hadamard=True), interpret=True
    )
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT4_REL_ERR


def test_hadamard_helps_outliers(rng):
    # Random-sign outliers in one channel (not removable by mean smoothing)
    # — FWHT spreads their energy across the block.
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    spike = np.zeros((1, 2, 128, 64), np.float32)
    spike[..., 3] = rng.choice([-30.0, 30.0], size=(1, 2, 128))
    q = q + jnp.asarray(spike)
    want = reference_attention(q, k, v)
    err_plain = rel_err(
        quantized_flash_attention(
            q, k, v, config=_cfg(Precision.INT4, QuantMode.TENSOR), interpret=True
        ),
        want,
    )
    err_had = rel_err(
        quantized_flash_attention(
            q, k, v,
            config=_cfg(Precision.INT4, QuantMode.TENSOR, hadamard=True),
            interpret=True,
        ),
        want,
    )
    assert err_had < err_plain


def test_pv_int8_fully_integer_path(rng):
    # Opt-in integer P·V: accuracy stays int8-grade despite per-tile V
    # scales + P rounding.
    import dataclasses

    q, k, v = make_qkv(rng, 1, 4, 256, 256, 64)
    cfg = dataclasses.replace(_cfg(Precision.INT8), pv_int8=True)
    out = quantized_flash_attention(q, k, v, config=cfg, interpret=True)
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT8_REL_ERR * 1.5
    # causal too
    out_c = quantized_flash_attention(
        q, k, v, config=cfg, causal=True, interpret=True
    )
    want_c = reference_attention(q, k, v, causal=True)
    assert rel_err(out_c, want_c) < INT8_REL_ERR * 1.5


def test_quantized_backward_ste(rng):
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)

    def loss_q(q, k, v):
        return jnp.sum(
            quantized_flash_attention(
                q, k, v, config=_cfg(Precision.INT8), interpret=True
            )
            ** 2
        )

    def loss_f(q, k, v):
        return jnp.sum(reference_attention(q, k, v) ** 2)

    got = jax.grad(loss_q, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        assert cosine(g, w) >= BWD_COSINE_MIN, f"d{name} cosine"
        assert rel_err(g, w) <= BWD_REL_ERR_MAX, f"d{name} rel err"


def test_quantized_gqa(rng):
    q, k, v = make_qkv(rng, 1, 8, 128, 128, 64, kv_heads=2)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT8), interpret=True
    )
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT8_REL_ERR


def test_quantized_lse_close_to_dense(rng):
    # smooth=False: K-channel smoothing deliberately shifts LSE by a per-row
    # constant (softmax-invariant), so only the unsmoothed LSE is comparable.
    import dataclasses

    from umfa_tpu.ops.flash_fwd import flash_attention_forward

    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    cfg = dataclasses.replace(_cfg(Precision.INT8), smooth=False)
    _, lse_q = quantized_flash_attention(
        q, k, v, config=cfg, interpret=True, return_lse=True
    )
    _, lse_d = flash_attention_forward(q, k, v, interpret=True)
    np.testing.assert_allclose(lse_q, lse_d, atol=0.1, rtol=0.02)
