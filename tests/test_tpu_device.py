"""Real-TPU tests (run with UMFA_TEST_TPU=1 python -m pytest tests/ -m tpu).

Skipped automatically off-device. These verify Mosaic compilation and
hardware numerics — interpret-mode green does not imply Mosaic green
(see .claude/skills/verify/SKILL.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.ops.attention import flash_attention, reference_attention
from umfa_tpu.utils.testing import make_qkv, rel_err

pytestmark = pytest.mark.tpu


def test_fp32_precision_on_hardware(rng):
    # FP32 must use HIGHEST MXU precision: 1e-5-grade, not bf16-pass 2e-3.
    q, k, v = make_qkv(rng, 1, 4, 512, 512, 64)
    out = flash_attention(q, k, v, causal=True)
    want = reference_attention(q, k, v, causal=True)
    assert rel_err(out, want) < 1e-5


def test_bf16_on_hardware(rng):
    q, k, v = make_qkv(rng, 1, 4, 512, 512, 64, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v)
    want = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    assert rel_err(np.asarray(out, np.float32), want) < 5e-3


def test_int8_int4_compile_and_accuracy(rng):
    from umfa_tpu.engine.config import Precision, QuantizationConfig

    q, k, v = make_qkv(rng, 1, 2, 512, 512, 64)
    from umfa_tpu.ops.quant_attention import quantized_flash_attention

    want = np.asarray(reference_attention(q, k, v))
    out8 = quantized_flash_attention(q, k, v, config=QuantizationConfig())
    assert rel_err(out8, want) < 0.02
    cfg4 = QuantizationConfig(
        q_precision=Precision.INT4, k_precision=Precision.INT4,
        v_precision=Precision.INT4,
    )
    out4 = quantized_flash_attention(q, k, v, config=cfg4)
    assert rel_err(out4, want) < 0.35


def test_backward_on_hardware(rng):
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    got = jax.grad(lambda q: jnp.sum(flash_attention(q, k, v) ** 2))(q)
    want = jax.grad(lambda q: jnp.sum(reference_attention(q, k, v) ** 2))(q)
    assert rel_err(got, want) < 1e-4


def test_decode_on_hardware(rng):
    from umfa_tpu.serving import decode_attention, init_quantized_cache
    from umfa_tpu.serving.kv_cache import append_quantized

    q_full, k_full, v_full = make_qkv(rng, 1, 4, 64, 64, 64)
    cache = init_quantized_cache(1, 4, 128, 64)
    cache = append_quantized(cache, k_full, v_full)
    out = decode_attention(q_full[:, :, -1:], cache)
    want = np.asarray(reference_attention(q_full[:, :, -1:], k_full, v_full))
    assert rel_err(np.asarray(out, np.float32), want) < 0.03


def test_ring_rdma_selfloop_mosaic(rng):
    """Mosaic codegen of the FULL RDMA ring protocol on one chip (VERDICT
    r3 #5): make_async_remote_copy sends/waits, the barrier semaphore, the
    capacity-credit flow control, and the double-buffered HBM comm buffer
    all compile and run (n_steps=4 exercises the credit wait). Parity vs
    the single-device dense kernel."""
    from umfa_tpu.parallel.ring_pallas import ring_pallas_selfloop_check

    rel, _, _ = ring_pallas_selfloop_check(seq=1024, n_steps=4, causal=True)
    assert rel < 5e-3


def test_ring_rdma_selfloop_bwd_mosaic(rng):
    """Mosaic codegen of the structural reverse-ring protocol on one chip
    (VERDICT r3 #6): dual-buffer RDMA (bf16 KV + f32 dKV), phase-split
    sends, capacity credits, and both RMW accumulation paths compile and
    run; (dq, dk, dv) parity vs the dense backward."""
    from umfa_tpu.parallel.ring_pallas import ring_pallas_selfloop_bwd_check

    assert ring_pallas_selfloop_bwd_check(seq=1024, n_steps=4, causal=True) < 2e-2
