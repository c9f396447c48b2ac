"""Public API dispatch behavior (reference: dispatcher routing + stats,
metal_sdpa_backend.cpp:1643-1904; SURVEY.md §5.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

import umfa_tpu
from umfa_tpu.engine.stats import get_dispatch_stats, reset_dispatch_stats
from umfa_tpu.ops.attention import reference_attention
from umfa_tpu.utils.testing import TOL, make_qkv


@pytest.fixture(autouse=True)
def _clean_state():
    reset_dispatch_stats()
    umfa_tpu.clear_quantization_mode()
    yield
    umfa_tpu.clear_quantization_mode()


def test_3d_promotion(rng):
    q, k, v = make_qkv(rng, 1, 2, 64, 64, 64)
    out3 = umfa_tpu.attention(q[0], k[0], v[0], interpret=True)
    assert out3.shape == (2, 64, 64)
    out4 = umfa_tpu.attention(q, k, v, interpret=True)
    np.testing.assert_allclose(out3, out4[0], **TOL["fp32"])


def test_2d_promotion(rng):
    q, k, v = make_qkv(rng, 1, 1, 64, 64, 64)
    out2 = umfa_tpu.attention(q[0, 0], k[0, 0], v[0, 0], interpret=True)
    assert out2.shape == (64, 64)


def test_dispatch_stats_routes(rng):
    q, k, v = make_qkv(rng, 1, 2, 64, 64, 64)
    umfa_tpu.attention(q, k, v, interpret=True)
    stats = get_dispatch_stats()
    assert stats["total"] == 1
    assert stats["fused_autograd"] == 1

    umfa_tpu.set_quantization_mode("int8", "row")
    umfa_tpu.attention(q, k, v, interpret=True)
    stats = get_dispatch_stats()
    assert stats["quantized_autograd"] == 1
    umfa_tpu.clear_quantization_mode()


def test_all_true_mask_elision(rng):
    # Reference: metal_sdpa_backend.cpp:1767-1784.
    q, k, v = make_qkv(rng, 1, 2, 64, 64, 64)
    mask = jnp.ones((64, 64), dtype=bool)
    out = umfa_tpu.attention(q, k, v, mask, interpret=True)
    stats = get_dispatch_stats()
    assert stats["mask_all_true_skipped"] == 1
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(out, want, **TOL["fp32"])


def test_bool_mask_semantics(rng):
    # True = attend (reference: mfa_ffi.h:46-64).
    q, k, v = make_qkv(rng, 1, 2, 64, 64, 64)
    mask = jnp.asarray(rng.random((1, 1, 64, 64)) > 0.3)
    out = umfa_tpu.attention(q, k, v, mask, interpret=True)
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    want = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(out, want, atol=1e-4, rtol=1e-4)


def test_use_quantization_context(rng):
    q, k, v = make_qkv(rng, 1, 2, 64, 64, 64)
    with umfa_tpu.use_quantization("int8", "row"):
        out_q = umfa_tpu.attention(q, k, v, interpret=True)
    out_d = umfa_tpu.attention(q, k, v, interpret=True)
    want = reference_attention(q, k, v)
    # Quantized differs slightly from dense; both close to reference.
    assert not np.allclose(np.asarray(out_q), np.asarray(out_d))
    np.testing.assert_allclose(out_d, want, **TOL["fp32"])


def test_attention_with_lse(rng):
    q, k, v = make_qkv(rng, 1, 2, 64, 64, 64)
    out, lse = umfa_tpu.attention_with_lse(q, k, v, interpret=True)
    assert lse.shape == (1, 2, 64)
    assert np.isfinite(np.asarray(lse)).all()


def test_attention_with_lse_quantized_route(rng):
    # Regression: return_lse under an active quantization mode must still
    # return the (out, lse) pair.
    q, k, v = make_qkv(rng, 1, 2, 64, 64, 64)
    with umfa_tpu.use_quantization("int8", "row"):
        out, lse = umfa_tpu.attention_with_lse(q, k, v, interpret=True)
    assert out.shape == (1, 2, 64, 64)
    assert lse.shape == (1, 2, 64)


def test_fp16_inputs(rng):
    # Reference supports FP16 inputs (mfa_ffi.h precision enum).
    q, k, v = make_qkv(rng, 1, 2, 64, 64, 64, dtype=jnp.float16)
    out = umfa_tpu.attention(q, k, v, is_causal=True, interpret=True)
    assert out.dtype == jnp.float16
    want = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=True,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want), **TOL["fp16"]
    )


def test_numpy_inputs_accepted(rng):
    # Reference parity: umfa.attention takes numpy arrays zero-copy
    # (core.py:120-126); here numpy flows through jnp.asarray.
    q = rng.normal(0, 1, (1, 2, 64, 64)).astype(np.float32)
    k = rng.normal(0, 1, (1, 2, 64, 64)).astype(np.float32)
    v = rng.normal(0, 1, (1, 2, 64, 64)).astype(np.float32)
    out = umfa_tpu.attention(q, k, v, interpret=True)
    want = reference_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), want, **TOL["fp32"])


def test_dropout_route(rng):
    import jax

    q, k, v = make_qkv(rng, 1, 2, 64, 64, 64)
    out = umfa_tpu.attention(
        q, k, v, dropout_p=0.5, dropout_key=jax.random.PRNGKey(0),
        interpret=True,
    )
    stats = get_dispatch_stats()
    assert stats["naive_fallback"] == 1
    # E[dropout attention] == attention; single sample just needs sanity.
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(
        umfa_tpu.attention(q, k, v, interpret=True)))
    with pytest.raises(ValueError):
        umfa_tpu.attention(q, k, v, dropout_p=0.5, interpret=True)


def test_explicit_quant_config_overrides_global(rng):
    from umfa_tpu.engine.config import Precision, QuantizationConfig

    q, k, v = make_qkv(rng, 1, 2, 64, 64, 64)
    umfa_tpu.set_quantization_mode("int4", "tensor")
    cfg = QuantizationConfig()  # int8 row
    out = umfa_tpu.attention(q, k, v, quantization=cfg, interpret=True)
    want = reference_attention(q, k, v)
    err = np.linalg.norm(np.asarray(out) - want) / np.linalg.norm(want)
    assert err < 0.02  # int8-grade, not int4-grade


def test_quantized_route_applies_block_mask(rng):
    """API-level regression for VERDICT r1 weak #1: quantized route +
    tile-aligned BlockMask must not silently attend everywhere."""
    import jax.numpy as jnp
    import numpy as np
    from umfa_tpu.ops.attention import reference_attention
    from umfa_tpu.ops.block_mask import make_block_mask
    from umfa_tpu.ops.flash_fwd import BlockSizes
    from umfa_tpu.utils.testing import make_qkv, rel_err

    seq = 256
    bs = BlockSizes(block_q=128, block_k=128)
    q_ids = jnp.arange(seq)[:, None]
    k_ids = jnp.arange(seq)[None, :]
    mask = (q_ids // 128) == (k_ids // 128)
    bm = make_block_mask(mask, seq, seq, block_sizes=bs)
    assert bm.bias is None

    q, k, v = make_qkv(rng, 1, 2, seq, seq, 64)
    with umfa_tpu.use_quantization("int8", "row"):
        out = umfa_tpu.attention(q, k, v, mask=bm, block_sizes=bs, interpret=True)
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    want = reference_attention(q, k, v, bias[None, None])
    assert rel_err(out, want) < 0.02


def test_byte_mask_is_boolean(rng):
    """Byte (uint8/int32) masks are boolean-valued (nonzero = attend), like
    the reference's byte-mask support — not additive bias."""
    import umfa_tpu
    from umfa_tpu.ops.attention import reference_attention

    q = jnp.asarray(rng.normal(0, 1, (1, 2, 64, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (1, 2, 64, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (1, 2, 64, 64)), jnp.float32)
    bool_mask = jnp.asarray(rng.random((1, 1, 64, 64)) > 0.3)
    byte_mask = bool_mask.astype(jnp.uint8)
    got = umfa_tpu.attention(q, k, v, byte_mask, interpret=True)
    want = umfa_tpu.attention(q, k, v, bool_mask, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-6
    )
