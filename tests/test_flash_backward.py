"""Backward kernels vs jax.grad of the naive reference (SURVEY.md §3.3:
FA2 two-phase backward; FP32 gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.ops.attention import flash_attention, reference_attention
from umfa_tpu.utils.testing import TOL, make_qkv


def _grads(fn, *args):
    def loss(*a):
        return jnp.sum(fn(*a) ** 2)

    return jax.grad(loss, argnums=tuple(range(len(args))))(*args)


@pytest.mark.parametrize("causal", [False, True])
def test_backward_matches_reference(rng, causal):
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)

    got = _grads(
        lambda q, k, v: flash_attention(q, k, v, causal=causal, interpret=True),
        q, k, v,
    )
    want = _grads(
        lambda q, k, v: reference_attention(q, k, v, causal=causal), q, k, v
    )
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            g, w, atol=1e-4, rtol=1e-4, err_msg=f"d{name} mismatch"
        )


def test_backward_ragged_seq(rng):
    q, k, v = make_qkv(rng, 1, 2, 200, 200, 64)
    got = _grads(
        lambda q, k, v: flash_attention(q, k, v, causal=True, interpret=True),
        q, k, v,
    )
    want = _grads(
        lambda q, k, v: reference_attention(q, k, v, causal=True), q, k, v
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-4, rtol=1e-4)


def test_backward_gqa(rng):
    q, k, v = make_qkv(rng, 1, 8, 128, 128, 64, kv_heads=2)
    got = _grads(
        lambda q, k, v: flash_attention(q, k, v, interpret=True), q, k, v
    )
    want = _grads(lambda q, k, v: reference_attention(q, k, v), q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-4, rtol=1e-4)


def test_backward_window(rng):
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    win = (64, 0)
    got = _grads(
        lambda q, k, v: flash_attention(q, k, v, window=win, interpret=True),
        q, k, v,
    )
    want = _grads(
        lambda q, k, v: reference_attention(q, k, v, window=win), q, k, v
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-4, rtol=1e-4)


def test_backward_with_bias(rng):
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    bias = jnp.asarray(rng.normal(0, 1, (1, 1, 128, 128)), jnp.float32)
    got = _grads(
        lambda q, k, v: flash_attention(q, k, v, bias, interpret=True), q, k, v
    )
    want = _grads(lambda q, k, v: reference_attention(q, k, v, bias), q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-4, rtol=1e-4)


def test_backward_bf16_grads_finite(rng):
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64, dtype=jnp.bfloat16)
    got = _grads(
        lambda q, k, v: flash_attention(q, k, v, interpret=True), q, k, v
    )
    for g in got:
        assert g.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(g, np.float32)).all()


def test_causal_diag_subtile_backward(rng):
    """Backward causal diagonal fast path (dQ prefix-split, dK/dV
    suffix-split, VERDICT r2 next #2/#3): plain causal defaults request
    EQUAL bwd tiles so every partial tile is exactly diagonal, and the
    sub-tiled path must match the reference bit-tight, GQA included."""
    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.flash_fwd import BlockSizes, _diag_subtile_count

    # Path precondition sanity (shared helper; bwd call sites prefer NS=4).
    assert _diag_subtile_count(
        1024, 1024, True, None, 4096, False, prefer_ns=(4, 2)) == 4
    assert _diag_subtile_count(
        256, 256, True, None, 1024, False, prefer_ns=(4, 2)) == 2

    bs = BlockSizes(
        block_q=256, block_k=256, block_q_dq=256, block_k_dq=256,
        block_q_dkv=256, block_k_dkv=256,
    )
    q, k, v = make_qkv(rng, 1, 4, 1024, 1024, 64, kv_heads=2)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

    got = jax.grad(
        loss(lambda q, k, v: flash_attention(
            q, k, v, causal=True, block_sizes=bs, interpret=True
        )),
        argnums=(0, 1, 2),
    )(q, k, v)
    want = jax.grad(
        loss(lambda q, k, v: reference_attention(q, k, v, causal=True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for g, gr in zip(got, want):
        rel = float(jnp.linalg.norm(g - gr) / jnp.linalg.norm(gr))
        assert rel < 3e-5, rel


def test_causal_rect_backward(rng):
    """Rectangular causal diagonal for the backward (bq = 2·bk, VERDICT r3
    #7): engages for plain causal bf16 at default tiles. S=4096 GQA covers
    both partial kinds (triangle-at-sub-block-0 with full rows below;
    triangle-at-sub-block-1) AND full (2048, 1024)-geometry tiles in both
    passes. Engagement asserted via the shared gate; the fp32 exclusion and
    the UMFA_DISABLE_RECT_BWD A/B knob are checked for equality with the
    square path."""
    from umfa_tpu.ops.flash_fwd import _rect_mode_ok

    assert _rect_mode_ok(
        causal=True, window=None, has_bias=False, has_map=False,
        has_fetch=False, default_blocks=True,
        block_k=1024, seq_q=4096, seq_k=4096,
    )
    q, k, v = make_qkv(rng, 1, 4, 4096, 4096, 64, kv_heads=2)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    got = _grads(
        lambda q, k, v: flash_attention(q, k, v, causal=True, interpret=True),
        qb, kb, vb,
    )
    want = _grads(
        lambda q, k, v: reference_attention(
            q, jnp.repeat(k, 2, 1), jnp.repeat(v, 2, 1), causal=True
        ),
        q, k, v,
    )
    for name, g, gr in zip("qkv", got, want):
        g = np.asarray(g, np.float32)
        gr = np.asarray(gr, np.float32)
        rel = float(np.linalg.norm(g - gr) / np.linalg.norm(gr))
        assert rel < 1e-2, (name, rel)


def test_causal_rect_backward_knob_matches_square(rng, monkeypatch):
    """UMFA_DISABLE_RECT_BWD=1 routes to the square diag path; both paths
    compute the same FP32 gradients up to accumulation order (bf16 inputs,
    tight tolerance since operands are identical)."""
    q, k, v = make_qkv(rng, 1, 2, 2048, 2048, 64)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    fn = lambda q, k, v: flash_attention(q, k, v, causal=True, interpret=True)
    rect = _grads(fn, qb, kb, vb)
    monkeypatch.setenv("UMFA_DISABLE_RECT_BWD", "1")
    square = _grads(fn, qb, kb, vb)
    for name, a, b in zip("qkv", rect, square):
        rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))
        assert rel < 2e-6, (name, rel)
