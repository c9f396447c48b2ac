"""Descriptor layer + capability probe."""

import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.engine.descriptor import (
    AttentionDescriptor,
    MultiHeadShape,
    SparsityPattern,
    get_quantized_capabilities,
)
from umfa_tpu.ops.attention import reference_attention
from umfa_tpu.utils.testing import TOL, make_qkv


def test_descriptor_is_hashable_cache_key():
    d1 = AttentionDescriptor(shape=MultiHeadShape(1, 2, 64, 64),
                             sparsity=SparsityPattern.CAUSAL)
    d2 = AttentionDescriptor(shape=MultiHeadShape(1, 2, 64, 64),
                             sparsity=SparsityPattern.CAUSAL)
    assert d1 == d2 and hash(d1) == hash(d2)
    assert d1 != AttentionDescriptor(shape=MultiHeadShape(1, 2, 64, 64))


def test_descriptor_runs_attention(rng):
    q, k, v = make_qkv(rng, 1, 2, 64, 64, 64)
    desc = AttentionDescriptor(
        shape=MultiHeadShape(1, 2, 64, 64), sparsity=SparsityPattern.CAUSAL
    )
    out = desc(q, k, v, interpret=True)
    want = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(out, want, **TOL["fp32"])


def test_descriptor_rejects_low_precision_intermediates():
    with pytest.raises(ValueError):
        AttentionDescriptor(
            shape=MultiHeadShape(1, 1, 64, 64),
            low_precision_intermediates=True,
        )


def test_window_requires_bounds():
    with pytest.raises(ValueError):
        AttentionDescriptor(
            shape=MultiHeadShape(1, 1, 64, 64),
            sparsity=SparsityPattern.SLIDING_WINDOW,
        )


def test_capabilities():
    caps = get_quantized_capabilities()
    assert caps["multi_head_backward"] and caps["blockwise_backward"]
    assert caps["int8"] and caps["int4"]
    assert caps["max_heads"] >= 128
    assert caps["native_bfloat"]
