"""Input-validation / error-path behavior (reference parity: mfa error
codes + graceful degradation, SURVEY.md §5.3 — here: clean Python errors)."""

import jax.numpy as jnp
import numpy as np
import pytest

import umfa_tpu
from umfa_tpu.ops.attention import flash_attention
from umfa_tpu.utils.testing import make_qkv


def test_gqa_head_mismatch_raises(rng):
    q, k, v = make_qkv(rng, 1, 3, 64, 64, 64)
    with pytest.raises(AssertionError):
        flash_attention(q, k[:, :2], v[:, :2], interpret=True)


def test_mask_too_many_dims_raises(rng):
    q, k, v = make_qkv(rng, 1, 2, 64, 64, 64)
    mask = jnp.ones((1, 1, 1, 64, 64), bool).at[0, 0, 0, 0, 0].set(False)
    with pytest.raises(ValueError, match="4-D"):
        umfa_tpu.attention(q, k, v, mask, interpret=True)


def test_mask_bad_broadcast_raises(rng):
    q, k, v = make_qkv(rng, 2, 2, 64, 64, 64)
    mask = jnp.ones((3, 1, 64, 64), bool).at[0, 0, 0, 0].set(False)  # batch 3 vs 2
    with pytest.raises(ValueError, match="broadcastable"):
        umfa_tpu.attention(q, k, v, mask, interpret=True)


def test_bias_and_block_mask_conflict(rng):
    from umfa_tpu.ops.block_mask import causal_block_mask

    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    bm = causal_block_mask(128, 128)
    bias = jnp.zeros((1, 1, 128, 128), jnp.float32)
    with pytest.raises(AssertionError, match="either bias or block_mask"):
        flash_attention(q, k, v, bias, block_mask=bm, interpret=True)


def test_block_mask_wrong_tiling_raises(rng):
    from umfa_tpu.ops.flash_fwd import BlockSizes
    from umfa_tpu.ops.block_mask import causal_block_mask

    q, k, v = make_qkv(rng, 1, 2, 512, 512, 64)
    bm = causal_block_mask(512, 512, block_sizes=BlockSizes(128, 128))
    # Forcing different kernel tiles must be caught, not silently misread.
    import dataclasses

    bad = dataclasses.replace(bm, block_q=256, block_k=256)
    with pytest.raises(AssertionError, match="block_map tiled"):
        flash_attention(q, k, v, block_mask=bad, interpret=True)


def test_dropout_without_key_raises(rng):
    q, k, v = make_qkv(rng, 1, 2, 64, 64, 64)
    with pytest.raises(ValueError, match="dropout_key"):
        umfa_tpu.attention(q, k, v, dropout_p=0.1, interpret=True)


def test_hadamard_bad_block_raises():
    from umfa_tpu.ops.hadamard import hadamard_rotate

    with pytest.raises(ValueError):
        hadamard_rotate(jnp.zeros((4, 96)))  # 96 not a power of two
