"""Trainable-bias gradients (dbias kernel with in-kernel broadcast
reduction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.ops.attention import flash_attention, reference_attention
from umfa_tpu.utils.testing import make_qkv


def _dbias(shape_bias, rng, causal=False, b=2, h=4, s=128, d=64):
    q, k, v = make_qkv(rng, b, h, s, s, d)
    bias = jnp.asarray(rng.normal(0, 0.5, shape_bias), jnp.float32)

    def loss(bias):
        return jnp.sum(
            flash_attention(q, k, v, bias, causal=causal, bias_grad=True,
                            interpret=True) ** 2
        )

    def ref_loss(bias):
        return jnp.sum(reference_attention(q, k, v, bias, causal=causal) ** 2)

    got = jax.grad(loss)(bias)
    want = jax.grad(ref_loss)(bias)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )


def test_dbias_full_shape(rng):
    _dbias((2, 4, 128, 128), rng)


def test_dbias_broadcast_heads(rng):
    _dbias((2, 1, 128, 128), rng)


def test_dbias_broadcast_batch(rng):
    _dbias((1, 4, 128, 128), rng)


def test_dbias_broadcast_both(rng):
    _dbias((1, 1, 128, 128), rng)


def test_dbias_causal(rng):
    _dbias((1, 1, 128, 128), rng, causal=True)


def test_dbias_q_broadcast(rng):
    # ALiBi-style (1, H, 1, Sk) bias.
    _dbias((1, 4, 1, 128), rng)


def test_dbias_quantized_path(rng):
    from umfa_tpu.engine.config import QuantizationConfig
    from umfa_tpu.ops.quant_attention import quantized_flash_attention
    from umfa_tpu.utils.testing import cosine

    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    bias = jnp.asarray(rng.normal(0, 0.5, (1, 1, 128, 128)), jnp.float32)

    got = jax.grad(
        lambda b: jnp.sum(
            quantized_flash_attention(
                q, k, v, b, config=QuantizationConfig(), bias_grad=True,
                interpret=True,
            ) ** 2
        )
    )(bias)
    want = jax.grad(
        lambda b: jnp.sum(reference_attention(q, k, v, b) ** 2)
    )(bias)
    assert cosine(got, want) > 0.99


def test_dbias_off_by_default(rng):
    q, k, v = make_qkv(rng, 1, 2, 64, 64, 64)
    bias = jnp.asarray(rng.normal(0, 0.5, (1, 1, 64, 64)), jnp.float32)
    g = jax.grad(
        lambda b: jnp.sum(flash_attention(q, k, v, b, interpret=True) ** 2)
    )(bias)
    assert float(jnp.abs(g).max()) == 0.0
