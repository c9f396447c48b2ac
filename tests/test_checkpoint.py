"""Checkpoint save/restore (params + quantized leaves)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.utils import checkpoint


def test_params_roundtrip(tmp_path, rng):
    from umfa_tpu.models import dit

    cfg = dit.DiTConfig(dim=128, num_heads=2, depth=1, dtype="float32")
    params = dit.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, params)
    restored = checkpoint.restore(path, params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.dtype == b.dtype


def test_quantized_tensor_roundtrip(tmp_path, rng):
    from umfa_tpu.ops.quant import quantize

    x = jnp.asarray(rng.normal(0, 1, (1, 2, 64, 64)), jnp.float32)
    qt = quantize(x)
    path = str(tmp_path / "qt")
    checkpoint.save(path, qt)
    restored = checkpoint.restore(path, qt)
    np.testing.assert_array_equal(np.asarray(qt.values), np.asarray(restored.values))
    np.testing.assert_array_equal(np.asarray(qt.scales), np.asarray(restored.scales))
    assert restored.precision == qt.precision


def test_mla_weight_loading(tmp_path, rng):
    w_k = rng.normal(0, 1, (32, 256)).astype(np.float32)
    w_v = rng.normal(0, 1, (32, 256)).astype(np.float32)
    path = str(tmp_path / "mla.npz")
    np.savez(path, w_k=w_k, w_v=w_v)
    jk, jv = checkpoint.load_mla_weights(path, 32, 256)
    np.testing.assert_array_equal(np.asarray(jk), w_k)
    jk2, jv2 = checkpoint.load_mla_weights((w_k, w_v), 32, 256)
    np.testing.assert_array_equal(np.asarray(jv2), w_v)
