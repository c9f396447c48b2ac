"""Model-level tests: DiT flagship, MLA layer, multichip dry run."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.models import dit, mla_model


def test_dit_forward_finite(rng):
    cfg = dit.DiTConfig(dim=256, num_heads=4, depth=2, dtype="float32",
                        interpret=True)
    params = dit.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 256)), jnp.float32)
    cond = jnp.asarray(rng.normal(0, 1, (2, 256)), jnp.float32)
    out = dit.forward(params, x, cond, cfg)
    assert out.shape == (2, 64, 256)
    assert np.isfinite(np.asarray(out)).all()


def test_dit_train_step(rng):
    cfg = dit.DiTConfig(dim=256, num_heads=4, depth=1, dtype="float32",
                        interpret=True)
    params = dit.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 256)), jnp.float32)
    cond = jnp.asarray(rng.normal(0, 1, (1, 256)), jnp.float32)
    tgt = jnp.asarray(rng.normal(0, 1, (1, 64, 256)), jnp.float32)

    def loss(params):
        pred = dit.forward(params, x, cond, cfg)
        return jnp.mean((pred - tgt) ** 2)

    l0, grads = jax.value_and_grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)
    params2 = jax.tree_util.tree_map(lambda p, g: p - 1e-2 * g, params, grads)
    assert float(loss(params2)) < float(l0)


def test_dit_quantized_close_to_dense(rng):
    # QAT-style: quantized DiT forward tracks the dense one (BASELINE
    # config 4 reduced).
    from umfa_tpu.engine.config import QuantizationConfig

    base = dit.DiTConfig(dim=256, num_heads=4, depth=1, dtype="float32",
                         interpret=True)
    qcfg = dit.DiTConfig(dim=256, num_heads=4, depth=1, dtype="float32",
                         quantization=QuantizationConfig(), interpret=True)
    params = dit.init_params(jax.random.PRNGKey(0), base)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 256)), jnp.float32)
    cond = jnp.asarray(rng.normal(0, 1, (1, 256)), jnp.float32)
    dense = np.asarray(dit.forward(params, x, cond, base))
    quant = np.asarray(dit.forward(params, x, cond, qcfg))
    err = np.linalg.norm(quant - dense) / np.linalg.norm(dense)
    assert err < 0.05


def test_dit_quantized_train_step(rng):
    # BASELINE config 4: quantization-aware training step (STE grads).
    from umfa_tpu.engine.config import QuantizationConfig

    cfg = dit.DiTConfig(dim=256, num_heads=4, depth=1, dtype="float32",
                        quantization=QuantizationConfig(), interpret=True)
    params = dit.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 256)), jnp.float32)
    cond = jnp.asarray(rng.normal(0, 1, (1, 256)), jnp.float32)
    tgt = jnp.asarray(rng.normal(0, 1, (1, 64, 256)), jnp.float32)

    def loss(params):
        pred = dit.forward(params, x, cond, cfg)
        return jnp.mean((pred - tgt) ** 2)

    l0, grads = jax.value_and_grad(loss)(params)
    params2 = jax.tree_util.tree_map(lambda p, g: p - 1e-2 * g, params, grads)
    assert float(loss(params2)) < float(l0)


def test_mla_forward_and_compression(rng):
    cfg = mla_model.MLAConfig(dim=256, num_heads=4, latent_dim=32,
                              dtype="float32", interpret=True)
    params = mla_model.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 256)), jnp.float32)
    latent = mla_model.compress_kv(params, x)
    assert latent.shape == (1, 64, 32)  # 8x KV compression
    out = mla_model.forward(params, x, cfg)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_mla_sparse_indexer(rng):
    cfg = mla_model.MLAConfig(dim=256, num_heads=4, latent_dim=32,
                              dtype="float32", indexer_topk=16,
                              causal=False, interpret=True)
    params = mla_model.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 256)), jnp.float32)
    out = mla_model.forward(params, x, cfg)
    assert np.isfinite(np.asarray(out)).all()
    dense_cfg = mla_model.MLAConfig(dim=256, num_heads=4, latent_dim=32,
                                    dtype="float32", causal=False,
                                    interpret=True)
    dense = mla_model.forward(params, x, dense_cfg)
    assert not np.allclose(np.asarray(out), np.asarray(dense))


def test_mla_decode_matches_forward(rng):
    """Latent-cache decode (absorbed weights) reproduces the causal forward
    pass: prefill one chunk, then decode token-by-token; every decoded
    position must match the full forward's output at that position."""
    from umfa_tpu.serving.kv_cache import init_latent_cache

    cfg = mla_model.MLAConfig(dim=256, num_heads=4, latent_dim=32,
                              dtype="float32", causal=True, interpret=True)
    params = mla_model.init_params(jax.random.PRNGKey(0), cfg)
    s = 24
    x = jnp.asarray(rng.normal(0, 1, (2, s, 256)), jnp.float32)
    full = np.asarray(mla_model.forward(params, x, cfg))

    cache = init_latent_cache(2, s, cfg.latent_dim, jnp.float32)
    prefill = 16
    y_pre, cache = mla_model.decode_step(params, x[:, :prefill], cache, cfg)
    np.testing.assert_allclose(
        np.asarray(y_pre), full[:, :prefill], atol=2e-3, rtol=2e-3
    )
    for t in range(prefill, s):
        y_t, cache = mla_model.decode_step(
            params, x[:, t : t + 1], cache, cfg
        )
        np.testing.assert_allclose(
            np.asarray(y_t)[:, 0], full[:, t], atol=2e-3, rtol=2e-3
        )


def test_deepseek_decode_matches_forward(rng):
    """Full DeepSeek-style model: logits from the latent-cache decode path
    (prefill chunk + token steps) match the training forward's logits."""
    from umfa_tpu.models import deepseek

    cfg = deepseek.DeepSeekConfig(
        vocab=64, dim=128, num_heads=4, latent_dim=16, depth=2,
        num_experts=4, top_k=2, n_shared=1, moe_hidden=64,
        dtype="float32", interpret=True,
    )
    params = deepseek.init_params(jax.random.PRNGKey(0), cfg)
    s = 12
    tokens = jnp.asarray(rng.integers(0, 64, (2, s)), jnp.int32)
    full_logits, aux = deepseek.forward(params, tokens, cfg)
    assert np.isfinite(np.asarray(full_logits)).all()
    assert float(aux) >= cfg.depth * (1.0 - 1e-5)

    caches = deepseek.init_caches(cfg, 2, s)
    prefill = 8
    logits, caches = deepseek.decode_step(
        params, tokens[:, :prefill], caches, cfg
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits)[:, prefill - 1],
        atol=5e-3, rtol=5e-3,
    )
    for t in range(prefill, s):
        logits, caches = deepseek.decode_step(
            params, tokens[:, t : t + 1], caches, cfg
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full_logits)[:, t],
            atol=5e-3, rtol=5e-3,
        )


def test_deepseek_generate(rng):
    from umfa_tpu.models import deepseek

    cfg = deepseek.DeepSeekConfig(
        vocab=64, dim=128, num_heads=4, latent_dim=16, depth=1,
        num_experts=4, top_k=2, moe_hidden=64,
        dtype="float32", interpret=True,
    )
    params = deepseek.init_params(jax.random.PRNGKey(1), cfg)
    prompt = jnp.asarray(rng.integers(0, 64, (2, 6)), jnp.int32)
    out = deepseek.generate(params, prompt, cfg, max_new_tokens=5)
    assert out.shape == (2, 5)
    assert ((np.asarray(out) >= 0) & (np.asarray(out) < 64)).all()
    # greedy generation is deterministic
    out2 = deepseek.generate(params, prompt, cfg, max_new_tokens=5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


@pytest.mark.multidevice
def test_graft_entry_dryrun():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(repo, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    mod.dryrun_multichip(8)
