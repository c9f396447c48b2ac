"""GPT-style causal LM: training forward, cache-consistency, generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.models import gpt


CFG = gpt.GPTConfig(vocab=64, dim=128, num_heads=4, num_kv_heads=2,
                    depth=2, max_seq=96, interpret=True)


def _params():
    return gpt.init_params(jax.random.PRNGKey(0), CFG)


def test_forward_shapes_finite(rng):
    params = _params()
    tokens = jnp.asarray(rng.integers(0, CFG.vocab, (2, 48)))
    logits = gpt.forward(params, tokens, CFG)
    assert logits.shape == (2, 48, CFG.vocab)
    assert np.isfinite(np.asarray(logits)).all()


def test_train_step_reduces_loss(rng):
    params = _params()
    tokens = jnp.asarray(rng.integers(0, CFG.vocab, (2, 48)))

    def loss(params):
        logits = gpt.forward(params, tokens[:, :-1], CFG)
        targets = tokens[:, 1:]
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(
            jnp.take_along_axis(lp, targets[..., None], axis=-1)
        )

    l0, grads = jax.value_and_grad(loss)(params)
    params2 = jax.tree_util.tree_map(lambda p, g: p - 0.5 * g, params, grads)
    assert float(loss(params2)) < float(l0)


def test_cache_decode_matches_full_forward(rng):
    # The serving path (KV cache + decode attention) must reproduce the
    # training forward logits token-by-token — the strongest end-to-end
    # check of cache/decode/RoPE-position correctness.
    params = _params()
    tokens = jnp.asarray(rng.integers(0, CFG.vocab, (1, 24)))
    full_logits = gpt.forward(params, tokens, CFG)

    caches = gpt.init_caches(CFG, 1)
    # Prefill the first 16 tokens at once, then decode 8 one at a time.
    logits_prefill, caches = gpt.forward_with_cache(
        params, tokens[:, :16], caches, CFG
    )
    np.testing.assert_allclose(
        np.asarray(logits_prefill), np.asarray(full_logits[:, :16]),
        atol=2e-3, rtol=2e-3,
    )
    for t in range(16, 24):
        step_logits, caches = gpt.forward_with_cache(
            params, tokens[:, t : t + 1], caches, CFG
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, t]),
            atol=2e-3, rtol=2e-3, err_msg=f"token {t}",
        )


def test_generate(rng):
    params = _params()
    prompt = jnp.asarray(rng.integers(0, CFG.vocab, (2, 8)))
    out = gpt.generate(params, prompt, steps=6, cfg=CFG)
    assert out.shape == (2, 14)
    np.testing.assert_array_equal(np.asarray(out[:, :8]), np.asarray(prompt))
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < CFG.vocab).all()


def test_generate_int8_kv_cache(rng):
    """INT8 KV cache through the full model decode loop: same greedy tokens
    as the dense cache at these scales (int8 KV noise ~1% on logits)."""
    import dataclasses

    cfg8 = gpt.GPTConfig(
        vocab=64, dim=128, num_heads=4, num_kv_heads=2, depth=2,
        max_seq=64, kv_cache="int8", interpret=True,
    )
    cfg_d = dataclasses.replace(cfg8, kv_cache="dtype")
    params = gpt.init_params(jax.random.PRNGKey(0), cfg8)
    prompt = jnp.asarray(rng.integers(0, 64, (2, 10)))
    out8 = gpt.generate(params, prompt, steps=6, cfg=cfg8)
    outd = gpt.generate(params, prompt, steps=6, cfg=cfg_d)
    assert out8.shape == (2, 16)
    assert float((out8 == outd).mean()) > 0.9


def test_ragged_decode_matches_per_sequence(rng):
    # uniform_pos=False: ragged cache lengths route through the vmap scatter
    # and per-(B,T) RoPE positions; each batch row must match the
    # single-sequence decode at that row's own fill length.
    params = _params()
    tokens = jnp.asarray(rng.integers(0, CFG.vocab, (2, 20)))
    lens = [20, 12]

    caches = gpt.init_caches(CFG, 2)
    _, caches = gpt.forward_with_cache(params, tokens, caches, CFG)
    for c in caches:
        c.length = c.length.at[1].set(lens[1])
    new_tok = jnp.asarray(rng.integers(0, CFG.vocab, (2, 1)))
    step_logits, _ = gpt.forward_with_cache(
        params, new_tok, caches, CFG, uniform_pos=False
    )
    for b, ln in enumerate(lens):
        c1 = gpt.init_caches(CFG, 1)
        _, c1 = gpt.forward_with_cache(
            params, tokens[b : b + 1, :ln], c1, CFG
        )
        want, _ = gpt.forward_with_cache(params, new_tok[b : b + 1], c1, CFG)
        np.testing.assert_allclose(
            np.asarray(step_logits[b : b + 1]), np.asarray(want),
            atol=2e-3, rtol=2e-3, err_msg=f"row {b}",
        )
