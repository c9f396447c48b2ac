"""Model-level serving throughput: GPT decode tokens/s, dense vs INT8 cache.

The kernel-level decode numbers live in decode_bench.py (INT8 cache 1.6×);
this measures the full model loop a deployment runs — embed → per-layer
(QKV proj, cache append, decode attention, MLP) → unembed — at production
batch size, where decode is dominated by weight streaming + KV reads.

Prints one JSON document.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from umfa_tpu.models import gpt
    from umfa_tpu.utils.timing import time_op

    on_cpu = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    if on_cpu:
        dim, heads, kv_heads, depth, batch, ctx = 256, 4, 2, 2, 2, 128
    else:
        dim, heads, kv_heads, depth, batch, ctx = 1024, 16, 8, 8, 8, 4096

    results = {}
    for cache_kind in ("dtype", "int8"):
        cfg = gpt.GPTConfig(
            vocab=32768 if not on_cpu else 128,
            dim=dim, num_heads=heads, num_kv_heads=kv_heads, depth=depth,
            max_seq=ctx, dtype="bfloat16" if not on_cpu else "float32",
            kv_cache=cache_kind, interpret=on_cpu,
        )
        params = gpt.init_params(jax.random.PRNGKey(0), cfg)
        caches = gpt.init_caches(cfg, batch)
        # Fill the caches to ~ctx-64 so decode reads a realistic context.
        prompt = jnp.asarray(
            rng.integers(0, cfg.vocab, (batch, ctx - 64)), jnp.int32
        )
        _, caches = jax.jit(
            lambda p, t, c: gpt.forward_with_cache(p, t, c, cfg, prefill=True)
        )(params, prompt, caches)

        tok = jnp.asarray(rng.integers(0, cfg.vocab, (batch, 1)), jnp.int32)

        # Thread the caches through an INNER decode loop (as real serving
        # does): cache appends then update in place under XLA aliasing. A
        # flat per-step call would copy-on-write the full cache buffers
        # every step (the original caches stay live) — measured 10× slower
        # than real decode. params FIRST so time_op's anti-hoisting
        # perturbation has float leaves to chain through.
        CHUNK = 2 if on_cpu else 8

        def decode_chunk(params, tok, caches):
            def body(i, carry):
                tok, caches = carry
                logits, caches = gpt.forward_with_cache(
                    params, tok, caches, cfg
                )
                return (
                    jnp.argmax(logits[:, -1:], axis=-1).astype(tok.dtype),
                    caches,
                )

            tok, caches = jax.lax.fori_loop(0, CHUNK, body, (tok, caches))
            return tok, caches

        iters = 2 if on_cpu else 16
        t = time_op(decode_chunk, params, tok, caches, iters=iters) / CHUNK
        results[cache_kind] = {
            "decode_step_ms": t * 1e3,
            "tokens_per_s": batch / t,
        }
        print(
            f"[serving_bench] {cache_kind}: {t*1e3:.3f} ms/step, "
            f"{batch/t:,.0f} tok/s (B={batch}, ctx~{ctx})",
            file=sys.stderr, flush=True,
        )
    if "int8" in results and "dtype" in results:
        results["int8"]["speedup_vs_dense_cache"] = (
            results["dtype"]["decode_step_ms"] / results["int8"]["decode_step_ms"]
        )
    results["config"] = dict(
        dim=dim, heads=heads, kv_heads=kv_heads, depth=depth,
        batch=batch, ctx=ctx,
    )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
