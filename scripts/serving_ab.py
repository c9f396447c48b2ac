"""Serving decode-step budget bisect, round 5.

Post-append-fix driver capture (BENCH r5 warm run): dense cache
1.757 ms/step, int8 cache 1.705 — speedup collapsed to 1.03x (the ragged
scatter the r4 fix removed was costing the DENSE cache more than the int8
one). Byte floors at this geometry (B8 dim1024 H16/Hkv8 depth8 ctx4K,
~819 GB/s): cache read dense 0.66 ms / int8 0.35, weights ~0.31 — so even
perfect execution gives 0.97 vs 0.66 ms (1.47x), and every ms of shared
overhead compresses the ratio. This script times the step's components in
fresh processes to find the shared overhead.

Usage: python scripts/serving_ab.py [--names a,b,c]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = [
    "full_dtype",     # the bench serving step (dense bf16 cache)
    "full_int8",      # the bench serving step (int8 cache)
    "attn_dtype",     # depth x decode_attention only (incl. append)
    "attn_int8",
    "gemv_dtype",     # depth x decode_attention only (no append)
    "gemv_int8",
    "mlp_only",       # depth x (qkv proj + out proj + MLP), no attention
    "unembed",        # final layernorm + logits einsum
]


def _model(cache_kind):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.models import gpt

    rng = np.random.default_rng(0)
    dim, heads, kv_heads, depth, batch, ctx = 1024, 16, 8, 8, 8, 4096
    cfg = gpt.GPTConfig(
        vocab=32768, dim=dim, num_heads=heads, num_kv_heads=kv_heads,
        depth=depth, max_seq=ctx, dtype="bfloat16", kv_cache=cache_kind,
    )
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    caches = gpt.init_caches(cfg, batch)
    prompt = jnp.asarray(
        rng.integers(0, cfg.vocab, (batch, ctx - 64)), jnp.int32
    )
    _, caches = jax.jit(
        lambda p, t, c: gpt.forward_with_cache(p, t, c, cfg, prefill=True)
    )(params, prompt, caches)
    tok = jnp.asarray(rng.integers(0, cfg.vocab, (batch, 1)), jnp.int32)
    return gpt, cfg, params, caches, tok, rng


CHUNK = 8


def run_one(name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.utils.timing import time_op

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    kind = "int8" if name.endswith("int8") else "dtype"
    gpt, cfg, params, caches, tok, rng = _model(kind)
    batch = tok.shape[0]

    if name.startswith("full"):
        def chunk(params, tok, caches):
            def body(i, carry):
                tok, caches = carry
                logits, caches = gpt.forward_with_cache(
                    params, tok, caches, cfg
                )
                return (
                    jnp.argmax(logits[:, -1:], axis=-1).astype(tok.dtype),
                    caches,
                )

            return jax.lax.fori_loop(0, CHUNK, body, (tok, caches))

        t = time_op(chunk, params, tok, caches, iters=16) / CHUNK

    elif name.startswith(("attn", "gemv")):
        from umfa_tpu.serving.decode import decode_attention
        from umfa_tpu.serving.kv_cache import append, append_quantized

        do_append = name.startswith("attn")
        q1 = jnp.asarray(
            rng.normal(0, 1, (batch, cfg.num_heads, 1, cfg.head_dim)),
            jnp.bfloat16,
        )
        kv1 = jnp.asarray(
            rng.normal(0, 1, (batch, cfg.num_kv_heads, 1, cfg.head_dim)),
            jnp.bfloat16,
        )

        hkv = cfg.num_kv_heads

        def chunk(q1, kv1, caches):
            def body(i, carry):
                x, caches = carry
                new = []
                for cache in caches:
                    if do_append:
                        ap = append_quantized if kind == "int8" else append
                        cache = ap(
                            cache, kv1 + x[:, :hkv] * 0, kv1,
                            pos=cache.length[0],
                        )
                    att = decode_attention(q1 + x * 0, cache)
                    x = x + att * 1e-6  # consume, keep shapes
                    new.append(cache)
                return x, new

            return jax.lax.fori_loop(0, CHUNK, body, (q1 * 0, caches))

        t = time_op(chunk, q1, kv1, caches, iters=16) / CHUNK

    elif name == "mlp_only":
        x0 = jnp.asarray(
            rng.normal(0, 1, (batch, 1, cfg.dim)), jnp.bfloat16
        )
        positions = jnp.arange(1)

        def chunk(params, x0):
            def body(i, carry):
                x = carry
                for block in params["blocks"]:
                    q, k, v = gpt._qkv(block, x, cfg, positions)
                    attn = q  # skip attention: feed q straight to the tail
                    x = gpt._block_tail(block, x, attn, cfg)
                return x * 0.5

            return jax.lax.fori_loop(0, CHUNK, body, x0)

        t = time_op(chunk, params, x0, iters=16) / CHUNK

    elif name == "unembed":
        x0 = jnp.asarray(
            rng.normal(0, 1, (batch, 1, cfg.dim)), jnp.bfloat16
        )

        def chunk(params, x0):
            def body(i, carry):
                x = carry
                logits = jnp.einsum(
                    "bsd,dv->bsv", gpt._ln(x), params["unembed"]
                )
                return x + logits[:, :, :1] * 1e-6

            return jax.lax.fori_loop(0, CHUNK, body, x0)

        t = time_op(chunk, params, x0, iters=16) / CHUNK

    print(json.dumps({"name": name, "ms": t * 1e3}))


def main():
    names = VARIANTS
    for a in sys.argv[1:]:
        if a.startswith("--names="):
            names = a.split("=", 1)[1].split(",")
    if os.environ.get("_SAB_ONE"):
        run_one(os.environ["_SAB_ONE"])
        return
    results = {}
    for name in names:
        env = dict(os.environ, _SAB_ONE=name)
        p = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=590,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if line:
            results[name] = json.loads(line[-1])["ms"]
            print(f"{name}: {results[name]:.4f} ms", file=sys.stderr)
        else:
            print(f"{name}: FAILED rc={p.returncode}\n{p.stderr[-400:]}",
                  file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
