"""DeepSeek-style demo: MLA latent KV compression, sparse indexer, MoE
routing, and latent-cache generation.

Parity: examples/deepseek-v3.2-exp (MLA with 32x KV compression, sparse-
attention indexer, MoE 256-experts/8-active routing, random-weight
generate loop — SURVEY.md §2.2).

Run: python examples/deepseek_mla_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from umfa_tpu.models import mla_model


def main():
    rng = np.random.default_rng(0)
    interpret = jax.default_backend() == "cpu"
    cfg = mla_model.MLAConfig(
        dim=1024, num_heads=16, latent_dim=128,  # 8x KV compression
        causal=True, dtype="bfloat16", interpret=interpret,
    )
    params = mla_model.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(0, 1, (1, 512, cfg.dim)), cfg.jdtype)

    latent = mla_model.compress_kv(params, x)
    full_kv_bytes = 2 * x.size * x.dtype.itemsize  # K and V at full width
    latent_bytes = latent.size * latent.dtype.itemsize
    print(f"KV cache: full {full_kv_bytes/1e6:.1f} MB -> latent "
          f"{latent_bytes/1e6:.1f} MB ({full_kv_bytes/latent_bytes:.0f}x smaller)")

    out = mla_model.forward(params, x, cfg)
    print("MLA forward:", out.shape, out.dtype)

    sparse_cfg = mla_model.MLAConfig(
        dim=1024, num_heads=16, latent_dim=128, causal=True,
        dtype="bfloat16", indexer_topk=128, interpret=interpret,
    )
    out_sparse = mla_model.forward(params, x, sparse_cfg)
    print("MLA + sparse indexer (top-128):", out_sparse.shape)

    # Full random-weight model: MLA attention + MoE FFN + shared expert,
    # generation against the latent cache (absorbed-weight decode).
    from umfa_tpu.models import deepseek

    dcfg = deepseek.DeepSeekConfig(
        vocab=512, dim=512, num_heads=8, latent_dim=64, depth=2,
        num_experts=16, top_k=4, n_shared=1, moe_hidden=512,
        dtype="bfloat16", interpret=interpret,
    )
    dparams = deepseek.init_params(jax.random.PRNGKey(1), dcfg)
    prompt = jnp.asarray(rng.integers(0, 512, (1, 16)), jnp.int32)
    tokens = deepseek.generate(dparams, prompt, dcfg, max_new_tokens=8)
    print("MoE model generate (16 experts / 4 active, latent-cache decode):",
          np.asarray(tokens)[0].tolist())


if __name__ == "__main__":
    main()
