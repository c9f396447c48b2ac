"""Decode (serving) benchmark: dense vs INT8-quantized KV cache.

This is the memory-bound regime behind the reference's headline claim
("quantized up to 1.3× faster than PyTorch SDPA in memory-bound workloads",
README.md:70): token-by-token decode reads the whole KV cache per step, so
an INT8 cache reads ~4× fewer bytes (and holds ~4× more tokens per HBM GB).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from umfa_tpu.serving import decode_attention, init_cache, init_quantized_cache
    from umfa_tpu.serving.kv_cache import append, append_quantized
    from umfa_tpu.utils.timing import time_op

    rng = np.random.default_rng(0)
    B, H, D = 8, 16, 64
    results = {}
    for s_max in (2048, 8192):
        k = jnp.asarray(rng.normal(0, 1, (B, H, s_max, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(0, 1, (B, H, s_max, D)), jnp.bfloat16)
        dense = append(init_cache(B, H, s_max, D), k, v)
        quant = append_quantized(init_quantized_cache(B, H, s_max, D), k, v)
        q1 = jnp.asarray(rng.normal(0, 1, (B, H, 1, D)), jnp.bfloat16)

        # Caches must be traced arguments — closing over them bakes hundreds
        # of MB of constants into the executable (endless compile).
        t_dense = time_op(
            lambda q, c: decode_attention(q, c), q1, dense, iters=32
        )
        t_quant = time_op(
            lambda q, c: decode_attention(q, c), q1, quant, iters=32
        )
        kv_bytes_dense = 2 * B * H * s_max * D * 2
        kv_bytes_quant = 2 * B * H * s_max * (D + 4)
        results[f"kv{s_max}"] = {
            "dense_ms": t_dense * 1e3,
            "dense_GBps": kv_bytes_dense / t_dense / 1e9,
            "int8_ms": t_quant * 1e3,
            "int8_GBps": kv_bytes_quant / t_quant / 1e9,
            "int8_speedup": t_dense / t_quant,
            "tokens_per_s_int8": B / t_quant,
        }
        print(f"kv={s_max}: {json.dumps(results[f'kv{s_max}'])}", file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
