"""Quantized vs dense training-step benchmark.

Parity: benchmarks/QuantizedBackwardBenchmark.swift (FP16-vs-quantized
backward GFLOPS + memory ratio, QuantizedBackwardBenchmark.swift:43-71) and
the reference's training claims (quantized backward 1.14-1.48× faster,
25-40% memory savings — README.md:99-100).

Memory ratio reported here is the residual footprint: dense saves q,k,v in
input dtype; quantized saves int8/int4 values + scales.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from umfa_tpu.engine.config import Precision, QuantizationConfig, QuantMode
    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.quant_attention import quantized_flash_attention
    from umfa_tpu.utils.timing import attention_flops, time_op

    rng = np.random.default_rng(0)
    B, H, D = 1, 8, 64
    S = int(os.environ.get("UMFA_BWD_BENCH_SEQ", "4096"))
    dt = jnp.bfloat16
    q = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), dt)
    k = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), dt)
    v = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), dt)
    flops = attention_flops(B, H, S, S, D, backward=True)

    def dense_step(q, k, v):
        return jax.grad(
            lambda q: jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)
        )(q)

    cfg8 = QuantizationConfig()
    cfg4 = QuantizationConfig(
        q_precision=Precision.INT4, k_precision=Precision.INT4,
        v_precision=Precision.INT4, mode=QuantMode.BLOCK,
    )

    def q8_step(q, k, v):
        return jax.grad(
            lambda q: jnp.sum(
                quantized_flash_attention(q, k, v, config=cfg8).astype(jnp.float32)
                ** 2
            )
        )(q)

    def q4_step(q, k, v):
        return jax.grad(
            lambda q: jnp.sum(
                quantized_flash_attention(q, k, v, config=cfg4).astype(jnp.float32)
                ** 2
            )
        )(q)

    iters = 8
    t_dense = time_op(dense_step, q, k, v, iters=iters)
    t_q8 = time_op(q8_step, q, k, v, iters=iters)
    t_q4 = time_op(q4_step, q, k, v, iters=iters)

    qkv_bytes = 3 * B * H * S * D
    dense_resid = qkv_bytes * q.dtype.itemsize
    q8_resid = qkv_bytes * 1 + 3 * B * H * S * 4          # int8 + row scales
    q4_resid = qkv_bytes // 2 + 3 * B * H * S * 4

    out = {
        "dense_bwd": {"ms": t_dense * 1e3, "tflops": flops / t_dense / 1e12},
        "int8_bwd": {
            "ms": t_q8 * 1e3,
            "tflops": flops / t_q8 / 1e12,
            "speedup_vs_dense": t_dense / t_q8,
            "residual_memory_ratio": q8_resid / dense_resid,
        },
        "int4_bwd": {
            "ms": t_q4 * 1e3,
            "tflops": flops / t_q4 / 1e12,
            "speedup_vs_dense": t_dense / t_q4,
            "residual_memory_ratio": q4_resid / dense_resid,
        },
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
