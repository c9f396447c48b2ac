"""GEMM benchmark: BF16 vs INT8 (MXU) vs MLA-decompression shapes.

Parity: benchmarks/GEMMBenchmark.swift (BF16-vs-INT8 GEMM kernels,
GEMMBenchmark.swift:48-57) and the FlashMLA decompression GEMM table
(docs/attic/performance/2025/september/30/FlashMLA.md:17-27 — MFA hits
10,940 GFLOPS at 2048×1024×512 on M3 Max; v5e peak is ~197 bf16 /
~394 int8 TFLOPS).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from umfa_tpu.utils.timing import time_op

    rng = np.random.default_rng(0)
    shapes = [
        (512, 1024, 512),    # MLA decompression shapes (FlashMLA.md:21-23)
        (1024, 1024, 512),
        (2048, 1024, 512),
        (4096, 4096, 4096),  # square compute-bound
        (8192, 8192, 8192),
    ]
    results = {}
    for m, n, kk in shapes:
        a16 = jnp.asarray(rng.normal(0, 1, (m, kk)), jnp.bfloat16)
        b16 = jnp.asarray(rng.normal(0, 1, (kk, n)), jnp.bfloat16)
        a8 = jnp.asarray(rng.integers(-127, 127, (m, kk)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 127, (kk, n)), jnp.int8)
        flops = 2 * m * n * kk

        t_bf16 = time_op(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
            a16, b16, iters=32,
        )
        t_int8 = time_op(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32),
            a8, b8, iters=32,
        )
        results[f"{m}x{n}x{kk}"] = {
            "bf16_tflops": flops / t_bf16 / 1e12,
            "int8_tops": flops / t_int8 / 1e12,
            "int8_speedup": t_bf16 / t_int8,
        }
        print(f"{m}x{n}x{kk}: {json.dumps(results[f'{m}x{n}x{kk}'])}",
              file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
