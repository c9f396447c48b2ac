"""FLUX.1-Schnell-shaped DiT attention benchmark.

Parity: examples/flux/flux_schnell_benchmark.py (the source of the
reference's README perf table: vanilla vs BF16/INT8/INT4 at 256/512/1024px).
FLUX.1 at resolution R uses joint attention over (R/16)^2 image tokens plus
512 text tokens, 24 heads, head_dim 128.

Run: python examples/flux_attention_benchmark.py [--res 256,512,1024]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from umfa_tpu.engine.config import Precision, QuantMode, QuantizationConfig
    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.quant_attention import quantized_flash_attention
    from umfa_tpu.utils.timing import attention_flops, time_op

    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="256,512,1024")
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    H, D = 24, 128  # FLUX.1 joint-attention geometry
    results = {}
    for res in (int(r) for r in args.res.split(",")):
        seq = (res // 16) ** 2 + 512
        q = jnp.asarray(rng.normal(0, 1, (1, H, seq, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(0, 1, (1, H, seq, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(0, 1, (1, H, seq, D)), jnp.bfloat16)
        flops = attention_flops(1, H, seq, seq, D)

        def qcfg(p):
            return QuantizationConfig(
                q_precision=p, k_precision=p, v_precision=p, mode=QuantMode.ROW
            )

        row = {}
        variants = {
            "bf16_fused": lambda q, k, v: flash_attention(q, k, v),
            "int8": lambda q, k, v: quantized_flash_attention(
                q, k, v, config=qcfg(Precision.INT8)
            ),
            "int4": lambda q, k, v: quantized_flash_attention(
                q, k, v, config=qcfg(Precision.INT4)
            ),
        }
        for name, fn in variants.items():
            t = time_op(fn, q, k, v, iters=args.iters)
            row[name] = {"ms": t * 1e3, "tflops": flops / t / 1e12}
        row["int8_speedup_vs_bf16"] = row["bf16_fused"]["ms"] / row["int8"]["ms"]
        row["int4_speedup_vs_bf16"] = row["bf16_fused"]["ms"] / row["int4"]["ms"]
        results[f"{res}px_seq{seq}"] = row
        print(f"{res}px (seq={seq}): {json.dumps(row)}", file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
