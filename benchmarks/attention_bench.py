"""Attention micro-benchmarks across size presets.

Parity: benchmarks/GluonOptimizationBenchmark.swift (Small/Medium/Large/
XLarge presets, seq 512→8192, GluonOptimizationBenchmark.swift:41-50) and the
attention micro-bench tables in docs/attic/PERFORMANCE_RESULTS.md:37-39.

Run: python benchmarks/attention_bench.py [--presets small,large] [--bwd]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PRESETS = {
    "small": dict(batch=2, heads=8, seq=512, head_dim=64),
    "medium": dict(batch=2, heads=8, seq=2048, head_dim=64),
    "large": dict(batch=1, heads=16, seq=4096, head_dim=64),
    "xlarge": dict(batch=1, heads=16, seq=8192, head_dim=128),
}


def main():
    from umfa_tpu.engine.config import Precision, QuantizationConfig, QuantMode
    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.quant_attention import quantized_flash_attention
    from umfa_tpu.utils.timing import attention_flops, time_op

    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", default="small,large")
    ap.add_argument("--bwd", action="store_true", help="benchmark backward too")
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    results = {}
    for name in args.presets.split(","):
        p = PRESETS[name.strip()]
        B, H, S, D = p["batch"], p["heads"], p["seq"], p["head_dim"]
        q = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
        flops = attention_flops(B, H, S, S, D, causal=args.causal)

        def qcfg(prec):
            return QuantizationConfig(
                q_precision=prec, k_precision=prec, v_precision=prec,
                mode=QuantMode.ROW,
            )

        variants = {
            "bf16": lambda q, k, v: flash_attention(q, k, v, causal=args.causal),
            "int8": lambda q, k, v: quantized_flash_attention(
                q, k, v, config=qcfg(Precision.INT8), causal=args.causal
            ),
            "int4": lambda q, k, v: quantized_flash_attention(
                q, k, v, config=qcfg(Precision.INT4), causal=args.causal
            ),
        }
        row = {}
        for vname, fn in variants.items():
            t = time_op(fn, q, k, v, iters=args.iters)
            row[vname] = {"ms": t * 1e3, "tflops": flops / t / 1e12}
            if args.bwd:
                def fwd_bwd(q, k, v, fn=fn):
                    return jax.grad(
                        lambda q: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
                    )(q)

                tb = time_op(fwd_bwd, q, k, v, iters=max(4, args.iters // 4))
                row[vname]["bwd_ms"] = tb * 1e3
        results[name] = row
        print(f"{name}: " + json.dumps(row), file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
