"""Headline benchmark (driver-run on real TPU).

North star (BASELINE.json): INT8 block/row-wise fused flash attention vs
BF16 XLA SDPA at seq 4K — target ≥ 1.3× throughput with accuracy within the
reference envelope. Prints ONE JSON line on stdout; details on stderr.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from umfa_tpu.engine.config import Precision, QuantizationConfig, QuantMode
    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.quant_attention import quantized_flash_attention
    from umfa_tpu.utils.timing import time_op

    on_cpu = jax.default_backend() == "cpu"
    B, H, S, D = (1, 2, 256, 64) if on_cpu else (2, 16, 4096, 64)
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), dtype)
    k = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), dtype)
    v = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), dtype)
    flops = 4 * B * H * S * S * D  # fwd, non-causal

    scale = D**-0.5

    @jax.jit
    def xla_sdpa(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    fused = jax.jit(lambda q, k, v: flash_attention(q, k, v))

    def qcfg(prec, mode=QuantMode.ROW):
        return QuantizationConfig(
            q_precision=prec, k_precision=prec, v_precision=prec, mode=mode
        )

    int8 = jax.jit(
        lambda q, k, v: quantized_flash_attention(q, k, v, config=qcfg(Precision.INT8))
    )
    int4 = jax.jit(
        lambda q, k, v: quantized_flash_attention(q, k, v, config=qcfg(Precision.INT4))
    )

    iters = 8 if on_cpu else 64
    t_sdpa = time_op(xla_sdpa, q, k, v, iters=iters)
    t_fused = time_op(fused, q, k, v, iters=iters)
    t_int8 = time_op(int8, q, k, v, iters=iters)
    t_int4 = time_op(int4, q, k, v, iters=iters)

    # Accuracy vs FP32 reference on the same inputs.
    from umfa_tpu.ops.attention import reference_attention

    want = np.asarray(
        reference_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )
    )

    def relerr(x):
        x = np.asarray(x, np.float32)
        return float(np.linalg.norm(x - want) / np.linalg.norm(want))

    err8 = relerr(int8(q, k, v))
    err4 = relerr(int4(q, k, v))
    errb = relerr(fused(q, k, v))

    def tflops(t):
        return flops / t / 1e12

    details = {
        "shape": [B, H, S, D],
        "bf16_xla_sdpa": {"ms": t_sdpa * 1e3, "tflops": tflops(t_sdpa)},
        "bf16_fused": {"ms": t_fused * 1e3, "tflops": tflops(t_fused), "relerr": errb},
        "int8_fused": {"ms": t_int8 * 1e3, "tflops": tflops(t_int8), "relerr": err8},
        "int4_fused": {"ms": t_int4 * 1e3, "tflops": tflops(t_int4), "relerr": err4},
        "backend": jax.default_backend(),
    }
    print(json.dumps(details, indent=2), file=sys.stderr)

    speedup = t_sdpa / t_int8
    print(
        json.dumps(
            {
                "metric": "int8_fused_attn_speedup_vs_bf16_xla_sdpa_seq4k",
                "value": round(speedup, 4),
                "unit": "x",
                "vs_baseline": round(speedup / 1.3, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
