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
    # Default INT4 recipe: Q/K int4 + Hadamard (in-kernel), V int8.
    cfg4 = QuantizationConfig.from_mode_string("int4")
    int4 = jax.jit(
        lambda q, k, v: quantized_flash_attention(q, k, v, config=cfg4)
    )

    import time as _time

    def _note(msg):
        print(f"[bench {_time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

    iters = 8 if on_cpu else 64
    _note("timing bf16 XLA SDPA")
    t_sdpa = time_op(xla_sdpa, q, k, v, iters=iters)
    _note("timing bf16 fused")
    t_fused = time_op(fused, q, k, v, iters=iters)
    _note("timing int8 fused")
    t_int8 = time_op(int8, q, k, v, iters=iters)
    _note("timing int4 fused")
    t_int4 = time_op(int4, q, k, v, iters=iters)
    _note("timings done")

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

    # Structured-input accuracy (LLM-activation-like: channel outliers +
    # moderately peaked softmax). The i.i.d. Gaussian case above is the
    # worst case for 4-bit score noise; the reference's "INT4 ≈ 2%" anchors
    # the QUANTIZER round-trip ("error introduced by the quantisers",
    # PERFORMANCE_RESULTS.md:47-52), reported separately below.
    sr = np.random.default_rng(1)
    qs_np = sr.normal(0, 1, (B, H, S, D))
    ks_np = sr.normal(0, 1, (B, H, S, D))
    ch = sr.choice(D, 4, replace=False)
    qs_np[..., ch] *= 8.0
    ks_np[..., ch] *= 8.0
    s_std = float(
        np.einsum("bhqd,bhkd->bhqk", qs_np[:1, :1], ks_np[:1, :1]).std()
    ) / np.sqrt(D)
    f = np.sqrt(0.5 / s_std)
    qs = jnp.asarray(qs_np * f, dtype)
    ks = jnp.asarray(ks_np * f, dtype)
    vs = jnp.asarray(sr.normal(0, 1, (B, H, S, D)), dtype)
    want_s = np.asarray(
        reference_attention(
            qs.astype(jnp.float32), ks.astype(jnp.float32), vs.astype(jnp.float32)
        )
    )

    def relerr_s(x):
        x = np.asarray(x, np.float32)
        return float(np.linalg.norm(x - want_s) / np.linalg.norm(want_s))

    err8_s = relerr_s(int8(qs, ks, vs))
    err4_s = relerr_s(int4(qs, ks, vs))

    # Quantizer-level round-trip error (the reference's accuracy metric).
    from umfa_tpu.engine.config import QuantStrategy
    from umfa_tpu.ops.quant import dequantize, quantize

    def roundtrip_relerr(x, prec):
        qt = quantize(x, prec, QuantMode.ROW, QuantStrategy.SYMMETRIC)
        xr = np.asarray(dequantize(qt, jnp.float32))
        xf = np.asarray(x, np.float32)
        return float(np.linalg.norm(xr - xf) / np.linalg.norm(xf))

    uni = jnp.asarray(rng.uniform(-1, 1, (1, 1, 1024, 64)), jnp.float32)
    rt8 = roundtrip_relerr(uni, Precision.INT8)
    rt4 = roundtrip_relerr(uni, Precision.INT4)

    # D=128 profile (FLUX head dim): at D=64 the kernel is VPU-softmax-bound
    # and int8's 2x-MXU QK buys little; at D=128 the MXU share doubles.
    d128 = {}
    if not on_cpu:
        B2, H2, S2, D2 = 1, 24, 4608, 128
        _note("timing D=128 profile")
        q2 = jnp.asarray(rng.normal(0, 1, (B2, H2, S2, D2)), dtype)
        k2 = jnp.asarray(rng.normal(0, 1, (B2, H2, S2, D2)), dtype)
        v2 = jnp.asarray(rng.normal(0, 1, (B2, H2, S2, D2)), dtype)
        flops2 = 4 * B2 * H2 * S2 * S2 * D2
        t2_f = time_op(fused, q2, k2, v2, iters=32)
        t2_8 = time_op(int8, q2, k2, v2, iters=32)
        d128 = {
            "shape": [B2, H2, S2, D2],
            "bf16_fused": {"ms": t2_f * 1e3, "tflops": flops2 / t2_f / 1e12},
            "int8_fused": {
                "ms": t2_8 * 1e3,
                "tflops": flops2 / t2_8 / 1e12,
                "speedup_vs_bf16_fused": t2_f / t2_8,
            },
        }
        _note("D=128 done")

    def tflops(t):
        return flops / t / 1e12

    details = {
        "shape": [B, H, S, D],
        "bf16_xla_sdpa": {"ms": t_sdpa * 1e3, "tflops": tflops(t_sdpa)},
        "bf16_fused": {"ms": t_fused * 1e3, "tflops": tflops(t_fused), "relerr": errb},
        "int8_fused": {
            "ms": t_int8 * 1e3, "tflops": tflops(t_int8),
            "relerr_iid": err8, "relerr_struct": err8_s,
        },
        "int4_fused": {
            "ms": t_int4 * 1e3, "tflops": tflops(t_int4),
            "relerr_iid": err4, "relerr_struct": err4_s,
        },
        "quantizer_roundtrip_relerr": {"int8": rt8, "int4": rt4},
        "d128_flux_profile": d128,
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
