"""Train-gap A/B profiler (VERDICT r4 #2): isolate the quantized training
step's overheads vs dense, one fresh process per timing.

The r3 driver artifact measured int8 train at 0.90x of dense (1.132 vs
1.024 ms at B1 H8 S4K D64). The backward rate analysis killed the
integer-backward-matmul route; this script bounds the remaining gap by
timing each HALF of the step and each candidate forward overhead
separately:

  dense_fwd          flash_attention forward only
  int8_fwd_infer     fused quantize-attend, emit_residuals=False
  int8_fwd_emit      emit_residuals=True (the training forward)
  int8_fwd_nosmooth  emit_residuals=True, smooth=False
  dense_bwd          flash_attention_backward on bf16 operands
  int8_bwd           quantized_attention_backward on int8 residuals
  int8_bwd_deq       dequantize-to-HBM + dense backward (r1 route)
  dense_step         full fwd+bwd (bench train parity)
  int8_step          full fwd+bwd quantized

Usage: python scripts/train_ab.py --case NAME  (one timing per process;
       run scripts/train_ab.py --all to spawn each case in a subprocess)
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CASES = [
    "dense_fwd", "int8_fwd_infer", "int8_fwd_emit", "int8_fwd_nosmooth",
    "dense_bwd", "int8_bwd", "int8_bwd_deq",
    "dense_step", "int8_step", "int8_step_nosmooth",
]


def _setup():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    import jax.numpy as jnp
    import numpy as np

    B, H, S, D = 1, 8, 4096, 64
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
        for _ in range(3)
    )
    return jax, jnp, (q, k, v)


def build(case):
    jax, jnp, (q, k, v) = _setup()
    from umfa_tpu.engine.config import QuantizationConfig
    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.flash_bwd import flash_attention_backward
    from umfa_tpu.ops.flash_fwd import flash_attention_forward
    from umfa_tpu.ops.quant import dequantize
    from umfa_tpu.ops.quant_attention import quantized_flash_attention
    from umfa_tpu.ops.quant_bwd import quantized_attention_backward
    from umfa_tpu.ops.quant_fused_attn import fused_quantize_attend

    cfg8 = QuantizationConfig()

    if case == "dense_fwd":
        return jax.jit(lambda q, k, v: flash_attention_forward(q, k, v)), (
            q, k, v,
        )
    if case == "int8_fwd_infer":
        fn = jax.jit(lambda q, k, v: fused_quantize_attend(
            q, k, v, emit_residuals=False)[:2])
        return fn, (q, k, v)
    if case == "int8_fwd_emit":
        fn = jax.jit(lambda q, k, v: fused_quantize_attend(
            q, k, v, emit_residuals=True))
        return fn, (q, k, v)
    if case == "int8_fwd_nosmooth":
        fn = jax.jit(lambda q, k, v: fused_quantize_attend(
            q, k, v, emit_residuals=True, smooth=False))
        return fn, (q, k, v)

    if case == "dense_bwd":
        out, lse = jax.jit(
            lambda q, k, v: flash_attention_forward(q, k, v)
        )(q, k, v)
        do = (out.astype(jnp.float32) * 2).astype(jnp.bfloat16)
        fn = jax.jit(lambda do, q, k, v, out, lse: flash_attention_backward(
            q, k, v, out, lse, do))
        return fn, (do, q, k, v, out, lse)

    if case in ("int8_bwd", "int8_bwd_deq"):
        out, lse, qt_q, qt_k, qt_v, qm, vm = jax.jit(
            lambda q, k, v: fused_quantize_attend(q, k, v,
                                                  emit_residuals=True)
        )(q, k, v)
        do = (out.astype(jnp.float32) * 2).astype(jnp.bfloat16)
        if case == "int8_bwd":
            def f(do, out, lse, vq, vk, vv, sq, sk, sv, vm):
                import dataclasses
                tq = dataclasses.replace(qt_q, values=vq, scales=sq)
                tk = dataclasses.replace(qt_k, values=vk, scales=sk)
                tv = dataclasses.replace(qt_v, values=vv, scales=sv)
                return quantized_attention_backward(
                    tq, tk, tv, out, lse, do, None, vm, None)
            fn = jax.jit(f)
            args = (do, out, lse, qt_q.values, qt_k.values, qt_v.values,
                    qt_q.scales, qt_k.scales, qt_v.scales, vm)
            return fn, args

        def f(do, out, lse, vq, vk, vv, sq, sk, sv, vm):
            import dataclasses
            tq = dataclasses.replace(qt_q, values=vq, scales=sq)
            tk = dataclasses.replace(qt_k, values=vk, scales=sk)
            tv = dataclasses.replace(qt_v, values=vv, scales=sv)
            q_dq = dequantize(tq, jnp.float32).astype(jnp.bfloat16)
            k_dq = dequantize(tk, jnp.float32).astype(jnp.bfloat16)
            v_dq = (dequantize(tv, jnp.float32) + vm).astype(jnp.bfloat16)
            return flash_attention_backward(
                q_dq, k_dq, v_dq, out, lse, do)
        fn = jax.jit(f)
        args = (do, out, lse, qt_q.values, qt_k.values, qt_v.values,
                qt_q.scales, qt_k.scales, qt_v.scales, vm)
        return fn, args

    def step(attn):
        # Full (q, k, v) gradients — grad w.r.t. q alone lets XLA DCE the
        # whole dK/dV pass (see bench.py _train_setup).
        def loss(q, k, v):
            return jnp.sum(attn(q, k, v).astype(jnp.float32) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))

    if case == "dense_step":
        return jax.jit(step(lambda q, k, v: flash_attention(q, k, v))), (
            q, k, v,
        )
    if case == "int8_step":
        return jax.jit(step(lambda q, k, v: quantized_flash_attention(
            q, k, v, config=cfg8))), (q, k, v)
    if case == "int8_step_nosmooth":
        from umfa_tpu.engine.config import QuantizationConfig as _QC

        return jax.jit(step(lambda q, k, v: quantized_flash_attention(
            q, k, v, config=_QC(smooth=False)))), (q, k, v)
    raise SystemExit(f"unknown case {case}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    if args.all:
        out = {}
        for c in CASES:
            r = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__),
                 "--case", c, "--iters", str(args.iters)],
                capture_output=True, text=True,
                timeout=float(os.environ.get("UMFA_AB_TIMEOUT_S", "590")),
            )
            line = [ln for ln in r.stdout.splitlines() if ln.startswith("#@")]
            if line:
                out[c] = json.loads(line[-1][2:])["ms"]
            else:
                out[c] = f"FAILED rc={r.returncode}: {r.stderr[-300:]}"
            print(f"{c:>18}: {out[c]}", flush=True)
        print(json.dumps(out, indent=2))
        return

    fn, fargs = build(args.case)
    from umfa_tpu.utils.timing import time_op

    t = time_op(fn, *fargs, iters=args.iters)
    print(f"#@{json.dumps({'case': args.case, 'ms': t * 1e3})}", flush=True)


if __name__ == "__main__":
    main()
