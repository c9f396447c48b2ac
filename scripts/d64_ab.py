"""Round-5 D=64 MFU experiment (VERDICT r4 next-step #7): the dense forward
runs 81 TFLOP/s at D=64 (~41% of v5e bf16 peak) vs 153 (78%) at D=128. Why,
and can "head-packing" (two D=64 heads per 128-lane tile) recover it?

The algebra first (docs/PERFORMANCE.md gets the writeup): for softmax
attention, NO packing of two heads into one 128-deep contraction is
semantically admissible —
  * packing along the contraction (Q=[Q1|Q2], K=[K1|K2]) computes
    Q1K1^T + Q2K2^T: the two heads' scores SUM before the softmax;
  * block-diagonal packing (K_b = [[K1,0],[0,K2]], shape (2Sk,128)) yields
    both score blocks exactly, but the zero half contributes real MACs —
    2·Sq·Sk·128 total, identical arithmetic to the two half-depth matmuls
    it replaces (the MXU does not skip zeros; zero-padding D 64->128 is
    the same trade). The PV side (N=64) packs the same way with V_b and
    the same zero-MAC conclusion.
So packing only wins if the MXU runs a 64-deep (or 64-wide) matmul at
WORSE than half its 128-deep rate — which is what this script measures.

MXU rate probes are PALLAS kernels (R back-to-back dots over VMEM-resident
tiles): a *standalone* thin matmul has arithmetic intensity ~K flops/byte
(K=64 -> 64, vs the ~240 flops/byte v5e needs), i.e. it is HBM-bound by
construction and measures bandwidth, not the MXU. The in-kernel loop chains
a (1,1) slice of the f32 accumulator into the B operand each iteration
(underflows to exactly +0 in bf16, so values are untouched) so Mosaic can
neither hoist the loop-invariant dot (LICM -> one dot + R adds) nor fold
the sum.

  mxu_k64/k128    (M,K,N) = (2048, D, 256)   QK^T contraction width probe
  mxu_n64/n128    (M,K,N) = (2048, 512, D)   PV output width probe
  mxu_deep        (M,K,N) = (2048, 512, 256) full-width peak anchor
  attn_d64        dense fused fwd B2 H16 S4096 D64  (the VERDICT number)
  attn_d128       dense fused fwd B2 H8  S4096 D128 (EQUAL total FLOPs —
                  this IS the two-heads-per-128-lane packed ceiling)

Each timing runs in one fresh process (measurement discipline). The report
derives the matmul-implied attention time from the probed rates; the
residual = softmax/VPU + grid overhead share at each D.

Usage: python scripts/d64_ab.py [--names=a,b,c]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

S = 4096
R = 1024  # dots per probe-kernel call (8 on CPU interpret smoke runs)
VARIANTS = {
    # name -> ("mxu", M, K, N) or ("attn", B, H, S, D)
    "mxu_k64": ("mxu", 2048, 64, 256),
    "mxu_k128": ("mxu", 2048, 128, 256),
    "mxu_n64": ("mxu", 2048, 512, 64),
    "mxu_n128": ("mxu", 2048, 512, 128),
    "mxu_deep": ("mxu", 2048, 512, 256),
    "attn_d64": ("attn", 2, 16, S, 64),
    "attn_d128": ("attn", 2, 8, S, 128),
}


def _mxu_probe_fn(M, K, N, reps, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]

        def body(i, acc):
            # Scalar from the accumulator, scaled into bf16 underflow: ~0
            # at runtime (absorbed exactly by bf16 rounding of b's ~1e-3
            # values), but a data dependence the compiler must honor. A
            # (1,1)->(K,N) vector broadcast is NOT Mosaic-lowerable for
            # bf16 ("Broadcast in both sublanes and lanes"); a scalar
            # splat is.
            eps = (jnp.max(acc[0:1, :]) * 1e-38).astype(jnp.bfloat16)
            bi = b_ref[...] + eps
            return acc + jnp.dot(a, bi, preferred_element_type=jnp.float32)

        o_ref[...] = jax.lax.fori_loop(
            0, reps, body, jnp.zeros((M, N), jnp.float32)
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )


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

    spec = VARIANTS[name]
    rng = np.random.default_rng(0)
    on_cpu = jax.default_backend() == "cpu"
    if spec[0] == "mxu":
        _, M, K, N = spec
        if on_cpu:  # interpret-mode smoke only
            M, reps, iters = 256, 8, 2
        else:
            # iters=16 keeps it to TWO Mosaic compiles (time_op builds one
            # module per loop count) inside the 900 s per-variant budget.
            reps, iters = R, 16
        a = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(0, 1e-3, (K, N)), jnp.bfloat16)
        fn = jax.jit(_mxu_probe_fn(M, K, N, reps, on_cpu))
        t = time_op(fn, a, b, iters=iters, reps=5) / reps
        flops = 2.0 * M * K * N
    else:
        from umfa_tpu.ops.attention import flash_attention

        _, B, H, Sq, D = spec
        q, k, v = (
            jnp.asarray(rng.normal(0, 1, (B, H, Sq, D)), jnp.bfloat16)
            for _ in range(3)
        )
        fn = jax.jit(lambda q, k, v: flash_attention(q, k, v))
        t = time_op(fn, q, k, v, iters=64)
        flops = 4.0 * B * H * Sq * Sq * D
    print(json.dumps({"name": name, "ms": t * 1e3,
                      "tflops": flops / t / 1e12}))


def main():
    names = list(VARIANTS)
    for a in sys.argv[1:]:
        if a.startswith("--names="):
            names = a.split("=", 1)[1].split(",")
    if os.environ.get("_D64_ONE"):
        run_one(os.environ["_D64_ONE"])
        return
    results = {}
    for name in names:
        env = dict(os.environ, _D64_ONE=name)
        try:
            p = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=900,
            )
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT (900s)", file=sys.stderr)
            continue
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if line:
            results[name] = json.loads(line[-1])
            r = results[name]
            print(f"{name}: {r['ms']:.5f} ms  {r['tflops']:.1f} TF/s",
                  file=sys.stderr)
        else:
            print(f"{name}: FAILED rc={p.returncode}\n{p.stderr[-500:]}",
                  file=sys.stderr)

    # Matmul-implied attention time at the probed rates; residual =
    # softmax/VPU + grid overhead.
    for d, (B, H) in ((64, (2, 16)), (128, (2, 8))):
        a = results.get(f"attn_d{d}")
        qk = results.get(f"mxu_k{d}")
        pv = results.get(f"mxu_n{d}")
        if not (a and qk and pv):
            continue
        side = 2.0 * B * H * S * S * d  # FLOPs of each matmul side
        implied = (side / (qk["tflops"] * 1e12)
                   + side / (pv["tflops"] * 1e12)) * 1e3
        print(f"attn_d{d}: measured {a['ms']:.3f} ms, matmul-implied "
              f"{implied:.3f} ms, residual (softmax+overhead) "
              f"{a['ms'] - implied:.3f} ms", file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
