"""Round-5 decomposition of the int8-fused vs bf16-fused gap (VERDICT r4
weak #3: 1.999 vs 1.691 ms driver-captured at S=4K — 0.85x of the repo's
own dense kernel; north star is <= +5%).

Levers, each timed in ONE fresh process per variant (measurement
discipline — same-process history contaminates up to 28%):
  * dense-Q (q_precision=bf16): deletes the per-q-tile quantize pass
  * smooth=False: deletes the K/V mean estimate + subtract on fill and
    the V-mean epilogue restore
Combinations decompose where the remaining overhead lives (Q quantize vs
KV fill quantize/deq vs smoothing).

Usage: python scripts/quant_ab.py [--names a,b,c]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

S4K = (2, 16, 4096, 64)

# name -> (q_precision, smooth)  /  None = bf16 fused baseline
VARIANTS = {
    "bf16_fused": None,
    "int8": ("int8", True),
    "int8_nosmooth": ("int8", False),
    "int8_qdense": ("bf16", True),
    "int8_qdense_nosmooth": ("bf16", False),
}


def run_one(name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.engine.config import Precision, QuantizationConfig
    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.quant_attention import quantized_flash_attention
    from umfa_tpu.utils.timing import time_op

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    B, H, S, D = S4K
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
        for _ in range(3)
    )
    spec = VARIANTS[name]
    if spec is None:
        fn = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    else:
        prec, smooth = spec
        cfg = QuantizationConfig(
            q_precision=Precision(prec), smooth=smooth
        )
        fn = jax.jit(
            lambda q, k, v: quantized_flash_attention(q, k, v, config=cfg)
        )
    t = time_op(fn, q, k, v, iters=64)
    print(json.dumps({"name": name, "ms": t * 1e3}))


def main():
    names = list(VARIANTS)
    for a in sys.argv[1:]:
        if a.startswith("--names="):
            names = a.split("=", 1)[1].split(",")
    if os.environ.get("_QAB_ONE"):
        run_one(os.environ["_QAB_ONE"])
        return
    results = {}
    for name in names:
        env = dict(os.environ, _QAB_ONE=name)
        p = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=590,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if line:
            results[name] = json.loads(line[-1])["ms"]
            print(f"{name}: {results[name]:.4f} ms", file=sys.stderr)
        else:
            print(f"{name}: FAILED rc={p.returncode}\n{p.stderr[-500:]}",
                  file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
