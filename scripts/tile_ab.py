"""Tile-config A/B for causal-fwd and window-fwd (round-3 follow-up).

hw_measure found: causal fwd 1.495 ms at S=4K (diag engaged, tiles 1024^2)
vs dense 1.557 — near-zero diag gain, vs the backward's 27% win. Hypothesis:
per-tile efficiency at 1024^2 is poor and the w=256 sub-block matmuls are
too small. This sweeps tile configs in ONE fresh process per config
(measurement discipline) and prints a JSON table.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

S4K = (2, 16, 4096, 64)
FLUX = (1, 24, 4608, 128)

CONFIGS = [
    # name, kind, shape, block_q, block_k
    ("causal_1024_1024_default", "causal", S4K, None, None),
    ("causal_2048_2048", "causal", S4K, 2048, 2048),
    ("causal_2048_1024", "causal", S4K, 2048, 1024),
    ("causal_4096_512", "causal", S4K, 4096, 512),
    ("dense_default", "dense", S4K, None, None),
    ("win256_default", "window", S4K, None, None),
    ("win256_1024_512", "window", S4K, 1024, 512),
    ("win256_2048_512", "window", S4K, 2048, 512),
    ("win256_512_512", "window", S4K, 512, 512),
    # Quantized / FLUX-geometry fresh-process re-measures (the hw_measure pv
    # stage timed these after parity+grad work in the same process).
    ("flux_bf16", "dense", FLUX, None, None),
    ("flux_int8", "int8", FLUX, None, None),
    ("flux_int8_block", "int8_block", FLUX, None, None),
    ("s4k_int8", "int8", S4K, None, None),
    ("s4k_int8_block", "int8_block", S4K, None, None),
    ("s4k_int8_causal", "int8_causal", S4K, None, None),
    ("flux_causal", "causal", FLUX, None, None),
]


def run_one(name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.engine.config import QuantizationConfig, QuantMode
    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.flash_fwd import BlockSizes
    from umfa_tpu.ops.quant_attention import quantized_flash_attention
    from umfa_tpu.utils.timing import time_op

    assert jax.default_backend() != "cpu"
    spec = dict((c[0], c) for c in CONFIGS)[name]
    _, kind, shape, bq, bk = spec
    rng = np.random.default_rng(0)
    B, H, S, D = shape
    q, k, v = (jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
               for _ in range(3))
    kw = {}
    if kind == "causal":
        kw["causal"] = True
    elif kind == "window":
        kw["window"] = (256, 0)
    if bq is not None:
        kw["block_sizes"] = BlockSizes(block_q=bq, block_k=bk)
    if kind.startswith("int8"):
        cfg = QuantizationConfig(
            mode=QuantMode.BLOCK if kind.endswith("block") else QuantMode.ROW
        )
        if kind == "int8_causal":
            kw["causal"] = True
        f = jax.jit(lambda q, k, v: quantized_flash_attention(
            q, k, v, config=cfg, **kw))
    else:
        f = jax.jit(lambda q, k, v: flash_attention(q, k, v, **kw))
    t = time_op(f, q, k, v, iters=64)
    print(json.dumps({"name": name, "ms": t * 1e3}))


def main():
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
        return
    out = {}
    for cfg in CONFIGS:
        name = cfg[0]
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), name],
            capture_output=True, text=True, timeout=1500,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if r.returncode == 0 and line:
            out[name] = json.loads(line[-1])["ms"]
            print(f"{name}: {out[name]:.3f} ms", file=sys.stderr, flush=True)
        else:
            out[name] = f"rc={r.returncode} {r.stderr[-300:]}"
            print(f"{name}: FAILED {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
