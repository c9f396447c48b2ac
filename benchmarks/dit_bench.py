"""End-to-end flagship workload benchmark: full DiT training/inference step.

The reference anchors its perf story on full FLUX.1-Schnell generation
(examples/flux/flux_schnell_benchmark.py; README.md:106-125 table: vanilla /
BF16 / INT8 / INT4 at 256-1024px). This is the TPU analogue at the model
level: a FLUX-shaped DiT stack (adaLN-zero blocks, RoPE, fused attention)
timed for a full forward (inference) and forward+backward (training) step at
image-equivalent sequence lengths, in dense bf16 / runtime-INT8 / the
default INT4 recipe.

Sequence lengths mirror FLUX latent token counts (px/16 patches squared +
512 text tokens): 512px -> 1536, 1024px -> 4608, 2048px-equivalent -> 16896
(BASELINE config 5).

Prints one JSON document; drop the table into docs/PERFORMANCE.md.
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
    # name: (seq, batch)
    "512px": (1536, 1),
    "1024px": (4608, 1),
    "2048px": (16896, 1),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", default="1024px,2048px")
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--dim", type=int, default=1536)
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--train", action="store_true", default=True)
    args = ap.parse_args()

    from umfa_tpu.engine.config import QuantizationConfig
    from umfa_tpu.models import dit
    from umfa_tpu.utils.timing import time_op

    on_cpu = jax.default_backend() == "cpu"
    presets = args.presets.split(",")
    if on_cpu:
        presets = ["512px"]

    results = {}
    for preset in presets:
        seq, batch = PRESETS[preset]
        if on_cpu:
            seq, batch = 512, 1
        variants = {
            "bf16": None,
            "int8": QuantizationConfig(),
            "int4": QuantizationConfig.from_mode_string("int4"),
        }
        row = {}
        for name, quant in variants.items():
            cfg = dit.DiTConfig(
                dim=args.dim, num_heads=args.heads, depth=args.depth,
                dtype="bfloat16", quantization=quant, interpret=on_cpu,
            )
            params = dit.init_params(jax.random.PRNGKey(0), cfg)
            rng = np.random.default_rng(0)
            x = jnp.asarray(
                rng.normal(0, 1, (batch, seq, cfg.dim)), cfg.jdtype
            )
            cond = jnp.asarray(rng.normal(0, 1, (batch, cfg.dim)), cfg.jdtype)
            tgt = jnp.asarray(
                rng.normal(0, 1, (batch, seq, cfg.dim)), jnp.float32
            )

            fwd = jax.jit(lambda p, x, c: dit.forward(p, x, c, cfg))

            def loss_fn(p, x, c):
                pred = dit.forward(p, x, c, cfg)
                return jnp.mean((pred.astype(jnp.float32) - tgt) ** 2)

            step = jax.jit(jax.grad(loss_fn))

            iters = 2 if on_cpu else 8
            t_fwd = time_op(fwd, params, x, cond, iters=iters)
            t_step = time_op(step, params, x, cond, iters=iters)
            row[name] = {
                "fwd_ms": t_fwd * 1e3,
                "train_step_ms": t_step * 1e3,
                "fwd_tokens_per_s": batch * seq / t_fwd,
                "train_tokens_per_s": batch * seq / t_step,
            }
            print(
                f"[dit_bench] {preset} {name}: fwd {t_fwd*1e3:.2f} ms, "
                f"step {t_step*1e3:.2f} ms",
                file=sys.stderr, flush=True,
            )
        base = row["bf16"]
        for name in ("int8", "int4"):
            row[name]["fwd_speedup_vs_bf16"] = (
                base["fwd_ms"] / row[name]["fwd_ms"]
            )
            row[name]["train_speedup_vs_bf16"] = (
                base["train_step_ms"] / row[name]["train_step_ms"]
            )
        results[preset] = {
            "seq": seq, "batch": batch, "dim": args.dim,
            "heads": args.heads, "depth": args.depth, **row,
        }

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
