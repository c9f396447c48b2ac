"""Multi-device scaling benchmark.

Measures tokens/s (attention-only) for the sharding strategies in
umfa_tpu.parallel at whatever device count is available: 1 chip → the dense
fused kernel; N chips → heads over "tp" and/or ring attention over "sp".
Records per-chip efficiency vs the 1-chip number (BASELINE target: ≥ 85%
scaling efficiency 1 host → 4 hosts).

On this environment only one real chip is attached; run on a pod slice to
get real scaling points. `--cpu-sim N` runs the same code on N virtual CPU
devices to validate the measurement path (numbers are not meaningful).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--cpu-sim", type=int, default=0)
    args = ap.parse_args()

    if args.cpu_sim:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_sim}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.parallel import make_mesh, sharded_attention
    from umfa_tpu.utils.timing import time_op

    n = len(jax.devices())
    rng = np.random.default_rng(0)
    B, H, S, D = args.batch, args.heads, args.seq, args.dim
    q = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
    interpret = jax.default_backend() == "cpu"

    results = {"devices": n}

    t1 = time_op(
        lambda q, k, v: flash_attention(q, k, v, causal=True, interpret=interpret),
        q, k, v, iters=args.iters,
    )
    tokens = B * S
    results["single_chip"] = {"ms": t1 * 1e3, "tokens_per_s": tokens / t1}

    if n > 1:
        for name, kwargs in {
            f"tp{n}_heads": dict(dp=1, sp=1, tp=n, seq_axis=None),
            f"sp{n}_ring": dict(dp=1, sp=n, tp=1, seq_axis="sp"),
        }.items():
            mesh = make_mesh(kwargs["dp"], kwargs["sp"], kwargs["tp"])
            attn = sharded_attention(
                mesh, seq_axis=kwargs["seq_axis"], causal=True,
                interpret=interpret,
            )
            t = time_op(lambda q, k, v: attn(q, k, v), q, k, v,
                        iters=args.iters)
            eff = (t1 / t) / n  # speedup / ideal
            results[name] = {
                "ms": t * 1e3,
                "tokens_per_s": tokens / t,
                "scaling_efficiency": eff,
            }

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
