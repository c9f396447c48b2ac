"""Device-true op timing.

The TPU in this environment sits behind a network relay: per-dispatch RTT is
~30 ms and `block_until_ready` can report early, so naive per-call timing is
meaningless (it reports >10× the chip's peak). Methodology here (the
TPU-native analogue of the reference's GPU-true
`commandBuffer.gpuEndTime - gpuStartTime` timing, MFABridge.swift:139-140):

  * run N iterations of the op inside ONE jitted fori_loop, chained through a
    tiny data dependency so XLA can neither hoist nor CSE the op;
  * force completion with a scalar host fetch;
  * time two iteration counts and take the slope — constant dispatch/RTT
    overhead cancels exactly.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _consume(out):
    """Sum of ALL leaves of the output: summing a slice lets XLA dead-code-
    eliminate the unconsumed rows of transparent (non-pallas) ops — an 8192³
    matmul "ran" 16× faster than the chip peak before this."""
    return sum(
        jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(out)
    )


def _perturb(x, s):
    """Chain a negligible perturbation into the next iteration's input to
    serialize iterations and defeat loop-invariant hoisting. Works on any
    pytree (e.g. a params dict): every float leaf gets the epsilon. The
    FIRST argument to time_op must contain at least one float leaf — an
    all-integer first arg leaves the loop body iteration-invariant and XLA
    hoists it entirely (a serving bench once reported 2.3M tok/s this way)."""
    leaves = [
        v for v in jax.tree.leaves(x)
        if jnp.issubdtype(v.dtype, jnp.floating)
    ]
    if not leaves:
        raise ValueError(
            "time_op: first argument has no float leaves to chain the "
            "anti-hoisting perturbation through; reorder the op's "
            "arguments so a float tensor (e.g. params) comes first"
        )

    def leaf(v):
        if jnp.issubdtype(v.dtype, jnp.floating):
            return v + (s * 1e-30).astype(v.dtype)
        return v

    return jax.tree.map(leaf, x)


def _looped(op: Callable, iters: int):
    @jax.jit
    def run(*args):
        q = args[0]

        def body(i, carry):
            acc, qq = carry
            out = op(qq, *args[1:])
            s = _consume(out)
            acc = acc + s
            qq = _perturb(qq, s)
            return acc, qq

        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), q))
        return acc

    return run


def time_op(op: Callable, *args, iters: int = 64, reps: int = 3) -> float:
    """Return best per-iteration seconds for op(*args) (device-true)."""
    n1, n2 = max(1, iters // 8), iters
    run1, run2 = _looped(op, n1), _looped(op, n2)
    float(run1(*args))  # compile + warm
    float(run2(*args))

    def best(run):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(*args))
            b = min(b, time.perf_counter() - t0)
        return b

    t1, t2 = best(run1), best(run2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def attention_flops(batch, heads, seq_q, seq_k, head_dim, causal=False,
                    backward=False):
    f = 4 * batch * heads * seq_q * seq_k * head_dim
    if causal:
        f //= 2
    if backward:
        f = f * 5 // 2  # bwd ≈ 2.5× fwd FLOPs (dQ + dKdV recompute)
    return f
