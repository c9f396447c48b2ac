"""GPipe-style pipeline parallelism over a mesh axis.

New scope beyond the reference (its parallelism is single-device —
SURVEY.md §2.4); part of the multi-host layer this framework adds. The
design follows the standard TPU shard_map pipelining recipe (the
scaling-book collective-matmul/pipeline pattern): stage weights live
sharded over the `pp` mesh axis (leading stage dim), the batch is split
into M microbatches, and the schedule runs S + M - 1 ticks where each tick
every stage applies itself to its in-flight microbatch and the activations
rotate one hop along the axis via `ppermute`. Communication is a
neighbor-only ICI hop per tick, overlapping naturally with the next tick's
compute under XLA's async collectives.

Constraints (by construction of pipelining): every stage maps activations
of one shape to the same shape, and the number of stages equals the axis
size. The bubble fraction is (S-1)/(S+M-1) — pick M >= S for efficiency.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from umfa_tpu.utils.compat import shard_map


def _pipeline_local(stage_params, x_mb, *, fn, axis, num_micro):
    """Body run per-device under shard_map. stage_params: this stage's
    params (leading stage dim of size 1, squeezed here). x_mb: (M, mb, ...)
    microbatched input, fully replicated. Outputs are banked on the last
    stage and replicated to all devices by a masked psum at the end."""
    s = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    params = jax.tree_util.tree_map(lambda a: a[0], stage_params)
    m = num_micro
    mb_shape = x_mb.shape[1:]

    def tick(t, carry):
        state, out = carry
        # Stage 0 ingests microbatch t (while t < m); other stages take the
        # activation handed to them last tick.
        fresh = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.minimum(t, m - 1), axis=0, keepdims=False
        )
        inp = jnp.where(idx == 0, fresh, state)
        y = fn(params, inp)
        # Last stage banks microbatch t-(s-1) when it's real.
        done = t - (s - 1)
        write = (idx == s - 1) & (done >= 0)
        out = jax.lax.cond(
            write,
            lambda o: jax.lax.dynamic_update_index_in_dim(
                o, y, jnp.maximum(done, 0), axis=0
            ),
            lambda o: o,
            out,
        )
        # Rotate activations one hop forward (stage i -> i+1). The wrap
        # (last -> 0) carries garbage that stage 0 ignores (it reads fresh).
        state = jax.lax.ppermute(
            y, axis, [(i, (i + 1) % s) for i in range(s)]
        )
        return state, out

    state = jnp.zeros(mb_shape, x_mb.dtype)
    out = jnp.zeros((m,) + mb_shape, x_mb.dtype)
    state, out = jax.lax.fori_loop(0, m + s - 1, tick, (state, out))
    # Outputs were banked on the last stage only; replicate them to every
    # device (masked psum — everyone else contributes zeros).
    mask = (idx == s - 1).astype(out.dtype)
    return jax.lax.psum(out * mask, axis)


def pipeline_apply(
    fn: Callable,
    stacked_params,
    x: jax.Array,
    *,
    mesh,
    axis: str = "pp",
    num_microbatches: int,
):
    """Apply `num_stages` sequential stages to x with pipeline parallelism.

    fn(params_i, x) -> y: one stage (shape-preserving).
    stacked_params: pytree whose leaves have a leading stage dim equal to
      the size of `axis`; sharded over that axis (stage i's weights live on
      pipeline rank i).
    x: (B, ...) global batch, B divisible by num_microbatches.

    Semantics match `for i in range(S): x = fn(params_i, x)`.
    """
    from jax.sharding import PartitionSpec as P

    s = mesh.shape[axis]
    b = x.shape[0]
    m = num_microbatches
    if b % m:
        raise ValueError(f"batch {b} not divisible by microbatches {m}")
    x_mb = x.reshape(m, b // m, *x.shape[1:])

    pspec = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    fn_sm = shard_map(
        lambda p, xx: _pipeline_local(p, xx, fn=fn, axis=axis, num_micro=m),
        mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=P(),
    )
    out = fn_sm(stacked_params, x_mb)
    return out.reshape(b, *x.shape[1:])
