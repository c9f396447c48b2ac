"""Ring attention: KV rotation across a mesh axis with online-softmax merge.

Long-context scaling beyond one device/host (new scope vs the reference,
SURVEY.md §5.7): the sequence is sharded along `axis_name`; each step every
device runs the fused single-chip Pallas kernel on its resident Q shard
against the currently-held KV shard, then rotates KV to its ring neighbour
with `jax.lax.ppermute` (XLA lowers this to ICI/DCN RDMA and overlaps it with
the next step's kernel — the collective-compute overlap lives in XLA's
scheduler). Partial results merge with the standard online-softmax rule on
(out, lse).

Differentiable end-to-end: ppermute and the fused kernel's custom_vjp give
jax.grad a reverse ring for free.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from umfa_tpu.ops.flash_fwd import BlockSizes, DEFAULT_MASK_VALUE
from umfa_tpu.ops.attention import flash_attention


def merge_partials(o1, lse1, o2, lse2):
    """Merge two normalized partial attention results.

    o_i: (B, H, S, D) = softmax-normalized partial outputs;
    lse_i: (B, H, S) log-sum-exp of the partial score sets.
    """
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    denom = w1 + w2
    safe = jnp.where(denom == 0.0, 1.0, denom)
    o = (
        o1.astype(jnp.float32) * (w1 / safe)[..., None]
        + o2.astype(jnp.float32) * (w2 / safe)[..., None]
    )
    return o.astype(o1.dtype), m + jnp.log(safe)


def zigzag_shard(x: jax.Array, n: int, axis: int = 2) -> jax.Array:
    """Reorder a sequence axis into zigzag layout for n ring devices: the
    global sequence splits into 2n half-chunks and device i receives
    (i, 2n-1-i) — balancing causal work across the ring (without it, device
    n-1 attends everything while device 0 mostly idles). Apply BEFORE
    shard_map; `zigzag_unshard` inverts it on outputs."""
    s = x.shape[axis]
    assert s % (2 * n) == 0, (s, n)
    half = s // (2 * n)
    order = []
    for i in range(n):
        order.extend(range(i * half, (i + 1) * half))
        order.extend(range((2 * n - 1 - i) * half, (2 * n - i) * half))
    return jnp.take(x, jnp.asarray(order), axis=axis)


def zigzag_unshard(x: jax.Array, n: int, axis: int = 2) -> jax.Array:
    """Inverse of zigzag_shard."""
    s = x.shape[axis]
    half = s // (2 * n)
    order = []
    for i in range(n):
        order.extend(range(i * half, (i + 1) * half))
        order.extend(range((2 * n - 1 - i) * half, (2 * n - i) * half))
    inv = [0] * s
    for dst, src in enumerate(order):
        inv[src] = dst
    return jnp.take(x, jnp.asarray(inv), axis=axis)


def _global_positions(chunk_idx, n, s_loc, zigzag):
    """Global token positions of the shard held by ring slot `chunk_idx`."""
    if zigzag:
        half = s_loc // 2
        lo = chunk_idx * half + jnp.arange(half)
        hi = (2 * n - 1 - chunk_idx) * half + jnp.arange(half)
        return jnp.concatenate([lo, hi])
    return chunk_idx * s_loc + jnp.arange(s_loc)


def ring_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interpret: bool = False,
    local_attention=None,
    zigzag: bool = False,
):
    """Flash attention over a sequence sharded along `axis_name`.

    Must be called inside shard_map with q/k/v sequence dims sharded into
    axis-ordered chunks: contiguous (device i holds tokens
    [i*S_loc, (i+1)*S_loc)) or, with zigzag=True, the `zigzag_shard` layout
    (device i holds global half-chunks i and 2n-1-i — causal work balanced
    across the ring). Returns the local output shard (B, H, S_loc, D).

    `local_attention(q, k, v, bias) -> (out, lse)` overrides the per-step
    kernel (e.g. the quantized fused kernel for a quantized ring).
    """
    n = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    batch, heads, s_loc, d = q.shape

    if causal:
        # Per-step visibility depends on *traced* chunk indices (which KV
        # chunk this device currently holds), so a single kernel call takes
        # a step bias built from global token positions: fully-masked steps
        # get zero merge weight and exactly zero gradients.
        qpos = _global_positions(my_idx, n, s_loc, zigzag)

    o = jnp.zeros((batch, heads, s_loc, d), q.dtype)
    lse = jnp.full((batch, heads, s_loc), DEFAULT_MASK_VALUE, jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    kv = (k, v)
    for step in range(n):
        src = (my_idx - step) % n  # ring slot of the chunk currently held
        kc, vc = kv
        if causal:
            kpos = _global_positions(src, n, s_loc, zigzag)
            step_bias = jnp.where(
                kpos[None, :] <= qpos[:, None], 0.0, DEFAULT_MASK_VALUE
            ).astype(jnp.float32)[None, None]
        else:
            step_bias = None
        if local_attention is not None:
            o_step, lse_step = local_attention(q, kc, vc, step_bias)
        else:
            o_step, lse_step = flash_attention(
                q, kc, vc, step_bias,
                scale=scale,
                block_sizes=block_sizes,
                interpret=interpret,
                return_lse=True,
            )
        o, lse = merge_partials(o, lse, o_step, lse_step)
        if step != n - 1:
            kv = jax.lax.ppermute(kv, axis_name, perm)
    return o
