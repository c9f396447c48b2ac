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
):
    """Flash attention over a sequence sharded along `axis_name`.

    Must be called inside shard_map with q/k/v sequence dims sharded into
    contiguous, axis-ordered chunks: device i holds tokens
    [i*S_loc, (i+1)*S_loc). Returns the local output shard (B, H, S_loc, D).

    `local_attention(q, k, v, bias) -> (out, lse)` overrides the per-step
    kernel (e.g. the quantized fused kernel for a quantized ring).
    """
    n = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    batch, heads, s_loc, d = q.shape

    if causal:
        # Per-step visibility is decided by a *traced* chunk index (which KV
        # chunk this device currently holds), so it cannot pick a different
        # kernel specialization per case (lax.switch over custom_vjp branches
        # breaks JVP). Instead a single kernel call takes a step bias:
        #   src > my  → all-masked (the step's merge weight and grads become
        #               exactly zero),
        #   src == my → causal tril within the chunk,
        #   src < my  → zero bias (fully visible).
        q_ids = jnp.arange(s_loc)[:, None]
        k_ids = jnp.arange(s_loc)[None, :]
        tril_bias = jnp.where(k_ids <= q_ids, 0.0, DEFAULT_MASK_VALUE).astype(
            jnp.float32
        )

    o = jnp.zeros((batch, heads, s_loc, d), q.dtype)
    lse = jnp.full((batch, heads, s_loc), DEFAULT_MASK_VALUE, jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    kv = (k, v)
    for step in range(n):
        src = (my_idx - step) % n  # global chunk index currently held
        kc, vc = kv
        if causal:
            step_bias = jnp.where(
                src > my_idx,
                jnp.float32(DEFAULT_MASK_VALUE),
                jnp.where(src == my_idx, tril_bias, jnp.zeros_like(tril_bias)),
            )[None, None]
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
