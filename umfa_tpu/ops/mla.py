"""MLA (Multi-head Latent Attention) support.

Parity with the reference's `MLAOptimizedGEMMMFA` KV decompression
(MFABridge.swift:2908-3064; docs/MLA_FFI_Implementation.md) and
`mfa_sparse_indexer_scores` (MFABridge.swift:3279-3420, used by the
DeepSeek-V3.2 sparse-attention indexer, examples/deepseek-v3.2-exp/kernel.py).

On TPU the decompression GEMMs `K = latent @ W_k`, `V = latent @ W_v` are
plain einsums — XLA tiles them straight onto the MXU at speed-of-light and
fuses them with the attention kernel's input stream, so the reference's
hand-tuned per-architecture GEMM tiles (M3: 32×32×8 etc.) have no analogue to
port. BF16 memory / FP32 accumulation matches the reference's FP16/FP32 split.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def mla_decompress(
    latent: jax.Array,
    w_k: jax.Array,
    w_v: jax.Array,
    *,
    num_heads: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Decompress latent KV into full K, V.

    latent: (B, S, L) compressed KV cache (L = latent dim, e.g. 512 for
      DeepSeek's 32× compression of 16384).
    w_k, w_v: (L, H*D) decompression weights.
    Returns (k, v) of shape (B, H, S, D) if num_heads given, else (B, S, H*D).
    FP32 accumulation regardless of input dtype.
    """
    k = jnp.einsum(
        "bsl,lf->bsf", latent, w_k, preferred_element_type=jnp.float32
    ).astype(latent.dtype)
    v = jnp.einsum(
        "bsl,lf->bsf", latent, w_v, preferred_element_type=jnp.float32
    ).astype(latent.dtype)
    if num_heads is not None:
        b, s, f = k.shape
        d = f // num_heads
        k = k.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    return k, v


def sparse_indexer_scores(
    q: jax.Array,
    k: jax.Array,
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """relu(Q @ K^T * scale) — the DeepSeek sparse-attention indexer score
    (reference: mfa_sparse_indexer_scores, MFABridge.swift:3279-3420).

    q: (..., Sq, D), k: (..., Sk, D) → (..., Sq, Sk) FP32.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum(
        "...qd,...kd->...qk",
        q.astype(jnp.float32),
        k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return jax.nn.relu(s * scale)


def mla_attention(
    q: jax.Array,
    latent: jax.Array,
    w_k: jax.Array,
    w_v: jax.Array,
    **attention_kwargs,
) -> jax.Array:
    """Latent-KV attention: decompress inside the same jit as the fused
    attention kernel so XLA overlaps the GEMMs with the attention pipeline
    (reference flow: mla_forward → MLAOptimizedGEMMMFA.forward + attention,
    SURVEY.md §3.5)."""
    from umfa_tpu.ops.attention import flash_attention

    num_heads = q.shape[1]
    k, v = mla_decompress(latent, w_k, w_v, num_heads=num_heads)
    return flash_attention(q, k, v, **attention_kwargs)
