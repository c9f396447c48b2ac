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


def mla_absorbed_decode(
    q: jax.Array,
    latent: jax.Array,
    w_k_up: jax.Array,
    w_v_up: jax.Array,
    *,
    length: Optional[jax.Array] = None,
    chunk_start: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Decode attention DIRECTLY against the latent cache via weight
    absorption — the serving-side complement to `mla_decompress`.

    Since K = latent @ W_k, the scores obey the exact identity
        Q·Kᵀ = (Q·W_kᵀ)·latentᵀ
    so attention runs entirely in latent space: absorb W_k into the query
    (per head), take softmax over latent-space scores, contract P against
    the latent, and un-absorb through W_v. The cache that decode READS is
    the (B, S, L) latent — L bytes/token instead of 2·H·D — which is the
    whole point of MLA in the memory-bound decode regime (reference:
    docs/MLA_FFI_Implementation.md; DeepSeek-V2 §2.1 absorbed inference).
    FLOPs grow from H·D to H·L per cached token; decode is
    bandwidth-bound, so trading (L/D)× FLOPs for (2·H·D/L)× fewer bytes
    wins whenever the cache doesn't fit in cache hierarchy.

    q: (B, H, Tq, D) new-token queries (Tq small: token decode or short
       continuation chunks). w_k_up/w_v_up: (L, H*D).
    length: (B,) cache fill AFTER the append that wrote these Tq tokens;
       rows past a sequence's fill are masked.
    chunk_start: (B,) or scalar fill BEFORE the append — enables intra-chunk
       causality for Tq>1 (query i sees cache rows j <= chunk_start+i).
    """
    b, h, tq, d = q.shape
    lat = w_k_up.shape[0]
    if scale is None:
        scale = d**-0.5
    fp32 = q.dtype == jnp.float32
    mxu = jax.lax.Precision.HIGHEST if fp32 else jax.lax.Precision.DEFAULT
    cdt = jnp.float32 if fp32 else jnp.bfloat16

    wk = w_k_up.reshape(lat, h, d).astype(cdt)
    wv = w_v_up.reshape(lat, h, d).astype(cdt)
    # Absorb W_k into the query: (B,H,Tq,L). Cost B·Tq·H·D·L — per new
    # token, not per cached token.
    q_lat = jnp.einsum(
        "bhtd,lhd->bhtl", q.astype(cdt), wk,
        precision=mxu, preferred_element_type=jnp.float32,
    ).astype(cdt)
    s = jnp.einsum(
        "bhtl,bsl->bhts", q_lat, latent.astype(cdt),
        precision=mxu, preferred_element_type=jnp.float32,
    ) * scale
    s_max = latent.shape[1]
    if length is not None:
        pos = jnp.arange(s_max)[None, :]
        dead = pos >= length[:, None]            # (B, S_max)
        s = jnp.where(dead[:, None, None, :], -1e30, s)
    if chunk_start is not None and tq > 1:
        start = jnp.asarray(chunk_start)
        if start.ndim == 0:
            start = jnp.broadcast_to(start, (b,))
        qpos = start[:, None] + jnp.arange(tq)[None, :]      # (B, Tq)
        future = jnp.arange(s_max)[None, None, :] > qpos[..., None]
        s = jnp.where(future[:, None], -1e30, s)
    p = jax.nn.softmax(s, axis=-1)
    o_lat = jnp.einsum(
        "bhts,bsl->bhtl", p.astype(cdt), latent.astype(cdt),
        precision=mxu, preferred_element_type=jnp.float32,
    ).astype(cdt)
    # Un-absorb through W_v: V-side identity P·V = (P·latent)·W_v.
    out = jnp.einsum(
        "bhtl,lhd->bhtd", o_lat, wv,
        precision=mxu, preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


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
