"""DeepSeek-style MLA (Multi-head Latent Attention) layer.

Parity target: examples/deepseek-v3.2-exp/{model,kernel}.py (SURVEY.md §2.2)
— KV compressed into a small latent (32× compression, e.g. 16384 → 512),
decompressed through per-layer up-projections at attention time, plus the
sparse-attention indexer scores routed through the fused relu(QK^T) op
(reference: mfa_sparse_indexer_scores, kernel.py:29-60).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from umfa_tpu.ops.attention import flash_attention
from umfa_tpu.ops.mla import mla_decompress, sparse_indexer_scores


@dataclasses.dataclass(frozen=True)
class MLAConfig:
    dim: int = 512
    num_heads: int = 8
    latent_dim: int = 64          # compressed KV width (dim/8 compression)
    causal: bool = True
    dtype: str = "bfloat16"
    # Sparse indexer (DeepSeek-V3.2-exp style): keep top-k KV per query.
    indexer_topk: Optional[int] = None
    interpret: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def init_params(key, cfg: MLAConfig) -> dict:
    dim, latent = cfg.dim, cfg.latent_dim
    keys = jax.random.split(key, 5)
    s = dim**-0.5
    return {
        "wq": jax.random.normal(keys[0], (dim, dim), cfg.jdtype) * s,
        "w_down": jax.random.normal(keys[1], (dim, latent), cfg.jdtype) * s,
        "w_k_up": jax.random.normal(keys[2], (latent, dim), cfg.jdtype)
        * (latent**-0.5),
        "w_v_up": jax.random.normal(keys[3], (latent, dim), cfg.jdtype)
        * (latent**-0.5),
        "wo": jax.random.normal(keys[4], (dim, dim), cfg.jdtype) * s,
    }


def compress_kv(params: dict, x: jax.Array) -> jax.Array:
    """x: (B, S, dim) → latent KV cache (B, S, latent). This is what a
    serving stack stores — the 32×-smaller cache is MLA's point."""
    return jnp.einsum("bsd,dl->bsl", x, params["w_down"])


def attend(params: dict, x: jax.Array, latent: jax.Array, cfg: MLAConfig):
    """Full MLA attention: Q from x, K/V decompressed from the latent cache
    (reference flow SURVEY.md §3.5), fused attention, output projection."""
    b, s, d = x.shape
    q = jnp.einsum("bsd,de->bse", x, params["wq"])
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    k, v = mla_decompress(
        latent, params["w_k_up"], params["w_v_up"], num_heads=cfg.num_heads
    )
    bias = None
    if cfg.indexer_topk is not None and cfg.indexer_topk < latent.shape[1]:
        # Sparse indexer: score KV positions per query with the cheap latent-
        # space relu(QK^T), keep top-k as an additive mask (others -> -inf).
        # The reference's torch fallback does exactly this dense top-k
        # (examples/deepseek-v3.2-exp/kernel.py:49-60).
        q_idx = jnp.einsum("bsd,dl->bsl", x, params["w_down"])  # latent-space query
        scores = sparse_indexer_scores(q_idx, latent)  # (B, S, S_kv)
        kth = jnp.sort(scores, axis=-1)[..., -cfg.indexer_topk][..., None]
        bias = jnp.where(scores >= kth, 0.0, -1e30).astype(jnp.float32)
        bias = bias[:, None]  # (B, 1, S, S_kv) broadcast over heads
    out = flash_attention(
        q, k, v, bias, causal=cfg.causal, interpret=cfg.interpret
    )
    out = out.transpose(0, 2, 1, 3).reshape(b, s, d).astype(x.dtype)
    return jnp.einsum("bsd,de->bse", out, params["wo"])


def forward(params: dict, x: jax.Array, cfg: MLAConfig):
    latent = compress_kv(params, x)
    return x + attend(params, x, latent, cfg)


def decode_step(
    params: dict, x: jax.Array, cache, cfg: MLAConfig,
    uniform_pos: bool = True,
):
    """Serving decode step over a LatentKVCache: compress the new tokens'
    latent, append, then attend against the latent cache via weight
    absorption (`mla_absorbed_decode`) — the cache read per step is
    B·S·L bytes, not 2·B·H·S·D. x: (B, Tq, dim). Returns (y, cache').

    `uniform_pos=True` (default) PROMISES every sequence in the batch is at
    the same fill length and takes the in-place append fast path (the ragged
    scatter rewrites the full cache: 1.91 of 3.14 ms/step, r4 bisect). A
    continuous-batching caller with ragged cache.length MUST pass
    uniform_pos=False; under UMFA_DEBUG=1 a broken promise NaN-poisons the
    written rows (kv_cache._write_rows)."""
    from umfa_tpu.ops.mla import mla_absorbed_decode
    from umfa_tpu.serving.kv_cache import append_latent

    b, tq, dim = x.shape
    chunk_start = cache.length
    cache = append_latent(
        cache, compress_kv(params, x),
        pos=cache.length[0] if uniform_pos else None,
    )
    q = jnp.einsum("bsd,de->bse", x, params["wq"])
    q = q.reshape(b, tq, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    out = mla_absorbed_decode(
        q, cache.latent, params["w_k_up"], params["w_v_up"],
        length=cache.length,
        chunk_start=chunk_start if tq > 1 else None,
    )
    out = out.transpose(0, 2, 1, 3).reshape(b, tq, dim).astype(x.dtype)
    return x + jnp.einsum("bsd,de->bse", out, params["wo"]), cache
