"""Decoder-only causal LM (GPT-style) on the fused attention stack.

Third model family (alongside the FLUX-style DiT and DeepSeek-style MLA):
pre-LN transformer with RoPE and GQA, trained through the fused causal
kernel, served through the serving layer's KV caches + decode attention —
the end-to-end path a production deployment uses.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from umfa_tpu.engine.config import QuantizationConfig
from umfa_tpu.ops.attention import flash_attention
from umfa_tpu.ops.rope import apply_rope
from umfa_tpu.serving import decode_attention, init_cache
from umfa_tpu.serving.kv_cache import append, append_quantized, init_quantized_cache


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    vocab: int = 256
    dim: int = 256
    num_heads: int = 4
    num_kv_heads: int = 2
    depth: int = 2
    mlp_ratio: int = 4
    max_seq: int = 512
    rope_base: float = 10000.0
    dtype: str = "float32"
    quantization: Optional[QuantizationConfig] = None
    # KV cache storage: "bf16"/"fp32" (input dtype) or "int8" (row-wise
    # symmetric; decode reads 4x fewer KV bytes — the memory-bound regime
    # where quantization actually wins on TPU, docs/PERFORMANCE.md).
    kv_cache: str = "dtype"
    interpret: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def init_params(key, cfg: GPTConfig) -> dict:
    keys = jax.random.split(key, 2 + cfg.depth)
    s = cfg.dim**-0.5
    params = {
        "embed": jax.random.normal(keys[0], (cfg.vocab, cfg.dim), cfg.jdtype) * s,
        "unembed": jax.random.normal(keys[1], (cfg.dim, cfg.vocab), cfg.jdtype) * s,
        "blocks": [],
    }
    hidden = cfg.dim * cfg.mlp_ratio
    for i in range(cfg.depth):
        bk = jax.random.split(keys[2 + i], 4)
        params["blocks"].append({
            "wq": jax.random.normal(
                bk[0], (cfg.dim, cfg.num_heads, cfg.head_dim), cfg.jdtype) * s,
            "wkv": jax.random.normal(
                bk[1], (cfg.dim, 2, cfg.num_kv_heads, cfg.head_dim), cfg.jdtype) * s,
            "wo": jax.random.normal(
                bk[2], (cfg.num_heads, cfg.head_dim, cfg.dim), cfg.jdtype) * s,
            "w1": jax.random.normal(bk[3], (cfg.dim, hidden), cfg.jdtype) * s,
            "w2": jax.random.normal(
                jax.random.fold_in(bk[3], 1), (hidden, cfg.dim), cfg.jdtype)
            * (hidden**-0.5),
        })
    return params


def _ln(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _rope_tables(positions, head_dim, base):
    """positions (T,) → tables (T, D/2); positions (B, T) (ragged decode) →
    tables (B, 1, T, D/2) broadcasting over heads in apply_rope."""
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    if freqs.ndim == 3:
        freqs = freqs[:, None]
    return jnp.cos(freqs), jnp.sin(freqs)


def _qkv(block, x, cfg, positions):
    q = jnp.einsum("bsd,dhe->bhse", _ln(x), block["wq"])
    kv = jnp.einsum("bsd,dthe->btshe", _ln(x), block["wkv"])
    k, v = kv[:, 0].transpose(0, 2, 1, 3), kv[:, 1].transpose(0, 2, 1, 3)
    cos, sin = _rope_tables(positions, cfg.head_dim, cfg.rope_base)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v


def _block_tail(block, x, attn, cfg):
    attn = jnp.einsum("bhse,hed->bsd", attn.astype(x.dtype), block["wo"])
    x = x + attn
    h = jnp.einsum("bsd,dk->bsk", _ln(x), block["w1"])
    h = jax.nn.gelu(h.astype(jnp.float32)).astype(x.dtype)
    x = x + jnp.einsum("bsk,kd->bsd", h, block["w2"])
    return x


def forward(params: dict, tokens: jax.Array, cfg: GPTConfig) -> jax.Array:
    """Training forward: tokens (B, S) → logits (B, S, vocab)."""
    b, s = tokens.shape
    x = params["embed"][tokens]
    positions = jnp.arange(s)
    for block in params["blocks"]:
        q, k, v = _qkv(block, x, cfg, positions)
        if cfg.quantization is not None:
            from umfa_tpu.ops.quant_attention import quantized_flash_attention

            attn = quantized_flash_attention(
                q, k, v, config=cfg.quantization, causal=True,
                interpret=cfg.interpret,
            )
        else:
            attn = flash_attention(q, k, v, causal=True, interpret=cfg.interpret)
        x = _block_tail(block, x, attn, cfg)
    return jnp.einsum("bsd,dv->bsv", _ln(x), params["unembed"])


def init_caches(cfg: GPTConfig, batch: int):
    if cfg.kv_cache == "int8":
        return [
            init_quantized_cache(
                batch, cfg.num_kv_heads, cfg.max_seq, cfg.head_dim
            )
            for _ in range(cfg.depth)
        ]
    return [
        init_cache(batch, cfg.num_kv_heads, cfg.max_seq, cfg.head_dim, cfg.jdtype)
        for _ in range(cfg.depth)
    ]


def forward_with_cache(
    params: dict,
    tokens: jax.Array,
    caches,
    cfg: GPTConfig,
    prefill: bool = False,
    chunk_start=None,
    uniform_pos: bool = True,
) -> Tuple[jax.Array, list]:
    """Incremental forward: append `tokens` (B, T) at each sequence's current
    cache position; returns (logits (B, T, vocab), new caches).

    `prefill=True` (static): the caches were empty before this call — the
    attention routes to the plain causal kernel with no materialized
    intra-chunk bias (see serving.decode.decode_attention).

    `uniform_pos=True` (default) PROMISES uniform cache fill lengths across
    the batch: the append takes the in-place fast path (the ragged scatter
    measured 1.91 ms/step of a 3.14 ms step at B8 ctx4K depth8 — r4 serving
    bisect) and RoPE positions derive from sequence 0's length. Ragged
    continuous-batching callers MUST pass uniform_pos=False; UMFA_DEBUG=1
    NaN-poisons a broken promise (kv_cache._write_rows)."""
    b, t = tokens.shape
    x = params["embed"][tokens]
    start = caches[0].length[0]
    if uniform_pos:
        positions = start + jnp.arange(t)           # (T,) shared
    else:
        positions = caches[0].length[:, None] + jnp.arange(t)  # (B, T)
    pos_arg = start if uniform_pos else None
    new_caches = []
    for block, cache in zip(params["blocks"], caches):
        q, k, v = _qkv(block, x, cfg, positions)
        if cfg.kv_cache == "int8":
            cache = append_quantized(cache, k, v, pos=pos_arg)
        else:
            cache = append(cache, k, v, pos=pos_arg)
        attn = decode_attention(
            q, cache, prefill=prefill, chunk_start=chunk_start,
            interpret=cfg.interpret,
        )
        new_caches.append(cache)
        x = _block_tail(block, x, attn.astype(x.dtype), cfg)
    return jnp.einsum("bsd,dv->bsv", _ln(x), params["unembed"]), new_caches


def generate(
    params: dict,
    prompt: jax.Array,
    steps: int,
    cfg: GPTConfig,
    greedy: bool = True,
) -> jax.Array:
    """Greedy generation with KV caches. prompt: (B, S0) → (B, S0 + steps)."""
    caches = init_caches(cfg, prompt.shape[0])
    logits, caches = forward_with_cache(params, prompt, caches, cfg, prefill=True)
    tokens = prompt
    next_tok = jnp.argmax(logits[:, -1:], axis=-1)
    for _ in range(steps):
        tokens = jnp.concatenate([tokens, next_tok], axis=1)
        logits, caches = forward_with_cache(params, next_tok, caches, cfg)
        next_tok = jnp.argmax(logits[:, -1:], axis=-1)
    return tokens
