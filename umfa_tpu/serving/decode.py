"""Incremental decode attention over KV caches.

Length masking is done with a per-batch additive bias row built from the
cache fill lengths (positions ≥ length → masked) — never a materialized
[B,H,Sq,Skv] mask. The quantized cache path feeds cached INT8 rows straight
into the quantized fused kernel (no dequantize-to-HBM round trip): the cache
is ~4× smaller AND attention reads ~4× fewer KV bytes — the memory-bound
decode regime is exactly where INT8 attention wins (reference claim:
quantized up to 1.3× faster in memory-bound workloads, README.md:70).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from umfa_tpu.engine.config import Precision, QuantMode, QuantStrategy
from umfa_tpu.ops.attention import flash_attention
from umfa_tpu.ops.quant import QuantizedTensor, quantize
from umfa_tpu.ops.quant_attention import quantized_attention_forward
from umfa_tpu.serving.kv_cache import KVCache, QuantizedKVCache


def _length_bias(length: jax.Array, max_len: int) -> jax.Array:
    """(B,) lengths → (B, 1, 1, max_len) additive bias masking the unfilled
    tail of the cache."""
    pos = jnp.arange(max_len)[None, :]
    masked = pos >= length[:, None]
    return jnp.where(masked, -1e30, 0.0).astype(jnp.float32)[:, None, None, :]


def decode_attention(
    q: jax.Array,
    cache: Union[KVCache, QuantizedKVCache],
    *,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Attend new queries against a cache. q: (B, Hq, Tq, D) (Tq = 1 for
    token-by-token decode; larger for chunked prefill continuation).
    New-token causal structure: query t may see all cached tokens plus
    itself/earlier new tokens (standard decode semantics when the queries
    were appended to the cache before calling)."""
    batch, hq, tq, d = q.shape
    bias = _length_bias(cache.length, cache.max_len)
    if tq > 1:
        # Intra-chunk causality relative to each sequence's position: query
        # row i (global pos length - tq + i) must not see cache slots beyond
        # it. Positions of queries: length - tq + i.
        pos = jnp.arange(cache.max_len)[None, None, :]
        qpos = (cache.length[:, None] - tq + jnp.arange(tq))[:, :, None]
        causal_mask = pos > qpos  # (B, Tq, S_max)
        bias = jnp.where(
            causal_mask[:, None], -1e30, bias
        )  # (B, 1, Tq, S_max) broadcastable
        bias = jnp.broadcast_to(bias, (batch, 1, tq, cache.max_len))

    # Few-token decode: the fused kernel's q tiles are ≥128 rows, so Tq=1
    # would burn 128× the q-side compute. A fused-by-XLA GEMV path reads the
    # cache exactly once (decode is KV-bandwidth-bound — and the quantized
    # cache reads 4× fewer bytes, dequantized on the fly in registers).
    if tq <= 16:
        return _gemv_decode(q, cache, bias, scale)

    if isinstance(cache, QuantizedKVCache):
        hkv = cache.k_values.shape[1]
        qt_q = quantize(q, Precision.INT8, QuantMode.ROW)
        shape_k = (batch, hkv, cache.max_len, d)

        def qt(values, scales):
            return QuantizedTensor(
                values=values, scales=scales, zero_points=None, row_sums=None,
                precision=Precision.INT8, mode=QuantMode.ROW,
                strategy=QuantStrategy.SYMMETRIC, block_size=64,
                orig_shape=shape_k, orig_dtype=jnp.dtype(q.dtype),
            )

        out, _ = quantized_attention_forward(
            qt_q, qt(cache.k_values, cache.k_scales),
            qt(cache.v_values, cache.v_scales),
            bias, scale=scale, interpret=interpret,
        )
        return out.astype(q.dtype)

    return flash_attention(
        q, cache.k, cache.v, bias, scale=scale, interpret=interpret
    )


def _gemv_decode(q, cache, bias, scale):
    """XLA-fused decode for small Tq: scores materialize at (B,H,Tq,S_max)
    — tiny for decode — and K/V stream through once."""
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    hq = q.shape[1]
    if isinstance(cache, QuantizedKVCache):
        hkv = cache.k_values.shape[1]
        k = cache.k_values.astype(jnp.bfloat16)
        v = cache.v_values.astype(jnp.bfloat16)
        k_scales = cache.k_scales.astype(jnp.float32)  # (B,Hkv,S,1)
        v_scales = cache.v_scales.astype(jnp.float32)
    else:
        hkv = cache.k.shape[1]
        k, v = cache.k, cache.v
        k_scales = v_scales = None
    if hq != hkv:
        g = hq // hkv
        k = jnp.repeat(k, g, axis=1)
        v = jnp.repeat(v, g, axis=1)
        if k_scales is not None:
            k_scales = jnp.repeat(k_scales, g, axis=1)
            v_scales = jnp.repeat(v_scales, g, axis=1)
    # fp32 inputs must not silently degrade to XLA's 1-pass bf16 matmul
    # (repo invariant — see flash_fwd's HIGHEST-precision rule).
    mxu = (
        jax.lax.Precision.HIGHEST
        if q.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    s = jnp.einsum(
        "bhtd,bhsd->bhts", q.astype(jnp.float32), k.astype(jnp.float32),
        precision=mxu,
    )
    if k_scales is not None:
        s = s * k_scales[..., 0][:, :, None, :]  # per-row K scale
    s = s * scale + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    if v_scales is not None:
        p = p * v_scales[..., 0][:, :, None, :]
    out = jnp.einsum(
        "bhts,bhsd->bhtd", p, v.astype(jnp.float32), precision=mxu
    )
    return out.astype(q.dtype)
