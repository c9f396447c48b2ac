"""KV caches for incremental decoding.

Static-shape by construction (XLA-friendly): a cache is a preallocated
(B, Hkv, S_max, D) buffer plus per-sequence fill lengths; `append` is a
dynamic_update_slice, never a reshape. The quantized variant stores INT8
rows + per-row scales — new tokens are quantized row-wise at append time, so
the cache holds ~4× more tokens per HBM byte (KV-cache compression,
PAPERS.md).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    k: jax.Array        # (B, Hkv, S_max, D)
    v: jax.Array        # (B, Hkv, S_max, D)
    length: jax.Array   # (B,) int32

    def tree_flatten(self):
        return (self.k, self.v, self.length), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedKVCache:
    k_values: jax.Array   # (B, Hkv, S_max, D) int8
    k_scales: jax.Array   # (B, Hkv, S_max, 1) f32
    v_values: jax.Array
    v_scales: jax.Array
    length: jax.Array     # (B,) int32

    def tree_flatten(self):
        return (
            self.k_values, self.k_scales, self.v_values, self.v_scales,
            self.length,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return self.k_values.shape[2]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LatentKVCache:
    """MLA latent cache: stores the COMPRESSED per-token latent instead of
    decompressed K/V. One (B, S_max, L) buffer replaces two (B, H, S_max, D)
    buffers — for DeepSeek geometry (L=512 vs 2·H·D=32768) that is a 64×
    smaller cache, and decode reads L bytes/token instead of 2·H·D
    (reference MLA rationale: docs/MLA_FFI_Implementation.md, the 32×
    compression claim in examples/deepseek-v3.2-exp/README.md)."""

    latent: jax.Array   # (B, S_max, L)
    length: jax.Array   # (B,) int32

    def tree_flatten(self):
        return (self.latent, self.length), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return self.latent.shape[1]


def init_cache(batch, num_kv_heads, max_len, head_dim, dtype=jnp.bfloat16):
    return KVCache(
        k=jnp.zeros((batch, num_kv_heads, max_len, head_dim), dtype),
        v=jnp.zeros((batch, num_kv_heads, max_len, head_dim), dtype),
        length=jnp.zeros((batch,), jnp.int32),
    )


def init_quantized_cache(batch, num_kv_heads, max_len, head_dim):
    return QuantizedKVCache(
        k_values=jnp.zeros((batch, num_kv_heads, max_len, head_dim), jnp.int8),
        k_scales=jnp.ones((batch, num_kv_heads, max_len, 1), jnp.float32),
        v_values=jnp.zeros((batch, num_kv_heads, max_len, head_dim), jnp.int8),
        v_scales=jnp.ones((batch, num_kv_heads, max_len, 1), jnp.float32),
        length=jnp.zeros((batch,), jnp.int32),
    )


def _update_rows(buf, new, start):
    """Write `new` (Hkv, T, ...) into buf (Hkv, S_max, ...) at row `start`."""
    return jax.lax.dynamic_update_slice(
        buf, new.astype(buf.dtype), (0, start) + (0,) * (buf.ndim - 2)
    )


def _write_rows(buf, new, length, pos):
    """Write `new` (B, Hkv, T, ...) into buf (B, Hkv, S_max, ...) at each
    sequence's current length. `pos` not None = UNIFORM positions (a traced
    scalar): a single scalar-start dynamic_update_slice, which XLA updates
    IN PLACE — the ragged vmap path lowers to a scatter that rewrites the
    FULL cache every call (measured 1.91 ms/step of a 3.14 ms decode step
    at B8 ctx4K depth8 — r4 serving bisect). Continuous batching keeps the
    ragged path; uniform decode must pass pos.

    Passing `pos` with RAGGED lengths writes every sequence's rows at `pos`
    and silently corrupts the cache. Under UMFA_DEBUG=1, float buffers are
    NaN-poisoned when the promise is broken so the corruption is loud
    (api.py's NaN machinery and any loss will catch it)."""
    if pos is not None:
        if (
            os.environ.get("UMFA_DEBUG") == "1"
            and jnp.issubdtype(buf.dtype, jnp.floating)
        ):
            uniform = jnp.all(length == length[0])
            new = jnp.where(uniform, new, jnp.nan)
        return jax.lax.dynamic_update_slice(
            buf, new.astype(buf.dtype), (0, 0, pos) + (0,) * (buf.ndim - 3)
        )
    return jax.vmap(_update_rows)(buf, new, length)


def append(
    cache: KVCache, k_new: jax.Array, v_new: jax.Array, pos=None
) -> KVCache:
    """Append T new tokens per sequence. k_new/v_new: (B, Hkv, T, D).
    Per-sequence fill positions come from cache.length (may differ across
    the batch — continuous batching appends at each sequence's own offset).
    `pos` (a scalar) promises UNIFORM positions and takes the in-place
    fast path (see _write_rows)."""
    t = k_new.shape[2]
    k = _write_rows(cache.k, k_new, cache.length, pos)
    v = _write_rows(cache.v, v_new, cache.length, pos)
    return KVCache(k=k, v=v, length=cache.length + t)


def init_latent_cache(batch, max_len, latent_dim, dtype=jnp.bfloat16):
    return LatentKVCache(
        latent=jnp.zeros((batch, max_len, latent_dim), dtype),
        length=jnp.zeros((batch,), jnp.int32),
    )


def append_latent(
    cache: LatentKVCache, latent_new: jax.Array, pos=None
) -> LatentKVCache:
    """Append T new latent rows per sequence. latent_new: (B, T, L).
    `pos` (a scalar) promises UNIFORM positions: single in-place
    dynamic_update_slice instead of the ragged scatter (see _write_rows;
    same UMFA_DEBUG=1 NaN-poison on a broken uniformity promise)."""
    t = latent_new.shape[1]

    if pos is not None:
        if os.environ.get("UMFA_DEBUG") == "1":
            uniform = jnp.all(cache.length == cache.length[0])
            latent_new = jnp.where(uniform, latent_new, jnp.nan)
        latent = jax.lax.dynamic_update_slice(
            cache.latent, latent_new.astype(cache.latent.dtype), (0, pos, 0)
        )
        return LatentKVCache(latent=latent, length=cache.length + t)

    def upd(buf, new, start):
        return jax.lax.dynamic_update_slice(
            buf, new.astype(buf.dtype), (start, 0)
        )

    return LatentKVCache(
        latent=jax.vmap(upd)(cache.latent, latent_new, cache.length),
        length=cache.length + t,
    )


def _rowwise_quant(x):
    """(…, T, D) → int8 values + (…, T, 1) scales (symmetric row-wise)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127)
    return q.astype(jnp.int8), scale


def append_quantized(
    cache: QuantizedKVCache, k_new: jax.Array, v_new: jax.Array, pos=None
) -> QuantizedKVCache:
    """Quantize new rows (row-wise symmetric INT8) and append. `pos` (a
    scalar) promises UNIFORM positions and takes the in-place fast path
    (see _write_rows)."""
    t = k_new.shape[2]
    kq, ks = _rowwise_quant(k_new)
    vq, vs = _rowwise_quant(v_new)
    ln = cache.length
    return QuantizedKVCache(
        k_values=_write_rows(cache.k_values, kq, ln, pos),
        k_scales=_write_rows(cache.k_scales, ks, ln, pos),
        v_values=_write_rows(cache.v_values, vq, ln, pos),
        v_scales=_write_rows(cache.v_scales, vs, ln, pos),
        length=ln + t,
    )
