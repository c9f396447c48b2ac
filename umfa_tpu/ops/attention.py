"""Differentiable fused flash attention (custom_vjp wiring).

Ties the Pallas forward (flash_fwd.py) and backward (flash_bwd.py) kernels
into one differentiable op — the TPU-native analogue of the reference's
autograd Function `MetalFlashAttentionFn`
(examples/pytorch-custom-op-ffi/src/metal_sdpa_backend.cpp:2672-2861):
forward saves (q, k, v, out, lse), backward recomputes P from LSE.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from umfa_tpu.ops.flash_fwd import BlockSizes, flash_attention_forward
from umfa_tpu.ops.flash_bwd import flash_attention_backward


@dataclasses.dataclass(frozen=True)
class AttnConfig:
    """Static attention configuration (hashable; the jit-cache key — the
    analogue of the reference's PipelineCacheKey, MFABridge.swift:1212-1268)."""

    causal: bool = False
    window: Optional[tuple] = None
    scale: Optional[float] = None
    block_sizes: BlockSizes = BlockSizes()
    out_dtype: Optional[str] = None
    interpret: bool = False
    # Opt-in: compute the real bias gradient (trainable relative-position
    # biases). Off by default — masks are usually constants and the dbias
    # pass costs a full extra kernel sweep.
    bias_grad: bool = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(config: AttnConfig, q, k, v, bias, block_map, fetch_kv, fetch_q):
    """Differentiable fused attention returning (out, lse).

    LSE is a first-class differentiable output (the ring-attention merge
    consumes it): its cotangent folds exactly into the backward's D statistic
    (flash_bwd.flash_attention_backward, `dlse`). `block_map` is a compiled
    block-sparse structure (ops/block_mask.py) or None."""
    return flash_attention_forward(
        q, k, v, bias, block_map, fetch_kv,
        causal=config.causal,
        window=config.window,
        scale=config.scale,
        block_sizes=config.block_sizes,
        out_dtype=jnp.dtype(config.out_dtype) if config.out_dtype else None,
        interpret=config.interpret,
    )


def _flash_fwd(config, q, k, v, bias, block_map, fetch_kv, fetch_q):
    out, lse = _flash(config, q, k, v, bias, block_map, fetch_kv, fetch_q)
    return (out, lse), (q, k, v, bias, block_map, fetch_kv, fetch_q, out, lse)


def _flash_bwd(config, residuals, g):
    q, k, v, bias, block_map, fetch_kv, fetch_q, out, lse = residuals
    g_out, g_lse = g
    # Kernels emit bf16 grads directly when the consumer would cast anyway
    # (halves grad HBM writes + deletes the cast pass); fp32/fp16 keep the
    # FP32 emission.
    gdt = jnp.bfloat16 if q.dtype == jnp.bfloat16 else None
    dq, dk, dv = flash_attention_backward(
        q, k, v, out, lse, g_out, bias, g_lse, block_map, fetch_kv, fetch_q,
        causal=config.causal,
        window=config.window,
        scale=config.scale,
        block_sizes=config.block_sizes,
        interpret=config.interpret,
        grad_dtype=gdt,
    )
    if bias is None:
        dbias = None
    elif config.bias_grad:
        from umfa_tpu.ops.flash_bwd import flash_attention_bias_grad

        b4 = bias
        while b4.ndim < 4:
            b4 = b4[None]
        expand_q = b4.shape[2] == 1
        if expand_q:
            b4 = jnp.broadcast_to(b4, (*b4.shape[:2], q.shape[2], b4.shape[3]))
        dbias = flash_attention_bias_grad(
            q, k, v, out, lse, g_out, b4,
            causal=config.causal, window=config.window, scale=config.scale,
            block_sizes=config.block_sizes, interpret=config.interpret,
        )
        if expand_q:
            dbias = jnp.sum(dbias, axis=2, keepdims=True)
        dbias = dbias.reshape(bias.shape).astype(bias.dtype)
    else:
        dbias = jnp.zeros_like(bias)
    dmap = None if block_map is None else jnp.zeros_like(block_map)
    dfkv = None if fetch_kv is None else jnp.zeros_like(fetch_kv)
    dfq = None if fetch_q is None else jnp.zeros_like(fetch_q)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias, dmap, dfkv, dfq)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    causal: bool = False,
    window: Optional[tuple] = None,
    scale: Optional[float] = None,
    block_mask=None,
    block_sizes: BlockSizes = BlockSizes(),
    out_dtype=None,
    interpret: bool = False,
    return_lse: bool = False,
    bias_grad: bool = False,
):
    """Differentiable fused flash attention.

    q: (B, Hq, Sq, D); k, v: (B, Hkv, Sk, D) with Hq % Hkv == 0 (GQA).
    bias: optional additive FP32 bias, broadcastable (leading dims may be 1).
    block_mask: a compiled ops.block_mask.BlockMask — fully-masked tiles skip
    all compute (FlexAttention-style block sparsity).
    bias_grad=True computes the real bias gradient (else zeros — see
    AttnConfig.bias_grad).
    Gradients are computed in FP32 and cast back to input dtypes (reference
    invariant: FP32 grads, metal_sdpa_backend.cpp:2800-2804).
    """
    if (
        block_mask is None
        and bias is None
        and window is not None
        and block_sizes == BlockSizes()
    ):
        # Plain `window=` calls get the same per-mask tile auto-tuning that
        # compiled BlockMasks do: tile structure (skip + compacted fetch)
        # comes from an analytically-built BlockMask, while intra-tile
        # masking stays the kernel's causal/window index math (bias=None —
        # nothing [Sq, Sk]-shaped is ever materialized). None = the default
        # masked walk is predicted at least as fast (wide windows).
        from umfa_tpu.ops.block_mask import maybe_window_block_mask

        block_mask = maybe_window_block_mask(
            q.shape[2], k.shape[2], tuple(window), causal, q.shape[3]
        )
        if block_mask is not None:
            from umfa_tpu.engine.stats import record_dispatch

            record_dispatch("window_auto_tiled")

    block_map = fetch_kv = fetch_q = None
    if block_mask is not None:
        assert bias is None, "pass either bias or block_mask, not both"
        bias = block_mask.bias
        block_map = block_mask.block_map
        fetch_kv = block_mask.fetch_kv
        fetch_q = block_mask.fetch_q
        # Forward AND backward tilings must match the compiled map.
        block_sizes = dataclasses.replace(
            block_sizes,
            block_q=block_mask.block_q,
            block_k=block_mask.block_k,
            block_q_dq=block_mask.block_q,
            block_k_dq=block_mask.block_k,
            block_q_dkv=block_mask.block_q,
            block_k_dkv=block_mask.block_k,
        )
    config = AttnConfig(
        causal=causal,
        window=window,
        scale=scale,
        block_sizes=block_sizes,
        out_dtype=jnp.dtype(out_dtype).name if out_dtype is not None else None,
        interpret=interpret,
        bias_grad=bias_grad,
    )
    out, lse = _flash(config, q, k, v, bias, block_map, fetch_kv, fetch_q)
    if return_lse:
        # (out, lse) path — reference: mfa_attention_forward_with_lse
        # (MFABridge.swift:3071) — differentiable here.
        return out, lse
    return out


def reference_attention(q, k, v, bias=None, *, causal=False, window=None, scale=None):
    """Naive jnp reference (softmax(QK^T)V) used by tests — the analogue of
    the reference's PyTorch-reproducible CPU reference
    (Tests/MFAFFITests/MultiHeadFFITests.swift:1215-1360)."""
    b, hq, sq, d = q.shape
    _, hkv, sk, _ = k.shape
    if hq != hkv:
        k = jnp.repeat(k, hq // hkv, axis=1)
        v = jnp.repeat(v, hq // hkv, axis=1)
    if scale is None:
        scale = d**-0.5
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) * scale
    if bias is not None:
        while bias.ndim < 4:
            bias = bias[None]
        s = s + bias.astype(jnp.float32)
    q_ids = jnp.arange(sq)[:, None]
    k_ids = jnp.arange(sk)[None, :]
    mask = jnp.ones((sq, sk), dtype=bool)
    if causal:
        mask &= k_ids <= q_ids
    if window is not None:
        left, right = window
        if left >= 0:
            mask &= k_ids >= q_ids - left
        if right >= 0:
            mask &= k_ids <= q_ids + right
    s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.isnan(p), 0.0, p)  # fully-masked rows → 0
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(q.dtype)
