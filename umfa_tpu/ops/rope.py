"""Rotary position embeddings with exact inverse (fused RoPE + attention).

Parity with the reference's `rope_rotate_{float,half,bfloat}` Metal kernels
(MFABridge.swift:269-319): interleaved-pair rotation computed in FP32 with a
`negate_sin` flag giving the exact inverse used by the backward pass
(metal_sdpa_backend.cpp:2872-2882, MetalRopeFlashAttentionFn).

On TPU the rotation is plain VPU math that XLA fuses into the attention
kernel's producers; `rope_attention` composes it with the fused flash kernel
and JAX autodiff applies the exact inverse rotation to gradients
automatically (rotation is orthogonal, so d/dq rotate(q) = rotate^{-1}ᵀ = rotate).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rope_angles(seq_len: int, head_dim: int, base: float = 10000.0, dtype=jnp.float32):
    """Standard RoPE angle table: (seq, head_dim // 2)."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    return jnp.cos(freqs).astype(dtype), jnp.sin(freqs).astype(dtype)


def apply_rope(
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    *,
    negate_sin: bool = False,
    interleaved: bool = True,
) -> jax.Array:
    """Rotate x (..., S, D) by the angle tables (S, D/2), FP32 math.

    negate_sin=True applies the exact inverse rotation (reference flag,
    MFABridge.swift:269-319).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    cos = cos.astype(jnp.float32)
    sin = (-sin if negate_sin else sin).astype(jnp.float32)
    if interleaved:
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        out = jnp.stack([r1, r2], axis=-1).reshape(xf.shape)
    else:
        d_half = xf.shape[-1] // 2
        x1 = xf[..., :d_half]
        x2 = xf[..., d_half:]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        out = jnp.concatenate([r1, r2], axis=-1)
    return out.astype(orig_dtype)


def rope_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cos: Optional[jax.Array] = None,
    sin: Optional[jax.Array] = None,
    *,
    base: float = 10000.0,
    interleaved: bool = True,
    **attention_kwargs,
) -> jax.Array:
    """Fused RoPE(Q,K) → flash attention (reference: rope_instream /
    rope_autograd routes, metal_sdpa_backend.cpp:2883-3133). Rotation and
    attention stay inside one jit so XLA fuses the rotation into the kernel's
    input stream — no extra HBM round trip."""
    from umfa_tpu.engine.stats import record_dispatch
    from umfa_tpu.ops.attention import flash_attention

    record_dispatch("rope_fused")
    if cos is None or sin is None:
        cos, sin = rope_angles(
            max(q.shape[-2], k.shape[-2]), q.shape[-1], base=base
        )
    q_rot = apply_rope(q, cos[: q.shape[-2]], sin[: q.shape[-2]], interleaved=interleaved)
    k_rot = apply_rope(k, cos[: k.shape[-2]], sin[: k.shape[-2]], interleaved=interleaved)
    return flash_attention(q_rot, k_rot, v, **attention_kwargs)
