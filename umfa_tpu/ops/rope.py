"""Rotary position embeddings with exact inverse (fused RoPE + attention).

Parity with the reference's `rope_rotate_{float,half,bfloat}` Metal kernels
(MFABridge.swift:269-319): pair rotation computed in FP32 with a
`negate_sin` flag giving the exact inverse used by the backward pass
(metal_sdpa_backend.cpp:2872-2882, MetalRopeFlashAttentionFn).

Two compositions with the flash kernel (reference: rope_instream /
rope_autograd routes, metal_sdpa_backend.cpp:2883-3133):

  * TRUE in-kernel fusion (`interleaved=False`, rotate-half pairing, the
    LLaMA/GPT-NeoX convention): the forward rotates Q per q-block at load
    and K once per tile at cache fill INSIDE the Pallas kernel
    (flash_fwd._rope_rotate_block) — rotated Q/K never exist in HBM. The
    backward recomputes the rotation in XLA (backward is ~2.5x forward
    FLOPs; two rotations there are noise) and applies the exact inverse
    (negate_sin) to dQ/dK. Only rotate-half fuses: the interleaved pairing
    is a stride-2 LANE gather Mosaic has no cheap layout for.
  * XLA two-pass (`interleaved=True`, or shapes the persistent-KV-cache
    layout can't serve): rotation as plain VPU math BEFORE the kernel.
    `pallas_call` is an opaque custom call to XLA, so the rotation CANNOT
    fuse into the kernel's input stream — rotated Q and K make one extra
    HBM round trip (~2·B·H·S·D·2 bytes each way; measured ~0.10 ms at
    B2 H16 S4K D64, docs/PERFORMANCE.md r5). JAX autodiff applies the
    exact inverse automatically (rotation is orthogonal).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

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


class _RopeKey(NamedTuple):
    causal: bool
    window: Optional[tuple]
    scale: Optional[float]
    interpret: bool


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rope_flash(key: _RopeKey, q, k, v, cos, sin):
    out, _ = _rope_flash_fwd_impl(key, q, k, v, cos, sin)
    return out


def _rope_flash_fwd_impl(key, q, k, v, cos, sin):
    from umfa_tpu.ops.flash_fwd import flash_attention_forward

    return flash_attention_forward(
        q, k, v, causal=key.causal, window=key.window, scale=key.scale,
        interpret=key.interpret, rope_cos=cos, rope_sin=sin,
    )


def _rope_flash_fwd(key, q, k, v, cos, sin):
    out, lse = _rope_flash_fwd_impl(key, q, k, v, cos, sin)
    return out, (q, k, v, cos, sin, out, lse)


def _rope_flash_bwd(key, res, g):
    from umfa_tpu.ops.flash_bwd import flash_attention_backward

    q, k, v, cos, sin, out, lse = res
    # Recompute the rotation in XLA (backward is ~2.5x forward FLOPs; two
    # rotations are noise there), run the dense backward on rotated
    # operands, then apply the EXACT inverse rotation (negate_sin) to
    # dQ/dK — the reference's backward contract
    # (metal_sdpa_backend.cpp:2872-2882).
    cq, sq = cos[: q.shape[-2]], sin[: q.shape[-2]]
    ck, sk = cos[: k.shape[-2]], sin[: k.shape[-2]]
    q_rot = apply_rope(q, cq, sq, interleaved=False)
    k_rot = apply_rope(k, ck, sk, interleaved=False)
    gdt = jnp.bfloat16 if q.dtype == jnp.bfloat16 else None
    dq, dk, dv = flash_attention_backward(
        q_rot, k_rot, v, out, lse, g,
        causal=key.causal, window=key.window, scale=key.scale,
        interpret=key.interpret, grad_dtype=gdt,
    )
    dq = apply_rope(dq, cq, sq, negate_sin=True, interleaved=False)
    dk = apply_rope(dk, ck, sk, negate_sin=True, interleaved=False)
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
        None, None,
    )


_rope_flash.defvjp(_rope_flash_fwd, _rope_flash_bwd)


def rope_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cos: Optional[jax.Array] = None,
    sin: Optional[jax.Array] = None,
    *,
    base: float = 10000.0,
    interleaved: bool = True,
    causal: bool = False,
    window: Optional[tuple] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
    **attention_kwargs,
) -> jax.Array:
    """RoPE(Q, K) → flash attention, differentiable with the exact inverse
    rotation in the backward.

    `interleaved=False` (rotate-half pairing, the LLaMA/GPT-NeoX
    convention) rotates IN-KERNEL — rotated Q/K never round-trip HBM (see
    module docstring for the convention constraint and the measured XLA
    round-trip cost). `interleaved=True` or any extra attention kwargs
    (bias, block_mask, ...) use the XLA two-pass composition."""
    from umfa_tpu.engine.stats import record_dispatch
    from umfa_tpu.ops.attention import flash_attention

    if cos is None or sin is None:
        cos, sin = rope_angles(
            max(q.shape[-2], k.shape[-2]), q.shape[-1], base=base
        )
    if (
        not interleaved
        and not attention_kwargs
        and q.shape[-1] % 2 == 0
    ):
        record_dispatch("rope_fused_inkernel")
        return _rope_flash(
            _RopeKey(causal, None if window is None else tuple(window),
                     scale, interpret),
            q, k, v, cos, sin,
        )
    record_dispatch("rope_xla_two_pass")
    q_rot = apply_rope(q, cos[: q.shape[-2]], sin[: q.shape[-2]], interleaved=interleaved)
    k_rot = apply_rope(k, cos[: k.shape[-2]], sin[: k.shape[-2]], interleaved=interleaved)
    return flash_attention(
        q_rot, k_rot, v, causal=causal, window=window, scale=scale,
        interpret=interpret, **attention_kwargs,
    )
