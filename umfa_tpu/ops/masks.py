"""Mask canonicalization.

TPU-native analogue of the reference's `mfa_prepare_mask` Metal kernel
(MFABridge.swift:153-243, 366-491), which expands any broadcastable ≤4-D
bool/FP16/BF16/FP32 mask with arbitrary strides into a dense FP32 additive
[B,H,Sq,Skv] buffer. Here we:

  * accept bool masks (True = attend, reference: mfa_ffi.h:46-64) and additive
    float masks of any broadcastable ≤4-D shape;
  * convert bool → additive {0, MASK_VALUE} lazily inside jit (XLA fuses the
    select into the attention kernel's bias stream);
  * KEEP broadcast batch/head dims at size 1 — the kernel's bias BlockSpec
    index map handles broadcasting, so the [B,H,Sq,Skv] tensor the reference
    materializes never exists in HBM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from umfa_tpu.ops.flash_fwd import DEFAULT_MASK_VALUE


def canonicalize_mask(
    mask: Optional[jax.Array],
    batch: int,
    num_heads: int,
    seq_q: int,
    seq_k: int,
) -> Optional[jax.Array]:
    """Convert a user mask to a canonical additive-bias array.

    Returns an FP32 additive bias of shape (Bm, Hm, Sqm, Sk) where each of
    Bm ∈ {1, batch}, Hm ∈ {1, num_heads}, Sqm ∈ {1, seq_q} is kept minimal,
    or None.
    """
    if mask is None:
        return None
    if mask.ndim > 4:
        raise ValueError(f"mask must be ≤4-D, got shape {mask.shape}")
    while mask.ndim < 4:
        mask = mask[None]

    def _check(dim, full, name):
        if dim not in (1, full):
            raise ValueError(
                f"mask {name} dim {dim} not broadcastable to {full}"
            )

    _check(mask.shape[0], batch, "batch")
    _check(mask.shape[1], num_heads, "head")
    _check(mask.shape[2], seq_q, "seq_q")
    _check(mask.shape[3], seq_k, "seq_k")
    if mask.shape[3] == 1 and seq_k != 1:
        # Broadcasting along KV would mask everything or nothing per row;
        # expand (cheap: seq_k values per row).
        mask = jnp.broadcast_to(
            mask, (*mask.shape[:3], seq_k)
        )

    if mask.dtype == jnp.bool_ or jnp.issubdtype(mask.dtype, jnp.integer):
        # Boolean and byte masks (reference: byte masks are boolean-valued,
        # MFABridge.swift:366-491): nonzero = attend.
        return jnp.where(
            mask != 0, 0.0, DEFAULT_MASK_VALUE
        ).astype(jnp.float32)
    return mask.astype(jnp.float32)


def is_all_true(mask: Optional[jax.Array]) -> bool:
    """Static check used for the all-True bool-mask elision fast path
    (reference: metal_sdpa_backend.cpp:1767-1784). Only triggers on concrete
    (non-traced) arrays so it never forces a device sync inside jit."""
    if mask is None:
        return True
    if isinstance(mask, jax.core.Tracer):
        return False
    if mask.dtype == jnp.bool_:
        try:
            return bool(jnp.all(mask))
        except Exception:
            return False
    return False
