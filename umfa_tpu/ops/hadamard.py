"""Blockwise Fast Walsh–Hadamard Transform (pre-quantization rotation).

Parity with the reference's `HadamardRotation` ("ConvRot",
MFABridge.swift:130-137, 3426-3452; AGENTS.md:140-149): an in-place blockwise
FWHT, normalized by 1/√N so it is self-inverse, used to smooth outliers
before quantization (rotating activation space spreads outlier energy across
the block, shrinking per-group absmax).

Implemented as log2(N) butterfly passes in pure jnp — XLA lowers this to a
handful of VPU shuffles; a dedicated Pallas kernel is unnecessary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hadamard_rotate(x: jax.Array, block_size: int = 0, axis: int = -1) -> jax.Array:
    """Apply a normalized FWHT along `axis`, blockwise.

    block_size 0 (default) uses the full axis length; otherwise the axis is
    processed in independent blocks of that size. Lengths must be powers of
    two. Self-inverse: hadamard_rotate(hadamard_rotate(x)) == x.
    """
    axis = axis % x.ndim
    n = x.shape[axis]
    if block_size <= 0:
        block_size = n
    if n % block_size != 0:
        raise ValueError(f"axis length {n} not divisible by block {block_size}")
    if block_size & (block_size - 1):
        raise ValueError(f"block_size {block_size} must be a power of two")

    orig_dtype = x.dtype
    # Move target axis last, split into blocks.
    perm = [i for i in range(x.ndim) if i != axis] + [axis]
    xt = jnp.transpose(x, perm).astype(jnp.float32)
    lead = xt.shape[:-1]
    xt = xt.reshape(*lead, n // block_size, block_size)

    h = 1
    while h < block_size:
        shape = xt.shape[:-1] + (block_size // (2 * h), 2, h)
        xb = xt.reshape(shape)
        a = xb[..., 0, :]
        b = xb[..., 1, :]
        xt = jnp.stack([a + b, a - b], axis=-2).reshape(xt.shape)
        h *= 2

    xt = xt * (block_size**-0.5)
    xt = xt.reshape(*lead, n)
    inv_perm = [0] * x.ndim
    for i, p in enumerate(perm):
        inv_perm[p] = i
    return jnp.transpose(xt, inv_perm).astype(orig_dtype)
