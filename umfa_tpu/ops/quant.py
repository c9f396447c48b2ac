"""Runtime quantization: INT8 / INT4, tensor-/row-/block-wise, sym/asym.

TPU-native equivalent of the reference's runtime GPU quantizer
(`QuantizedTensor.from(...)` + `GEMMRuntimeQuantization`, SURVEY.md §2.3;
docs/attic/QuantizedMetalSIMDImplementation.md): quantization runs on-device
inside jit (XLA fuses the reductions and rounding into a few VPU passes), and
the quantized attention kernels dequantize inside the matmul with FP32/INT32
accumulation.

Granularities (reference: metal_sdpa_backend.h:15-20):
  * TENSOR — one scale per (batch, head) slice;
  * ROW    — one scale per token row (per (b, h, s)) — exact rescaling for
             QK^T (INT-FlashAttention-style);
  * BLOCK  — one scale per block of sequence rows (SageAttention-style
             per-tile scales, aligned with the kernel's KV tiles).
    NOTE: this is a deliberate TPU-first redesign of the reference's
    blockwise-along-head-dim (`blockSizeK`) granularity: sub-row blocks would
    split the MXU contraction into multiple int8 matmuls, while per-seq-tile
    scales keep one systolic pass per tile.

Strategies (reference: MFABridge.swift:1791-1810):
  * SYMMETRIC  — zero_point = 0, scale = absmax / qmax;
  * ASYMMETRIC — zero_point ≠ 0; the kernels correct with precomputed row
    sums (the reference's `precomputedSums` machinery, SURVEY.md §2.3).

INT4 packing: two nibbles per int8 byte using a split-halves layout along the
last dim — byte j holds element j (low nibble) and element j + D/2 (high
nibble), so unpack = concat(low, high) restores exact element order with no
permutation (unlike the reference, which packs on CPU: SURVEY.md §7.3).
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Optional

import jax
import jax.numpy as jnp

from umfa_tpu.engine.config import Precision, QuantMode, QuantStrategy

_hybrid_trace_warned = False


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedTensor:
    """Quantized array + scale metadata (reference: QuantizedTensor,
    MFABridge.swift:747-776).

    values: int8 array; for INT4, packed (last dim halved, split-halves).
    scales: FP32, broadcastable against the unquantized shape.
    zero_points: int32 like scales, or None (symmetric).
    row_sums: int32 per-row sums of quantized values (for asymmetric
      zero-point correction inside matmuls), or None.
    """

    values: jax.Array
    scales: jax.Array
    zero_points: Optional[jax.Array]
    row_sums: Optional[jax.Array]
    precision: Precision
    mode: QuantMode
    strategy: QuantStrategy
    block_size: int
    orig_shape: tuple
    orig_dtype: jnp.dtype

    def tree_flatten(self):
        children = (self.values, self.scales, self.zero_points, self.row_sums)
        aux = (
            self.precision,
            self.mode,
            self.strategy,
            self.block_size,
            self.orig_shape,
            self.orig_dtype,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def compression_ratio(self) -> float:
        orig_bytes = 1
        for dim in self.orig_shape:
            orig_bytes *= dim
        orig_bytes *= jnp.dtype(self.orig_dtype).itemsize
        q_bytes = self.values.size * self.values.dtype.itemsize
        q_bytes += self.scales.size * 4
        if self.zero_points is not None:
            q_bytes += self.zero_points.size * 4
        return orig_bytes / q_bytes


def _qmax(precision: Precision) -> int:
    return 127 if precision == Precision.INT8 else 7


def _group_reduce(x, mode: QuantMode, block_size: int, reduce_fn):
    """Reduce over the quantization group. x: (..., S, D) FP32.

    Returns stats broadcastable to x."""
    if mode == QuantMode.TENSOR:
        # Per (batch, head) slice: reduce over last two dims.
        return reduce_fn(x, axis=(-1, -2), keepdims=True)
    if mode == QuantMode.ROW:
        return reduce_fn(x, axis=-1, keepdims=True)
    if mode == QuantMode.BLOCK:
        *lead, s, d = x.shape
        nb = -(-s // block_size)
        pad = nb * block_size - s
        if pad:
            # Pad with edge values so padding never dominates the stats.
            x = jnp.concatenate([x, jnp.repeat(x[..., -1:, :], pad, axis=-2)], axis=-2)
        xb = x.reshape(*lead, nb, block_size, d)
        stat = reduce_fn(xb, axis=(-1, -2), keepdims=True)  # (..., nb, 1, 1)
        stat = jnp.broadcast_to(stat, (*lead, nb, block_size, d))
        stat = stat.reshape(*lead, nb * block_size, d)[..., :s, :]
        return stat[..., 0:1]  # (..., S, 1) per-row view of per-block stat
    raise ValueError(f"unsupported mode {mode}")


def choose_mode(x: jax.Array, block_size: int = 64) -> QuantMode:
    """HYBRID auto-selection (reference: hybrid granularity auto-selection,
    metal_sdpa_backend.h:731-796): pick finer granularity when per-row dynamic
    range varies strongly."""
    absmax_rows = jnp.max(jnp.abs(x), axis=-1)
    ratio = jnp.max(absmax_rows) / jnp.maximum(jnp.mean(absmax_rows), 1e-12)
    # Static heuristic requires concrete values; under trace (jit/grad) the
    # data is abstract, so HYBRID degrades to ROW. Warn once — in a jitted
    # training loop this means HYBRID is effectively ROW, which is usually
    # fine (ROW is the default) but should not be silent.
    if isinstance(ratio, jax.core.Tracer):
        global _hybrid_trace_warned
        if not _hybrid_trace_warned:
            _hybrid_trace_warned = True
            warnings.warn(
                "HYBRID quantization granularity cannot inspect data under "
                "jit/grad tracing; falling back to ROW scales. Pass an "
                "explicit mode= (ROW/BLOCK/TENSOR) to silence this.",
                stacklevel=2,
            )
        return QuantMode.ROW
    r = float(ratio)
    if r < 2.0:
        return QuantMode.TENSOR
    if r < 16.0:
        return QuantMode.ROW
    # High per-row dynamic-range variance: per-block (sequence-tile) scales
    # localize outlier rows (reference selects blockwise for high-variance
    # tensors, metal_sdpa_backend.h:731-796).
    return QuantMode.BLOCK


def pack_int4(x_i8: jax.Array) -> jax.Array:
    """Pack int8 values in [-8, 7] into nibbles, split-halves layout."""
    d = x_i8.shape[-1]
    assert d % 2 == 0, "INT4 packing requires even last dim"
    low = x_i8[..., : d // 2]
    high = x_i8[..., d // 2 :]
    return ((low & 0xF) | ((high & 0xF) << 4)).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4. Uses int32 arithmetic only — Mosaic (Pallas TPU)
    cannot legalize sub-32-bit vector shifts, and this form lowers cleanly
    both inside kernels and in plain XLA."""
    p = packed.astype(jnp.int32)
    low = ((p & 0xF) ^ 8) - 8
    high = jnp.right_shift(p, 4)
    return jnp.concatenate([low, high], axis=-1).astype(jnp.int8)


def quantize(
    x: jax.Array,
    precision: Precision = Precision.INT8,
    mode: QuantMode = QuantMode.ROW,
    strategy: QuantStrategy = QuantStrategy.SYMMETRIC,
    block_size: int = 64,
) -> QuantizedTensor:
    """Quantize x (..., S, D) at runtime on-device."""
    if mode == QuantMode.HYBRID:
        mode = choose_mode(x, block_size)
    orig_shape, orig_dtype = x.shape, x.dtype
    xf = x.astype(jnp.float32)
    qmax = _qmax(precision)

    if strategy == QuantStrategy.SYMMETRIC:
        absmax = _group_reduce(jnp.abs(xf), mode, block_size, jnp.max)
        scale = jnp.maximum(absmax, 1e-12) / qmax
        q = jnp.clip(jnp.round(xf / scale), -qmax - 1, qmax).astype(jnp.int8)
        zp = None
    else:
        hi = _group_reduce(xf, mode, block_size, jnp.max)
        lo = _group_reduce(xf, mode, block_size, jnp.min)
        scale = jnp.maximum(hi - lo, 1e-12) / (2 * qmax + 1)
        # zp is kept int32 and applied after the integer matmul, so it is NOT
        # clipped to the int8 range (distributions not straddling 0 need
        # |zp| > 127).
        zp = jnp.round(-lo / scale).astype(jnp.int32) - (qmax + 1)
        q = jnp.clip(
            jnp.round(xf / scale) + zp.astype(jnp.float32), -qmax - 1, qmax
        ).astype(jnp.int8)

    row_sums = None
    if strategy == QuantStrategy.ASYMMETRIC:
        row_sums = jnp.sum(q.astype(jnp.int32), axis=-1, keepdims=True)

    if precision == Precision.INT4:
        q = pack_int4(q)

    return QuantizedTensor(
        values=q,
        scales=scale.astype(jnp.float32),
        zero_points=zp,
        row_sums=row_sums,
        precision=precision,
        mode=mode,
        strategy=strategy,
        block_size=block_size,
        orig_shape=orig_shape,
        orig_dtype=orig_dtype,
    )


def dequantize(qt: QuantizedTensor, dtype=None) -> jax.Array:
    """Exact dequantization (used for fake-quant STE and tests)."""
    vals = qt.values
    if qt.precision == Precision.INT4:
        vals = unpack_int4(vals)
    vf = vals.astype(jnp.float32)
    if qt.zero_points is not None:
        vf = vf - qt.zero_points.astype(jnp.float32)
    out = vf * qt.scales
    return out.astype(dtype or qt.orig_dtype)


def fake_quantize(
    x: jax.Array,
    precision: Precision = Precision.INT8,
    mode: QuantMode = QuantMode.ROW,
    strategy: QuantStrategy = QuantStrategy.SYMMETRIC,
    block_size: int = 64,
) -> jax.Array:
    """quantize → dequantize round trip in x's dtype (STE forward value)."""
    return dequantize(quantize(x, precision, mode, strategy, block_size), x.dtype)
