"""Quantized GEMM ops (weight quantization for linear layers).

Parity with the reference's GEMM stack (SURVEY.md §2.3): `GEMMKernel` (MFA
GEMM codegen), `GEMMRuntimeQuantization` (fused blockwise symmetric
quantizer with mean-centering + bias restoration after the GEMM) and the
`load_quantized_int8/int4` dequantize-on-load trick. On TPU the dense GEMM
itself is XLA's — already speed-of-light on the MXU — so what this module
adds is the quantized-weight path:

  * W8A16 / W4A16: int8/int4 weights + per-output-channel scales; weights
    are cast (dequantize-on-load, the reference's trick) and the matmul runs
    bf16 — HBM traffic for weights drops 2-4×.
  * W8A8: activations quantized per row at runtime, int8×int8→int32 on the
    MXU, scale outer product applied after (2× MXU rate).
  * Mean-centering: w' = w − μ (per column) shrinks quantization range; the
    exact correction `rowsum(x) ⊗ μ` is added back after the GEMM — the
    reference's "centering + bias restored after GEMM"
    (docs/attic/QuantizedMetalSIMDImplementation.md:64-80).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from umfa_tpu.engine.config import Precision
from umfa_tpu.ops.quant import pack_int4, unpack_int4


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedWeight:
    """int8 (or packed int4) weight (K, N) + per-column FP32 scales (1, N)
    and optional centering means (1, N)."""

    values: jax.Array
    scales: jax.Array
    means: Optional[jax.Array]
    precision: Precision
    orig_dtype: jnp.dtype

    def tree_flatten(self):
        return (self.values, self.scales, self.means), (
            self.precision,
            self.orig_dtype,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def quantize_weight(
    w: jax.Array,
    precision: Precision = Precision.INT8,
    *,
    center: bool = False,
) -> QuantizedWeight:
    """Quantize a (K, N) weight per output channel (column)."""
    assert w.ndim == 2, w.shape
    orig_dtype = w.dtype
    wf = w.astype(jnp.float32)
    means = None
    if center:
        means = jnp.mean(wf, axis=0, keepdims=True)  # (1, N)
        wf = wf - means
    qmax = 127 if precision == Precision.INT8 else 7
    absmax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scales = jnp.maximum(absmax, 1e-12) / qmax
    q = jnp.clip(jnp.round(wf / scales), -qmax - 1, qmax).astype(jnp.int8)
    if precision == Precision.INT4:
        # Pack along K (rows): split-halves on the contraction dim keeps the
        # matmul exact after unpack (order restored).
        q = pack_int4(q.T).T
    return QuantizedWeight(
        values=q, scales=scales.astype(jnp.float32), means=means,
        precision=precision, orig_dtype=orig_dtype,
    )


def dequantize_weight(qw: QuantizedWeight, dtype=None) -> jax.Array:
    vals = qw.values
    if qw.precision == Precision.INT4:
        vals = unpack_int4(vals.T).T
    w = vals.astype(jnp.float32) * qw.scales
    if qw.means is not None:
        w = w + qw.means
    return w.astype(dtype or qw.orig_dtype)


def quantized_matmul(
    x: jax.Array,
    qw: QuantizedWeight,
    *,
    activation_precision: Optional[Precision] = None,
) -> jax.Array:
    """x (..., K) @ quantized weight (K, N) → (..., N).

    activation_precision=None → W8A16/W4A16 (dequantize-on-load, bf16
    matmul). Precision.INT8 → W8A8 (runtime row-wise activation
    quantization, integer matmul, post-scales).
    """
    orig_dtype = x.dtype
    vals = qw.values
    if qw.precision == Precision.INT4:
        vals = unpack_int4(vals.T).T

    if activation_precision is None or not activation_precision.is_integer:
        w = vals.astype(jnp.bfloat16)
        out = jnp.einsum(
            "...k,kn->...n", x.astype(jnp.bfloat16), w,
            preferred_element_type=jnp.float32,
        )
        out = out * qw.scales
    else:
        xf = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        x_scale = jnp.maximum(absmax, 1e-12) / 127.0
        x_q = jnp.clip(jnp.round(xf / x_scale), -128, 127).astype(jnp.int8)
        acc = jnp.einsum(
            "...k,kn->...n", x_q, vals, preferred_element_type=jnp.int32
        )
        out = acc.astype(jnp.float32) * (x_scale * qw.scales)

    if qw.means is not None:
        # Centering restoration: x @ (w' + μ) = x @ w' + rowsum(x) ⊗ μ.
        row_sums = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True)
        out = out + row_sums * qw.means
    return out.astype(orig_dtype)
