"""Fused runtime quantizer (Pallas / TPU).

The reference runs quantization on-GPU inside one fused kernel
(`GEMMRuntimeQuantization`: per-block reductions, centering, quantize —
docs/attic/QuantizedMetalSIMDImplementation.md:13,64-80). Round-1 here used
plain jnp (`ops/quant.quantize`), which XLA compiles to several separate
HBM passes (mean / subtract / absmax / round-clip-cast) — measured as the
dominant overhead of the INT8 forward at D=64 (BENCH_r01: int8 2.59 ms vs
bf16 2.17 ms; the quantizer accounts for most of the gap).

This kernel does the whole ROW-wise symmetric pipeline in ONE pass per
operand: read a sequence tile, subtract the (precomputed) channel mean in
registers, per-row absmax over D (row-local — no cross-tile reduction),
quantize, optionally pack INT4 nibbles, and write int8 values + scales.
The smoothed FP32 operand never exists in HBM at all — strictly better than
round-1's materialized `x.astype(f32) - mean`.

Scales are written in a transposed (B, H, nblocks, block_s) layout so the
lane dimension is the sequence tile (>=128 lanes) instead of a broadcast
(see VERDICT r1 weak #5 for why (S, 128)-broadcast stats are expensive),
then cheaply reshaped host-side to the canonical (B, H, S, 1).
"""

from __future__ import annotations

from typing import Optional

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from umfa_tpu.engine.config import Precision, QuantMode, QuantStrategy
from umfa_tpu.ops.flash_fwd import _pad_seq, _round_up
from umfa_tpu.ops.quant import QuantizedTensor


def _quant_rows_kernel(*refs, qmax, int4, has_mean, has_hadamard, head_dim):
    refs = list(refs)
    x_ref = refs.pop(0)
    h_ref = refs.pop(0) if has_hadamard else None
    mean_ref = refs.pop(0) if has_mean else None
    vals_ref, scales_ref = refs
    x = x_ref[0, 0].astype(jnp.float32)  # (block_s, D)
    if h_ref is not None:
        # Hadamard rotation as one small MXU matmul (x @ H, H = D x D with
        # entries ±1/sqrt(D)) — the reference's ConvRot outlier smoothing
        # (AGENTS.md:140-149) fused into the quantizer at zero HBM cost.
        x = jax.lax.dot_general(
            x, h_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if mean_ref is not None:
        x = x - mean_ref[0, 0]  # (1, D) channel mean (rotated space), fp32
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)  # (block_s, 1)
    # Exact divisions (not reciprocal-multiplies): determinism contract — the
    # STE backward re-derives P from these exact values, and tests assert
    # bitwise parity with ops/quant.quantize.
    scale = jnp.maximum(absmax, 1e-12) / qmax
    q = jnp.clip(jnp.round(x / scale), -qmax - 1, qmax).astype(jnp.int32)
    if int4:
        # Split-halves nibble packing (quant.pack_int4 layout) in int32 math
        # (Mosaic cannot legalize sub-32-bit vector shifts).
        low = q[:, : head_dim // 2]
        high = q[:, head_dim // 2 :]
        packed = (low & 0xF) | ((high & 0xF) << 4)
        vals_ref[0, 0] = packed.astype(jnp.int8)
    else:
        vals_ref[0, 0] = q.astype(jnp.int8)
    # Transposed scale layout: the (block_s, 1) column folds row-major into
    # (block_s/128, 128) — sublane×lane tiled, Mosaic-legal (a (1, block_s)
    # row block would violate the (8, 128) divisibility rule).
    scales_ref[0, 0, 0] = scale.reshape(-1, 128)


def hadamard_matrix(n: int, dtype=jnp.float32) -> jax.Array:
    """Normalized Sylvester-Hadamard matrix (entries ±1/sqrt(n)); matches
    ops/hadamard.hadamard_rotate's transform."""
    import numpy as np

    assert n & (n - 1) == 0, f"{n} must be a power of two"
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return jnp.asarray(h * (n**-0.5), dtype)


def quantize_rows_fused(
    x: jax.Array,
    mean: Optional[jax.Array] = None,
    *,
    precision: Precision = Precision.INT8,
    block_s: int = 1024,
    hadamard: bool = False,
    interpret: bool = False,
) -> QuantizedTensor:
    """ROW-wise symmetric quantization in one fused pass.

    x: (B, H, S, D). mean: optional (B, H, 1, D) channel mean subtracted in
    registers before quantization (mean smoothing); when `hadamard` is set,
    the kernel rotates x in registers FIRST, so `mean` must be given in the
    rotated space (mean(Hx) = H mean(x)). Returns a QuantizedTensor whose
    `orig_shape`/`orig_dtype` describe x (pre-subtraction), matching
    `quantize(rotate(x) - mean, ...)` up to the removed double-rounding.
    """
    batch, heads, seq, head_dim = x.shape
    interpret = interpret or jax.default_backend() == "cpu"
    qmax = 127 if precision == Precision.INT8 else 7
    int4 = precision == Precision.INT4
    block_s = min(block_s, _round_up(seq, 128))
    x_pad = _pad_seq(x, block_s, 2)
    padded_s = x_pad.shape[2]
    nb = padded_s // block_s

    grid = (batch, heads, nb)
    in_specs = [
        pl.BlockSpec(
            (1, 1, block_s, head_dim), lambda b, h, i: (b, h, i, 0)
        )
    ]
    args = [x_pad]
    if hadamard:
        in_specs.append(
            pl.BlockSpec((head_dim, head_dim), lambda b, h, i: (0, 0))
        )
        args.append(hadamard_matrix(head_dim))
    has_mean = mean is not None
    if has_mean:
        in_specs.append(
            pl.BlockSpec((1, 1, 1, head_dim), lambda b, h, i: (b, h, 0, 0))
        )
        args.append(mean.astype(jnp.float32))

    vals, scales_t = pl.pallas_call(
        functools.partial(
            _quant_rows_kernel,
            qmax=qmax, int4=int4, has_mean=has_mean,
            has_hadamard=hadamard, head_dim=head_dim,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, 1, block_s, head_dim // (2 if int4 else 1)),
                lambda b, h, i: (b, h, i, 0),
            ),
            pl.BlockSpec(
                (1, 1, 1, block_s // 128, 128),
                lambda b, h, i: (b, h, i, 0, 0),
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, heads, padded_s, head_dim // (2 if int4 else 1)),
                jnp.int8,
            ),
            jax.ShapeDtypeStruct(
                (batch, heads, nb, block_s // 128, 128), jnp.float32
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(*args)

    vals = vals[:, :, :seq]
    scales = scales_t.reshape(batch, heads, padded_s)[:, :, :seq, None]
    return QuantizedTensor(
        values=vals,
        scales=scales,
        zero_points=None,
        row_sums=None,
        precision=precision,
        mode=QuantMode.ROW,
        strategy=QuantStrategy.SYMMETRIC,
        block_size=0,
        orig_shape=x.shape,
        orig_dtype=x.dtype,
    )
