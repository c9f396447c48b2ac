"""Pallas flash-decode kernel for the quantized KV cache.

Decode is KV-bandwidth-bound: the model-level int8-KV speedup through the
XLA gemv path measured 1.29× vs the dense cache (BENCH serving stage,
VERDICT r3 #4) against an ~1.47× byte-ratio ideal at that geometry — the
int8→bf16 widening of the cache and the per-row scale multiplies are at
XLA's mercy to fuse. This kernel pins the byte count: each (batch, kv-head)
cell streams the int8 K/V tiles through VMEM exactly once, dequantizes in
registers, and runs an online-softmax flash-decode over KV tiles:

  grid (B, Hkv, nS), S innermost ("arbitrary"): running (m, l, acc) in
  VMEM scratch; K's per-row scales fold into the score columns POST-dot
  (gTq·bk elements instead of bk·D), V's fold into P the same way — the
  classic decode trick, now guaranteed in-register.

GQA folds the query group into rows (q → (B, Hkv, g·Tq, D)) exactly like
serving/decode._gemv_decode — no cache repeat. Tq stays small (≤16), so
the whole q side is a handful of MXU rows; the kernel is a pure
bandwidth play.

Reference anchor: decode with quantized KV up to 1.3× claimed by the
reference (README.md:70); this path exists to beat it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from umfa_tpu.ops.flash_fwd import DEFAULT_MASK_VALUE, _LANES


def _decode_kernel(
    q_ref,       # (1, 1, gTq, D) bf16 — group-folded queries
    k_ref,       # (1, 1, bk, D) int8
    ks_ref,      # (1, 1, 1, 1, bk) f32 — lane-major scale strip
    v_ref,       # (1, 1, bk, D) int8
    vs_ref,      # (1, 1, 1, 1, bk) f32
    bias_ref,    # (1, 1, Tq, bk) f32 — length (+ causal) bias
    o_ref,       # (1, 1, gTq, D) f32
    m_scr,       # (gTq, 1) f32
    l_scr,       # (gTq, 1) f32
    acc_scr,     # (gTq, D) f32
    *,
    scale: float,
    group: int,
    tq: int,
    block_k: int,
    fp32: bool,
):
    si = pl.program_id(2)
    ns = pl.num_programs(2)

    @pl.when(si == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]                      # (gTq, D) q-dtype
    k8 = k_ref[0, 0]                     # (bk, D) int8
    ks = ks_ref[0, 0, 0]                 # (1, bk) f32
    v8 = v_ref[0, 0]
    vs = vs_ref[0, 0, 0]                 # (1, bk) f32

    # fp32 inputs keep fp32 operands + HIGHEST (repo invariant); bf16
    # serving runs 1-pass MXU.
    cdt = jnp.float32 if fp32 else jnp.bfloat16
    mxu = jax.lax.Precision.HIGHEST if fp32 else jax.lax.Precision.DEFAULT

    # Scores on the MXU from the RAW int8 K (widened in registers);
    # per-row K scales fold into the score columns post-dot — gTq·bk
    # multiplies instead of bk·D.
    s = jax.lax.dot_general(
        q, k8.astype(cdt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu,
    )
    col_scale = ks * scale                           # (1, bk)
    bias = bias_ref[0, 0]                            # (Tq, bk)
    if group > 1:
        # bias rows are per (t); tile over the g query groups. Row-major
        # (g, t) flatten matches the host-side q reshape.
        bias = jnp.concatenate([bias] * group, axis=0)
    s = s * col_scale + bias

    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    # V's per-row scales fold into P (classic decode trick).
    pv = jax.lax.dot_general(
        (p * vs).astype(cdt), v8.astype(cdt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu,
    )
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(si == ns - 1)
    def _finalize():
        l = l_scr[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = acc_scr[...] / l_safe


def quantized_flash_decode(
    q: jax.Array,          # (B, Hq, Tq, D)
    k_values: jax.Array,   # (B, Hkv, S, D) int8
    k_scales: jax.Array,   # (B, Hkv, S, 1) f32
    v_values: jax.Array,
    v_scales: jax.Array,
    bias: jax.Array,       # (B, 1, Tq, S) or (B, 1, 1, S) f32
    *,
    scale: Optional[float] = None,
    block_k: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Flash-decode over a quantized cache; returns (B, Hq, Tq, D) f32."""
    b, hq, tq, d = q.shape
    _, hkv, s_max, _ = k_values.shape
    group = hq // hkv
    if scale is None:
        scale = d**-0.5
    interpret = interpret or jax.default_backend() == "cpu"
    block_k = min(block_k, s_max)
    assert s_max % block_k == 0, (s_max, block_k)
    ns = s_max // block_k

    fp32 = q.dtype == jnp.float32
    qg = q.reshape(b, hkv, group * tq, d)
    if not fp32:
        qg = qg.astype(jnp.bfloat16)
    bias = jnp.broadcast_to(
        bias.astype(jnp.float32), (b, 1, tq, s_max)
    )
    # Scale strips reshaped lane-major (zero-copy: (B,Hkv,S,1) is
    # contiguous) so each block is one 128-lane-aligned f32 strip. The
    # length-1 axis before the strip keeps the last-two block dims Mosaic-
    # legal ((1 == array dim, bk) — a (1,1,1,bk) 4D block is rejected).
    ks_r = k_scales.astype(jnp.float32).reshape(b, hkv, ns, 1, block_k)
    vs_r = v_scales.astype(jnp.float32).reshape(b, hkv, ns, 1, block_k)

    grid = (b, hkv, ns)
    kernel = functools.partial(
        _decode_kernel, scale=scale, group=group, tq=tq, block_k=block_k,
        fp32=fp32,
    )
    gtq = group * tq
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, gtq, d), lambda bb, h, s: (bb, h, 0, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bb, h, s: (bb, h, s, 0)),
            pl.BlockSpec(
                (1, 1, 1, 1, block_k), lambda bb, h, s: (bb, h, s, 0, 0)
            ),
            pl.BlockSpec((1, 1, block_k, d), lambda bb, h, s: (bb, h, s, 0)),
            pl.BlockSpec(
                (1, 1, 1, 1, block_k), lambda bb, h, s: (bb, h, s, 0, 0)
            ),
            pl.BlockSpec((1, 1, tq, block_k), lambda bb, h, s: (bb, 0, 0, s)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, gtq, d), lambda bb, h, s: (bb, h, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, gtq, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((gtq, _LANES), jnp.float32),
            pltpu.VMEM((gtq, _LANES), jnp.float32),
            pltpu.VMEM((gtq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qg, k_values, ks_r, v_values, vs_r, bias)
    return out.reshape(b, hq, tq, d)
