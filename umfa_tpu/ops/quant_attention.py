"""Quantized fused flash attention (INT8 / INT4) with STE backward.

TPU-native redesign of the reference's quantized path (SURVEY.md §3.4:
mfa_quantized_forward_with_lse / mfa_quantized_backward,
MFABridge+Quantized.swift) with two deliberate departures:

  1. The reference dispatches per (batch, head) in a serialized host loop with
     a wait after each dispatch (its known weakness, SURVEY.md §3.4). Here the
     whole (B, H, Sq-blocks, KV-blocks) space is one Pallas grid — a single
     device launch.
  2. The reference dequantizes INT8/INT4 into FP32 register tiles *before*
     the multiply (`load_quantized_int8/4`, SURVEY.md §2.3), because Apple
     GPUs have no integer matmul units. The MXU does have them: QK^T runs as
     an int8×int8 → int32 systolic pass at 2× BF16 rate, and scales /
     zero-point corrections are applied *after* the matmul
     (INT-FlashAttention / SageAttention2 style, SURVEY.md §7.3). The
     reference's `precomputedSums` blockwise compensation maps to the
     row-sum correction terms below.

P·V: V is dequantized on load (cast + fold the per-row V scale into P, which
is a lane-broadcast multiply), PV runs in BF16 with FP32 accumulation —
matching the reference's FP16-memory/FP32-accumulate invariant.

Backward = straight-through estimator: gradients are computed by the dense
FP32 backward kernels on the *deterministically re-dequantized* operands with
the quantized forward's LSE — fake-quant forward, full-precision grads
(reference: AGENTS.md:108-111, MFABridge+Quantized.swift:425-440). Residuals
are stored quantized (int8 + scales), which is where the reference's 25-40%
training memory saving comes from (README.md:100).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from umfa_tpu.engine.config import (
    Precision,
    QuantMode,
    QuantStrategy,
    QuantizationConfig,
)
from umfa_tpu.ops.flash_fwd import (
    DEFAULT_MASK_VALUE,
    _LANES,
    BlockSizes,
    _block_visible,
    _intra_block_mask,
    _pad_seq,
)
from umfa_tpu.ops.flash_bwd import flash_attention_backward
from umfa_tpu.ops.quant import QuantizedTensor, dequantize, quantize


def _unpack_int4_lanes(packed):
    """In-kernel INT4 unpack (split-halves layout, see quant.pack_int4).

    Mosaic cannot legalize sub-32-bit vector shifts (arith.shli on i8), so
    the nibble extraction runs in int32: low nibble via mask + sign-fix
    ((m ^ 8) - 8), high nibble via arithmetic right shift of the
    sign-extended byte (flooring division matches two's complement)."""
    p = packed.astype(jnp.int32)
    low = ((p & 0xF) ^ 8) - 8
    high = jnp.right_shift(p, 4)
    return jnp.concatenate([low, high], axis=-1).astype(jnp.int8)


def _quant_fwd_kernel(
    *refs,
    scale: float,
    causal: bool,
    window,
    block_q: int,
    block_k: int,
    seq_q: int,
    seq_k: int,
    num_k_blocks: int,
    head_dim: int,
    q_int4: bool,
    k_int4: bool,
    v_int4: bool,
    asym: bool,
    has_corr: bool,
    has_bias: bool,
    has_map: bool,
    has_fetch: bool,
    pv_int8: bool,
    out_dtype,
):
    refs = list(refs)
    fetch_ref = refs.pop(0) if has_fetch else None
    idx = 0

    def nxt():
        nonlocal idx
        r = refs[idx]
        idx += 1
        return r

    q_ref, k_ref, v_ref = nxt(), nxt(), nxt()
    qs_ref, ks_ref, vs_ref = nxt(), nxt(), nxt()
    if asym:
        qzp_ref, qrs_ref, kzp_ref, krs_ref, vzp_ref = (
            nxt(), nxt(), nxt(), nxt(), nxt(),
        )
    corr_ref = nxt() if has_corr else None
    bias_ref = nxt() if has_bias else None
    map_ref = nxt() if has_map else None
    o_ref, lse_ref = nxt(), nxt()
    m_scr, l_scr, acc_scr = nxt(), nxt(), nxt()

    qi = pl.program_id(2)
    ki = pl.program_id(3)  # compacted step index when has_fetch
    q_start = qi * block_q
    if fetch_ref is not None:
        # Compacted KV walk (see flash_fwd._fwd_kernel): the prefetched table
        # holds the step's actual tile id; negative = padding (encoded as
        # -(last_visible+1) so the index map aliases the previous tile and
        # its DMA is elided).
        fid_raw = fetch_ref[
            pl.program_id(0) if fetch_ref.shape[0] > 1 else 0,
            pl.program_id(1) if fetch_ref.shape[1] > 1 else 0,
            qi, ki,
        ]
        fid = jnp.where(fid_raw >= 0, fid_raw, -fid_raw - 1)
        k_start = fid * block_k
    else:
        k_start = ki * block_k

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    visible, partial = _block_visible(
        q_start, k_start,
        block_q=block_q, block_k=block_k,
        causal=causal, window=window, seq_q=seq_q, seq_k=seq_k,
    )
    if fetch_ref is not None:
        visible = jnp.logical_and(visible, fid_raw >= 0)
    elif map_ref is not None:
        # Compiled block-sparse structure: 0 = skip tile entirely.
        typ = map_ref[
            pl.program_id(0) if map_ref.shape[0] > 1 else 0,
            pl.program_id(1) if map_ref.shape[1] > 1 else 0,
            qi, ki,
        ]
        visible = jnp.logical_and(visible, typ > 0)

    def _do_update(apply_mask: bool):
        qv = q_ref[0, 0]
        kv = k_ref[0, 0]
        if q_int4:
            qv = _unpack_int4_lanes(qv)
        if k_int4:
            kv = _unpack_int4_lanes(kv)

        # INT8 × INT8 → INT32 on the MXU.
        s_i32 = jax.lax.dot_general(
            qv, kv,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = s_i32.astype(jnp.float32)

        sq = qs_ref[0, 0]          # (block_q, 1) or (1, 1)
        sk_row = ks_ref[0, 0]      # (1, block_k) or (1, 1)
        if asym:
            qzp = qzp_ref[0, 0].astype(jnp.float32)   # (block_q, 1)|(1,1)
            qrs = qrs_ref[0, 0].astype(jnp.float32)
            kzp = kzp_ref[0, 0].astype(jnp.float32)   # (1, block_k)|(1,1)
            krs = krs_ref[0, 0].astype(jnp.float32)
            # Σ(qq - zq)(qk - zk) = dot - zq·rowsum(k) - zk·rowsum(q) + D·zq·zk
            s = s - qzp * krs - kzp * qrs + head_dim * qzp * kzp
        # The softmax scale is pre-folded into sq (and corr) host-side, and
        # the per-row/per-col scales apply as two broadcast multiplies — no
        # (block_q, block_k) scale outer product is materialized.
        s = (s * sq) * sk_row
        if corr_ref is not None:
            # Q-mean smoothing compensation: + qm·K'^T · scale
            # (SageAttention2-style, exact — see _quantize_operands).
            s = s + corr_ref[0, 0]

        if bias_ref is not None:
            s = s + bias_ref[0, 0].astype(jnp.float32)

        if apply_mask:
            mask = _intra_block_mask(
                q_start, k_start,
                block_q=block_q, block_k=block_k,
                causal=causal, window=window, seq_k=seq_k,
            )
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[:, 0:1]
        l_prev = l_scr[:, 0:1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        if apply_mask:
            p = jnp.where(mask, p, 0.0)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

        vv = v_ref[0, 0]
        if v_int4:
            vv = _unpack_int4_lanes(vv)
        sv = vs_ref[0, 0]  # sym: (block_k, 1)|(1, 1); asym: (1, block_k)|(1,1)
        if pv_int8:
            # Fully-integer P·V: P ∈ [0,1] (online softmax) quantizes with
            # the fixed scale 1/127; V's scale is constant over this tile
            # (re-quantized per kernel tile) so it factors out of the dot.
            p_i8 = jnp.round(p * 127.0).astype(jnp.int8)
            pv_i32 = jax.lax.dot_general(
                p_i8, vv,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            sv_scalar = sv[0:1, 0:1]  # tile-constant by construction
            pv = pv_i32.astype(jnp.float32) * (sv_scalar * (1.0 / 127.0))
        elif asym:
            # P·V with the per-row V scale folded into P (lane broadcast) —
            # the zero-point correction needs the row-vector form.
            p_scaled = p * sv
            pv = jax.lax.dot_general(
                p_scaled.astype(jnp.bfloat16),
                vv.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            vzp = vzp_ref[0, 0].astype(jnp.float32)  # (1, block_k)|(1,1)
            corr = jnp.sum(p_scaled * vzp, axis=-1, keepdims=True)
            pv = pv - corr
        else:
            # Dequantize-on-load: fold the per-row V scale onto the V TILE
            # (block_k x D ops) instead of onto P (block_q x block_k ops) —
            # 8x fewer VPU ops at block_q=512/D=64. The kernel is VPU-bound
            # at D=64, so every per-score-element op counts.
            v_f = vv.astype(jnp.bfloat16) * sv.astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16),
                v_f,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_scr[...] = acc_scr[...] * alpha + pv

    masked = causal or window is not None or bool(seq_k % block_k)
    if masked:
        # Interior tiles skip the VPU mask work (see flash_fwd._fwd_kernel).
        @pl.when(jnp.logical_and(visible, partial))
        def _compute_masked():
            _do_update(True)

        @pl.when(jnp.logical_and(visible, jnp.logical_not(partial)))
        def _compute_full():
            _do_update(False)
    else:
        @pl.when(visible)
        def _compute():
            _do_update(False)

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        m = m_scr[:, 0:1]
        l = l_scr[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(out_dtype)
        lse = jnp.where(l == 0.0, DEFAULT_MASK_VALUE, m + jnp.log(l_safe))
        # Column LSE layout (see flash_fwd finalize).
        lse_ref[0, 0] = lse


def _col_stat(x, batch, heads, seq):
    """Normalize a q-side per-row stat to (B, H, Sm, 1), Sm ∈ {1, seq}."""
    assert x.shape[0] == batch and x.shape[1] == heads
    return x


def _row_stat(x):
    """Transpose a kv-side per-row stat (B, H, S, 1) → (B, H, 1, S)."""
    return jnp.swapaxes(x, -1, -2)


def quantized_attention_forward(
    qt_q: QuantizedTensor,
    qt_k: QuantizedTensor,
    qt_v: QuantizedTensor,
    bias: Optional[jax.Array] = None,
    score_corr: Optional[jax.Array] = None,
    block_map: Optional[jax.Array] = None,
    fetch_ids: Optional[jax.Array] = None,
    *,
    causal: bool = False,
    window: Optional[tuple] = None,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    out_dtype=jnp.float32,
    interpret: bool = False,
    pv_int8: bool = False,
):
    """Run the quantized fused kernel on pre-quantized operands.

    Returns (out, lse). Analogue of QuantizedAttention.forward with
    externalLogsumexp (MFABridge+Quantized.swift:273-356); the reference's
    quantized forward is mask-aware too (MFABridge+Quantized.swift:322-353).
    `block_map`/`fetch_ids` are a compiled BlockMask's per-tile structure
    (ops/block_mask.py): SKIP tiles cost neither compute nor DMA, and with
    `fetch_ids` the KV walk is compacted to the max visible-tile count.
    """
    batch, num_heads, seq_q, _ = qt_q.orig_shape
    _, num_kv_heads, seq_k, head_dim = qt_k.orig_shape
    group = num_heads // num_kv_heads
    if scale is None:
        scale = head_dim**-0.5
    interpret = interpret or jax.default_backend() == "cpu"
    # Mosaic has no f16 type: FP16 output is storage-only (cast outside).
    fp16_out = jnp.dtype(out_dtype) == jnp.float16
    if fp16_out:
        out_dtype = jnp.float32

    asym = qt_q.strategy == QuantStrategy.ASYMMETRIC
    for t in (qt_q, qt_k, qt_v):
        assert (t.strategy == QuantStrategy.ASYMMETRIC) == asym, (
            "mixed quantization strategies not supported"
        )

    from umfa_tpu.ops.flash_fwd import _choose_block

    block_q = _choose_block(
        block_sizes.block_q
        if block_map is not None
        else block_sizes.fwd_q_request(causal or window is not None),
        seq_q, head_dim,
    )
    block_k = _choose_block(block_sizes.block_k, seq_k, head_dim)

    q_vals = _pad_seq(qt_q.values, block_q, 2)
    k_vals = _pad_seq(qt_k.values, block_k, 2)
    v_vals = _pad_seq(qt_v.values, block_k, 2)
    padded_sq = q_vals.shape[2]
    padded_sk = k_vals.shape[2]
    num_q_blocks = padded_sq // block_q
    num_k_blocks = padded_sk // block_k

    def pad_stat(x, block, axis):
        return _pad_seq(x, block, axis) if x.shape[axis] > 1 else x

    # Softmax scale folded into the Q scales (one fewer full-tile multiply
    # in-kernel; the asymmetric zero-point corrections happen pre-scaling so
    # they are unaffected).
    q_scales = pad_stat(qt_q.scales * scale, block_q, 2)     # (B,H,Sq|1,1)
    k_scales = pad_stat(_row_stat(qt_k.scales), block_k, 3)  # (B,H,1,Sk|1)
    # Symmetric V scales stay in column form (B,H,Sk|1,1): the kernel folds
    # them onto the V tile. Asym keeps the row form (zero-point correction).
    if asym:
        v_scales = pad_stat(_row_stat(qt_v.scales), block_k, 3)
    else:
        v_scales = pad_stat(qt_v.scales, block_k, 2)

    has_fetch = block_map is not None and fetch_ids is not None
    has_map = block_map is not None and not has_fetch
    if block_map is not None:
        assert block_map.shape[2] == num_q_blocks and (
            block_map.shape[3] == num_k_blocks
        ), (
            f"block_map tiled {block_map.shape[2:]} but kernel uses "
            f"({num_q_blocks}, {num_k_blocks}) — build the BlockMask with "
            "the same block sizes"
        )
    if has_fetch:
        assert fetch_ids.shape[2] == num_q_blocks, (
            fetch_ids.shape, num_q_blocks
        )
    # Compacted KV walk: the inner grid dimension shrinks to the mask's max
    # visible tile count (see flash_fwd).
    num_steps = fetch_ids.shape[3] if has_fetch else num_k_blocks
    grid = (batch, num_heads, num_q_blocks, num_steps)

    def _ki_eff(b, h, qi, ki, refs):
        """Effective KV tile for this grid step: decoded from the prefetched
        compacted table when available (padding steps alias the previous
        tile → DMA elided)."""
        if not has_fetch:
            return ki
        fref = refs[0]
        kk = fref[
            b if fref.shape[0] > 1 else 0,
            h if fref.shape[1] > 1 else 0,
            qi, ki,
        ]
        return jnp.where(kk >= 0, kk, -kk - 1)

    dq_pack = 2 if qt_q.precision == Precision.INT4 else 1
    dk_pack = 2 if qt_k.precision == Precision.INT4 else 1
    dv_pack = 2 if qt_v.precision == Precision.INT4 else 1

    q_spec = pl.BlockSpec(
        (1, 1, block_q, head_dim // dq_pack),
        lambda b, h, i, j, *refs: (b, h, i, 0),
    )
    k_spec = pl.BlockSpec(
        (1, 1, block_k, head_dim // dk_pack),
        lambda b, h, i, j, *refs: (b, h // group, _ki_eff(b, h, i, j, refs), 0),
    )
    v_spec = pl.BlockSpec(
        (1, 1, block_k, head_dim // dv_pack),
        lambda b, h, i, j, *refs: (b, h // group, _ki_eff(b, h, i, j, refs), 0),
    )

    def col_spec(stat):
        per_row = stat.shape[2] > 1
        return pl.BlockSpec(
            (1, 1, block_q if per_row else 1, 1),
            lambda b, h, i, j, *refs, pr=per_row: (b, h, i if pr else 0, 0),
        )

    def row_spec(stat):
        per_row = stat.shape[3] > 1
        return pl.BlockSpec(
            (1, 1, 1, block_k if per_row else 1),
            lambda b, h, i, j, *refs, pr=per_row: (
                b, h // group, 0, _ki_eff(b, h, i, j, refs) if pr else 0
            ),
        )

    def kv_col_spec(stat):
        per_row = stat.shape[2] > 1
        return pl.BlockSpec(
            (1, 1, block_k if per_row else 1, 1),
            lambda b, h, i, j, *refs, pr=per_row: (
                b, h // group, _ki_eff(b, h, i, j, refs) if pr else 0, 0
            ),
        )

    v_scale_spec = row_spec(v_scales) if asym else kv_col_spec(v_scales)
    in_specs = [q_spec, k_spec, v_spec,
                col_spec(q_scales), row_spec(k_scales), v_scale_spec]
    args = [q_vals, k_vals, v_vals, q_scales, k_scales, v_scales]

    if asym:
        q_zp = pad_stat(qt_q.zero_points, block_q, 2)
        q_rs = pad_stat(qt_q.row_sums, block_q, 2)
        k_zp = pad_stat(_row_stat(qt_k.zero_points), block_k, 3)
        k_rs = pad_stat(_row_stat(qt_k.row_sums), block_k, 3)
        v_zp = pad_stat(_row_stat(qt_v.zero_points), block_k, 3)
        in_specs += [col_spec(q_zp), col_spec(q_rs),
                     row_spec(k_zp), row_spec(k_rs), row_spec(v_zp)]
        args += [q_zp, q_rs, k_zp, k_rs, v_zp]

    has_corr = score_corr is not None
    if has_corr:
        # (B, Hq, 1, Sk) — q-side heads, so index by h (not h // group).
        # Pre-scaled: the kernel adds it after the (scale-folded) q/k scales.
        corr = _pad_seq((score_corr * scale).astype(jnp.float32), block_k, 3)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1, block_k),
                lambda b, h, i, j, *refs: (b, h, 0, _ki_eff(b, h, i, j, refs)),
            )
        )
        args.append(corr)

    has_bias = bias is not None
    if has_bias:
        while bias.ndim < 4:
            bias = bias[None]
        bb, bh = bias.shape[0], bias.shape[1]
        bq_bcast = bias.shape[2] == 1  # decide BEFORE padding grows the dim
        bias = _pad_seq(bias, block_k, 3)
        if not bq_bcast:
            bias = _pad_seq(bias, block_q, 2)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1 if bq_bcast else block_q, block_k),
                lambda b, h, i, j, *refs, bb=bb, bh=bh, bq=bq_bcast: (
                    b if bb > 1 else 0,
                    h if bh > 1 else 0,
                    0 if bq else i,
                    _ki_eff(b, h, i, j, refs),
                ),
            )
        )
        args.append(bias)

    if has_map:
        in_specs.append(
            pl.BlockSpec(
                block_map.shape,
                lambda b, h, i, j, *refs: (0, 0, 0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        args.append(block_map)

    kernel = functools.partial(
        _quant_fwd_kernel,
        scale=scale, causal=causal, window=window,
        block_q=block_q, block_k=block_k,
        seq_q=seq_q, seq_k=seq_k,
        num_k_blocks=num_steps,  # finalize at the last (compacted) step
        head_dim=head_dim,
        q_int4=dq_pack == 2, k_int4=dk_pack == 2, v_int4=dv_pack == 2,
        asym=asym, has_corr=has_corr, has_bias=has_bias,
        has_map=has_map, has_fetch=has_fetch,
        pv_int8=pv_int8,
        out_dtype=jnp.dtype(out_dtype),
    )
    out_specs = [
        pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, i, j, *refs: (b, h, i, 0)
        ),
        pl.BlockSpec(
            (1, 1, block_q, 1),
            lambda b, h, i, j, *refs: (b, h, i, 0),
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(
            (batch, num_heads, padded_sq, head_dim), jnp.dtype(out_dtype)
        ),
        jax.ShapeDtypeStruct(
            (batch, num_heads, padded_sq, 1), jnp.float32
        ),
    ]
    scratch_shapes = [
        pltpu.VMEM((block_q, _LANES), jnp.float32),
        pltpu.VMEM((block_q, _LANES), jnp.float32),
        pltpu.VMEM((block_q, head_dim), jnp.float32),
    ]
    common = dict(
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * num_heads * seq_q * seq_k * head_dim,
            bytes_accessed=q_vals.size + k_vals.size + v_vals.size
            + batch * num_heads * seq_q * head_dim * 4,
            transcendentals=batch * num_heads * seq_q * seq_k,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # Tuned 2048-row q-tiles + double-buffered operand/stat streams
            # exceed the default 16 MiB scoped-vmem budget at some shapes.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    if has_fetch:
        out, lse = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            **common,
        )(fetch_ids, *args)
    else:
        out, lse = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
            **common,
        )(*args)

    out = out[:, :, :seq_q]
    if fp16_out:
        out = out.astype(jnp.float16)
    return out, lse[:, :, :seq_q, 0]


@dataclasses.dataclass(frozen=True)
class _QAttnKey:
    config: QuantizationConfig
    causal: bool
    window: Optional[tuple]
    scale: Optional[float]
    block_sizes: BlockSizes
    out_dtype: Optional[str]
    interpret: bool
    bias_grad: bool = False


def _corr_from_quantized(qm, qt_k):
    """Q-mean score correction computed from the quantized K:
    corr_j = qm · deq(k')_j = sk_j (qm · k_i8_j). Exact w.r.t. the STE
    contract (the kernel's k̃ IS deq(k')) and needs no dequantized K in HBM —
    one integer-weight GEMV."""
    from umfa_tpu.ops.quant import unpack_int4

    k_i8 = qt_k.values
    if qt_k.precision == Precision.INT4:
        k_i8 = unpack_int4(k_i8)
    b, hq, _, d = qm.shape
    hkv = qt_k.orig_shape[1]
    grp = hq // hkv
    cint = jnp.einsum(
        "bhgd,bhkd->bhgk",
        qm.reshape(b, hkv, grp, d).astype(jnp.float32),
        k_i8.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return (cint * jnp.swapaxes(qt_k.scales, -1, -2)).reshape(
        b, hq, 1, qt_k.orig_shape[2]
    )


def _quantize_operands(
    q, k, v, config: QuantizationConfig, v_tile_k=None, interpret=False
):
    """Runtime quantization with exact mean-smoothing compensation.

    Smoothing (SageAttention2-style, PAPERS.md; config.smooth):
      * K channel-mean: k' = k − mean_seq(k). Subtracting a per-(b,h) vector
        from every K row shifts each score row by a constant (q_i·km over all
        j) — softmax-invariant, NO compensation needed. The shrunk dynamic
        range is pure accuracy win.
      * Q mean: q' = q − mean_seq(q). Score change −qm·k'_j varies over j, so
        the kernel adds back the correction row corr_j = qm·k'_j (FP32 GEMV).
      * V channel-mean: v' = v − mean_seq(v). Since softmax rows sum to 1,
        out = P·v' + vm exactly; vm is added back after the kernel.

    Returns (qt_q, qt_k, qt_v, qm, vm, corr); qm/vm/corr are None when
    smoothing is off.
    """
    from umfa_tpu.ops.hadamard import hadamard_rotate

    # Fast path: the default ROW-symmetric config quantizes in ONE fused
    # Pallas pass per operand (ops/quant_fused.py) — Hadamard rotation AND
    # mean subtraction happen in registers, so neither the rotated nor the
    # smoothed operand ever exists in HBM, and the Q-mean correction is
    # computed from the quantized K (exact w.r.t. STE).
    use_fused = (
        config.strategy == QuantStrategy.SYMMETRIC
        and config.mode == QuantMode.ROW
    )

    if config.hadamard and not use_fused:
        # FWHT is orthogonal: QK^T is invariant under rotating both Q and K,
        # so only the quantization error changes (reference: ConvRot,
        # AGENTS.md:140-149). V is NOT rotated (PV is not an inner product
        # over D).
        q = hadamard_rotate(q)
        k = hadamard_rotate(k)

    qm = vm = corr = None
    orig_dtypes = (q.dtype, k.dtype, v.dtype)
    f32 = jnp.float32
    km = None
    smooth_q = config.effective_smooth_q()
    if config.smooth:
        if smooth_q:
            qm = jnp.mean(q.astype(f32), axis=2, keepdims=True)  # (B,Hq,1,D)
        km = jnp.mean(k.astype(f32), axis=2, keepdims=True)  # (B,Hkv,1,D)
        vm = jnp.mean(v.astype(f32), axis=2, keepdims=True)  # (B,Hkv,1,D)

    if use_fused:
        from umfa_tpu.ops.quant_fused import quantize_rows_fused

        if config.hadamard and config.smooth:
            # Means feed the kernel's post-rotation subtraction: rotation is
            # linear over the sequence, so mean(Hx) = H mean(x). Downstream
            # (corr, residual qm for the backward) lives in rotated space.
            if qm is not None:
                qm = hadamard_rotate(qm)
            km = hadamard_rotate(km)
        qt_q = quantize_rows_fused(
            q, qm, precision=config.q_precision,
            hadamard=config.hadamard, interpret=interpret,
        )
        qt_k = quantize_rows_fused(
            k, km, precision=config.k_precision,
            hadamard=config.hadamard, interpret=interpret,
        )
        if config.pv_int8:
            assert v_tile_k is not None
            v_in = v.astype(f32) - vm if vm is not None else v
            qt_v = quantize(
                v_in, config.v_precision, QuantMode.BLOCK, config.strategy,
                v_tile_k,
            )
            qt_v.orig_dtype = jnp.dtype(orig_dtypes[2])
        else:
            qt_v = quantize_rows_fused(
                v, vm, precision=config.v_precision, interpret=interpret
            )
        if qm is not None:
            corr = _corr_from_quantized(qm, qt_k)
        return qt_q, qt_k, qt_v, qm, vm, corr

    if config.smooth:
        # Keep the smoothed operands in FP32: rounding (x − mean) back to
        # bf16 adds a second rounding error on top of quantization (int8
        # relerr 1.1% → 2.4% at seq 4K). The quantizer reads FP32 anyway;
        # original dtypes are restored on the QuantizedTensors below so STE
        # gradients come back in the input dtype.
        k = k.astype(f32) - km
        v = v.astype(f32) - vm
        if qm is not None:
            q = q.astype(f32) - qm
            # corr_j = qm · k'_j in raw-dot units: (B, Hq, 1, Sk).
            b, hq, _, d = qm.shape
            hkv = k.shape[1]
            group = hq // hkv
            qm_g = qm.reshape(b, hkv, group, d)
            corr = jnp.einsum(
                "bhgd,bhkd->bhgk", qm_g, k.astype(f32),
                preferred_element_type=f32,
            ).reshape(b, hq, 1, k.shape[2])

    bs = config.block_sizes
    qt_q = quantize(q, config.q_precision, config.mode, config.strategy, bs.q)
    qt_k = quantize(k, config.k_precision, config.mode, config.strategy, bs.k)
    if config.pv_int8:
        # V scale must be constant per kernel KV tile so it factors out of
        # the integer P·V matmul — quantize per tile-sized sequence block.
        assert config.strategy == QuantStrategy.SYMMETRIC, (
            "pv_int8 requires symmetric quantization"
        )
        assert v_tile_k is not None
        qt_v = quantize(
            v, config.v_precision, QuantMode.BLOCK, config.strategy, v_tile_k
        )
    else:
        qt_v = quantize(v, config.v_precision, config.mode, config.strategy, bs.v)
    qt_q.orig_dtype, qt_k.orig_dtype, qt_v.orig_dtype = (
        jnp.dtype(d) for d in orig_dtypes
    )
    return qt_q, qt_k, qt_v, qm, vm, corr


def _try_fused_single_launch(
    key: _QAttnKey, q, k, v, bias, block_map, fetch_kv, hold_kv, fill_kv,
    emit_residuals: bool,
):
    """Route to the single-launch kernel (ops/quant_fused_attn.py) when
    supported: quantization, attention, and the V-mean restore all happen
    inside one kernel — no quantizer pass, no dequantized or smoothed copies
    in HBM. Returns None when the config needs the two-pass route."""
    from umfa_tpu.ops.quant_fused_attn import (
        fused_path_supported,
        fused_quantize_attend,
    )

    if not fused_path_supported(
        key.config, k.shape[2], k.shape[3], block_map, fetch_kv, bias,
        causal=key.causal, window=key.window, seq_q=q.shape[2],
        hold_kv=hold_kv, fill_kv=fill_kv,
        num_heads=q.shape[1], num_kv_heads=k.shape[1],
        bias_grad=key.bias_grad,
    ):
        return None
    out_dtype = jnp.dtype(key.out_dtype) if key.out_dtype else q.dtype
    return fused_quantize_attend(
        q, k, v, bias,
        causal=key.causal, window=key.window, scale=key.scale,
        smooth=key.config.smooth,
        smooth_q=key.config.effective_smooth_q(),
        hadamard=key.config.hadamard,
        pv_int8=key.config.pv_int8,
        emit_residuals=emit_residuals,
        block_map=block_map, fetch_kv=fetch_kv,
        hold_kv=hold_kv, fill_kv=fill_kv,
        q_precision=key.config.q_precision,
        k_precision=key.config.k_precision,
        v_precision=key.config.v_precision,
        strategy=key.config.strategy,
        mode=key.config.mode,
        quant_blocks=key.config.block_sizes,
        block_sizes=key.block_sizes, out_dtype=out_dtype,
        interpret=key.interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _qflash(
    key: _QAttnKey, q, k, v, bias, block_map, fetch_kv, fetch_q,
    hold_kv, fill_kv,
):
    """Differentiable quantized attention returning (out, lse). LSE is
    merge-grade only when config.smooth is False — smoothing shifts LSE by a
    per-chunk constant, which is softmax-invariant locally but breaks
    cross-chunk online-softmax merges (ring attention disables smoothing)."""
    # Primal (inference) call: residual emission elided at the kernel level
    # — Pallas outputs are opaque to XLA DCE, so the inference path must not
    # write them at all.
    fused = _try_fused_single_launch(
        key, q, k, v, bias, block_map, fetch_kv, hold_kv, fill_kv,
        emit_residuals=False,
    )
    if fused is not None:
        return fused[0], fused[1]
    _require_integer_q(key)
    (out, lse), _ = _qflash_fwd(
        key, q, k, v, bias, block_map, fetch_kv, fetch_q, hold_kv, fill_kv
    )
    return out, lse


def _require_integer_q(key):
    """Dense-Q (q_precision bf16/fp16/fp32, K/V integer) only exists in the
    fused single-launch kernel — the two-pass quantizer has no passthrough
    stream. Fail loudly instead of silently quantizing Q."""
    if not key.config.q_precision.is_integer:
        raise ValueError(
            "q_precision="
            f"{key.config.q_precision.value} (dense-Q) requires the fused "
            "single-launch path, but this call falls back to the two-pass "
            "kernels (unsupported mask/mode/shape — see "
            "fused_path_supported). Use an integer q_precision here."
        )


def _qflash_fwd(
    key: _QAttnKey, q, k, v, bias, block_map, fetch_kv, fetch_q,
    hold_kv, fill_kv,
):
    fused = _try_fused_single_launch(
        key, q, k, v, bias, block_map, fetch_kv, hold_kv, fill_kv,
        emit_residuals=True,
    )
    if fused is not None:
        out, lse, qt_q, qt_k, qt_v, qm, vm = fused
        if qt_q is None:
            # Dense-Q: no Q residual exists; the backward consumes the raw
            # Q array directly (STE on Q is the identity).
            qt_q = q
        return (out, lse), (
            qt_q, qt_k, qt_v, qm, vm, bias, block_map, fetch_kv, fetch_q,
            hold_kv, fill_kv, out, lse,
        )
    _require_integer_q(key)

    v_tile_k = None
    if key.config.pv_int8:
        from umfa_tpu.ops.flash_fwd import _choose_block

        v_tile_k = _choose_block(
            key.block_sizes.block_k, k.shape[2], k.shape[3]
        )
    qt_q, qt_k, qt_v, qm, vm, corr = _quantize_operands(
        q, k, v, key.config, v_tile_k, interpret=key.interpret
    )
    out_dtype = jnp.dtype(key.out_dtype) if key.out_dtype else q.dtype
    out, lse = quantized_attention_forward(
        qt_q, qt_k, qt_v, bias, corr, block_map, fetch_kv,
        causal=key.causal, window=key.window, scale=key.scale,
        block_sizes=key.block_sizes, out_dtype=out_dtype,
        interpret=key.interpret, pv_int8=key.config.pv_int8,
    )
    if vm is not None:
        # V-mean restoration: softmax rows sum to 1, so out = P·v' + vm —
        # except fully-masked rows (l == 0), where the kernel emits exact
        # zeros and lse = mask value; those must stay 0 like the unquantized
        # kernel's output.
        group = out.shape[1] // vm.shape[1]
        vm_q = jnp.repeat(vm, group, axis=1) if group > 1 else vm
        live = (lse > DEFAULT_MASK_VALUE * 0.5)[..., None]
        out = jnp.where(
            live, out.astype(jnp.float32) + vm_q, 0.0
        ).astype(out.dtype)
    # Residuals stay quantized — the training-memory saving
    # (reference: 25-40%, README.md:100).
    return (out, lse), (
        qt_q, qt_k, qt_v, qm, vm, bias, block_map, fetch_kv, fetch_q,
        hold_kv, fill_kv, out, lse,
    )


def _qflash_bwd(key: _QAttnKey, residuals, g):
    (qt_q, qt_k, qt_v, qm, vm, bias, block_map, fetch_kv, fetch_q,
     hold_kv, fill_kv, out, lse) = residuals
    g, g_lse = g
    # STE backward contract (reference: MFABridge+Quantized.swift:425-440,
    # AGENTS.md:108-111): gradients of the fake-quant forward, i.e. the dense
    # backward evaluated on q̃ = deq(q')+qm, k̃ = deq(k') (K-mean stays
    # subtracted — softmax-invariant), ṽ = deq(v')+vm, with the quantized
    # forward's LSE. Two implementations of the same values:
    #   * SYMMETRIC (default): quantized-NATIVE kernels (ops/quant_bwd.py)
    #     consume the int8/int4 residuals in-kernel — int8 S recompute at 2×
    #     MXU rate, no dequantized copies in HBM.
    #   * ASYMMETRIC: dequantize + dense backward (zero-point corrections in
    #     the backward matmuls aren't worth the complexity for this rarer
    #     config).
    # Dense-Q stores the RAW q array in qt_q's slot (no residual exists).
    q_dense = not isinstance(qt_q, QuantizedTensor)
    symmetric = all(
        t.strategy == QuantStrategy.SYMMETRIC
        for t in ((qt_k, qt_v) if q_dense else (qt_q, qt_k, qt_v))
    )
    if q_dense:
        # Dense backward on (q, deq(k'), deq(v')+vm) with the quantized
        # forward's out/lse — exactly the function the forward computed
        # (K-mean stays subtracted: softmax-invariant; V-mean was added in
        # the epilogue, and P rows sum to 1, so v = ṽ + vm reproduces out).
        q_dq = qt_q.astype(jnp.float32)
        k_dq = dequantize(qt_k, jnp.float32)
        v_dq = dequantize(qt_v, jnp.float32)
        if vm is not None:
            v_dq = v_dq + vm
        dq, dk, dv = flash_attention_backward(
            q_dq, k_dq, v_dq, out.astype(jnp.float32),
            lse, g.astype(jnp.float32), bias, g_lse, block_map, fetch_kv,
            fetch_q, causal=key.causal, window=key.window, scale=key.scale,
            block_sizes=key.block_sizes, interpret=key.interpret,
        )
    elif symmetric:
        from umfa_tpu.ops.quant_bwd import quantized_attention_backward

        corr = None
        if qm is not None:
            corr = _corr_from_quantized(qm, qt_k)
        gdt = (
            jnp.bfloat16
            if jnp.dtype(qt_q.orig_dtype) == jnp.bfloat16 else None
        )
        dq, dk, dv = quantized_attention_backward(
            qt_q, qt_k, qt_v, out, lse, g,
            qm, vm, corr, bias, g_lse, block_map, fetch_kv, fetch_q,
            causal=key.causal, window=key.window, scale=key.scale,
            block_sizes=key.block_sizes, interpret=key.interpret,
            grad_dtype=gdt,
        )
    else:
        q_dq = dequantize(qt_q, jnp.float32)
        k_dq = dequantize(qt_k, jnp.float32)
        v_dq = dequantize(qt_v, jnp.float32)
        if qm is not None:
            q_dq = q_dq + qm
        if vm is not None:
            v_dq = v_dq + vm
        dq, dk, dv = flash_attention_backward(
            q_dq, k_dq, v_dq, out.astype(jnp.float32), lse,
            g.astype(jnp.float32), bias, g_lse, block_map, fetch_kv, fetch_q,
            causal=key.causal, window=key.window, scale=key.scale,
            block_sizes=key.block_sizes, interpret=key.interpret,
        )
    if key.config.hadamard:
        from umfa_tpu.ops.hadamard import hadamard_rotate

        # Grads w.r.t. rotated Q/K rotate back with the same (self-inverse)
        # transform.
        dq = hadamard_rotate(dq)
        dk = hadamard_rotate(dk)
    if bias is None:
        dbias = None
    elif key.bias_grad:
        from umfa_tpu.ops.flash_bwd import flash_attention_bias_grad

        if symmetric and not q_dense:
            # The opt-in bias-grad sweep still runs on dequantized operands
            # (it is a separate full kernel pass either way). q_dense
            # already has q_dq/k_dq/v_dq in scope from its branch above.
            q_dq = dequantize(qt_q, jnp.float32)
            k_dq = dequantize(qt_k, jnp.float32)
            v_dq = dequantize(qt_v, jnp.float32)
            if qm is not None:
                q_dq = q_dq + qm
            if vm is not None:
                v_dq = v_dq + vm
        b4 = bias
        while b4.ndim < 4:
            b4 = b4[None]
        expand_q = b4.shape[2] == 1
        if expand_q:
            b4 = jnp.broadcast_to(
                b4, (*b4.shape[:2], q_dq.shape[2], b4.shape[3])
            )
        dbias = flash_attention_bias_grad(
            q_dq, k_dq, v_dq, out.astype(jnp.float32), lse,
            g.astype(jnp.float32), b4,
            causal=key.causal, window=key.window, scale=key.scale,
            block_sizes=key.block_sizes, interpret=key.interpret,
        )
        if expand_q:
            dbias = jnp.sum(dbias, axis=2, keepdims=True)
        dbias = dbias.reshape(bias.shape).astype(bias.dtype)
    else:
        dbias = jnp.zeros_like(bias)
    dmap = None if block_map is None else jnp.zeros_like(block_map)
    dfkv = None if fetch_kv is None else jnp.zeros_like(fetch_kv)
    dfq = None if fetch_q is None else jnp.zeros_like(fetch_q)
    dhold = None if hold_kv is None else jnp.zeros_like(hold_kv)
    dfill = None if fill_kv is None else jnp.zeros_like(fill_kv)
    return (
        dq.astype(qt_q.dtype if q_dense else qt_q.orig_dtype),
        dk.astype(qt_k.orig_dtype),
        dv.astype(qt_v.orig_dtype),
        dbias,
        dmap, dfkv, dfq, dhold, dfill,
    )


_qflash.defvjp(_qflash_fwd, _qflash_bwd)


def quantized_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    config: QuantizationConfig = QuantizationConfig(),
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
    """Runtime-quantized fused attention, differentiable (STE).

    Analogue of the reference route `MetalQuantizedFlashAttentionFn.apply`
    (metal_sdpa_backend.cpp:3139-3345): operands are quantized on device at
    runtime, the fused INT kernel produces output + LSE, and gradients flow
    straight through the rounding in FP32. `block_mask` is a compiled
    ops.block_mask.BlockMask — SKIP tiles cost neither compute nor DMA in
    forward AND backward (the reference's quantized path is mask-aware too:
    MFABridge+Quantized.swift:504-536).
    """
    if (
        block_mask is None
        and bias is None
        and window is not None
        and block_sizes == BlockSizes()
    ):
        # Plain `window=` calls get the same analytic tile auto-tuning the
        # dense route does (ops/attention.flash_attention): tile structure
        # from a host-built BlockMask, intra-tile masking stays the
        # kernel's index math. None = default walk already predicted fast.
        from umfa_tpu.ops.block_mask import maybe_window_block_mask

        block_mask = maybe_window_block_mask(
            q.shape[2], k.shape[2], tuple(window), causal, q.shape[3]
        )
        if block_mask is not None:
            from umfa_tpu.engine.stats import record_dispatch

            record_dispatch("window_auto_tiled")

    block_map = fetch_kv = fetch_q = hold_kv = fill_kv = None
    if block_mask is not None:
        assert bias is None, "pass either bias or block_mask, not both"
        bias = block_mask.bias
        block_map = block_mask.block_map
        fetch_kv = block_mask.fetch_kv
        fetch_q = block_mask.fetch_q
        hold_kv = getattr(block_mask, "hold_kv", None)
        fill_kv = getattr(block_mask, "fill_kv", None)
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
    if config.mode == QuantMode.HYBRID:
        from umfa_tpu.ops.quant import choose_mode

        config = dataclasses.replace(config, mode=choose_mode(q))
    key = _QAttnKey(
        config=config,
        causal=causal,
        window=window,
        scale=scale,
        block_sizes=block_sizes,
        out_dtype=jnp.dtype(out_dtype).name if out_dtype else None,
        interpret=interpret,
        bias_grad=bias_grad,
    )
    out, lse = _qflash(
        key, q, k, v, bias, block_map, fetch_kv, fetch_q, hold_kv, fill_kv
    )
    if return_lse:
        return out, lse
    return out
