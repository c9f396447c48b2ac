"""Quantized-native flash-attention backward (Pallas / TPU).

The reference's quantized backward consumes quantized tensors inside the
kernel (`backwardQuery`/`backwardKeyValue`, MFABridge+Quantized.swift:363-551)
and claims 1.14-1.48x vs the baseline backward (README.md:99). Round-1 STE
here dequantized Q/K/V to full FP32 HBM tensors and ran the dense backward —
a transient 4x memory blowup, and (worse) FP32 operands force the dense
kernels' matmuls into HIGHEST precision (6-pass bf16 emulation on the MXU).

These kernels instead consume the stored int8/int4 residuals directly:

  * Operands are DEQUANTIZED-ON-LOAD into bf16 registers (the reference's
    own load_quantized_int8/4 trick, SURVEY §2.3): per-row scales land on
    the (tile, D) operand tiles — int8 values are exact in bf16 — and every
    matmul runs at the full single-pass bf16 MXU rate. An int8×int8 S
    recompute is HALF the bf16 rate at head-dim contractions on v5e, and
    its post-matmul scaling costs two full passes over the score tile
    (measured r2; this was the r1 design).
  * P = exp(S - LSE) uses the same deq-bf16 formula as the (symmetric)
    quantized forward, so P matches the forward's softmax grade-for-grade.
  * No dequantized copies ever hit HBM; outer-constant tiles (Q in the dQ
    pass, K/V in the dK/dV pass) dequantize once into VMEM scratch.
  * dV = P^T dO needs no scales at all (STE: d out/d v = P exactly).
  * Mean-smoothing corrections (quant_attention._quantize_operands) stay
    exact: the Q-mean score row `corr` streams like the forward; the V-mean
    enters dP as dP_ij += dO_i . vm (per-row VPU reduction); the K-mean needs
    no term in dQ with softmax-closure and folds into dK via the streamed qm.

Gradient semantics match the round-1 STE contract exactly: these kernels
compute the same values as `flash_attention_backward(deq(q')+qm, deq(k'),
deq(v')+vm, ...)` — fake-quant forward, straight-through full-precision
grads (reference: AGENTS.md:108-111).

Supported: SYMMETRIC strategy (the default), INT8/INT4 per operand, causal /
window / bias / compiled BlockMask structure (tile skipping + compacted
fetch), GQA with in-kernel group reduction on static-mask paths. ASYMMETRIC
falls back to the dequantize-and-run-dense path in quant_attention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from umfa_tpu.engine.config import Precision
from umfa_tpu.ops.flash_fwd import (
    DEFAULT_MASK_VALUE,
    ELIDE_SKIPPED_DMA,
    BlockSizes,
    _block_visible,
    _choose_block,
    _intra_block_mask,
    _pad_seq,
    _LANES,
)
from umfa_tpu.ops.quant import QuantizedTensor
from umfa_tpu.ops.quant_attention import _unpack_int4_lanes


def _recompute_p_deq(
    q_bf, k_bf, lse, corr_blk, bias_blk, *, masked_args
):
    """P = exp(S - lse) with S from the bf16 matmul on dequantized-on-load
    operands — the exact formula the (symmetric) quantized forward uses, so
    P matches the forward's softmax in the same bf16-deq grade. int8×int8
    is HALF the bf16 MXU rate at head-dim contractions on v5e, and the
    per-row scales land on the (tile, D) operands instead of two full
    passes over the (block_q, block_k) score tile."""
    s = jax.lax.dot_general(
        q_bf, k_bf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if corr_blk is not None:
        s = s + corr_blk
    if bias_blk is not None:
        s = s + bias_blk.astype(jnp.float32)
    keep = None
    if masked_args is not None:
        partial, mask = masked_args
        keep = jnp.logical_or(jnp.logical_not(partial), mask)
        s = jnp.where(keep, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)
    if keep is not None:
        p = jnp.where(keep, p, 0.0)
    return p


def _deq_bf16(vals, scales, int4):
    """Dequantize an int tile into bf16 registers: (tile, D/pack) → (tile, D)."""
    if int4:
        vals = _unpack_int4_lanes(vals)
    return (vals.astype(jnp.float32) * scales).astype(jnp.bfloat16)


def _q_dq_kernel(
    *refs,
    scale,
    causal,
    window,
    block_q,
    block_k,
    seq_q,
    seq_k,
    num_k_blocks,
    q_int4,
    k_int4,
    v_int4,
    has_corr,
    has_bias,
    has_map,
    has_fetch,
    has_vm,
    kv_cache=False,
    group=1,
    diag_ns=0,
):
    refs = list(refs)
    fetch_ref = refs.pop(0) if has_fetch else None
    (q_ref, k_ref, v_ref, qs_ref, ks_ref, vs_ref,
     do_ref, lse_ref, delta_ref) = refs[:9]
    idx = 9
    vm_ref = corr_ref = bias_ref = map_ref = None
    if has_vm:
        vm_ref = refs[idx]; idx += 1
    if has_corr:
        corr_ref = refs[idx]; idx += 1
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    if has_map:
        map_ref = refs[idx]; idx += 1
    if kv_cache:
        dq_ref, dq_scr, q_scr, kdeq, vdeq = refs[idx:]
    else:
        dq_ref, dq_scr, q_scr = refs[idx:]
        kdeq = vdeq = None

    qi = pl.program_id(2)
    ki = pl.program_id(3)  # compacted step when has_fetch
    q_start = qi * block_q
    if fetch_ref is not None:
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
        dq_scr[...] = jnp.zeros_like(dq_scr)
        # Dequantize-on-load Q once per q-block (softmax scale pre-folded
        # into sq_eff host-side).
        q_scr[...] = _deq_bf16(q_ref[0, 0], qs_ref[0, 0], q_int4)

    if kv_cache:
        # Persistent deq-bf16 K/V VMEM caches, filled on first touch (same
        # schedule as the forward's _fill_kv_cache — SURVEY fwd design):
        # the per-step dequantize was measured at 26% of the whole int8
        # backward at S=4K (r4 NODEQ A/B, 1.567 → 1.158 ms); caching makes
        # the deq a once-per-tile cost and elides the repeated K/V HBM
        # reads entirely (the int8 residual bytes are read exactly once).
        from umfa_tpu.ops.flash_fwd import _right_bound

        rb = _right_bound(causal, window)
        if rb is None:
            first_qi = 0
        else:
            first_qi = jnp.maximum(ki * block_k - rb, 0) // block_q
        h = pl.program_id(1)
        fill = jnp.logical_and(qi == first_qi, h % group == 0)

        @pl.when(fill)
        def _fill_kv_deq():
            kdeq[pl.ds(k_start, block_k), :] = _deq_bf16(
                k_ref[0, 0], ks_ref[0, 0], k_int4
            )
            vdeq[pl.ds(k_start, block_k), :] = _deq_bf16(
                v_ref[0, 0], vs_ref[0, 0], v_int4
            )

    visible, partial = _block_visible(
        q_start, k_start,
        block_q=block_q, block_k=block_k,
        causal=causal, window=window, seq_q=seq_q, seq_k=seq_k,
    )
    if fetch_ref is not None:
        visible = jnp.logical_and(visible, fid_raw >= 0)
    elif map_ref is not None:
        typ = map_ref[
            pl.program_id(0) if map_ref.shape[0] > 1 else 0,
            pl.program_id(1) if map_ref.shape[1] > 1 else 0,
            qi, ki,
        ]
        visible = jnp.logical_and(visible, typ > 0)

    def _do_update(apply_mask: bool):
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        # k~ = sk * k_i8 dequantized on load — the (block_k, D) tile op
        # replaces a full (block_q, block_k) score-tile scale pass. With the
        # VMEM deq cache the load is a pure slice (deq paid once per tile).
        if kv_cache:
            k_bf = kdeq[pl.ds(k_start, block_k), :]
        else:
            k_bf = _deq_bf16(k_ref[0, 0], ks_ref[0, 0], k_int4)

        masked_args = None
        if apply_mask:
            mask = _intra_block_mask(
                q_start, k_start,
                block_q=block_q, block_k=block_k,
                causal=causal, window=window, seq_k=seq_k,
            )
            masked_args = (jnp.bool_(True), mask)
        corr_blk = corr_ref[0, 0] if corr_ref is not None else None
        bias_blk = bias_ref[0, 0] if bias_ref is not None else None
        p = _recompute_p_deq(
            q_scr[...], k_bf, lse, corr_blk, bias_blk,
            masked_args=masked_args,
        )

        # dP_ij = dO_i . v~_j [+ dO_i . vm].
        if kv_cache:
            v_f = vdeq[pl.ds(k_start, block_k), :]
        else:
            v_f = _deq_bf16(v_ref[0, 0], vs_ref[0, 0], v_int4)
        dp = jax.lax.dot_general(
            do.astype(jnp.bfloat16), v_f,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if vm_ref is not None:
            dp = dp + jnp.sum(do * vm_ref[0, 0], axis=-1, keepdims=True)
        ds = p * (dp - delta)  # (block_q, block_k) FP32
        # dQ_i += scale * sum_j dS_ij k~_j (K-mean stays subtracted —
        # consistent with the round-1 STE contract).
        dq_scr[...] += scale * jax.lax.dot_general(
            ds.astype(jnp.bfloat16), k_bf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _do_update_diag():
        # Causal diagonal fast path (see flash_bwd._dq_kernel's variant for
        # the derivation): q sub-block i touches only its visible column
        # prefix of the deq-on-load K/V tiles; one shared w×w triangle
        # bias, no where() passes. The Q-mean compensation row (corr) and
        # the V-mean dp term slice/broadcast along.
        from umfa_tpu.ops.flash_bwd import _tri_bias

        w = block_q // diag_ns
        if kv_cache:
            k_bf = kdeq[pl.ds(k_start, block_k), :]
            v_f = vdeq[pl.ds(k_start, block_k), :]
        else:
            k_bf = _deq_bf16(k_ref[0, 0], ks_ref[0, 0], k_int4)
            v_f = _deq_bf16(v_ref[0, 0], vs_ref[0, 0], v_int4)
        corr_blk = corr_ref[0, 0] if corr_ref is not None else None
        tri = _tri_bias(w)
        do_t = do_ref[0, 0].astype(jnp.float32)
        for i in range(diag_ns):
            rows = slice(i * w, (i + 1) * w)
            q_i = q_scr[rows, :]
            do_i = do_t[rows, :]
            lse_i = lse_ref[0, 0][rows, :]
            delta_i = delta_ref[0, 0][rows, :]
            vm_corr = None
            if vm_ref is not None:
                vm_corr = jnp.sum(
                    do_i * vm_ref[0, 0], axis=-1, keepdims=True
                )
            n_pre = i * w
            dq_i = jnp.zeros((w, q_i.shape[1]), jnp.float32)
            for k0, nk, tb in (
                ((0, n_pre, None),) if n_pre else ()
            ) + ((n_pre, w, tri),):
                k_c = k_bf[k0:k0 + nk, :]
                s = jax.lax.dot_general(
                    q_i, k_c,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if corr_blk is not None:
                    s = s + corr_blk[0:1, k0:k0 + nk]
                if tb is not None:
                    s = s + tb
                p = jnp.exp(s - lse_i)
                dp = jax.lax.dot_general(
                    do_i.astype(jnp.bfloat16), v_f[k0:k0 + nk, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if vm_corr is not None:
                    dp = dp + vm_corr
                ds = p * (dp - delta_i)
                dq_i = dq_i + jax.lax.dot_general(
                    ds.astype(jnp.bfloat16), k_c,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            dq_scr[rows, :] += scale * dq_i

    masked = causal or window is not None or bool(seq_k % block_k)
    if masked:
        if diag_ns:
            @pl.when(jnp.logical_and(visible, partial))
            def _compute_diag():
                _do_update_diag()
        else:
            # Interior tiles skip the VPU mask work (see
            # flash_fwd._fwd_kernel).
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
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _q_dkv_kernel(
    *refs,
    scale,
    causal,
    window,
    block_q,
    block_k,
    seq_q,
    seq_k,
    num_q_blocks,
    q_int4,
    k_int4,
    v_int4,
    has_corr,
    has_bias,
    has_map,
    has_fetch,
    has_qm,
    has_vm,
    group=1,
    nq_logical=None,
    q_cache=False,
    diag_ns=0,
):
    refs = list(refs)
    fetch_ref = refs.pop(0) if has_fetch else None
    (q_ref, k_ref, v_ref, qs_ref, ks_ref, vs_ref,
     do_ref, lse_ref, delta_ref) = refs[:9]
    idx = 9
    qm_ref = vm_ref = corr_ref = bias_ref = map_ref = None
    if has_qm:
        qm_ref = refs[idx]; idx += 1
    if has_vm:
        vm_ref = refs[idx]; idx += 1
    if has_corr:
        corr_ref = refs[idx]; idx += 1
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    if has_map:
        map_ref = refs[idx]; idx += 1
    if q_cache:
        dk_ref, dv_ref, dk_scr, dv_scr, k_scr, v_scr, qdeq = refs[idx:]
    else:
        dk_ref, dv_ref, dk_scr, dv_scr, k_scr, v_scr = refs[idx:]
        qdeq = None

    ki = pl.program_id(2)
    inner = pl.program_id(3)
    if group > 1:
        # In-kernel GQA reduction (see flash_bwd._dkv_kernel): grid dim 1 is
        # the KV head; the inner walk covers (query-head-in-group, step).
        qi = inner % nq_logical
        h_q = pl.program_id(1) * group + inner // nq_logical
    else:
        qi = inner
        h_q = pl.program_id(1)
    k_start = ki * block_k
    if fetch_ref is not None:
        fid_raw = fetch_ref[
            pl.program_id(0) if fetch_ref.shape[0] > 1 else 0,
            h_q if fetch_ref.shape[1] > 1 else 0,
            ki, qi,
        ]
        fid = jnp.where(fid_raw >= 0, fid_raw, -fid_raw - 1)
        q_start = fid * block_q
    else:
        q_start = qi * block_q

    @pl.when(inner == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)
        # K/V tiles are outer-constant: dequantize on load once per ki.
        k_scr[...] = _deq_bf16(k_ref[0, 0], ks_ref[0, 0], k_int4)
        v_scr[...] = _deq_bf16(v_ref[0, 0], vs_ref[0, 0], v_int4)

    if q_cache:
        # Q deq cache: Q tiles recur across every outer ki step — deq each
        # once during ki == 0's inner walk into VMEM, read pure bf16 after
        # (the repeated per-step deq was the dK/dV pass's share of the
        # 26%-of-backward deq cost measured in the r4 NODEQ A/B). The host
        # gates this to group == 1, no fetch/map, and window-left None (at
        # ki == 0 every q tile is visited, so the fill covers the cache).
        @pl.when(ki == 0)
        def _fill_q_deq():
            qdeq[pl.ds(q_start, block_q), :] = _deq_bf16(
                q_ref[0, 0], qs_ref[0, 0], q_int4
            )

    def _q_bf():
        if q_cache:
            return qdeq[pl.ds(q_start, block_q), :]
        return _deq_bf16(q_ref[0, 0], qs_ref[0, 0], q_int4)

    visible, partial = _block_visible(
        q_start, k_start,
        block_q=block_q, block_k=block_k,
        causal=causal, window=window, seq_q=seq_q, seq_k=seq_k,
    )
    if fetch_ref is not None:
        visible = jnp.logical_and(visible, fid_raw >= 0)
    elif map_ref is not None:
        typ = map_ref[
            pl.program_id(0) if map_ref.shape[0] > 1 else 0,
            h_q if map_ref.shape[1] > 1 else 0,
            qi, ki,
        ]
        visible = jnp.logical_and(visible, typ > 0)

    def _do_update(apply_mask: bool):
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        # Q varies per inner step: deq on load with sq_eff (softmax scale
        # pre-folded), or a pure VMEM slice when the deq cache is on.
        q_bf = _q_bf()

        masked_args = None
        if apply_mask:
            mask = _intra_block_mask(
                q_start, k_start,
                block_q=block_q, block_k=block_k,
                causal=causal, window=window, seq_k=seq_k,
            )
            masked_args = (jnp.bool_(True), mask)
        corr_blk = corr_ref[0, 0] if corr_ref is not None else None
        bias_blk = bias_ref[0, 0] if bias_ref is not None else None
        p = _recompute_p_deq(
            q_bf, k_scr[...], lse, corr_blk, bias_blk,
            masked_args=masked_args,
        )

        # dV += P^T dO — STE: d out / d v is exactly P, no scales.
        dv_scr[...] += jax.lax.dot_general(
            p.astype(jnp.bfloat16), do.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do.astype(jnp.bfloat16), v_scr[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if vm_ref is not None:
            dp = dp + jnp.sum(do * vm_ref[0, 0], axis=-1, keepdims=True)
        ds = p * (dp - delta)
        # dK_j += scale * sum_i dS_ij q~_i ; q~_i = sq_i q_i8_i + qm.
        # q_bf already carries sq_eff = sq·scale, so dSᵀ·q_bf IS
        # scale·dSᵀ·q~ — no extra factor, no score-tile scale pass.
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), q_bf,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if qm_ref is not None:
            colsum = jnp.sum(ds, axis=0, keepdims=True)  # (1, block_k)
            dk_scr[...] += scale * colsum.T * qm_ref[0, 0]

    def _do_update_diag():
        # Causal diagonal fast path, dK/dV orientation (see
        # flash_bwd._dkv_kernel's variant): k sub-block j is visible only to
        # the q-row suffix [j·w, bq); triangular corner + full dot below.
        from umfa_tpu.ops.flash_bwd import _tri_bias

        w = block_k // diag_ns
        q_bf = _q_bf()
        do_t = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        corr_blk = corr_ref[0, 0] if corr_ref is not None else None
        tri = _tri_bias(w)
        for j in range(diag_ns):
            cols = slice(j * w, (j + 1) * w)
            k_j = k_scr[cols, :]
            v_j = v_scr[cols, :]
            dv_j = jnp.zeros((w, v_j.shape[1]), jnp.float32)
            dk_j = jnp.zeros((w, k_j.shape[1]), jnp.float32)
            ds_colsum = jnp.zeros((1, w), jnp.float32) if qm_ref is not None else None
            n_post = block_q - (j + 1) * w
            for r0, nr, tb in (
                ((j * w, w, tri),)
                + ((((j + 1) * w, n_post, None),) if n_post else ())
            ):
                rows = slice(r0, r0 + nr)
                q_r = q_bf[rows, :]
                do_r = do_t[rows, :]
                s = jax.lax.dot_general(
                    q_r, k_j,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if corr_blk is not None:
                    s = s + corr_blk[0:1, cols]
                if tb is not None:
                    s = s + tb
                p = jnp.exp(s - lse[rows, :])
                dv_j = dv_j + jax.lax.dot_general(
                    p.astype(jnp.bfloat16), do_r.astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dp = jax.lax.dot_general(
                    do_r.astype(jnp.bfloat16), v_j,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if vm_ref is not None:
                    dp = dp + jnp.sum(
                        do_r * vm_ref[0, 0], axis=-1, keepdims=True
                    )
                ds = p * (dp - delta[rows, :])
                dk_j = dk_j + jax.lax.dot_general(
                    ds.astype(jnp.bfloat16), q_r,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if ds_colsum is not None:
                    ds_colsum = ds_colsum + jnp.sum(ds, axis=0, keepdims=True)
            if qm_ref is not None:
                dk_j = dk_j + scale * ds_colsum.T * qm_ref[0, 0]
            dv_scr[cols, :] += dv_j
            dk_scr[cols, :] += dk_j

    masked = causal or window is not None or bool(seq_k % block_k)
    if masked:
        if diag_ns:
            @pl.when(jnp.logical_and(visible, partial))
            def _compute_diag():
                _do_update_diag()
        else:
            # Interior tiles skip the VPU mask work (see
            # flash_fwd._fwd_kernel).
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

    @pl.when(inner == num_q_blocks - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def quantized_attention_backward(
    qt_q: QuantizedTensor,
    qt_k: QuantizedTensor,
    qt_v: QuantizedTensor,
    out: jax.Array,
    lse: jax.Array,
    do: jax.Array,
    qm: Optional[jax.Array] = None,
    vm: Optional[jax.Array] = None,
    score_corr: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    dlse: Optional[jax.Array] = None,
    block_map: Optional[jax.Array] = None,
    fetch_kv: Optional[jax.Array] = None,
    fetch_q: Optional[jax.Array] = None,
    *,
    causal: bool = False,
    window: Optional[tuple] = None,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interpret: bool = False,
    grad_dtype=None,
):
    """FA2 backward consuming quantized residuals in-kernel.

    Returns (dq, dk, dv) FP32 by default (grad_dtype, e.g. bf16, makes the
    kernels emit that dtype directly — see flash_bwd) — the same STE
    gradients the dense backward
    produces on the deterministically dequantized operands, without ever
    materializing those operands in HBM.
    `score_corr` is the Q-mean correction row in raw (unscaled) dot units,
    exactly as produced by quant_attention._quantize_operands.
    """
    batch, num_heads, seq_q, head_dim = qt_q.orig_shape
    _, num_kv_heads, seq_k, _ = qt_k.orig_shape
    group = num_heads // num_kv_heads
    if scale is None:
        scale = head_dim**-0.5
    interpret = interpret or jax.default_backend() == "cpu"

    # Compiled BlockMasks fix the tiling (see flash_fwd); otherwise use the
    # tuned backward q-tile request (see flash_bwd). Plain causal requests
    # EQUAL tiles so the sub-tiled diagonal fast path engages (see
    # flash_bwd for the tradeoff).
    q_req = (
        block_sizes.block_q_dq
        if block_map is not None
        else block_sizes.bwd_q_request("block_q_dq")
    )
    if (
        block_map is None and block_sizes == BlockSizes()
        and causal and window is None and bias is None
    ):
        q_req = block_sizes.block_k_dq
    block_q = _choose_block(q_req, seq_q, head_dim)
    block_k = _choose_block(block_sizes.block_k_dq, seq_k, head_dim)

    # D = rowsum(dO . O) (+ LSE cotangent folded: see flash_bwd).
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)

    q_vals = _pad_seq(qt_q.values, block_q, 2)
    k_vals = _pad_seq(qt_k.values, block_k, 2)
    v_vals = _pad_seq(qt_v.values, block_k, 2)
    do_pad = _pad_seq(
        do.astype(jnp.float32) if do.dtype == jnp.float16 else do, block_q, 2
    )
    padded_sq = q_vals.shape[2]
    padded_sk = k_vals.shape[2]
    num_q_blocks = padded_sq // block_q
    num_k_blocks = padded_sk // block_k

    lse_pad = _pad_seq(lse, block_q, 2)
    if padded_sq != seq_q:
        pad_rows = jnp.arange(padded_sq) >= seq_q
        lse_pad = jnp.where(pad_rows[None, None, :], -DEFAULT_MASK_VALUE, lse_pad)
    # Fully-masked rows carry lse = DEFAULT_MASK_VALUE; exp(s - lse) would
    # blow up to ~1 on their bias-masked entries. Their true grads are zero
    # (out is a constant 0) — give them +1e30 like padding rows.
    lse_pad = jnp.where(
        lse_pad <= DEFAULT_MASK_VALUE * 0.5, -DEFAULT_MASK_VALUE, lse_pad
    )
    delta_pad = _pad_seq(delta, block_q, 2)
    lse_b = lse_pad[..., None]
    delta_b = delta_pad[..., None]

    def pad_stat(x, block, axis):
        return _pad_seq(x, block, axis) if x.shape[axis] > 1 else x

    # Scale folding mirrors the forward: softmax scale folds into Q scales.
    q_scales = pad_stat(qt_q.scales * scale, block_q, 2)     # (B,H,Sq|1,1)
    # K/V scales in column form (B,H,Sk|1,1): dequantize-on-load folds them
    # onto the (block_k, D) tiles (see quant_attention).
    k_scales = pad_stat(qt_k.scales, block_k, 2)
    v_scales = pad_stat(qt_v.scales, block_k, 2)

    has_corr = score_corr is not None
    corr = None
    if has_corr:
        corr = _pad_seq((score_corr * scale).astype(jnp.float32), block_k, 3)

    has_bias = bias is not None
    bias_meta = None
    if has_bias:
        while bias.ndim < 4:
            bias = bias[None]
        bq_bcast = bias.shape[2] == 1  # decide BEFORE padding grows the dim
        bias = _pad_seq(bias, block_k, 3)
        if not bq_bcast:
            bias = _pad_seq(bias, block_q, 2)
        bias_meta = (bias.shape[0], bias.shape[1], bq_bcast)

    has_fetch = (
        block_map is not None and fetch_kv is not None and fetch_q is not None
    )
    has_map = block_map is not None and not has_fetch
    if block_map is not None:
        assert block_map.shape[2] == num_q_blocks and (
            block_map.shape[3] == num_k_blocks
        ), (block_map.shape, num_q_blocks, num_k_blocks)
    if has_fetch:
        assert fetch_kv.shape[2] == num_q_blocks, (fetch_kv.shape, num_q_blocks)
        assert fetch_q.shape[2] == num_k_blocks, (fetch_q.shape, num_k_blocks)

    has_qm = qm is not None
    has_vm = vm is not None

    dq_pack = 2 if qt_q.precision == Precision.INT4 else 1
    dk_pack = 2 if qt_k.precision == Precision.INT4 else 1
    dv_pack = 2 if qt_v.precision == Precision.INT4 else 1

    def clamp_ki(qi, ki):
        if not ELIDE_SKIPPED_DMA:
            return ki
        if causal:
            ki = jnp.minimum(ki, (qi * block_q + block_q - 1) // block_k)
        if window is not None:
            left, right = window
            if left >= 0:
                ki = jnp.maximum(ki, jnp.maximum(qi * block_q - left, 0) // block_k)
            if right >= 0:
                ki = jnp.minimum(ki, (qi * block_q + block_q - 1 + right) // block_k)
        return ki

    def clamp_qi(ki, qi):
        if not ELIDE_SKIPPED_DMA:
            return qi
        if causal:
            qi = jnp.maximum(qi, (ki * block_k) // block_q)
        if window is not None:
            left, right = window
            if left >= 0:
                qi = jnp.minimum(qi, (ki * block_k + block_k - 1 + left) // block_q)
            if right >= 0:
                qi = jnp.maximum(qi, jnp.maximum(ki * block_k - right, 0) // block_q)
        return qi

    def _fetch_idx(fref, b, h, o, inner):
        val = fref[
            b if fref.shape[0] > 1 else 0,
            h if fref.shape[1] > 1 else 0,
            o, inner,
        ]
        return jnp.where(val >= 0, val, -val - 1)

    # Deq-cache gates (r4): the per-step dequantize was 26% of the int8
    # backward at S=4K (NODEQ A/B, 1.567 → 1.158 ms). The dQ pass caches
    # deq'd K/V (fill-on-first-touch, forward's schedule); the dK/dV pass
    # caches deq'd Q (filled during outer step ki == 0, which visits every
    # q tile when window-left is unbounded). Frozen index maps elide the
    # repeated HBM reads too — int8 residual bytes are read exactly once.
    from umfa_tpu.ops.flash_fwd import _right_bound

    rb_host = _right_bound(causal, window)
    use_dq_cache = (
        not has_fetch and not has_map
        and padded_sk * head_dim * 4 <= 12 * 2**20
        and not (rb_host is not None and seq_q != seq_k)
    )
    use_dkv_qcache = (
        not has_fetch and not has_map and group == 1
        and (window is None or window[0] < 0)
        and padded_sq * head_dim * 2 <= 6 * 2**20
        and not (rb_host is not None and seq_q != seq_k)
    )

    def _last_filled(qi, ki):
        """Largest KV tile already deq-cache-filled at dQ step (qi, ki) —
        same formula as the forward's fill schedule."""
        if rb_host is None:
            return jnp.where(qi > 0, num_k_blocks - 1, ki)
        a = (qi * block_q - 1 + rb_host) // block_k
        bmax = ((qi + 1) * block_q - 1 + rb_host) // block_k
        t = jnp.maximum(a, jnp.minimum(ki, bmax))
        return jnp.clip(t, 0, num_k_blocks - 1)

    def build_specs(order, use_group=False, width=None):
        """order 'qk' = dQ kernel (qi outer, ki inner); 'kq' = dK/dV kernel.
        use_group: in-kernel GQA layout (h = KV head, inner = (g, step) with
        `width` steps per query head — compacted steps under fetch).

        When a deq cache is active, the cached operand streams (K/V values +
        scales in 'qk'; Q values + scales in 'kq') follow FROZEN index maps
        (first-touch fill, then alias the last-filled tile so the DMA is
        elided); the per-step streams (do/lse/delta/corr/bias) keep the
        true streaming index."""
        if width is None:
            width = num_q_blocks

        if use_group:
            def hq(h, j):
                return h * group + j // width

            def qix(b, h, i, j, refs):
                if has_fetch:
                    return _fetch_idx(refs[0], b, hq(h, j), i, j % width)
                return clamp_qi(i, j % width)

            def kix(b, h, i, j, refs):
                return i

            def hsel_q(b, h, i, j):
                return hq(h, j)

            def hsel_kv(b, h, i, j):
                return h
        elif order == "qk":
            def qix(b, h, i, j, refs):
                return i

            def kix(b, h, i, j, refs):
                if has_fetch:
                    return _fetch_idx(refs[0], b, h, i, j)
                return clamp_ki(i, j)

            def hsel_q(b, h, i, j):
                return h

            def hsel_kv(b, h, i, j):
                return h // group
        else:
            def qix(b, h, i, j, refs):
                if has_fetch:
                    return _fetch_idx(refs[0], b, h, i, j)
                return clamp_qi(i, j)

            def kix(b, h, i, j, refs):
                return i

            def hsel_q(b, h, i, j):
                return h

            def hsel_kv(b, h, i, j):
                return h // group

        # Cached-operand index maps: freeze on the last-filled tile after
        # first touch so the repeated DMAs are elided (deq caches hold the
        # data). Per-step streams keep the raw qix/kix.
        kix_vals, qix_vals = kix, qix
        if order == "qk" and use_dq_cache:
            def kix_vals(b, h, i, j, refs):
                t = _last_filled(i, j)
                return jnp.where(h % group == 0, t, num_k_blocks - 1)
        if order == "kq" and not use_group and use_dkv_qcache:
            def qix_vals(b, h, i, j, refs):
                return jnp.where(i == 0, clamp_qi(i, j), num_q_blocks - 1)

        q_spec = pl.BlockSpec(
            (1, 1, block_q, head_dim // dq_pack),
            lambda b, h, i, j, *refs: (
                b, hsel_q(b, h, i, j), qix_vals(b, h, i, j, refs), 0
            ),
        )
        k_spec = pl.BlockSpec(
            (1, 1, block_k, head_dim // dk_pack),
            lambda b, h, i, j, *refs: (
                b, hsel_kv(b, h, i, j), kix_vals(b, h, i, j, refs), 0
            ),
        )
        v_spec = pl.BlockSpec(
            (1, 1, block_k, head_dim // dv_pack),
            lambda b, h, i, j, *refs: (
                b, hsel_kv(b, h, i, j), kix_vals(b, h, i, j, refs), 0
            ),
        )

        def col_spec(stat):
            per_row = stat.shape[2] > 1
            return pl.BlockSpec(
                (1, 1, block_q if per_row else 1, 1),
                lambda b, h, i, j, *refs, pr=per_row: (
                    b, hsel_q(b, h, i, j),
                    qix_vals(b, h, i, j, refs) if pr else 0, 0
                ),
            )

        def row_spec(stat):
            per_row = stat.shape[3] > 1
            return pl.BlockSpec(
                (1, 1, 1, block_k if per_row else 1),
                lambda b, h, i, j, *refs, pr=per_row: (
                    b, hsel_kv(b, h, i, j), 0,
                    kix(b, h, i, j, refs) if pr else 0,
                ),
            )

        do_spec = pl.BlockSpec(
            (1, 1, block_q, head_dim),
            lambda b, h, i, j, *refs: (b, hsel_q(b, h, i, j), qix(b, h, i, j, refs), 0),
        )
        stat_spec = pl.BlockSpec(
            (1, 1, block_q, 1),
            lambda b, h, i, j, *refs: (
                b, hsel_q(b, h, i, j), qix(b, h, i, j, refs), 0
            ),
        )

        def kv_col_spec(stat):
            per_row = stat.shape[2] > 1
            return pl.BlockSpec(
                (1, 1, block_k if per_row else 1, 1),
                lambda b, h, i, j, *refs, pr=per_row: (
                    b, hsel_kv(b, h, i, j),
                    kix_vals(b, h, i, j, refs) if pr else 0, 0,
                ),
            )

        ins = [q_spec, k_spec, v_spec,
               col_spec(q_scales), kv_col_spec(k_scales),
               kv_col_spec(v_scales), do_spec, stat_spec, stat_spec]
        extra = []
        if order == "kq" and has_qm:
            # qm: (B, Hq, 1, D) — q-side heads.
            extra.append(pl.BlockSpec(
                (1, 1, 1, head_dim),
                lambda b, h, i, j, *refs: (b, hsel_q(b, h, i, j), 0, 0),
            ))
        if has_vm:
            # vm: (B, Hkv, 1, D).
            extra.append(pl.BlockSpec(
                (1, 1, 1, head_dim),
                lambda b, h, i, j, *refs: (b, hsel_kv(b, h, i, j), 0, 0),
            ))
        if has_corr:
            # corr: (B, Hq, 1, Sk) — q-side heads.
            extra.append(pl.BlockSpec(
                (1, 1, 1, block_k),
                lambda b, h, i, j, *refs: (
                    b, hsel_q(b, h, i, j), 0, kix(b, h, i, j, refs)
                ),
            ))
        if has_bias:
            bb, bh, bq_bcast = bias_meta
            extra.append(pl.BlockSpec(
                (1, 1, 1 if bq_bcast else block_q, block_k),
                lambda b, h, i, j, *refs: (
                    b if bb > 1 else 0,
                    hsel_q(b, h, i, j) if bh > 1 else 0,
                    0 if bq_bcast else qix(b, h, i, j, refs),
                    kix(b, h, i, j, refs),
                ),
            ))
        if has_map:
            extra.append(pl.BlockSpec(
                block_map.shape,
                lambda b, h, i, j, *refs: (0, 0, 0, 0),
                memory_space=pltpu.SMEM,
            ))
        return ins + extra

    base_args = [q_vals, k_vals, v_vals, q_scales, k_scales, v_scales,
                 do_pad, lse_b, delta_b]

    def extra_args(order):
        a = []
        if order == "kq" and has_qm:
            a.append(qm.astype(jnp.float32))
        if has_vm:
            a.append(vm.astype(jnp.float32))
        if has_corr:
            a.append(corr)
        if has_bias:
            a.append(bias)
        if has_map:
            a.append(block_map)
        return a

    int4_flags = dict(
        q_int4=dq_pack == 2, k_int4=dk_pack == 2, v_int4=dv_pack == 2
    )

    from umfa_tpu.ops.flash_fwd import _diag_subtile_count

    diag_ns = 0
    if not has_fetch and not has_map:
        diag_ns = _diag_subtile_count(
            block_q, block_k, causal, window, seq_k, has_bias,
            prefer_ns=(4, 2),  # bwd: NS=4 measured best (see flash_fwd)
        )

    # ---- dQ pass ----
    dq_kernel = functools.partial(
        _q_dq_kernel,
        scale=scale, causal=causal, window=window,
        block_q=block_q, block_k=block_k,
        seq_q=seq_q, seq_k=seq_k,
        num_k_blocks=fetch_kv.shape[3] if has_fetch else num_k_blocks,
        has_corr=has_corr, has_bias=has_bias,
        has_map=has_map, has_fetch=has_fetch, has_vm=has_vm,
        kv_cache=use_dq_cache, group=group,
        diag_ns=diag_ns,
        **int4_flags,
    )
    dq_grid = (
        batch, num_heads, num_q_blocks,
        fetch_kv.shape[3] if has_fetch else num_k_blocks,
    )
    dq_out_spec = pl.BlockSpec(
        (1, 1, block_q, head_dim), lambda b, h, i, j, *refs: (b, h, i, 0)
    )
    gdt = jnp.dtype(grad_dtype) if grad_dtype is not None else jnp.float32
    dq_out_shape = jax.ShapeDtypeStruct(
        (batch, num_heads, padded_sq, head_dim), gdt
    )
    dq_scratch = [
        pltpu.VMEM((block_q, head_dim), jnp.float32),
        pltpu.VMEM((block_q, head_dim), jnp.bfloat16),  # deq Q
    ]
    if use_dq_cache:
        dq_scratch += [
            pltpu.VMEM((padded_sk, head_dim), jnp.bfloat16),  # deq K cache
            pltpu.VMEM((padded_sk, head_dim), jnp.bfloat16),  # deq V cache
        ]
    if use_dq_cache:
        # Fill schedule depends on iteration order within a head: qi must
        # walk sequentially; under GQA the group shares the leader's fill
        # (same semantics tradeoff the forward makes).
        cparams = pltpu.CompilerParams(
            dimension_semantics=(
                "parallel",
                "parallel" if group == 1 else "arbitrary",
                "arbitrary", "arbitrary",
            ),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    else:
        cparams = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    if has_fetch:
        dq = pl.pallas_call(
            dq_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=dq_grid,
                in_specs=build_specs("qk"),
                out_specs=dq_out_spec,
                scratch_shapes=dq_scratch,
            ),
            out_shape=dq_out_shape,
            compiler_params=cparams,
            interpret=interpret,
        )(fetch_kv, *base_args, *extra_args("qk"))
    else:
        dq = pl.pallas_call(
            dq_kernel,
            grid=dq_grid,
            in_specs=build_specs("qk"),
            out_specs=dq_out_spec,
            out_shape=dq_out_shape,
            scratch_shapes=dq_scratch,
            compiler_params=cparams,
            interpret=interpret,
        )(*base_args, *extra_args("qk"))

    # ---- dK/dV pass ----
    # GQA group reduction in-kernel (see flash_bwd), incl. the compacted-
    # fetch path.
    use_group_reduce = group > 1
    dkv_width = fetch_q.shape[3] if has_fetch else num_q_blocks
    if use_group_reduce:
        dkv_inner = group * dkv_width
        dkv_heads = num_kv_heads
    else:
        dkv_inner = dkv_width
        dkv_heads = num_heads
    dkv_kernel = functools.partial(
        _q_dkv_kernel,
        scale=scale, causal=causal, window=window,
        block_q=block_q, block_k=block_k,
        seq_q=seq_q, seq_k=seq_k,
        num_q_blocks=dkv_inner,
        has_corr=has_corr, has_bias=has_bias,
        has_map=has_map, has_fetch=has_fetch,
        has_qm=has_qm, has_vm=has_vm,
        q_cache=use_dkv_qcache,
        diag_ns=diag_ns,
        group=group if use_group_reduce else 1,
        nq_logical=dkv_width,
        **int4_flags,
    )
    dkv_grid = (batch, dkv_heads, num_k_blocks, dkv_inner)
    dkv_out_specs = [
        pl.BlockSpec(
            (1, 1, block_k, head_dim), lambda b, h, i, j, *refs: (b, h, i, 0)
        ),
        pl.BlockSpec(
            (1, 1, block_k, head_dim), lambda b, h, i, j, *refs: (b, h, i, 0)
        ),
    ]
    dkv_out_shape = [
        jax.ShapeDtypeStruct((batch, dkv_heads, padded_sk, head_dim), gdt),
        jax.ShapeDtypeStruct((batch, dkv_heads, padded_sk, head_dim), gdt),
    ]
    dkv_scratch = [
        pltpu.VMEM((block_k, head_dim), jnp.float32),
        pltpu.VMEM((block_k, head_dim), jnp.float32),
        pltpu.VMEM((block_k, head_dim), jnp.bfloat16),  # deq K
        pltpu.VMEM((block_k, head_dim), jnp.bfloat16),  # deq V
    ]
    if use_dkv_qcache:
        dkv_scratch.append(
            pltpu.VMEM((padded_sq, head_dim), jnp.bfloat16)  # deq Q cache
        )
    dkv_in_specs = build_specs(
        "kq", use_group=use_group_reduce, width=dkv_width
    )
    # The Q deq cache is filled during outer step ki == 0: ki must walk
    # sequentially ("arbitrary") so later steps read a warm cache.
    dkv_cparams = pltpu.CompilerParams(
        dimension_semantics=(
            "parallel", "parallel",
            "arbitrary" if use_dkv_qcache else "parallel",
            "arbitrary",
        ),
        vmem_limit_bytes=64 * 1024 * 1024,
    )
    if has_fetch:
        dk, dv = pl.pallas_call(
            dkv_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=dkv_grid,
                in_specs=dkv_in_specs,
                out_specs=dkv_out_specs,
                scratch_shapes=dkv_scratch,
            ),
            out_shape=dkv_out_shape,
            compiler_params=dkv_cparams,
            interpret=interpret,
        )(fetch_q, *base_args, *extra_args("kq"))
    else:
        dk, dv = pl.pallas_call(
            dkv_kernel,
            grid=dkv_grid,
            in_specs=dkv_in_specs,
            out_specs=dkv_out_specs,
            out_shape=dkv_out_shape,
            scratch_shapes=dkv_scratch,
            compiler_params=dkv_cparams,
            interpret=interpret,
        )(*base_args, *extra_args("kq"))

    dq = dq[:, :, :seq_q]
    dk = dk[:, :, :seq_k]
    dv = dv[:, :, :seq_k]
    return dq, dk, dv
