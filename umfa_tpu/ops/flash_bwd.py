"""Flash-attention backward kernels (Pallas / TPU).

Same two-phase FA2 decomposition as the reference (SURVEY.md §3.3:
MultiHeadAttention.backward computes D = rowsum(dO ∘ O), then a dQ pass and a
dK/dV pass; MFABridge.swift:3164-3259): probabilities are recomputed from the
saved LSE rather than stored (LSE-based recompute), and all gradients are FP32
(reference invariant, metal_sdpa_backend.cpp:2800-2804).

  dQ kernel:   grid (B, H, nq, nk) — KV innermost, dQ accumulates in VMEM.
  dK/dV kernel: grid (B, H, nk, nq) — Q innermost, dK/dV accumulate in VMEM.

D is precomputed with plain jnp (XLA fuses the rowsum into neighbours).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from umfa_tpu.ops.flash_fwd import (
    DEFAULT_MASK_VALUE,
    ELIDE_SKIPPED_DMA,
    BlockSizes,
    _block_visible,
    _intra_block_mask,
    _pad_seq,
    _LANES,
)


def _mxu(dtype):
    """FP32 inputs force HIGHEST MXU precision (see flash_fwd)."""
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _recompute_p(q, k, lse, bias_blk, *, scale, masked_args):
    """Recompute P = exp(S*scale + bias - lse) for one (q-block, kv-block).

    The softmax scale is folded into Q before the dot: a multiply over the
    (block_q, head_dim) operand instead of a full VPU pass over the
    (block_q, block_k) score tile (Mosaic does not fuse `s * scale` into the
    exp — measured ~0.5 ms/pass at FLUX geometry on the forward)."""
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu(q.dtype),
    )
    if bias_blk is not None:
        s = s + bias_blk.astype(jnp.float32)
    if masked_args is not None:
        partial, mask = masked_args
        keep = jnp.logical_or(jnp.logical_not(partial), mask)
        s = jnp.where(keep, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)  # lse: (block_q, 1)
    if masked_args is not None:
        p = jnp.where(keep, p, 0.0)
    return p


def _tri_bias(w: int):
    """Shared w×w additive causal triangle (col > row masked): exp
    underflows masked lanes to exact 0, so the diagonal fast paths never
    run a where() pass (see flash_fwd._do_update_diag)."""
    return jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        > jax.lax.broadcasted_iota(jnp.int32, (w, w), 0),
        DEFAULT_MASK_VALUE,
        0.0,
    )


def _dq_kernel(
    *refs,
    scale,
    causal,
    window,
    block_q,
    block_k,
    seq_q,
    seq_k,
    num_k_blocks,
    has_bias,
    has_map,
    has_fetch=False,
    diag_ns=0,
    diag_rect=False,
):
    refs = list(refs)
    fetch_ref = None
    if has_fetch:
        fetch_ref = refs.pop(0)
    (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref) = refs[:6]
    idx = 6
    bias_ref = map_ref = None
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    if has_map:
        map_ref = refs[idx]; idx += 1
    dq_ref, dq_scr = refs[idx:]

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
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        # Column-layout row stats (see flash_fwd finalize): (block_q, 1).
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]

        masked_args = None
        if apply_mask:
            mask = _intra_block_mask(
                q_start, k_start,
                block_q=block_q, block_k=block_k,
                causal=causal, window=window, seq_k=seq_k,
            )
            masked_args = (jnp.bool_(True), mask)
        bias_blk = bias_ref[0, 0] if bias_ref is not None else None
        p = _recompute_p(q, k, lse, bias_blk, scale=scale, masked_args=masked_args)

        # dP = dO @ V^T
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu(v.dtype),
        )
        ds = p * (dp - delta)  # (block_q, block_k) FP32
        dq_scr[...] += scale * jax.lax.dot_general(
            ds.astype(k.dtype), k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu(k.dtype),
        )

    def _do_update_diag():
        # Causal diagonal fast path (bq == bk, aligned KV tail: the only
        # partial tile is EXACTLY diagonal). q rows go in diag_ns sub-blocks
        # of w; sub-block i touches only its visible column prefix
        # [0, (i+1)·w) — prefix columns as a full dot, the trailing w×w
        # corner with the shared triangle bias. ~(NS+1)/2NS of the full
        # tile's MACs/exp, no where() passes (masked lanes underflow exp to
        # exact 0, so their ds contribution vanishes identically).
        w = block_q // diag_ns
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        tri = _tri_bias(w)
        qf = q_ref[0, 0]
        qf = (qf.astype(jnp.float32) * scale).astype(qf.dtype)
        mxu = _mxu(k.dtype)
        for i in range(diag_ns):
            q_i = qf[i * w:(i + 1) * w, :]
            do_i = do_ref[0, 0][i * w:(i + 1) * w, :].astype(jnp.float32)
            lse_i = lse_ref[0, 0][i * w:(i + 1) * w, :]
            delta_i = delta_ref[0, 0][i * w:(i + 1) * w, :]
            n_pre = i * w
            dq_i = jnp.zeros((w, q_i.shape[1]), jnp.float32)
            for k0, nk, bias_tri in (
                ((0, n_pre, None),) if n_pre else ()
            ) + ((n_pre, w, tri),):
                k_c = k[k0:k0 + nk, :]
                v_c = v[k0:k0 + nk, :]
                s = jax.lax.dot_general(
                    q_i, k_c,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mxu,
                )
                if bias_tri is not None:
                    s = s + bias_tri
                p = jnp.exp(s - lse_i)
                dp = jax.lax.dot_general(
                    do_i.astype(v.dtype), v_c,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_mxu(v.dtype),
                )
                ds = p * (dp - delta_i)
                dq_i = dq_i + jax.lax.dot_general(
                    ds.astype(k.dtype), k_c,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mxu,
                )
            dq_scr[i * w:(i + 1) * w, :] += scale * dq_i

    def _dq_rect_piece(r0: int, nr: int, k, v, k0: int, nk: int, bias_tri):
        """dQ contribution of q rows [r0, r0+nr) vs KV cols [k0, k0+nk) of
        the resident tile (static indices → lane selects)."""
        mxu = _mxu(k.dtype)
        qf = q_ref[0, 0][r0:r0 + nr, :]
        qf = (qf.astype(jnp.float32) * scale).astype(qf.dtype)
        do_r = do_ref[0, 0][r0:r0 + nr, :].astype(jnp.float32)
        lse_r = lse_ref[0, 0][r0:r0 + nr, :]
        delta_r = delta_ref[0, 0][r0:r0 + nr, :]
        k_c = k[k0:k0 + nk, :]
        v_c = v[k0:k0 + nk, :]
        s = jax.lax.dot_general(
            qf, k_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu,
        )
        if bias_tri is not None:
            s = s + bias_tri
        p = jnp.exp(s - lse_r)
        dp = jax.lax.dot_general(
            do_r.astype(v.dtype), v_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu(v.dtype),
        )
        ds = p * (dp - delta_r)
        dq_scr[r0:r0 + nr, :] += scale * jax.lax.dot_general(
            ds.astype(k.dtype), k_c,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu,
        )

    def _do_update_rect(jj: int, full_below: bool):
        # Rectangular causal diagonal, dQ orientation (bq == 2·bk, w = bk):
        # the partial KV tile at k_start == q_start + jj·w has a w×w
        # triangle on q sub-block jj, full visibility for the rows below it
        # (jj == 0 only), and nothing above. The triangle block is further
        # sub-tiled exactly like the square diag path (prefix dot + ws×ws
        # corner, NS sub-blocks) — without it the rect diagonal band costs
        # 3.0 tile-units vs the square path's 2.25 and the mode LOSES
        # (measured r4: 1.435 vs 1.181 ms full train step at S=4K); with it
        # the band matches square at 2.25 while FULL tiles keep the 2·bk
        # q-tile rate (see flash_fwd._do_update_rect).
        w = block_q // 2
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        ns = diag_ns if diag_ns else 4
        ws = w // ns
        tri = _tri_bias(ws)
        row0 = jj * w
        for i in range(ns):
            r0 = row0 + i * ws
            n_pre = i * ws
            if n_pre:
                _dq_rect_piece(r0, ws, k, v, 0, n_pre, None)
            _dq_rect_piece(r0, ws, k, v, n_pre, ws, tri)
        if full_below:
            _dq_rect_piece(w, w, k, v, 0, w, None)

    masked = causal or window is not None or bool(seq_k % block_k)
    if masked:
        if diag_rect:
            at_diag0 = k_start == q_start

            @pl.when(
                jnp.logical_and(visible, jnp.logical_and(partial, at_diag0))
            )
            def _compute_rect0():
                _do_update_rect(0, True)

            @pl.when(
                jnp.logical_and(
                    visible,
                    jnp.logical_and(partial, jnp.logical_not(at_diag0)),
                )
            )
            def _compute_rect1():
                _do_update_rect(1, False)
        elif diag_ns:
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


def _dkv_kernel(
    *refs,
    scale,
    causal,
    window,
    block_q,
    block_k,
    seq_q,
    seq_k,
    num_q_blocks,
    has_bias,
    has_map,
    has_fetch=False,
    group=1,
    nq_logical=None,
    diag_ns=0,
    diag_rect=False,
):
    refs = list(refs)
    fetch_ref = None
    if has_fetch:
        fetch_ref = refs.pop(0)
    (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref) = refs[:6]
    idx = 6
    bias_ref = map_ref = None
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    if has_map:
        map_ref = refs[idx]; idx += 1
    dk_ref, dv_ref, dk_scr, dv_scr = refs[idx:]

    ki = pl.program_id(2)
    inner = pl.program_id(3)  # compacted step / (group, step) when group > 1
    if group > 1:
        # In-kernel GQA reduction: grid dim 1 is the KV head, the inner walk
        # covers (query-head-in-group, q-block-or-compacted-step); dK/dV
        # accumulate across the whole group in VMEM — no per-query-head
        # gradient tensors in HBM (incl. the compacted-fetch path, whose
        # tables are per query head).
        qi = inner % nq_logical
        h_q = pl.program_id(1) * group + inner // nq_logical
    else:
        qi = inner
        h_q = pl.program_id(1)
    k_start = ki * block_k
    if fetch_ref is not None:
        # fetch_q table is (Bm, Hm, nk, max_vis_q): indexed by (ki, step).
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
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]

        masked_args = None
        if apply_mask:
            mask = _intra_block_mask(
                q_start, k_start,
                block_q=block_q, block_k=block_k,
                causal=causal, window=window, seq_k=seq_k,
            )
            masked_args = (jnp.bool_(True), mask)
        bias_blk = bias_ref[0, 0] if bias_ref is not None else None
        p = _recompute_p(q, k, lse, bias_blk, scale=scale, masked_args=masked_args)

        # dV += P^T @ dO. Operands cast to the INPUT dtype: `do` was widened
        # to f32 above, and an f32 operand dtype would silently select the
        # 6-pass HIGHEST emulation on bf16-input calls — 6× the MXU time for
        # precision below the bf16-rounded P it would consume anyway.
        dv_scr[...] += jax.lax.dot_general(
            p.astype(v.dtype), do.astype(v.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu(v.dtype),
        )
        # dS = P ∘ (dO @ V^T - delta)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu(v.dtype),
        )
        ds = p * (dp - delta)
        # dK += scale * dS^T @ Q
        dk_scr[...] += scale * jax.lax.dot_general(
            ds.astype(q.dtype), q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu(q.dtype),
        )

    def _do_update_diag():
        # Causal diagonal fast path, dK/dV orientation: k sub-block j (cols
        # [j·w, (j+1)·w)) is visible only to the q-row SUFFIX [j·w, bq) —
        # the triangular w×w corner (first w of those rows) plus a full dot
        # for the rows below. Same ~(NS+1)/2NS work fraction as the dQ side.
        w = block_k // diag_ns
        q = q_ref[0, 0]
        # scale folds into the S-dot operand only; the dK dot consumes the
        # RAW q (dK = scale · dS^T @ q, scale applied once at accumulation).
        qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        tri = _tri_bias(w)
        mxu = _mxu(k.dtype)
        for j in range(diag_ns):
            k_j = k[j * w:(j + 1) * w, :]
            v_j = v[j * w:(j + 1) * w, :]
            dv_j = jnp.zeros((w, v_j.shape[1]), jnp.float32)
            dk_j = jnp.zeros((w, k_j.shape[1]), jnp.float32)
            n_post = block_q - (j + 1) * w
            for r0, nr, bias_tri in (
                ((j * w, w, tri),)
                + ((((j + 1) * w, n_post, None),) if n_post else ())
            ):
                q_r = q[r0:r0 + nr, :]
                do_r = do[r0:r0 + nr, :]
                s = jax.lax.dot_general(
                    qf[r0:r0 + nr, :], k_j,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mxu,
                )
                if bias_tri is not None:
                    s = s + bias_tri
                p = jnp.exp(s - lse[r0:r0 + nr, :])
                dv_j = dv_j + jax.lax.dot_general(
                    p.astype(v.dtype), do_r.astype(v.dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_mxu(v.dtype),
                )
                dp = jax.lax.dot_general(
                    do_r.astype(v.dtype), v_j,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_mxu(v.dtype),
                )
                ds = p * (dp - delta[r0:r0 + nr, :])
                dk_j = dk_j + jax.lax.dot_general(
                    ds.astype(q.dtype), q_r,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mxu,
                )
            dv_scr[j * w:(j + 1) * w, :] += dv_j
            dk_scr[j * w:(j + 1) * w, :] += scale * dk_j

    def _dkv_rect_piece(k0: int, nk: int, k, v, r0: int, nr: int, bias_tri):
        """dK/dV contribution of q rows [r0, r0+nr) vs KV cols [k0, k0+nk)
        of the resident tile (static indices → lane selects)."""
        mxu = _mxu(k.dtype)
        q_r = q_ref[0, 0][r0:r0 + nr, :]
        qf = (q_r.astype(jnp.float32) * scale).astype(q_r.dtype)
        do_r = do_ref[0, 0][r0:r0 + nr, :].astype(jnp.float32)
        lse_r = lse_ref[0, 0][r0:r0 + nr, :]
        delta_r = delta_ref[0, 0][r0:r0 + nr, :]
        k_c = k[k0:k0 + nk, :]
        v_c = v[k0:k0 + nk, :]
        s = jax.lax.dot_general(
            qf, k_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu,
        )
        if bias_tri is not None:
            s = s + bias_tri
        p = jnp.exp(s - lse_r)
        dv_scr[k0:k0 + nk, :] += jax.lax.dot_general(
            p.astype(v.dtype), do_r.astype(v.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu(v.dtype),
        )
        dp = jax.lax.dot_general(
            do_r.astype(v.dtype), v_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu(v.dtype),
        )
        ds = p * (dp - delta_r)
        dk_scr[k0:k0 + nk, :] += scale * jax.lax.dot_general(
            ds.astype(q_r.dtype), q_r,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu,
        )

    def _do_update_rect_kq(jj: int, full_below: bool):
        # Rectangular causal diagonal, dK/dV orientation (bq == 2·bk,
        # w = bk): the partial q tile at q_start == k_start − jj·w has the
        # w×w triangle on q-row sub-block jj, full visibility for the rows
        # below it (jj == 0 only: q rows [w, 2w) see every col of this KV
        # tile), and nothing above. The triangle is sub-tiled like the
        # square diag path (ws×ws corner + q-row suffix per k sub-block) so
        # the diagonal band costs the square path's 2.25 tile-units, not
        # 3.0 (see _do_update_rect).
        w = block_k
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        ns = diag_ns if diag_ns else 4
        ws = w // ns
        tri = _tri_bias(ws)
        row0 = jj * w
        for j in range(ns):
            k0 = j * ws
            r0 = row0 + j * ws
            _dkv_rect_piece(k0, ws, k, v, r0, ws, tri)
            n_post = w - (j + 1) * ws
            if n_post:
                _dkv_rect_piece(k0, ws, k, v, r0 + ws, n_post, None)
        if full_below:
            _dkv_rect_piece(0, w, k, v, w, w, None)

    masked = causal or window is not None or bool(seq_k % block_k)
    if masked:
        if diag_rect:
            at_diag0 = q_start == k_start

            @pl.when(
                jnp.logical_and(visible, jnp.logical_and(partial, at_diag0))
            )
            def _compute_rect0():
                _do_update_rect_kq(0, True)

            @pl.when(
                jnp.logical_and(
                    visible,
                    jnp.logical_and(partial, jnp.logical_not(at_diag0)),
                )
            )
            def _compute_rect1():
                _do_update_rect_kq(1, False)
        elif diag_ns:
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


def _dbias_kernel(
    *refs,
    scale,
    causal,
    window,
    block_q,
    block_k,
    seq_q,
    seq_k,
    b_inner,          # grid dim order: True → (qi, ki, h, b), else (qi, ki, b, h)
    sum_b,
    sum_h,
    nb,
    nh,
):
    (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref,
     dbias_ref, acc_scr) = refs

    qi = pl.program_id(0)
    ki = pl.program_id(1)
    d3 = pl.program_id(2)
    d4 = pl.program_id(3)
    b, h = (d4, d3) if b_inner else (d3, d4)
    q_start = qi * block_q
    k_start = ki * block_k

    inner = d4
    n_inner = nb if b_inner else nh
    first = inner == 0 if (sum_b or sum_h) else inner >= 0
    last = inner == n_inner - 1 if (sum_b or sum_h) else inner >= 0
    if sum_b and sum_h:
        first = jnp.logical_and(d3 == 0, d4 == 0)
        last = jnp.logical_and(d3 == pl.num_programs(2) - 1,
                               d4 == pl.num_programs(3) - 1)

    @pl.when(first)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    visible, partial = _block_visible(
        q_start, k_start,
        block_q=block_q, block_k=block_k,
        causal=causal, window=window, seq_q=seq_q, seq_k=seq_k,
    )

    @pl.when(visible)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]

        masked = causal or window is not None or bool(seq_k % block_k)
        masked_args = None
        if masked:
            mask = _intra_block_mask(
                q_start, k_start,
                block_q=block_q, block_k=block_k,
                causal=causal, window=window, seq_k=seq_k,
            )
            masked_args = (partial, mask)
        p = _recompute_p(q, k, lse, bias_ref[0, 0], scale=scale,
                         masked_args=masked_args)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu(v.dtype),
        )
        # d bias = dS = P ∘ (dP − δ): bias enters scores additively after
        # the softmax scale, so no scale factor here.
        acc_scr[...] += p * (dp - delta)

    @pl.when(last)
    def _finalize():
        dbias_ref[0, 0] = acc_scr[...]


def flash_attention_bias_grad(
    q, k, v, out, lse, do, bias,
    *,
    causal=False, window=None, scale=None,
    block_sizes: BlockSizes = BlockSizes(),
    interpret: bool = False,
):
    """dL/dbias with broadcast dims reduced in-kernel (a bias of shape
    (1, 1, Sq, Sk) gets its gradient summed over batch and heads in VMEM
    scratch — the [B,H,Sq,Sk] tensor is never materialized)."""
    batch, num_heads, seq_q, head_dim = q.shape
    _, num_kv_heads, seq_k, _ = k.shape
    group = num_heads // num_kv_heads
    if scale is None:
        scale = head_dim**-0.5
    interpret = interpret or jax.default_backend() == "cpu"

    from umfa_tpu.ops.flash_fwd import _choose_block

    block_q = _choose_block(block_sizes.block_q_dq, seq_q, head_dim)
    block_k = _choose_block(block_sizes.block_k_dq, seq_k, head_dim)

    while bias.ndim < 4:
        bias = bias[None]
    bb, bh = bias.shape[0], bias.shape[1]
    assert bias.shape[2] != 1, "q-broadcast bias grad unsupported (expand first)"
    sum_b, sum_h = bb == 1, bh == 1
    b_inner = sum_b and not sum_h  # broadcast dim goes innermost

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    q_pad = _pad_seq(q, block_q, 2)
    k_pad = _pad_seq(k, block_k, 2)
    v_pad = _pad_seq(v, block_k, 2)
    do_pad = _pad_seq(do, block_q, 2)
    lse_pad = _pad_seq(lse, block_q, 2)
    padded_sq = q_pad.shape[2]
    if padded_sq != seq_q:
        pad_rows = jnp.arange(padded_sq) >= seq_q
        lse_pad = jnp.where(pad_rows[None, None, :], -DEFAULT_MASK_VALUE, lse_pad)
    delta_pad = _pad_seq(delta, block_q, 2)
    lse_b = lse_pad[..., None]
    delta_b = delta_pad[..., None]
    bias_pad = _pad_seq(_pad_seq(bias, block_k, 3), block_q, 2)
    padded_sk = k_pad.shape[2]
    nq, nk = padded_sq // block_q, padded_sk // block_k

    if b_inner:
        grid = (nq, nk, num_heads, batch)

        def bsel(qi, ki, d3, d4):
            return d4

        def hsel(qi, ki, d3, d4):
            return d3
    else:
        grid = (nq, nk, batch, num_heads)

        def bsel(qi, ki, d3, d4):
            return d3

        def hsel(qi, ki, d3, d4):
            return d4

    q_spec = pl.BlockSpec(
        (1, 1, block_q, head_dim),
        lambda *i: (bsel(*i), hsel(*i), i[0], 0),
    )
    kv_spec = pl.BlockSpec(
        (1, 1, block_k, head_dim),
        lambda *i: (bsel(*i), hsel(*i) // group, i[1], 0),
    )
    row_spec = pl.BlockSpec(
        (1, 1, block_q, 1),
        lambda *i: (bsel(*i), hsel(*i), i[0], 0),
    )
    bias_spec = pl.BlockSpec(
        (1, 1, block_q, block_k),
        lambda *i: (
            0 if sum_b else bsel(*i),
            0 if sum_h else hsel(*i),
            i[0],
            i[1],
        ),
    )

    dbias = pl.pallas_call(
        functools.partial(
            _dbias_kernel,
            scale=scale, causal=causal, window=window,
            block_q=block_q, block_k=block_k,
            seq_q=seq_q, seq_k=seq_k,
            b_inner=b_inner, sum_b=sum_b, sum_h=sum_h,
            nb=batch, nh=num_heads,
        ),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec,
                  bias_spec],
        out_specs=bias_spec,
        out_shape=jax.ShapeDtypeStruct(
            (bb, bh, padded_sq, padded_sk), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((block_q, block_k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(q_pad, k_pad, v_pad, do_pad, lse_b, delta_b, bias_pad)

    return dbias[:, :, :seq_q, :seq_k]


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "window", "scale", "block_sizes", "interpret", "grad_dtype",
    ),
)
def flash_attention_backward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    out: jax.Array,
    lse: jax.Array,
    do: jax.Array,
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
    """FA2 backward. Returns (dq, dk, dv) in FP32 by default; grad_dtype
    (e.g. bf16 when the training consumer casts anyway) makes the kernels
    EMIT that dtype — halves the gradient HBM writes and deletes the
    separate cast pass. Accumulation stays FP32 in VMEM either way
    (reference invariant, metal_sdpa_backend.cpp:2800-2804: FP32
    *accumulation*; the store rounding equals the consumer's cast).

    GQA (Hq > Hkv): dK/dV per-KV-head gradients are the sum over the query
    group — handled by summing the expanded-head gradients host-side here
    (group dims folded with a reshape, no copies of K/V are made).
    """
    batch, num_heads, seq_q, head_dim = q.shape
    _, num_kv_heads, seq_k, _ = k.shape
    group = num_heads // num_kv_heads
    if scale is None:
        scale = head_dim**-0.5
    interpret = interpret or jax.default_backend() == "cpu"
    # Mosaic has no f16 type: FP16 is storage-only (see flash_fwd).
    if q.dtype == jnp.float16:
        q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    if out.dtype == jnp.float16:
        out = out.astype(jnp.float32)
    if do.dtype == jnp.float16:
        do = do.astype(jnp.float32)

    from umfa_tpu.ops.flash_fwd import _choose_block

    # Compiled BlockMasks fix the tiling (see flash_fwd); otherwise use the
    # tuned q-tile request (r2 v5e sweep: (2048, 1024) beat the old
    # (512, 1024) by 14% on the S=4096 training step). Plain causal requests
    # EQUAL tiles (1024, 1024) instead: every partial tile is then exactly
    # diagonal and the sub-tiled diagonal fast path engages (~37% of the
    # diagonal tiles' MACs/exp deleted at NS=4), which outweighs the extra
    # K/V re-reads of the smaller q-tile (~2-4% of step HBM time at S=4K).
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

    # Rectangular causal diagonal (bq = 2·bk) for the backward (VERDICT r3
    # #7): same gate as the forward (plain causal, default tiles, aligned
    # seqs, no A/B override) — FULL tiles then run at the 2048-row q-tile
    # rate in BOTH passes while the two partial tiles per q tile keep the
    # triangle/underflow trick. fp32 stays on the square path: the rect
    # full-tile p/dp/ds temporaries are (2·bk, bk) f32 (the fwd's measured
    # scoped-vmem exclusion applies at least as hard here).
    # UMFA_DISABLE_RECT_BWD=1 A/Bs the backward independently of the fwd.
    from umfa_tpu.ops.flash_fwd import _rect_mode_ok

    import os as _os

    diag_rect = (
        _rect_mode_ok(
            causal=causal, window=window, has_bias=bias is not None,
            has_map=block_map is not None, has_fetch=fetch_kv is not None,
            default_blocks=block_sizes == BlockSizes(),
            block_k=block_k, seq_q=seq_q, seq_k=seq_k,
        )
        and q.dtype != jnp.float32
        and _os.environ.get("UMFA_DISABLE_RECT_BWD") != "1"
    )
    if diag_rect:
        block_q = 2 * block_k

    # D = rowsum(dO ∘ O) — FP32 per-row statistic (reference's D scratch,
    # MFABridge.swift:3241-3243). A cotangent on LSE folds in exactly here:
    # dL/ds_ij gains g_lse_i · p_ij, i.e. ds = p∘(dp − (D − g_lse)).
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)

    q_pad = _pad_seq(q, block_q, 2)
    k_pad = _pad_seq(k, block_k, 2)
    v_pad = _pad_seq(v, block_k, 2)
    do_pad = _pad_seq(do, block_q, 2)
    padded_sq = q_pad.shape[2]
    padded_sk = k_pad.shape[2]
    num_q_blocks = padded_sq // block_q
    num_k_blocks = padded_sk // block_k

    # Row statistics broadcast across lanes: (B, H, S) -> (B, H, S, LANES).
    # Padded q rows get lse = mask value so exp(s - lse) stays tiny.
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

    has_bias = bias is not None
    bias_meta = None
    if has_bias:
        if bias.ndim == 2:
            bias = bias[None, None]
        elif bias.ndim == 3:
            bias = bias[:, None]
        bq_bcast = bias.shape[2] == 1  # decide BEFORE padding grows the dim
        bias = _pad_seq(bias, block_k, 3)
        if not bq_bcast:
            bias = _pad_seq(bias, block_q, 2)
        bias_meta = (bias.shape[0], bias.shape[1], bq_bcast)

    def clamp_ki(qi, ki):
        """Clamp a KV block index into q-block qi's visible range so
        out-of-range grid steps reuse their neighbour's block and Pallas
        elides the DMA (see flash_fwd)."""
        if not ELIDE_SKIPPED_DMA:
            return ki
        if causal:
            ki = jnp.minimum(ki, (qi * block_q + block_q - 1) // block_k)
        if window is not None:
            left, right = window
            if left >= 0:
                ki = jnp.maximum(ki, jnp.maximum(qi * block_q - left, 0) // block_k)
            if right >= 0:
                ki = jnp.minimum(
                    ki, (qi * block_q + block_q - 1 + right) // block_k
                )
        return ki

    def clamp_qi(ki, qi):
        """Clamp a Q block index into kv-block ki's visible range."""
        if not ELIDE_SKIPPED_DMA:
            return qi
        if causal:
            qi = jnp.maximum(qi, (ki * block_k) // block_q)
        if window is not None:
            left, right = window
            if left >= 0:
                qi = jnp.minimum(
                    qi, (ki * block_k + block_k - 1 + left) // block_q
                )
            if right >= 0:
                qi = jnp.maximum(
                    qi, jnp.maximum(ki * block_k - right, 0) // block_q
                )
        return qi

    def _fetch_idx(fref, b, h, o, inner):
        val = fref[
            b if fref.shape[0] > 1 else 0,
            h if fref.shape[1] > 1 else 0,
            o, inner,
        ]
        return jnp.where(val >= 0, val, -val - 1)

    def specs(order):
        """order: 'qk' for dQ kernel (qi, ki), 'kq' for dK/dV kernel.
        The inner-loop operand indices are clamped into the outer block's
        visible range — statically for causal/window, via the prefetched
        fetch tables for compiled block masks (DMA elision either way)."""
        if order == "qk":
            def qix(b, h, i, j, refs):
                return i
            def kix(b, h, i, j, refs):
                if has_fetch:
                    return _fetch_idx(refs[0], b, h, i, j)
                return clamp_ki(i, j)
        else:
            def qix(b, h, i, j, refs):
                if has_fetch:
                    return _fetch_idx(refs[0], b, h, i, j)
                return clamp_qi(i, j)
            def kix(b, h, i, j, refs):
                return i
        q_spec = pl.BlockSpec(
            (1, 1, block_q, head_dim),
            lambda b, h, i, j, *refs: (b, h, qix(b, h, i, j, refs), 0),
        )
        kv_spec = pl.BlockSpec(
            (1, 1, block_k, head_dim),
            lambda b, h, i, j, *refs: (b, h // group, kix(b, h, i, j, refs), 0),
        )
        row_spec = pl.BlockSpec(
            (1, 1, block_q, 1),
            lambda b, h, i, j, *refs: (b, h, qix(b, h, i, j, refs), 0),
        )
        ins = [q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec]
        if has_bias:
            bb, bh, bq_bcast = bias_meta
            ins.append(
                pl.BlockSpec(
                    (1, 1, 1 if bq_bcast else block_q, block_k),
                    lambda b, h, i, j, *refs: (
                        b if bb > 1 else 0,
                        h if bh > 1 else 0,
                        0 if bq_bcast else qix(b, h, i, j, refs),
                        kix(b, h, i, j, refs),
                    ),
                )
            )
        if has_map:
            ins.append(
                pl.BlockSpec(
                    block_map.shape,
                    lambda b, h, i, j, *refs: (0, 0, 0, 0),
                    memory_space=pltpu.SMEM,
                )
            )
        return ins

    common_args = [q_pad, k_pad, v_pad, do_pad, lse_b, delta_b]
    if has_bias:
        common_args.append(bias)
    has_fetch = (
        block_map is not None and fetch_kv is not None and fetch_q is not None
    )
    if has_fetch:
        assert fetch_kv.shape[2] == num_q_blocks, (fetch_kv.shape, num_q_blocks)
        assert fetch_q.shape[2] == num_k_blocks, (fetch_q.shape, num_k_blocks)
    has_map = block_map is not None and not has_fetch
    if block_map is not None:
        assert block_map.shape[2] == num_q_blocks and (
            block_map.shape[3] == num_k_blocks
        ), (block_map.shape, num_q_blocks, num_k_blocks)
    if has_map:
        common_args.append(block_map)

    from umfa_tpu.ops.flash_fwd import _diag_subtile_count

    diag_ns = 0
    if not has_fetch and not has_map and not diag_rect:
        diag_ns = _diag_subtile_count(
            block_q, block_k, causal, window, seq_k, has_bias,
            prefer_ns=(4, 2),  # bwd: NS=4 measured best (see flash_fwd)
        )

    # ---- dQ pass ----
    dq_kernel = functools.partial(
        _dq_kernel,
        scale=scale, causal=causal, window=window,
        block_q=block_q, block_k=block_k,
        seq_q=seq_q, seq_k=seq_k,
        num_k_blocks=(
            fetch_kv.shape[3] if has_fetch else num_k_blocks
        ),  # finalize at the last (compacted) step
        has_bias=has_bias, has_map=has_map,
        has_fetch=has_fetch,
        diag_ns=diag_ns,
        diag_rect=diag_rect,
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
    dq_scratch = [pltpu.VMEM((block_q, head_dim), jnp.float32)]
    dq_cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=64 * 1024 * 1024,
    )
    if has_fetch:
        dq = pl.pallas_call(
            dq_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=dq_grid,
                in_specs=specs("qk"),
                out_specs=dq_out_spec,
                scratch_shapes=dq_scratch,
            ),
            out_shape=dq_out_shape,
            compiler_params=dq_cparams,
            interpret=interpret,
        )(fetch_kv, *common_args)
    else:
        dq = pl.pallas_call(
            dq_kernel,
            grid=dq_grid,
            in_specs=specs("qk"),
            out_specs=dq_out_spec,
            out_shape=dq_out_shape,
            scratch_shapes=dq_scratch,
            compiler_params=dq_cparams,
            interpret=interpret,
        )(*common_args)

    # ---- dK/dV pass ----
    # With GQA (group > 1) the group reduction happens IN-KERNEL: grid dim 1
    # is the KV head and the inner walk spans (query-head-in-group ×
    # q-blocks-or-compacted-steps), so no per-query-head dK/dV tensors are
    # materialized in HBM — including the compacted-fetch path (the fetch
    # table is looked up per derived query head).
    use_group_reduce = group > 1
    width = fetch_q.shape[3] if has_fetch else num_q_blocks
    if use_group_reduce:
        dkv_inner = group * width
        dkv_heads = num_kv_heads
    else:
        dkv_inner = width
        dkv_heads = num_heads
    dkv_kernel = functools.partial(
        _dkv_kernel,
        scale=scale, causal=causal, window=window,
        block_q=block_q, block_k=block_k,
        seq_q=seq_q, seq_k=seq_k,
        num_q_blocks=dkv_inner,
        has_bias=has_bias, has_map=has_map,
        has_fetch=has_fetch,
        group=group if use_group_reduce else 1,
        nq_logical=width,
        diag_ns=diag_ns,
        diag_rect=diag_rect,
    )
    dkv_grid = (batch, dkv_heads, num_k_blocks, dkv_inner)

    def group_specs():
        """Specs for the in-kernel group-reduction layout: h = KV head,
        inner j = (g, step) with `width` steps per query head (compacted
        steps when fetch tables are in play)."""

        def hq(h, j):
            return h * group + j // width

        def qix(b, h, i, j, refs):
            if has_fetch:
                return _fetch_idx(refs[0], b, hq(h, j), i, j % width)
            return clamp_qi(i, j % width)

        q_spec = pl.BlockSpec(
            (1, 1, block_q, head_dim),
            lambda b, h, i, j, *refs: (
                b, hq(h, j), qix(b, h, i, j, refs), 0
            ),
        )
        kv_spec = pl.BlockSpec(
            (1, 1, block_k, head_dim),
            lambda b, h, i, j, *refs: (b, h, i, 0),
        )
        row_spec = pl.BlockSpec(
            (1, 1, block_q, 1),
            lambda b, h, i, j, *refs: (
                b, hq(h, j), qix(b, h, i, j, refs), 0
            ),
        )
        ins = [q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec]
        if has_bias:
            bb, bh, bq_bcast = bias_meta
            ins.append(
                pl.BlockSpec(
                    (1, 1, 1 if bq_bcast else block_q, block_k),
                    lambda b, h, i, j, *refs: (
                        b if bb > 1 else 0,
                        hq(h, j) if bh > 1 else 0,
                        0 if bq_bcast else qix(b, h, i, j, refs),
                        i,
                    ),
                )
            )
        if has_map:
            ins.append(
                pl.BlockSpec(
                    block_map.shape,
                    lambda b, h, i, j, *refs: (0, 0, 0, 0),
                    memory_space=pltpu.SMEM,
                )
            )
        return ins
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
    ]
    dkv_cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=64 * 1024 * 1024,
    )
    dkv_in_specs = group_specs() if use_group_reduce else specs("kq")
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
        )(fetch_q, *common_args)
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
        )(*common_args)

    dq = dq[:, :, :seq_q]
    dk = dk[:, :, :seq_k]
    dv = dv[:, :, :seq_k]
    return dq, dk, dv
