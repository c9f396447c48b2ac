"""Fused flash-attention forward kernel (Pallas / TPU).

TPU-native re-design of the reference's AttentionKernel forward path
(reference: Sources/MFABridge/MFABridge.swift:1228-1420 and the
metal-flash-attention submodule's generated `attention` kernel — see
SURVEY.md §2.3). Instead of runtime-generated MSL with per-call pipeline
caches, this is a single Pallas kernel parameterized by static config and
cached by jit.

Design:
  * grid = (batch, heads, num_q_blocks, num_kv_blocks); the KV dimension is
    innermost so FP32 accumulators (m, l, acc) persist in VMEM scratch across
    KV steps — the online-softmax recurrence of FlashAttention-2.
  * All softmax statistics and the output accumulator are FP32 regardless of
    input dtype (reference invariant: "FP32 intermediates mandatory",
    README.md:83-85).
  * Causal / sliding-window structure is evaluated per block: fully-masked
    blocks skip all compute via `pl.when` (analogue of the reference's
    block-level early exit), diagonal/edge blocks apply an intra-block mask.
  * Arbitrary additive bias is streamed per block with broadcast-aware index
    maps (B/H broadcast dims never materialized — unlike the reference's
    dense [B,H,Sq,Skv] mask expansion, MFABridge.swift:153-243, which would
    be fatal in HBM at long seq).
  * GQA is expressed in the K/V index maps (head h reads KV head
    h // group_size) — zero-copy, no repeat_interleave (the reference expands
    heads by copy: metal_sdpa_backend.cpp:1694-1702).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Large-but-finite mask value. -inf breaks the online-softmax recurrence
# ((-inf) - (-inf) = NaN), so fully-masked statistics stay finite.
DEFAULT_MASK_VALUE = -1e30
_LANES = 128

# Remap skipped causal/window tiles onto their neighbour's block index so
# Pallas elides the DMA. A/B-able: dynamic index maps can also inhibit
# Mosaic's prefetch pipelining (v5e measurements were within noise).
import os as _os

ELIDE_SKIPPED_DMA = _os.environ.get("UMFA_ELIDE_SKIPPED_DMA", "1") not in (
    "0", "false",
)


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Static tile sizes (role parity: the reference's BlockSizeConfig,
    metal_sdpa_backend.h:63-253 — but tuned for TPU: v5e sweep showed the
    forward kernel goes 7.5 → 68 TFLOP/s moving from 128×128 to large KV
    tiles, which amortize grid-step overhead and keep the MXU fed).

    A default-constructed instance means "auto": the host functions pick
    mask-aware tuned requests (r2 v5e sweep — dense fwd q-tile 2048,
    causal/window 1024; backward q-tiles 2048) before the padding/VMEM
    clamps of `_choose_block`. Any explicitly constructed non-default
    instance is honored as-is."""

    block_q: int = 512
    block_k: int = 2048
    block_q_dq: int = 512
    block_k_dq: int = 1024
    block_q_dkv: int = 512
    block_k_dkv: int = 1024

    def fwd_q_request(self, masked: bool) -> int:
        if self != BlockSizes():
            return self.block_q
        return 1024 if masked else 2048

    def bwd_q_request(self, attr: str) -> int:
        if self != BlockSizes():
            return getattr(self, attr)
        return 2048


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _choose_block(requested: int, seq: int, head_dim: int, vmem_cap_elems=2**18):
    """Pick a tile size ≤ `requested`: clamp to the (128-rounded) sequence,
    keep per-operand tiles under ~vmem_cap_elems elements, and avoid
    pathological padding — seq 4608 with 2048-tiles pads to 6144 (33% wasted
    compute); preferring a 128-multiple tile with ≤ ~7% padding recovers it
    (v5e: 91 → ~130 TFLOP/s on FLUX's 1024px geometry)."""
    cap = min(requested, _round_up(max(seq, 1), 128))
    while cap > 128 and cap * head_dim > vmem_cap_elems:
        cap //= 2
    if seq <= cap:
        return cap
    best = cap
    b = cap
    while b >= 256:
        waste = (_round_up(seq, b) - seq) / seq
        if waste <= 0.07:
            return b
        b -= 128
        if b < cap // 2:
            break
    return best


def _right_bound(causal: bool, window) -> Optional[int]:
    """How far right of the diagonal a row can see (None = unbounded)."""
    r = None
    if causal:
        r = 0
    if window is not None and window[1] >= 0:
        r = window[1] if r is None else min(r, window[1])
    return r


def _block_visible(
    q_start, k_start, *, block_q, block_k, causal, window, seq_q, seq_k
):
    """Whether block (q_start, k_start) has ANY visible entry, and whether it
    is only partially visible (needs an intra-block mask).

    Returns (visible: traced bool, partial: traced bool).
    `window` is (left, right) with -1 meaning unbounded on that side.
    """
    q_last = q_start + block_q - 1
    k_last = k_start + block_k - 1

    visible = jnp.bool_(True)
    partial = jnp.bool_(False)

    if causal:
        # visible iff some (q, k) with k <= q:  k_start <= q_last
        visible = jnp.logical_and(visible, k_start <= q_last)
        # fully visible iff k_last <= q_start
        partial = jnp.logical_or(partial, k_last > q_start)
    if window is not None:
        left, right = window
        if left >= 0:
            # visible iff some k >= q - left: k_last >= q_start - left
            visible = jnp.logical_and(visible, k_last >= q_start - left)
            partial = jnp.logical_or(partial, k_start < q_last - left)
        if right >= 0:
            visible = jnp.logical_and(visible, k_start <= q_last + right)
            partial = jnp.logical_or(partial, k_last > q_start + right)
    if seq_k % block_k != 0:
        # KV tail block padding must be masked out.
        tail = (seq_k // block_k) * block_k
        partial = jnp.logical_or(partial, k_start >= tail)
    return visible, partial


def _intra_block_mask(
    q_start, k_start, *, block_q, block_k, causal, window, seq_k
):
    """FP32-free boolean visibility mask of shape (block_q, block_k)."""
    q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_ids = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = k_ids < seq_k  # KV tail padding
    if causal:
        mask = jnp.logical_and(mask, k_ids <= q_ids)
    if window is not None:
        left, right = window
        if left >= 0:
            mask = jnp.logical_and(mask, k_ids >= q_ids - left)
        if right >= 0:
            mask = jnp.logical_and(mask, k_ids <= q_ids + right)
    return mask


def _diag_subtile_count(block_q: int, block_k: int, causal: bool, window,
                        seq_k: int, has_bias: bool,
                        prefer_ns=(2, 4)) -> int:
    """How many q-row sub-blocks the causal-diagonal fast path uses (0 = path
    disabled). Preconditions for the path: with bq == bk and the KV tail
    aligned, every PARTIAL causal tile is EXACTLY diagonal (k_start ==
    q_start), so sub-block i of the q rows attends only the column prefix
    [0, (i+1)·w) — the matmul, exp, and stat updates all shrink to ~(NS+1)/2NS
    of the full tile, and the only mask needed is one shared w×w triangle.

    NS choice is direction-specific (v5e A/B, fresh process each): the
    FORWARD wants NS=2 (1.366 ms vs 1.455 at NS=4 / 1.517 no-diag, S=4K —
    the finer sub-block matmuls cost more than the extra exp they skip);
    the BACKWARD wants NS=4 (1.227 vs 1.243 NS=2 / 1.306 no-diag) — its
    diagonal work is exp/VPU-heavier, so finer splits still pay."""
    if os.environ.get("UMFA_DISABLE_DIAG") == "1":  # perf A/B escape hatch
        return 0
    if not causal or window is not None or has_bias:
        return 0
    if block_q != block_k or seq_k % block_k != 0:
        return 0
    ns_env = os.environ.get("UMFA_DIAG_NS")
    if ns_env:
        # A/B knob validation (ADVICE r3): a typo'd value must not silently
        # measure the no-diag path while the operator believes they measured
        # NS=n — exactly the contamination class the measurement notes warn
        # about. Non-integers raise; integers that disable the path warn.
        try:
            ns_req = int(ns_env)
        except ValueError as e:
            raise ValueError(
                f"UMFA_DIAG_NS={ns_env!r} is not an integer — the diagonal "
                "A/B knob takes the sub-block count (e.g. 2 or 4)"
            ) from e
        candidates = (ns_req,)
    else:
        candidates = prefer_ns
    for ns in candidates:
        if ns > 0 and block_q % ns == 0 and block_q // ns >= 128:
            return ns
    if ns_env:
        import warnings

        warnings.warn(
            f"UMFA_DIAG_NS={ns_env} disables the diagonal path at "
            f"block_q={block_q} (must divide it with >=128-row sub-blocks) "
            "— this A/B run measures the NO-diag configuration",
            stacklevel=2,
        )
    return 0


def _rect_sub_update(m_scr, l_scr, acc_scr, *, row0, w, d, s, v_t,
                     psum_col, mxu):
    """Shared (m, l, acc) online-softmax update for one w-row sub-block of
    the rectangular diagonal mode (used by the dense AND fused-quant rect
    kernels — ADVICE r3: keep the stat algebra in ONE place). `s` is the
    finished score strip (triangle bias already added when applicable);
    `psum_col` is the ones-column index in the P·V output (None = VPU
    row-sum reduce)."""
    m_prev = m_scr[pl.ds(row0, w), 0:1]
    l_prev = l_scr[pl.ds(row0, w), 0:1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    pv = jax.lax.dot_general(
        p.astype(v_t.dtype), v_t,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu,
    )
    psum = (
        pv[:, psum_col:psum_col + 1] if psum_col is not None
        else jnp.sum(p, axis=-1, keepdims=True)
    )
    l_new = alpha * l_prev + psum
    m_scr[pl.ds(row0, w), :] = jnp.broadcast_to(m_new, (w, m_scr.shape[1]))
    l_scr[pl.ds(row0, w), :] = jnp.broadcast_to(l_new, (w, l_scr.shape[1]))
    acc_scr[pl.ds(row0, w), :] = (
        acc_scr[pl.ds(row0, w), :] * alpha + pv[:, :d]
    )


def _rect_mode_ok(
    *, causal, window, has_bias, has_map, has_fetch, default_blocks: bool,
    block_k: int, seq_q: int, seq_k: int,
) -> bool:
    """Shared gate for the rectangular causal diagonal mode (bq = 2·bk):
    plain causal at DEFAULT tiles, aligned KV tail, seq_q divisible by the
    doubled q-tile, and no A/B override. Callers add their own extra gates
    (dense fwd: fp32 scoped-vmem exclusion; fused-quant: pv_int8 wants the
    square prefix walk). Exposed for tests to assert engagement rather than
    silently measuring a fallback (ADVICE r3)."""
    return (
        causal and window is None and not has_bias and not has_map
        and not has_fetch
        and default_blocks
        and seq_k % block_k == 0
        and seq_q % (2 * block_k) == 0
        and os.environ.get("UMFA_DISABLE_DIAG") != "1"
        and os.environ.get("UMFA_DISABLE_RECT") != "1"
        and os.environ.get("UMFA_DIAG_NS") is None
    )


def _rope_rotate_block(x, cos_t, sin_t):
    """In-register RoPE rotation, rotate-half convention: the feature pairs
    are (x_i, x_{i+D/2}), so both halves are CONTIGUOUS lane slices —
    Mosaic-friendly (a stride-2 interleaved lane gather is not). cos_t and
    sin_t are full-width (rows, D): the (rows, D/2) angle tables duplicated
    along lanes by the host. FP32 math (rotation feeds the FP32 softmax
    scale fold anyway)."""
    h = x.shape[1] // 2
    rot = jnp.concatenate([-x[:, h:], x[:, :h]], axis=1)
    return x * cos_t + rot * sin_t


def _fwd_kernel(
    # refs (bias_ref only present when has_bias)
    *refs,
    scale: float,
    causal: bool,
    window,
    block_q: int,
    block_k: int,
    seq_q: int,
    seq_k: int,
    num_k_blocks: int,
    has_bias: bool,
    has_map: bool,
    has_fetch: bool,
    has_rope: bool,
    kv_cache: bool,
    group: int,
    vc_width: int,
    diag_ns: int,
    diag_rect: bool,
    out_dtype,
):
    refs = list(refs)
    fetch_ref = None
    if has_fetch:
        # Scalar-prefetch operand comes first (PrefetchScalarGridSpec).
        fetch_ref = refs.pop(0)
    q_ref, k_ref, v_ref = refs[:3]
    idx = 3
    bias_ref = map_ref = None
    if has_bias:
        bias_ref = refs[idx]
        idx += 1
    if has_map:
        map_ref = refs[idx]
        idx += 1
    cq_ref = sq_ref = ck_ref = sk_ref = None
    if has_rope:
        # Fused RoPE: angle-table blocks ride the SAME index maps as Q and
        # K (incl. the cache-fill aliasing), so rotated Q/K never exist in
        # HBM at all (reference: rope_instream route,
        # examples/pytorch-custom-op-ffi/src/metal_sdpa_backend.cpp:2883-3133).
        cq_ref, sq_ref, ck_ref, sk_ref = refs[idx:idx + 4]
        idx += 4
    o_ref, lse_ref, m_scr, l_scr, acc_scr, q_scr = refs[idx:idx + 6]
    idx += 6
    kcache = vcache = None
    if kv_cache:
        kcache, vcache = refs[idx:idx + 2]

    qi = pl.program_id(2)
    ki = pl.program_id(3)  # compacted step index when has_fetch
    q_start = qi * block_q
    if fetch_ref is not None:
        # Compacted KV walk: the prefetched table holds the step's actual
        # tile id (negative = padding, encoded as -(last_visible+1) so the
        # index map aliases the previous tile and its DMA is elided).
        b = pl.program_id(0)
        h = pl.program_id(1)
        fid_raw = fetch_ref[
            b if fetch_ref.shape[0] > 1 else 0,
            h if fetch_ref.shape[1] > 1 else 0,
            qi,
            ki,
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
        # Softmax scale folded into Q once per q-block: the per-step
        # `s * scale` is a full VPU pass over the (block_q, block_k) score
        # tile that Mosaic does not fuse into the exp — measured ~0.5 ms of
        # the flux-geometry forward (one tile pass ≈ 0.8 µs × 648 steps).
        qf = q_ref[0, 0].astype(jnp.float32)
        if has_rope:
            qf = _rope_rotate_block(qf, cq_ref[...], sq_ref[...])
        q_scr[...] = (qf * scale).astype(q_scr.dtype)

    visible, partial = _block_visible(
        q_start,
        k_start,
        block_q=block_q,
        block_k=block_k,
        causal=causal,
        window=window,
        seq_q=seq_q,
        seq_k=seq_k,
    )
    if fetch_ref is not None:
        visible = jnp.logical_and(visible, fid_raw >= 0)
    elif map_ref is not None:
        # Compiled block-sparse structure: 0 = skip tile entirely.
        b = pl.program_id(0)
        h = pl.program_id(1)
        typ = map_ref[
            b if map_ref.shape[0] > 1 else 0,
            h if map_ref.shape[1] > 1 else 0,
            qi,
            ki,
        ]
        visible = jnp.logical_and(visible, typ > 0)

    if kv_cache:
        # Persistent K/V VMEM cache: each tile is DMA'd from HBM exactly
        # once per (batch, kv-head) — at the FIRST q-block that can see it —
        # and every later q-block reads VMEM. The HBM index maps (host-side
        # `_last_filled`) alias all other grid steps to the tile the buffer
        # already holds, so their DMAs are elided; non-leader GQA heads
        # freeze on the last tile and re-read nothing. This deletes the
        # (num_q_blocks − 1)× K/V HBM re-read of the streaming layout
        # (~30% of runtime at D=128 FLUX geometry; measured r2).
        head_dim = q_ref.shape[-1]
        rb = _right_bound(causal, window)
        if rb is None:
            first_qi = 0
        else:
            first_qi = jnp.maximum(ki * block_k - rb, 0) // block_q
        h = pl.program_id(1)
        fill = jnp.logical_and(qi == first_qi, h % group == 0)

        @pl.when(fill)
        def _fill_kv_cache():
            kt = k_ref[0, 0]
            if has_rope:
                # K rotates once per tile at cache fill (leader head only);
                # every later q-block reads the rotated VMEM rows.
                kt = _rope_rotate_block(
                    kt.astype(jnp.float32), ck_ref[...], sk_ref[...]
                ).astype(kt.dtype)
            kcache[pl.ds(k_start, block_k), :] = kt
            vt = v_ref[0, 0]
            if vc_width > head_dim:
                # Ones column (row-sum rides the P·V matmul) + zero padding
                # to the lane-aligned cache width, built once at fill time
                # instead of per inner step.
                cols = [vt, jnp.ones((block_k, 1), vt.dtype)]
                pad_w = vc_width - head_dim - 1
                if pad_w:
                    cols.append(jnp.zeros((block_k, pad_w), vt.dtype))
                vt = jnp.concatenate(cols, axis=1)
            vcache[pl.ds(k_start, block_k), :] = vt

    def _do_update(apply_mask: bool):
        q = q_scr[...]  # (block_q, d), softmax scale pre-folded
        if kv_cache:
            k = kcache[pl.ds(k_start, block_k), :]
        else:
            k = k_ref[0, 0]  # (block_k, d)

        # QK^T on the MXU, FP32 accumulation. FP32 inputs force HIGHEST
        # precision (6-pass bf16 emulation) to hold the reference's 1e-5
        # FP32 tolerance; bf16 inputs use the native single-pass path.
        mxu = (
            jax.lax.Precision.HIGHEST
            if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu,
        )
        if bias_ref is not None:
            s = s + bias_ref[0, 0].astype(jnp.float32)

        if apply_mask:
            mask = _intra_block_mask(
                q_start,
                k_start,
                block_q=block_q,
                block_k=block_k,
                causal=causal,
                window=window,
                seq_k=seq_k,
            )
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[:, 0:1]  # (block_q, 1)
        l_prev = l_scr[:, 0:1]

        m_cur = jnp.max(s, axis=-1, keepdims=True)  # (block_q, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # (block_q, block_k) FP32
        if apply_mask:
            # Rows fully masked in this block would otherwise get p = exp(0).
            p = jnp.where(mask, p, 0.0)

        d = q.shape[1]
        if kv_cache:
            # Cache rows already carry the ones column + lane padding.
            v = vcache[pl.ds(k_start, block_k), :]
            ones_col = vc_width > d
        else:
            v = v_ref[0, 0]
            ones_col = d < _LANES
            if ones_col:
                # Row-sum rides the MXU: a ones column appended to V makes
                # the P·V matmul emit sum_j(p) in column d — at d < 128
                # those output lanes are padding anyway, and it deletes the
                # per-step VPU row-sum reduce (1 op per score element).
                # Summing the SAME (possibly bf16-rounded) p the product
                # uses keeps out exactly normalized in the weights actually
                # applied.
                v = jnp.concatenate(
                    [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1
                )
        pb = p.astype(v.dtype)
        pv = jax.lax.dot_general(
            pb,
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu,
        )
        if ones_col:
            psum = pv[:, d:d + 1]
            pv = pv[:, :d]
        else:
            psum = jnp.sum(p, axis=-1, keepdims=True)
        l_new = alpha * l_prev + psum

        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)
        acc_scr[...] = acc_scr[...] * alpha + pv

    def _do_update_diag():
        # Causal diagonal tile (k_start == q_start — the ONLY partial tile
        # when bq == bk, no window, aligned KV tail): q rows go in diag_ns
        # sub-blocks of w rows; sub-block i attends columns [0, (i+1)·w)
        # only, so the fully-masked column suffix is never multiplied,
        # exp'd, or masked — ~(NS+1)/2NS of the full tile's MACs/exp at
        # NS=4 (62.5%). The w×w triangular corner is the same for every i
        # (and every diagonal tile): built once per tile at 1/NS² the full
        # mask cost and applied as a bias ADD; exp underflows masked lanes
        # to exact 0 and every diagonal row has >= 1 visible column, so the
        # where(s)/where(p) passes vanish entirely. This is the sub-tiled
        # diagonal lever (VERDICT r2 next #2; reference anchor: the GLUON
        # subtiled-softmax optimization, GLUON_OPTIMIZATIONS_SUMMARY.md).
        w = block_q // diag_ns
        d = q_scr.shape[1]
        mxu = (
            jax.lax.Precision.HIGHEST
            if q_scr.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )

        def k_rows(start, n):
            if kv_cache:
                return kcache[pl.ds(k_start + start, n), :]
            return k_ref[0, 0, pl.ds(start, n), :]

        def v_rows(start, n):
            if kv_cache:
                return vcache[pl.ds(k_start + start, n), :]
            return v_ref[0, 0, pl.ds(start, n), :]

        tri = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
            > jax.lax.broadcasted_iota(jnp.int32, (w, w), 0),
            DEFAULT_MASK_VALUE,
            0.0,
        )
        for i in range(diag_ns):
            q_i = q_scr[pl.ds(i * w, w), :]
            n_pre = i * w
            s_diag = jax.lax.dot_general(
                q_i, k_rows(n_pre, w),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu,
            ) + tri
            m_cur = jnp.max(s_diag, axis=-1, keepdims=True)
            if n_pre:
                s_pre = jax.lax.dot_general(
                    q_i, k_rows(0, n_pre),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mxu,
                )
                m_cur = jnp.maximum(
                    m_cur, jnp.max(s_pre, axis=-1, keepdims=True)
                )
            m_prev = m_scr[pl.ds(i * w, w), 0:1]
            l_prev = l_scr[pl.ds(i * w, w), 0:1]
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p_diag = jnp.exp(s_diag - m_new)
            v_diag = v_rows(n_pre, w)
            pb_diag = p_diag.astype(v_diag.dtype)
            pv = jax.lax.dot_general(
                pb_diag, v_diag,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu,
            )
            # Row-sum: from the cache's ones column when present (the P·V
            # matmul emitted it in column d), else a VPU reduce.
            ones_from_cache = kv_cache and vc_width > d
            psum_vpu = None
            if not ones_from_cache:
                psum_vpu = jnp.sum(p_diag, axis=-1, keepdims=True)
            if n_pre:
                p_pre = jnp.exp(s_pre - m_new)
                v_pre = v_rows(0, n_pre)
                pv = pv + jax.lax.dot_general(
                    p_pre.astype(v_pre.dtype), v_pre,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mxu,
                )
                if psum_vpu is not None:
                    psum_vpu = psum_vpu + jnp.sum(
                        p_pre, axis=-1, keepdims=True
                    )
            psum = pv[:, d:d + 1] if ones_from_cache else psum_vpu
            l_new = alpha * l_prev + psum
            m_scr[pl.ds(i * w, w), :] = jnp.broadcast_to(
                m_new, (w, m_scr.shape[1])
            )
            l_scr[pl.ds(i * w, w), :] = jnp.broadcast_to(
                l_new, (w, l_scr.shape[1])
            )
            acc_scr[pl.ds(i * w, w), :] = (
                acc_scr[pl.ds(i * w, w), :] * alpha + pv[:, :d]
            )

    def _do_update_rect(jj: int, full_below: bool):
        # Rectangular causal diagonal (bq == 2·bk, w = bk): the partial tile
        # at k_start == q_start + jj·w has a w×w triangle on q sub-block jj
        # (rows [jj·w, (jj+1)·w)), full visibility for the rows below it
        # (jj == 0 only), and no visibility above — those rows' stats are
        # simply not touched. Same shared-triangle/underflow-to-zero trick
        # as _do_update_diag, but FULL tiles run at the 2·bk q-tile rate
        # (dense@1024² measured 16% slower than dense@2048² on v5e — the
        # square path's equal-tile requirement taxed every full tile).
        w = block_k
        d = q_scr.shape[1]
        mxu = (
            jax.lax.Precision.HIGHEST
            if q_scr.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        if kv_cache:
            k_t = kcache[pl.ds(k_start, w), :]
            v_t = vcache[pl.ds(k_start, w), :]
        else:
            k_t = k_ref[0, 0]
            v_t = v_ref[0, 0]
        psum_col = d if (kv_cache and vc_width > d) else None

        def sub_update(row0: int, s):
            _rect_sub_update(
                m_scr, l_scr, acc_scr, row0=row0, w=w, d=d, s=s, v_t=v_t,
                psum_col=psum_col, mxu=mxu,
            )

        tri = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
            > jax.lax.broadcasted_iota(jnp.int32, (w, w), 0),
            DEFAULT_MASK_VALUE,
            0.0,
        )
        row0 = jj * w
        s_tri = jax.lax.dot_general(
            q_scr[pl.ds(row0, w), :], k_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu,
        ) + tri
        sub_update(row0, s_tri)
        if full_below:
            s_full = jax.lax.dot_general(
                q_scr[pl.ds(w, w), :], k_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu,
            )
            sub_update(w, s_full)

    masked = causal or window is not None or bool(seq_k % block_k)
    if masked:
        # Runtime split: interior (fully-visible) tiles skip all VPU mask
        # work — iota, compares, selects on a (block_q, block_k) tile — which
        # is pure overhead on the ~60% of causal tiles that are not on the
        # diagonal (VERDICT r1: causal at ~65% of its visible-tile ceiling).
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
        # Fully-masked rows have l == 0; emit 0 output and -inf-free LSE.
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(out_dtype)
        lse = jnp.where(l == 0.0, DEFAULT_MASK_VALUE, m + jnp.log(l_safe))
        # Column layout (B, H, S, 1): 128x fewer HBM bytes than the old
        # (B, H, S, 128) lane broadcast (VERDICT r1 #9); the (block_q, 1)
        # block is tiling-legal (last dim equals the array dim) and needs no
        # in-kernel relayout (Mosaic rejects the (block_q,1)->(sub,128)
        # shape cast here).
        lse_ref[0, 0] = lse


def _pad_seq(x, block, axis):
    seq = x.shape[axis]
    rem = seq % block
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, block - rem)
    return jnp.pad(x, pad)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal",
        "window",
        "scale",
        "block_sizes",
        "out_dtype",
        "interpret",
        "debug",
    ),
)
def flash_attention_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    block_map: Optional[jax.Array] = None,
    fetch_ids: Optional[jax.Array] = None,
    *,
    causal: bool = False,
    window: Optional[tuple] = None,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    out_dtype=None,
    interpret: bool = False,
    debug: bool = False,
    rope_cos: Optional[jax.Array] = None,
    rope_sin: Optional[jax.Array] = None,
):
    """Fused flash attention forward with LSE.

    Args:
      q: (B, Hq, Sq, D)
      k, v: (B, Hkv, Sk, D); Hq must be a multiple of Hkv (GQA).
      bias: additive bias broadcastable to (B, Hq, Sq, Sk); leading dims may
        be 1 and are NOT materialized.
      causal: causal masking flag.
      window: optional (left, right) sliding window; -1 = unbounded side.
      scale: softmax scale (default 1/sqrt(D)).
      rope_cos/rope_sin: optional (S >= max(Sq, Sk), D/2) RoPE angle tables.
        When given, Q and K are rotated IN-KERNEL (rotate-half convention):
        Q per q-block at load, K once per tile at cache fill — rotated Q/K
        never exist in HBM. Requires the persistent-KV-cache layout; calls
        that fall to the streaming layout (block masks, compacted walks,
        cross-attention with causal/window, tiny/huge shapes) rotate in XLA
        instead — same values, one extra HBM round trip.

    Returns:
      (out (B, Hq, Sq, D) in out_dtype (default q.dtype), lse (B, Hq, Sq) FP32)
    """
    batch, num_heads, seq_q, head_dim = q.shape
    _, num_kv_heads, seq_k, _ = k.shape
    assert num_heads % num_kv_heads == 0, (num_heads, num_kv_heads)
    group = num_heads // num_kv_heads
    # Pallas TPU lowering is unavailable on CPU (tests, multi-chip dry runs):
    # fall back to the interpreter automatically. Static per-process choice.
    interpret = interpret or jax.default_backend() == "cpu"
    # Mosaic has no f16 type: FP16 is storage-only — compute in FP32 (the
    # intermediates are FP32 anyway) and cast the output back.
    fp16_out = (out_dtype is None and q.dtype == jnp.float16) or (
        out_dtype is not None and jnp.dtype(out_dtype) == jnp.float16
    )
    if q.dtype == jnp.float16:
        q = q.astype(jnp.float32)
    if k.dtype == jnp.float16:
        k = k.astype(jnp.float32)
        v = v.astype(jnp.float32)
    if fp16_out:
        out_dtype = jnp.float32
    if scale is None:
        scale = head_dim**-0.5
    if out_dtype is None:
        out_dtype = q.dtype

    # Compiled BlockMasks fix the tiling (make_block_mask uses the raw
    # attrs); the tuned q-tile requests apply to mask-free structure only.
    block_q = _choose_block(
        block_sizes.block_q
        if block_map is not None
        else block_sizes.fwd_q_request(causal or window is not None),
        seq_q, head_dim,
    )
    kv_req = block_sizes.block_k
    if (causal or window is not None) and block_map is None:
        # Finer KV tiles let more fully-masked blocks skip (v5e: causal
        # 2.05 → 1.83 ms at seq 4K moving 2048 → 1024). Skipped when a
        # compiled BlockMask dictates the tiling. Clamp BEFORE the padding-
        # avoidance sweep: clamping after it broke alignment at seq 4608
        # (sweep picked 1536, post-clamp 1024 pads to 5120 and kills the
        # diagonal path — measured causal == dense there, 1.75 ms).
        kv_req = min(kv_req, 1024)
    block_k = _choose_block(kv_req, seq_k, head_dim)

    # Rectangular diagonal mode (plain causal, default tiles): bq = 2·bk.
    # The two partial tiles per q-tile split at the diagonal — a shared
    # w×w triangle on one q half, one unmasked w-row update on the other —
    # while FULL tiles run at the 2·bk q-tile rate. Motivation (v5e,
    # fresh-process): dense@1024² is 16% slower than dense@2048², so the
    # square diag path's equal-tile requirement taxes every full tile;
    # this keeps the diagonal savings AND the big-tile rate.
    diag_rect = _rect_mode_ok(
        causal=causal, window=window, has_bias=bias is not None,
        has_map=block_map is not None, has_fetch=fetch_ids is not None,
        default_blocks=block_sizes == BlockSizes(),
        block_k=block_k, seq_q=seq_q, seq_k=seq_k,
        # fp32 operands double every scoped buffer (q_scr, caches, plus the
        # w×w f32 triangle/score temporaries) — 22.8M > the 16M scoped-vmem
        # limit at bq=2048 (measured Mosaic OOM); fp32 keeps the square
        # diag path, which carries the accuracy story anyway.
    ) and q.dtype != jnp.float32
    if diag_rect:
        block_q = 2 * block_k

    q_pad = _pad_seq(q, block_q, 2)
    k_pad = _pad_seq(k, block_k, 2)
    v_pad = _pad_seq(v, block_k, 2)
    padded_sq = q_pad.shape[2]
    padded_sk = k_pad.shape[2]
    num_q_blocks = padded_sq // block_q
    num_k_blocks = padded_sk // block_k

    has_fetch = block_map is not None and fetch_ids is not None
    # Compacted KV walk: the inner grid dimension shrinks to the mask's max
    # visible tile count (a 1/8-dense mask iterates 8× fewer steps).
    num_steps = fetch_ids.shape[3] if has_fetch else num_k_blocks
    grid = (batch, num_heads, num_q_blocks, num_steps)

    # Persistent K/V VMEM cache (see _fwd_kernel): worthwhile whenever more
    # than one q-block would re-read K/V from HBM and the cache fits the
    # VMEM budget. Block-sparse walks keep the streaming layout (their
    # compacted grid already touches each tile at most once per q-block),
    # and causal/window fill schedules assume self-attention geometry.
    rb = _right_bound(causal, window)
    isz = jnp.dtype(k.dtype).itemsize
    ones_col = head_dim < _LANES
    vc_width = _round_up(head_dim + 1, _LANES) if ones_col else head_dim
    cache_bytes = padded_sk * (head_dim + vc_width) * isz
    use_kv_cache = (
        not has_fetch
        and block_map is None
        and num_q_blocks > 1
        and cache_bytes <= 16 * 2**20
        and not (rb is not None and seq_q != seq_k)
        and _os.environ.get("UMFA_DISABLE_KV_CACHE", "0") != "1"
    )
    has_rope = rope_cos is not None
    if has_rope:
        assert rope_sin is not None and head_dim % 2 == 0
        assert rope_cos.shape[0] >= max(seq_q, seq_k), (
            rope_cos.shape, seq_q, seq_k
        )

        def _tab(t, rows):
            # Full-width (rows, D) table: the (S, D/2) angles duplicated
            # along lanes (rotate-half pairs features i and i + D/2), rows
            # zero-padded to the padded sequence (padded rows are masked or
            # sliced off downstream either way).
            t = jnp.concatenate([t, t], axis=-1).astype(jnp.float32)
            if t.shape[0] < rows:
                t = jnp.pad(t, ((0, rows - t.shape[0]), (0, 0)))
            return t[:rows]

        if use_kv_cache:
            cq_tab = _tab(rope_cos, padded_sq)
            sq_tab = _tab(rope_sin, padded_sq)
            ck_tab = _tab(rope_cos, padded_sk)
            sk_tab = _tab(rope_sin, padded_sk)
        else:
            # Streaming layout has no single fill point for K — rotate in
            # XLA (same rotate-half values, one extra HBM round trip).
            def _rot_xla(x, rows):
                c = _tab(rope_cos, rows)[None, None]
                s = _tab(rope_sin, rows)[None, None]
                xf = x.astype(jnp.float32)
                h2 = head_dim // 2
                rot = jnp.concatenate(
                    [-xf[..., h2:], xf[..., :h2]], axis=-1
                )
                return (xf * c + rot * s).astype(x.dtype)

            q_pad = _rot_xla(q_pad, padded_sq)
            k_pad = _rot_xla(k_pad, padded_sk)
            has_rope = False
    if _os.environ.get("UMFA_DEBUG", "0") == "1":
        print(
            f"[umfa] fwd S={seq_q}/{seq_k} D={head_dim} blocks="
            f"({block_q},{block_k}) kv_cache={use_kv_cache} "
            f"cache_bytes={cache_bytes} rope_fused={has_rope}"
        )

    def _ki_eff(b, h, qi, ki, refs):
        """Effective KV tile for this grid step: decoded from the prefetched
        compacted table when available (padding encodes the previous tile →
        DMA elided), else the static causal/window clamp."""
        if has_fetch:
            fref = refs[0]
            kk = fref[
                b if fref.shape[0] > 1 else 0,
                h if fref.shape[1] > 1 else 0,
                qi,
                ki,
            ]
            return jnp.where(kk >= 0, kk, -kk - 1)
        return clamp_ki(qi, ki)

    def clamp_ki(qi, ki):
        """Clamp the KV block index into this q-block's visible range.
        Out-of-range steps then map to the same block as their neighbour, so
        Pallas elides the DMA — skipped tiles cost neither compute (pl.when)
        nor bandwidth."""
        if not ELIDE_SKIPPED_DMA:
            return ki
        if causal:
            last_vis = (qi * block_q + block_q - 1) // block_k
            ki = jnp.minimum(ki, last_vis)
        if window is not None:
            left, right = window
            if left >= 0:
                first_vis = jnp.maximum(qi * block_q - left, 0) // block_k
                ki = jnp.maximum(ki, first_vis)
            if right >= 0:
                last_vis = (qi * block_q + block_q - 1 + right) // block_k
                ki = jnp.minimum(ki, jnp.maximum(last_vis, 0))
        return ki

    def _last_filled(qi, ki):
        """Largest tile already cache-filled at step (qi, ki): the K/V HBM
        index maps follow it so the fetch happens exactly on first touch and
        every other step's DMA is elided (index unchanged)."""
        if rb is None:
            return jnp.where(qi > 0, num_k_blocks - 1, ki)
        a = (qi * block_q - 1 + rb) // block_k
        bmax = ((qi + 1) * block_q - 1 + rb) // block_k
        t = jnp.maximum(a, jnp.minimum(ki, bmax))
        return jnp.clip(t, 0, num_k_blocks - 1)

    def _cached_kv_idx(b, h, qi, ki):
        # Non-leader GQA heads never read the HBM ref (the cache carries the
        # group): freeze their index on the last tile so no DMA refires.
        t = jnp.where(h % group == 0, _last_filled(qi, ki), num_k_blocks - 1)
        return (b, h // group, t, 0)

    q_spec = pl.BlockSpec(
        (1, 1, block_q, head_dim), lambda b, h, qi, ki, *refs: (b, h, qi, 0)
    )
    kv_spec = pl.BlockSpec(
        (1, 1, block_k, head_dim),
        (lambda b, h, qi, ki, *refs: _cached_kv_idx(b, h, qi, ki))
        if use_kv_cache
        else lambda b, h, qi, ki, *refs, group=group: (
            b, h // group, _ki_eff(b, h, qi, ki, refs), 0
        ),
    )
    in_specs = [q_spec, kv_spec, kv_spec]
    args = [q_pad, k_pad, v_pad]

    has_bias = bias is not None
    if has_bias:
        if bias.ndim == 2:
            bias = bias[None, None]
        elif bias.ndim == 3:
            bias = bias[:, None]
        assert bias.ndim == 4
        bb, bh = bias.shape[0], bias.shape[1]
        assert bb in (1, batch) and bh in (1, num_heads), bias.shape
        assert bias.shape[2] in (1, seq_q) and bias.shape[3] == seq_k, bias.shape
        bq_bcast = bias.shape[2] == 1  # decide BEFORE padding grows the dim
        bias = _pad_seq(bias, block_k, 3)
        if not bq_bcast:
            bias = _pad_seq(bias, block_q, 2)
        bias_spec = pl.BlockSpec(
            (1, 1, 1 if bq_bcast else block_q, block_k),
            lambda b, h, qi, ki, *refs, bb=bb, bh=bh, bq=bq_bcast: (
                b if bb > 1 else 0,
                h if bh > 1 else 0,
                0 if bq else qi,
                _ki_eff(b, h, qi, ki, refs),
            ),
        )
        in_specs.append(bias_spec)
        args.append(bias)

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
    if has_map:
        in_specs.append(
            pl.BlockSpec(
                block_map.shape,
                lambda b, h, qi, ki, *refs: (0, 0, 0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        args.append(block_map)

    if has_rope:
        # Angle-table blocks ride the same index maps as Q and K so their
        # DMAs elide/fire in lockstep with the operands they rotate.
        rq_spec = pl.BlockSpec(
            (block_q, head_dim), lambda b, h, qi, ki, *refs: (qi, 0)
        )
        rk_spec = pl.BlockSpec(
            (block_k, head_dim),
            lambda b, h, qi, ki, *refs: (_cached_kv_idx(b, h, qi, ki)[2], 0),
        )
        in_specs += [rq_spec, rq_spec, rk_spec, rk_spec]
        args += [cq_tab, sq_tab, ck_tab, sk_tab]

    out_specs = [
        pl.BlockSpec(
            (1, 1, block_q, head_dim),
            lambda b, h, qi, ki, *refs: (b, h, qi, 0),
        ),
        pl.BlockSpec(
            (1, 1, block_q, 1),
            lambda b, h, qi, ki, *refs: (b, h, qi, 0),
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((batch, num_heads, padded_sq, head_dim), out_dtype),
        jax.ShapeDtypeStruct(
            (batch, num_heads, padded_sq, 1), jnp.float32
        ),
    ]

    diag_ns = 0
    if block_map is None and not diag_rect:
        diag_ns = _diag_subtile_count(
            block_q, block_k, causal, window, seq_k, has_bias
        )

    kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        causal=causal,
        window=window,
        block_q=block_q,
        block_k=block_k,
        seq_q=seq_q,
        seq_k=seq_k,
        num_k_blocks=num_steps,  # finalize at the last (compacted) step
        has_bias=has_bias,
        has_map=has_map,
        has_fetch=has_fetch,
        has_rope=has_rope,
        kv_cache=use_kv_cache,
        group=group,
        vc_width=vc_width,
        diag_ns=diag_ns,
        diag_rect=diag_rect,
        out_dtype=out_dtype,
    )

    scratch_shapes = [
        pltpu.VMEM((block_q, _LANES), jnp.float32),  # m
        pltpu.VMEM((block_q, _LANES), jnp.float32),  # l
        pltpu.VMEM((block_q, head_dim), jnp.float32),  # acc
        pltpu.VMEM((block_q, head_dim), q.dtype),  # scale-folded Q
    ]
    if use_kv_cache:
        scratch_shapes += [
            pltpu.VMEM((padded_sk, head_dim), k.dtype),  # K cache
            pltpu.VMEM((padded_sk, vc_width), v.dtype),  # V (+ones) cache
        ]
    if use_kv_cache:
        # The cache-fill schedule depends on iteration order within a head:
        # qi must walk sequentially ("arbitrary"). Heads are self-contained
        # when group == 1; under GQA the group shares the leader's fill.
        semantics = (
            "parallel",
            "parallel" if group == 1 else "arbitrary",
            "arbitrary",
            "arbitrary",
        )
    else:
        # b/h/qi are independent; only the KV walk carries state — lets
        # Mosaic software-pipeline DMA against compute.
        semantics = ("parallel", "parallel", "parallel", "arbitrary")
    common = dict(
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * num_heads * seq_q * seq_k * head_dim,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + q.size * jnp.dtype(out_dtype).itemsize,
            transcendentals=batch * num_heads * seq_q * seq_k,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            # Persistent K/V caches + pipeline buffers can exceed the
            # default 16 MiB scoped-vmem budget; raise the cap (the gate on
            # cache_bytes keeps actual usage well below this). The rect
            # mode's STREAMING branch (nq == 1, no cache) needs it too at
            # D=128: bq=2048 f32 temporaries measured 16.19M — 192K over
            # the default (r4c Mosaic OOM at B1 H4 S2048 D128 bf16).
            vmem_limit_bytes=(
                64 * 1024 * 1024 if (use_kv_cache or diag_rect) else None
            ),
        ),
        interpret=interpret,
        debug=debug,
    )
    if has_fetch:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        out, lse = pl.pallas_call(kernel, grid_spec=grid_spec, **common)(
            fetch_ids, *args
        )
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
    lse = lse[:, :, :seq_q, 0]
    if fp16_out:
        out = out.astype(jnp.float16)
    return out, lse
