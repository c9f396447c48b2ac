"""Pallas ring attention: in-kernel KV rotation with explicit comm/compute
overlap (SURVEY.md §5.8: `pltpu.make_async_remote_copy`).

The jnp-level ring (parallel/ring.py) leaves overlap to XLA's scheduler and
rotates every chunk every step. This kernel makes the overlap *structural*:

  * KV lives in a double-buffered HBM comm buffer (a kernel output — the
    standard Pallas distributed pattern, so the peer's RDMA has a stable
    address). The RDMA send of the CURRENT chunk to the right neighbour
    starts at the top of each step, then the whole step's attention compute
    runs while it flies; completion is only awaited at the step boundary.
  * Flow control is explicit: a receiver signals a capacity semaphore to its
    left neighbour when a buffer slot is free; senders wait on it before
    overwriting the remote slot (no overrun even if devices drift).
  * Causal + contiguous layout: chunk j is needed only by devices i >= j, so
    sends of chunks that no remaining device will attend are SKIPPED —
    halving ring traffic (n(n-1)/2 instead of n(n-1) chunk hops). Skipped
    steps also skip their compute and semaphore handshakes symmetrically.
  * Zigzag layout (causal load balancing — every device computes ~n/2+1
    steps' worth of visible work) is supported via global-position masking;
    all chunks stay needed, so sends are not skipped.

Per (q-tile, step) the online-softmax merge runs against the (o, lse) output
blocks (read-modify-write accumulation across the outer step grid dim), so
results match the jnp ring's merge_partials exactly.

The backward is STRUCTURAL too (_ring_bwd_kernel, VERDICT r3 #6): K/V and
the accumulating f32 dK/dV travel together in double-buffered comm buffers;
per step, phase 0 folds this device's dK/dV contributions into the traveling
buffer, phase 1 starts the dual RDMA sends and runs the dQ pass while they
fly. The final homing hop is one host-side ppermute, so gradients match the
jnp ppermute ring (UMFA_RING_BWD=jnp keeps that fallback for A/B).

Caveats learned the hard way:
  * Collective kernels must run under jit. Unjitted jax.grad dispatches the
    ops one by one, and eager per-device dispatch interleaves two ring
    instances in inconsistent order across device threads — deadlocks (both
    backends, reproduced r4). Jitted multi-instance programs are fine.
  * Each kernel instance draws its own collective_id (trace-time counter):
    simultaneously-live instances must not share a barrier semaphore.

Hardware status: protocol Mosaic-compiled and parity-checked on ONE real
chip via the self-loop modes (fwd + bwd); multi-device behavior validated
under the TPU interpret mode's emulation on an 8-device CPU mesh;
real-slice validation awaits multi-chip hardware.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from umfa_tpu.ops.flash_fwd import DEFAULT_MASK_VALUE, _LANES, BlockSizes

# Per-instance collective ids (trace-time counter — SPMD traces once, so the
# assignment is identical on every device). Two kernel instances in ONE
# program (e.g. two ring-attention layers in a training step) must NOT share
# a barrier semaphore: with a shared collective_id a fast device's
# instance-2 barrier/RDMA traffic lands in a slow peer's instance-1 epoch
# and the protocol deadlocks (reproduced under interpret with two reverse
# rings in one jit program). Forward instances draw odd ids, backward even.
_COLLECTIVE_BASE_FWD = 13
_COLLECTIVE_BASE_BWD = 14
_N_COLLECTIVE_SLOTS = 8
_collective_counter = [0, 0]


def _next_collective_id(is_bwd: bool) -> int:
    base = _COLLECTIVE_BASE_BWD if is_bwd else _COLLECTIVE_BASE_FWD
    count = _collective_counter[int(is_bwd)]
    slot = count % _N_COLLECTIVE_SLOTS
    _collective_counter[int(is_bwd)] += 1
    if count and slot == 0:
        # More than _N_COLLECTIVE_SLOTS ring instances traced: ids now
        # repeat. Two instances sharing an id in ONE live program is the
        # exact deadlock mode documented above; it is benign only when the
        # program barriers between them (e.g. sequential layers separated
        # by a psum). Warn rather than fail — the counter is process-global
        # and also advances across independent jit programs, which never
        # conflict.
        import warnings

        warnings.warn(
            f"ring attention collective-id counter wrapped (>"
            f"{_N_COLLECTIVE_SLOTS} {'backward' if is_bwd else 'forward'} "
            "instances traced in this process): if a single jit program "
            "holds more than 8 concurrent ring instances, shared ids can "
            "deadlock the RDMA protocol.",
            stacklevel=3,
        )
    return base + 2 * slot


def _ring_fwd_kernel(
    # inputs: q, k, v (ANY); outputs: o, lse, kvbuf (ANY for kvbuf)
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    kvbuf_ref,
    # scratch
    q_vmem,
    kv_vmem,      # (2 slots, 2 (k/v), block_k, d)
    o_acc,
    m_acc,
    l_acc,
    o_io,         # (block_q, d) out_dtype — staged output tile
    lse_io,       # (1, block_q) f32 — staged LSE tile (transposed layout)
    load_sems,    # DMA sems for tile loads (2 slots x 2 operands) + q
    io_sems,      # DMA sems for output tile read/merge/write (o, lse)
    copy_sem,
    send_sem,
    recv_sem,
    capacity_sem,
    *,
    n: int,
    my_static: None,
    axis_name: str,
    batch: int,
    heads: int,
    kv_heads: int,
    s_loc: int,
    head_dim: int,
    block_q: int,
    block_k: int,
    scale: float,
    causal: bool,
    zigzag: bool,
    in_dtype,
    out_dtype,
    self_loop: bool = False,
):
    step = pl.program_id(0)
    b = pl.program_id(1)
    h = pl.program_id(2)
    qi = pl.program_id(3)
    nq = pl.num_programs(3)
    n_kv_tiles = s_loc // block_k
    group = heads // kv_heads
    hkv = h // group

    my = jax.lax.axis_index(axis_name)
    if self_loop:
        # Single-chip Mosaic validation of the FULL comm protocol (VERDICT
        # r3 #5: make_async_remote_copy, barrier + capacity semaphores, and
        # the double-buffered HBM comm buffer had only ever met the
        # interpreter): the ring degenerates to one device sending its own
        # chunk to itself for `n` grid steps. Only step 0 computes, so the
        # output equals single-device attention — parity-checkable — while
        # every RDMA/semaphore op goes through real codegen: step 0 sends
        # slot 0→1, step 1 waits that receive, capacity-credits itself and
        # sends 1→0, step 2 waits again (n >= 3 exercises the credit wait).
        left = my
        right = my
    else:
        left = (my - 1) % n
        right = (my + 1) % n
    src = (my - step) % n  # ring slot of the chunk held this step
    cur = step % 2
    nxt = (step + 1) % 2

    half = s_loc // 2

    def chunk_base(slot_idx, local_r0):
        """Global position of local row `local_r0` of ring slot `slot_idx`
        (scalar; tiles never straddle the zigzag halves — asserted host-side)."""
        if not zigzag:
            return slot_idx * s_loc + local_r0
        in_hi = local_r0 >= half
        lo_base = slot_idx * half + local_r0
        hi_base = (2 * n - 1 - slot_idx) * half + (local_r0 - half)
        return jnp.where(in_hi, hi_base, lo_base)

    # Compute-visibility of this whole step for this device (causal only):
    # with the contiguous layout, chunk src is visible iff src <= my.
    if self_loop:
        step_visible = step == 0
        will_send = jnp.bool_(step < n - 1)
        will_recv = jnp.bool_(step < n - 1)
        recvd_this_step = jnp.bool_(True)
    elif causal and not zigzag:
        step_visible = src <= my
        # Sender: chunk held at step s is useful to the right neighbour
        # (who computes it at s+1) iff s <= my and right exists (my < n-1).
        will_send = jnp.logical_and(step <= my, my < n - 1)
        # Receiver: left neighbour sends during step s iff s <= my - 1.
        will_recv = step <= my - 1  # arrival awaited at step s+1
        recvd_this_step = step - 1 <= my - 1  # data for THIS step arrived
    else:
        step_visible = jnp.bool_(True)
        will_send = jnp.bool_(step < n - 1)
        will_recv = jnp.bool_(step < n - 1)
        recvd_this_step = jnp.bool_(True)

    first_cell = jnp.logical_and(
        b == 0, jnp.logical_and(h == 0, qi == 0)
    )
    last_cell = jnp.logical_and(
        b == batch - 1, jnp.logical_and(h == heads - 1, qi == nq - 1)
    )

    # ---- step prologue (first grid cell of the step) ----
    @pl.when(jnp.logical_and(first_cell, step == 0))
    def _init_comm():
        if n > 1:
            # All-entered barrier with ring neighbours before any RDMA.
            barrier = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(
                barrier, inc=1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            pltpu.semaphore_signal(
                barrier, inc=1, device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            pltpu.semaphore_wait(barrier, 2)
        # Stage the local chunk into comm slot 0 (HBM -> HBM).
        cp_k = pltpu.make_async_copy(
            k_ref, kvbuf_ref.at[0, 0], copy_sem
        )
        cp_k.start()
        cp_k.wait()
        cp_v = pltpu.make_async_copy(
            v_ref, kvbuf_ref.at[0, 1], copy_sem
        )
        cp_v.start()
        cp_v.wait()

    @pl.when(jnp.logical_and(first_cell, jnp.logical_and(step > 0, recvd_this_step)))
    def _await_recv():
        if n > 1:
            # The chunk for THIS step arrived during the previous step.
            pltpu.make_async_remote_copy(
                src_ref=kvbuf_ref.at[cur],
                dst_ref=kvbuf_ref.at[cur],
                send_sem=send_sem,
                recv_sem=recv_sem,
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).wait_recv()

    @pl.when(jnp.logical_and(first_cell, will_send))
    def _start_send():
        if n > 1:
            # Back-pressure: the send at step s targets the receiver's slot
            # (s+1)%2, whose last compute use was the receiver's step s-1 —
            # wait for its "slot free" credit. Step 0 targets a fresh slot.
            @pl.when(step >= 1)
            def _():
                pltpu.semaphore_wait(capacity_sem, 1)

            pltpu.make_async_remote_copy(
                src_ref=kvbuf_ref.at[cur],
                dst_ref=kvbuf_ref.at[nxt],
                send_sem=send_sem,
                recv_sem=recv_sem,
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).start()

    # ---- attention compute for this (b, h, qi) against chunk `src` ----
    @pl.when(step_visible)
    def _compute():
        # q tile HBM -> VMEM.
        q0 = qi * block_q
        cp_q = pltpu.make_async_copy(
            q_ref.at[b, h, pl.ds(q0, block_q)], q_vmem, load_sems.at[4]
        )
        cp_q.start()

        m_acc[...] = jnp.full_like(m_acc, DEFAULT_MASK_VALUE)
        l_acc[...] = jnp.zeros_like(l_acc)
        o_acc[...] = jnp.zeros_like(o_acc)

        q_base = chunk_base(my, q0)

        def start_load(slot, ki):
            k0 = ki * block_k
            for opi in range(2):
                pltpu.make_async_copy(
                    kvbuf_ref.at[cur, opi, b, hkv, pl.ds(k0, block_k)],
                    kv_vmem.at[slot, opi],
                    load_sems.at[slot * 2 + opi],
                ).start()

        def wait_load(slot, ki):
            k0 = ki * block_k
            for opi in range(2):
                pltpu.make_async_copy(
                    kvbuf_ref.at[cur, opi, b, hkv, pl.ds(k0, block_k)],
                    kv_vmem.at[slot, opi],
                    load_sems.at[slot * 2 + opi],
                ).wait()

        start_load(0, 0)
        cp_q.wait()

        def body(ki, _):
            slot = ki % 2

            @pl.when(ki + 1 < n_kv_tiles)
            def _():
                start_load((ki + 1) % 2, ki + 1)

            wait_load(slot, ki)
            k_t = kv_vmem[slot, 0]
            v_t = kv_vmem[slot, 1]
            qv = q_vmem[...]

            mxu = (
                jax.lax.Precision.HIGHEST
                if qv.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            )
            s = jax.lax.dot_general(
                qv, k_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu,
            ) * scale
            if causal:
                k_base = chunk_base(src, ki * block_k)
                q_ids = q_base + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0
                )
                k_ids = k_base + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1
                )
                keep = k_ids <= q_ids
                s = jnp.where(keep, s, DEFAULT_MASK_VALUE)

            m_prev = m_acc[:, 0:1]
            l_prev = l_acc[:, 0:1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            if causal:
                p = jnp.where(keep, p, 0.0)
            l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            m_acc[...] = jnp.broadcast_to(m_new, m_acc.shape)
            l_acc[...] = jnp.broadcast_to(l_new, l_acc.shape)
            pv = jax.lax.dot_general(
                p.astype(v_t.dtype), v_t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu,
            )
            o_acc[...] = o_acc[...] * alpha + pv
            return 0

        jax.lax.fori_loop(0, n_kv_tiles, body, 0)

        # ---- merge this step's partial into the running (o, lse) ----
        # (o, lse) live in ANY/HBM (output blocks may not be revisited
        # across a non-innermost grid dim): explicit read-merge-write.
        m = m_acc[:, 0:1]
        l = l_acc[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        lse_step = jnp.where(l == 0.0, DEFAULT_MASK_VALUE, m + jnp.log(l_safe))
        o_step = o_acc[...] / l_safe

        o_slice = o_ref.at[b, h, pl.ds(q0, block_q)]
        lse_slice = lse_ref.at[b, h, pl.ds(qi, 1)]

        @pl.when(step > 0)
        def _load_prev():
            cp_o = pltpu.make_async_copy(o_slice, o_io, io_sems.at[0])
            cp_l = pltpu.make_async_copy(lse_slice, lse_io, io_sems.at[1])
            cp_o.start()
            cp_l.start()
            cp_o.wait()
            cp_l.wait()
            lse_prev = lse_io[...].reshape(block_q, 1)
            o_prev = o_io[...].astype(jnp.float32)
            m2 = jnp.maximum(lse_prev, lse_step)
            w1 = jnp.exp(lse_prev - m2)
            w2 = jnp.exp(lse_step - m2)
            denom = w1 + w2
            safe = jnp.where(denom == 0.0, 1.0, denom)
            o_new = o_prev * (w1 / safe) + o_step * (w2 / safe)
            lse_new = m2 + jnp.log(safe)
            o_io[...] = o_new.astype(out_dtype)
            lse_io[...] = lse_new.reshape(1, block_q)

        @pl.when(step == 0)
        def _first():
            o_io[...] = o_step.astype(out_dtype)
            lse_io[...] = lse_step.reshape(1, block_q)

        cp_o = pltpu.make_async_copy(o_io, o_slice, io_sems.at[0])
        cp_l = pltpu.make_async_copy(lse_io, lse_slice, io_sems.at[1])
        cp_o.start()
        cp_l.start()
        cp_o.wait()
        cp_l.wait()

    # ---- step epilogue (last grid cell of the step) ----
    @pl.when(last_cell)
    def _epilogue():
        if n > 1:
            @pl.when(will_send)
            def _await_send():
                pltpu.make_async_remote_copy(
                    src_ref=kvbuf_ref.at[cur],
                    dst_ref=kvbuf_ref.at[nxt],
                    send_sem=send_sem,
                    recv_sem=recv_sem,
                    device_id=right,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                ).wait_send()

            # Slot `cur` (= step % 2) is now free: compute done, outbound
            # send drained. The left neighbour targets this slot with its
            # send at step+1 — credit it one "slot free". Pair exactly with
            # the sender's wait (sends at s >= 1 wait one credit).
            if self_loop:
                left_sends_next = jnp.bool_(step + 1 < n - 1)
            elif causal and not zigzag:
                left_sends_next = jnp.logical_and(
                    step + 1 <= left, left < n - 1
                )
            else:
                left_sends_next = jnp.bool_(step + 1 < n - 1)

            @pl.when(left_sends_next)
            def _signal_capacity():
                pltpu.semaphore_signal(
                    capacity_sem, inc=1, device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )


def _ring_fwd_pallas(
    q, k, v, *, axis_name, n, causal, zigzag, scale, block_q, block_k,
    interpret, self_loop=False,
):
    batch, heads, s_loc, head_dim = q.shape
    _, kv_heads, _, _ = k.shape
    assert s_loc % block_k == 0 and s_loc % block_q == 0, (
        "Pallas ring requires the local shard divisible by the tile sizes"
    )
    if zigzag:
        half = s_loc // 2
        assert half % block_q == 0 and half % block_k == 0, (
            "zigzag halves must align with tiles"
        )
    nq = s_loc // block_q
    out_dtype = q.dtype
    grid = (n, batch, heads, nq)

    kernel = functools.partial(
        _ring_fwd_kernel,
        n=n, my_static=None, axis_name=axis_name,
        batch=batch, heads=heads, kv_heads=kv_heads,
        s_loc=s_loc, head_dim=head_dim,
        block_q=block_q, block_k=block_k,
        scale=scale, causal=causal, zigzag=zigzag,
        in_dtype=q.dtype, out_dtype=out_dtype,
        self_loop=self_loop,
    )

    if interpret:
        # 'eager' DMA emulation: the default 'on_wait' mode defers the READ
        # side of queued transfers to semaphore-wait time, which mis-orders
        # this double-buffered protocol (verified with a minimal rotation
        # repro); eager mode executes transfers at start() and reproduces
        # the exact ring rotation.
        interpret_mode = pltpu.InterpretParams(dma_execution_mode="eager")
    else:
        interpret_mode = False

    o, lse_l, _ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, heads, s_loc, head_dim), out_dtype),
            # Transposed LSE layout (B, H, nq, block_q) — reshaped to
            # (B, H, S_loc) host-side; no 128-lane broadcast.
            jax.ShapeDtypeStruct((batch, heads, nq, block_q), jnp.float32),
            # Double-buffered KV comm buffer: (slot, k/v, B, Hkv, S_loc, D).
            jax.ShapeDtypeStruct(
                (2, 2, batch, kv_heads, s_loc, head_dim), k.dtype
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, head_dim), q.dtype),
            pltpu.VMEM((2, 2, block_k, head_dim), k.dtype),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, head_dim), out_dtype),
            pltpu.VMEM((1, block_q), jnp.float32),
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.REGULAR,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=_next_collective_id(False),
            dimension_semantics=(
                "arbitrary", "arbitrary", "arbitrary", "arbitrary",
            ),
        ),
        interpret=interpret_mode,
    )(q, k, v)
    return o, lse_l.reshape(batch, heads, s_loc)


def _ring_bwd_kernel(
    # inputs (ANY): q, k, v, do, lse_t, delta_t
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,      # (B, H, nt, block) f32 — transposed row-stat layout
    delta_ref,    # (B, H, nt, block) f32 (dlse already folded in host-side)
    # outputs (ANY): dq, kvbuf, dkvbuf
    dq_ref,       # (B, H, S_loc, D) f32 — accumulated across steps (RMW)
    kvbuf_ref,    # (2, 2, B, Hkv, S_loc, D) in_dtype — traveling K/V
    dkvbuf_ref,   # (2, 2, B, Hkv, S_loc, D) f32 — traveling dK/dV
    # scratch
    a_vmem,       # (2 slots, 2 ops, block, D) in_dtype — inner-walk tiles
    res_vmem,     # (2, block, D) in_dtype — phase residents (k/v or q/do)
    row_vmem,     # (2 slots, 2 stats, 1, block) f32 — lse/delta tiles
    acc0,         # (block, D) f32 — dK or dQ accumulator
    acc1,         # (block, D) f32 — dV accumulator
    upd_io,       # (block, D) f32 — RMW staging for dq/dkv HBM tiles
    load_sems,    # DMA sems: 2 slots × 2 operands + 2 residents
    row_sems,     # DMA sems: 2 slots × 2 stats
    io_sem,
    copy_sem,
    send_kv_sem,
    recv_kv_sem,
    send_dkv_sem,
    recv_dkv_sem,
    capacity_sem,
    *,
    n: int,
    axis_name: str,
    batch: int,
    heads: int,
    kv_heads: int,
    s_loc: int,
    head_dim: int,
    block: int,
    scale: float,
    causal: bool,
    zigzag: bool,
    in_dtype,
    self_loop: bool = False,
):
    """Structural reverse ring (VERDICT r3 #6): K/V AND the accumulating
    dK/dV travel together in double-buffered HBM comm buffers. Per step,
    phase 0 accumulates this device's dK/dV contributions into the traveling
    f32 buffer; phase 1 starts the RDMA sends (both buffers) and runs the dQ
    pass while they fly — the send rides the entire dQ phase instead of a
    bare step boundary. The final homing hop (chunk (my+1)%n sits here after
    n−1 rotations) is one host-side ppermute, matching _ring_vjp_bwd's jnp
    schedule exactly."""
    step = pl.program_id(0)
    phase = pl.program_id(1)
    b = pl.program_id(2)
    h = pl.program_id(3)
    i = pl.program_id(4)
    nt = pl.num_programs(4)
    group = heads // kv_heads
    hkv = h // group

    my = jax.lax.axis_index(axis_name)
    if self_loop:
        left = my
        right = my
    else:
        left = (my - 1) % n
        right = (my + 1) % n
    src = (my - step) % n
    cur = step % 2
    nxt = (step + 1) % 2

    half = s_loc // 2

    def chunk_base(slot_idx, local_r0):
        if not zigzag:
            return slot_idx * s_loc + local_r0
        in_hi = local_r0 >= half
        lo_base = slot_idx * half + local_r0
        hi_base = (2 * n - 1 - slot_idx) * half + (local_r0 - half)
        return jnp.where(in_hi, hi_base, lo_base)

    if self_loop:
        step_visible = step == 0
        will_send = jnp.bool_(step < n - 1)
        recvd_this_step = jnp.bool_(True)
        left_sends_next = jnp.bool_(step + 1 < n - 1)
    elif causal and not zigzag:
        # dK/dV must keep traveling even past their last contribution (they
        # ride home through the remaining hops) — no causal send skipping
        # here, unlike the forward.
        step_visible = src <= my
        will_send = jnp.bool_(step < n - 1)
        recvd_this_step = jnp.bool_(True)
        left_sends_next = jnp.bool_(step + 1 < n - 1)
    else:
        step_visible = jnp.bool_(True)
        will_send = jnp.bool_(step < n - 1)
        recvd_this_step = jnp.bool_(True)
        left_sends_next = jnp.bool_(step + 1 < n - 1)

    first_cell = jnp.logical_and(
        b == 0, jnp.logical_and(h == 0, i == 0)
    )
    last_cell = jnp.logical_and(
        b == batch - 1, jnp.logical_and(h == heads - 1, i == nt - 1)
    )

    def _remote(buf, sems):
        return pltpu.make_async_remote_copy(
            src_ref=buf.at[cur],
            dst_ref=buf.at[nxt],
            send_sem=sems[0],
            recv_sem=sems[1],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    # ---- step prologue (first cell of phase 0) ----
    @pl.when(jnp.logical_and(phase == 0, first_cell))
    def _prologue():
        @pl.when(step == 0)
        def _init_comm():
            if n > 1:
                barrier = pltpu.get_barrier_semaphore()
                pltpu.semaphore_signal(
                    barrier, inc=1, device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )
                pltpu.semaphore_signal(
                    barrier, inc=1, device_id=right,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )
                pltpu.semaphore_wait(barrier, 2)
            for opi, op_ref in ((0, k_ref), (1, v_ref)):
                cp = pltpu.make_async_copy(
                    op_ref, kvbuf_ref.at[0, opi], copy_sem
                )
                cp.start()
                cp.wait()

        @pl.when(jnp.logical_and(step > 0, recvd_this_step))
        def _await_recv():
            if n > 1:
                _remote(kvbuf_ref, (send_kv_sem, recv_kv_sem)).wait_recv()
                _remote(dkvbuf_ref, (send_dkv_sem, recv_dkv_sem)).wait_recv()

    # ---- inner-walk helpers --------------------------------------------
    mxu = (
        jax.lax.Precision.HIGHEST
        if in_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def _keep_mask(q_base, k_base):
        q_ids = q_base + jax.lax.broadcasted_iota(
            jnp.int32, (block, block), 0
        )
        k_ids = k_base + jax.lax.broadcasted_iota(
            jnp.int32, (block, block), 1
        )
        return k_ids <= q_ids

    def _p_ds(q_t, do_t, k_t, v_t, lse_col, delta_col, q_base, k_base):
        """Recompute P and dS for one (q-tile, k-tile) pair."""
        qf = (q_t.astype(jnp.float32) * scale).astype(q_t.dtype)
        s = jax.lax.dot_general(
            qf, k_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu,
        )
        if causal:
            keep = _keep_mask(q_base, k_base)
            s = jnp.where(keep, s, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse_col)
        if causal:
            p = jnp.where(keep, p, 0.0)
        do_f = do_t.astype(jnp.float32)
        dp = jax.lax.dot_general(
            do_f.astype(v_t.dtype), v_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu,
        )
        ds = p * (dp - delta_col)
        return p, ds

    def _start_tile(slot, refs, j):
        """Kick the (operand-pair, row-stat-pair) loads for inner tile j."""
        r0 = j * block
        for opi, (ref, bb, hh) in enumerate(refs):
            pltpu.make_async_copy(
                ref.at[bb, hh, pl.ds(r0, block)],
                a_vmem.at[slot, opi],
                load_sems.at[slot * 2 + opi],
            ).start()

    def _wait_tile(slot, refs, j):
        r0 = j * block
        for opi, (ref, bb, hh) in enumerate(refs):
            pltpu.make_async_copy(
                ref.at[bb, hh, pl.ds(r0, block)],
                a_vmem.at[slot, opi],
                load_sems.at[slot * 2 + opi],
            ).wait()

    def _start_rows(slot, j):
        for sti, ref in ((0, lse_ref), (1, delta_ref)):
            pltpu.make_async_copy(
                ref.at[b, h, pl.ds(j, 1)],
                row_vmem.at[slot, sti],
                row_sems.at[slot * 2 + sti],
            ).start()

    def _wait_rows(slot, j):
        for sti, ref in ((0, lse_ref), (1, delta_ref)):
            pltpu.make_async_copy(
                ref.at[b, h, pl.ds(j, 1)],
                row_vmem.at[slot, sti],
                row_sems.at[slot * 2 + sti],
            ).wait()

    def _rmw(dst_slice, acc, first: jax.Array):
        """dst_slice (HBM f32 tile) ← first ? acc : dst_slice + acc.
        A select, not a multiply-by-0: the first touch reads UNINITIALIZED
        memory, and 0·NaN would poison the accumulator."""
        cp_in = pltpu.make_async_copy(dst_slice, upd_io, io_sem)
        cp_in.start()
        cp_in.wait()
        upd_io[...] = jnp.where(first, acc, upd_io[...] + acc)
        cp_out = pltpu.make_async_copy(upd_io, dst_slice, io_sem)
        cp_out.start()
        cp_out.wait()

    # ---- phase 0: dK/dV accumulation for KV tile i of chunk `src` -------
    @pl.when(jnp.logical_and(phase == 0, step_visible))
    def _dkv_phase():
        k0 = i * block
        # Resident: this chunk's KV tile i (K and V) — loaded once into
        # res_vmem, re-read per inner iteration (keeps the (block, D) tiles
        # in VMEM instead of a giant live SSA value across the loop).
        for opi in range(2):
            pltpu.make_async_copy(
                kvbuf_ref.at[cur, opi, b, hkv, pl.ds(k0, block)],
                res_vmem.at[opi],
                load_sems.at[4 + opi],
            ).start()
        for opi in range(2):
            pltpu.make_async_copy(
                kvbuf_ref.at[cur, opi, b, hkv, pl.ds(k0, block)],
                res_vmem.at[opi],
                load_sems.at[4 + opi],
            ).wait()
        k_base = chunk_base(src, k0)

        acc0[...] = jnp.zeros_like(acc0)
        acc1[...] = jnp.zeros_like(acc1)

        qdo = ((q_ref, b, h), (do_ref, b, h))

        _start_tile(1, qdo, 0)
        _start_rows(0, 0)

        def body(j, _):
            slot = 1 - (j % 2)  # q/do tiles alternate slots 1, 0, 1, ...

            @pl.when(j + 1 < nt)
            def _():
                _start_tile(1 - ((j + 1) % 2), qdo, j + 1)
                _start_rows((j + 1) % 2, j + 1)

            _wait_tile(slot, qdo, j)
            _wait_rows(j % 2, j)
            q_t = a_vmem[slot, 0]
            do_t = a_vmem[slot, 1]
            k_t = res_vmem[0]
            v_t = res_vmem[1]
            lse_col = row_vmem[j % 2, 0].reshape(block, 1)
            delta_col = row_vmem[j % 2, 1].reshape(block, 1)
            q_base = chunk_base(my, j * block)

            p, ds = _p_ds(
                q_t, do_t, k_t, v_t, lse_col, delta_col, q_base, k_base
            )
            acc1[...] += jax.lax.dot_general(
                p.astype(v_t.dtype), do_t.astype(v_t.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu,
            )
            acc0[...] += jax.lax.dot_general(
                ds.astype(q_t.dtype), q_t,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu,
            )
            return 0

        jax.lax.fori_loop(0, nt, body, 0)

        # Fold into the traveling buffer. Step 0's first GQA writer per
        # (b, hkv, i) tile REPLACES (slot 0's dkv was never written); every
        # later touch accumulates — from step 1 on, slot `cur` holds the
        # dkv received from the left neighbour.
        first_touch = jnp.logical_and(h % group == 0, step == 0)
        dk_slice = dkvbuf_ref.at[cur, 0, b, hkv, pl.ds(k0, block)]
        dv_slice = dkvbuf_ref.at[cur, 1, b, hkv, pl.ds(k0, block)]
        _rmw(dk_slice, acc0[...] * scale, first_touch)
        _rmw(dv_slice, acc1[...], first_touch)

    # ---- phase 1: sends + dQ pass for q tile i --------------------------
    @pl.when(jnp.logical_and(phase == 1, first_cell))
    def _start_sends():
        if n > 1:
            @pl.when(will_send)
            def _():
                @pl.when(step >= 1)
                def _wait_credit():
                    pltpu.semaphore_wait(capacity_sem, 1)

                _remote(kvbuf_ref, (send_kv_sem, recv_kv_sem)).start()
                _remote(dkvbuf_ref, (send_dkv_sem, recv_dkv_sem)).start()

    @pl.when(jnp.logical_and(phase == 1, step_visible))
    def _dq_phase():
        q0 = i * block
        # Resident: q/do tile i (into res_vmem) + row stats.
        for opi, ref in ((0, q_ref), (1, do_ref)):
            pltpu.make_async_copy(
                ref.at[b, h, pl.ds(q0, block)],
                res_vmem.at[opi],
                load_sems.at[4 + opi],
            ).start()
        _start_rows(0, i)
        for opi, ref in ((0, q_ref), (1, do_ref)):
            pltpu.make_async_copy(
                ref.at[b, h, pl.ds(q0, block)],
                res_vmem.at[opi],
                load_sems.at[4 + opi],
            ).wait()
        _wait_rows(0, i)
        lse_col = row_vmem[0, 0].reshape(block, 1)
        delta_col = row_vmem[0, 1].reshape(block, 1)
        q_base = chunk_base(my, q0)

        acc0[...] = jnp.zeros_like(acc0)

        def start_kv(slot, j):
            k0 = j * block
            for opi in range(2):
                pltpu.make_async_copy(
                    kvbuf_ref.at[cur, opi, b, hkv, pl.ds(k0, block)],
                    a_vmem.at[slot, opi],
                    load_sems.at[slot * 2 + opi],
                ).start()

        def wait_kv(slot, j):
            k0 = j * block
            for opi in range(2):
                pltpu.make_async_copy(
                    kvbuf_ref.at[cur, opi, b, hkv, pl.ds(k0, block)],
                    a_vmem.at[slot, opi],
                    load_sems.at[slot * 2 + opi],
                ).wait()

        start_kv(1, 0)

        def body(j, _):
            slot = 1 - (j % 2)

            @pl.when(j + 1 < nt)
            def _():
                start_kv(1 - ((j + 1) % 2), j + 1)

            wait_kv(slot, j)
            k_t = a_vmem[slot, 0]
            v_t = a_vmem[slot, 1]
            q_t = res_vmem[0]
            do_t = res_vmem[1]
            k_base = chunk_base(src, j * block)
            p, ds = _p_ds(
                q_t, do_t, k_t, v_t, lse_col, delta_col, q_base, k_base
            )
            acc0[...] += jax.lax.dot_general(
                ds.astype(k_t.dtype), k_t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu,
            )
            return 0

        jax.lax.fori_loop(0, nt, body, 0)

        dq_slice = dq_ref.at[b, h, pl.ds(q0, block)]
        _rmw(dq_slice, acc0[...] * scale, jnp.bool_(step == 0))

    # ---- step epilogue (last cell of phase 1) ----------------------------
    @pl.when(jnp.logical_and(phase == 1, last_cell))
    def _epilogue():
        if n > 1:
            @pl.when(will_send)
            def _await_sends():
                _remote(kvbuf_ref, (send_kv_sem, recv_kv_sem)).wait_send()
                _remote(dkvbuf_ref, (send_dkv_sem, recv_dkv_sem)).wait_send()

            @pl.when(left_sends_next)
            def _signal_capacity():
                pltpu.semaphore_signal(
                    capacity_sem, inc=1, device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )


def _ring_bwd_pallas(
    q, k, v, out, lse, do, dlse, *, axis_name, n, causal, zigzag, scale,
    block, interpret, self_loop=False,
):
    """Host wrapper for the structural reverse ring. Returns (dq, dk, dv)
    — dk/dv already homed via the final ppermute hop (matching the jnp
    ring's schedule: n−1 in-kernel rotations + one homing hop)."""
    batch, heads, s_loc, head_dim = q.shape
    _, kv_heads, _, _ = k.shape
    assert s_loc % block == 0
    nt = s_loc // block
    in_dtype = q.dtype

    # delta = rowsum(dO ∘ O) − g_lse, in the kernel's transposed row-stat
    # layout (B, H, nt, block); fully-masked/padded rows are handled by the
    # forward's LSE conventions (finite everywhere on ring shapes).
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)
    delta_t = delta.reshape(batch, heads, nt, block)
    lse_t = lse.reshape(batch, heads, nt, block)
    do_in = do.astype(in_dtype)

    grid = (n, 2, batch, heads, nt)
    kernel = functools.partial(
        _ring_bwd_kernel,
        n=n, axis_name=axis_name,
        batch=batch, heads=heads, kv_heads=kv_heads,
        s_loc=s_loc, head_dim=head_dim, block=block,
        scale=scale, causal=causal, zigzag=zigzag,
        in_dtype=in_dtype, self_loop=self_loop,
    )

    if interpret:
        interpret_mode = pltpu.InterpretParams(dma_execution_mode="eager")
    else:
        interpret_mode = False

    dq, _, dkvbuf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((batch, heads, s_loc, head_dim), jnp.float32),
            jax.ShapeDtypeStruct(
                (2, 2, batch, kv_heads, s_loc, head_dim), in_dtype
            ),
            jax.ShapeDtypeStruct(
                (2, 2, batch, kv_heads, s_loc, head_dim), jnp.float32
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, block, head_dim), in_dtype),   # a_vmem
            pltpu.VMEM((2, block, head_dim), in_dtype),      # res_vmem
            pltpu.VMEM((2, 2, 1, block), jnp.float32),       # row_vmem
            pltpu.VMEM((block, head_dim), jnp.float32),      # acc0
            pltpu.VMEM((block, head_dim), jnp.float32),      # acc1
            pltpu.VMEM((block, head_dim), jnp.float32),      # upd_io
            pltpu.SemaphoreType.DMA((6,)),                   # load_sems
            pltpu.SemaphoreType.DMA((4,)),                   # row_sems
            pltpu.SemaphoreType.DMA(()),                     # io_sem
            pltpu.SemaphoreType.DMA(()),                     # copy_sem
            pltpu.SemaphoreType.DMA(()),                     # send_kv
            pltpu.SemaphoreType.DMA(()),                     # recv_kv
            pltpu.SemaphoreType.DMA(()),                     # send_dkv
            pltpu.SemaphoreType.DMA(()),                     # recv_dkv
            pltpu.SemaphoreType.REGULAR,                     # capacity
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=_next_collective_id(True),
            dimension_semantics=("arbitrary",) * 5,
        ),
        interpret=interpret_mode,
    )(q, k, v, do_in, lse_t, delta_t)

    # After n−1 rotations, slot (n−1)%2 holds the fully-accumulated dK/dV
    # for chunk (my+1)%n — one homing hop right returns them.
    dkv = dkvbuf[(n - 1) % 2]
    dk = dkv[0]
    dv = dkv[1]
    if n > 1 and not self_loop:
        perm = [(i, (i + 1) % n) for i in range(n)]
        dk, dv = jax.lax.ppermute((dk, dv), axis_name, perm)
    return dq, dk, dv


def ring_flash_attention_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    zigzag: bool = False,
    scale: Optional[float] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interpret: bool = False,
    return_lse: bool = False,
):
    """Ring attention with the in-kernel RDMA rotation (forward) and the
    differentiable jnp-ring backward. Call inside shard_map with the
    sequence dim sharded along `axis_name` (zigzag layout when zigzag=True —
    see parallel/ring.zigzag_shard)."""
    n = jax.lax.axis_size(axis_name)
    head_dim = q.shape[-1]
    s_loc = q.shape[2]
    if scale is None:
        scale = head_dim**-0.5
    interpret = interpret or jax.default_backend() == "cpu"
    block_q = min(block_sizes.block_q, s_loc)
    block_k = min(block_sizes.block_k, s_loc)
    if zigzag:
        half = s_loc // 2
        block_q = min(block_q, half)
        block_k = min(block_k, half)

    out, lse = _ring_pallas_vjp(
        _RingKey(
            axis_name=axis_name, n=n, causal=causal, zigzag=zigzag,
            scale=scale, block_q=block_q, block_k=block_k,
            interpret=interpret, block_sizes=block_sizes,
        ),
        q, k, v,
    )
    if return_lse:
        return out, lse
    return out


import dataclasses


@dataclasses.dataclass(frozen=True)
class _RingKey:
    axis_name: str
    n: int
    causal: bool
    zigzag: bool
    scale: float
    block_q: int
    block_k: int
    interpret: bool
    block_sizes: BlockSizes


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ring_pallas_vjp(key: _RingKey, q, k, v):
    return _ring_fwd_pallas(
        q, k, v,
        axis_name=key.axis_name, n=key.n, causal=key.causal,
        zigzag=key.zigzag, scale=key.scale,
        block_q=key.block_q, block_k=key.block_k,
        interpret=key.interpret,
    )


def _ring_vjp_fwd(key: _RingKey, q, k, v):
    out, lse = _ring_pallas_vjp(key, q, k, v)
    return (out, lse), (q, k, v, out, lse)


def _ring_vjp_bwd(key: _RingKey, residuals, g):
    """Reverse ring. Default: the STRUCTURAL Pallas kernel (_ring_bwd_pallas
    — K/V and the accumulating dK/dV travel together via RDMA, sends overlap
    the dQ phase; VERDICT r3 #6). UMFA_RING_BWD=jnp falls back to the
    ppermute ring of dense backward kernels (same gradients; kept as the
    A/B + compatibility path)."""
    import os

    q, k, v, out, lse = residuals
    do, dlse = g
    n = key.n

    if os.environ.get("UMFA_RING_BWD", "pallas") == "pallas":
        block = min(key.block_q, key.block_k)
        dq, dk, dv = _ring_bwd_pallas(
            q, k, v, out, lse, do, dlse,
            axis_name=key.axis_name, n=n, causal=key.causal,
            zigzag=key.zigzag, scale=key.scale, block=block,
            interpret=key.interpret,
        )
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))

    from umfa_tpu.ops.flash_bwd import flash_attention_backward
    from umfa_tpu.parallel.ring import _global_positions
    my_idx = jax.lax.axis_index(key.axis_name)
    s_loc = q.shape[2]
    perm = [(i, (i + 1) % n) for i in range(n)]
    perm_back = [(i, (i - 1) % n) for i in range(n)]

    qpos = _global_positions(my_idx, n, s_loc, key.zigzag)
    dq = jnp.zeros(q.shape, jnp.float32)
    kv = (k, v, jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32))
    for stepi in range(n):
        src = (my_idx - stepi) % n
        kc, vc, dkc, dvc = kv
        if key.causal:
            kpos = _global_positions(src, n, s_loc, key.zigzag)
            step_bias = jnp.where(
                kpos[None, :] <= qpos[:, None], 0.0, DEFAULT_MASK_VALUE
            ).astype(jnp.float32)[None, None]
        else:
            step_bias = None
        dq_s, dk_s, dv_s = flash_attention_backward(
            q, kc, vc, out, lse, do, step_bias, dlse,
            causal=False, scale=key.scale,
            block_sizes=key.block_sizes, interpret=key.interpret,
        )
        dq = dq + dq_s
        kv = (kc, vc, dkc + dk_s, dvc + dv_s)
        if stepi != n - 1:
            kv = jax.lax.ppermute(kv, key.axis_name, perm)
    # dk/dv accumulated while travelling; one final hop returns them home.
    kc, vc, dk, dv = jax.lax.ppermute(kv, key.axis_name, perm)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))


_ring_pallas_vjp.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def ring_pallas_selfloop_check(
    *,
    batch: int = 1,
    heads: int = 2,
    seq: int = 1024,
    head_dim: int = 128,
    n_steps: int = 4,
    causal: bool = True,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    seed: int = 0,
):
    """Single-chip Mosaic validation of the RDMA ring protocol (VERDICT r3
    #5): runs the ring kernel with `n_steps` grid steps on a ONE-device mesh
    in self-loop mode — every `make_async_remote_copy`, the barrier
    semaphore, the capacity-credit flow control, and the double-buffered HBM
    comm buffer go through real Mosaic codegen (never possible via the
    n>=2 path in a one-chip environment; interpret-green != Mosaic-green is
    this repo's hardest-won lesson). Only step 0 computes, so the output
    must match single-device `flash_attention` exactly in routing terms.

    Returns (max_rel_err, ring_out, dense_out); raises AssertionError on
    parity failure. n_steps >= 3 exercises the capacity-credit wait.
    """
    from jax.sharding import Mesh, PartitionSpec as P

    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.utils.compat import shard_map

    rng = jax.random.PRNGKey(seed)
    kq, kk, kv_ = jax.random.split(rng, 3)
    shape = (batch, heads, seq, head_dim)
    q = jax.random.normal(kq, shape, jnp.float32).astype(dtype)
    k = jax.random.normal(kk, shape, jnp.float32).astype(dtype)
    v = jax.random.normal(kv_, shape, jnp.float32).astype(dtype)
    scale = head_dim**-0.5

    mesh = Mesh(jax.devices()[:1], ("sp",))
    block = min(1024, seq)

    def inner(q, k, v):
        o, _ = _ring_fwd_pallas(
            q, k, v, axis_name="sp", n=n_steps, causal=causal,
            zigzag=False, scale=scale, block_q=block, block_k=block,
            interpret=interpret, self_loop=True,
        )
        return o

    ring_fn = jax.jit(shard_map(
        inner, mesh=mesh,
        in_specs=(P(), P(), P()), out_specs=P(),
    ))
    out = ring_fn(q, k, v)
    want = flash_attention(q, k, v, causal=causal, interpret=interpret)
    a = jnp.asarray(out, jnp.float32)
    b = jnp.asarray(want, jnp.float32)
    rel = float(jnp.linalg.norm(a - b) / jnp.maximum(jnp.linalg.norm(b), 1e-9))
    assert rel < 5e-3, f"self-loop ring parity failed: rel={rel}"
    return rel, out, want


def ring_pallas_selfloop_bwd_check(
    *,
    batch: int = 1,
    heads: int = 2,
    seq: int = 1024,
    head_dim: int = 128,
    n_steps: int = 4,
    causal: bool = True,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    seed: int = 0,
):
    """Single-chip Mosaic validation of the STRUCTURAL reverse-ring protocol
    (VERDICT r3 #6): runs _ring_bwd_pallas with `n_steps` grid steps in
    self-loop mode — the dual-buffer (KV + f32 dKV) RDMA sends, the
    phase-split send-overlaps-dQ schedule, the capacity credits, and the
    RMW accumulation paths all go through real codegen. Only step 0
    computes, so (dq, dk, dv) must match the dense backward.

    Returns max rel err across (dq, dk, dv); raises on parity failure."""
    from jax.sharding import Mesh, PartitionSpec as P

    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.utils.compat import shard_map

    rng = jax.random.PRNGKey(seed)
    kq, kk, kv_, kd = jax.random.split(rng, 4)
    shape = (batch, heads, seq, head_dim)
    q = jax.random.normal(kq, shape, jnp.float32).astype(dtype)
    k = jax.random.normal(kk, shape, jnp.float32).astype(dtype)
    v = jax.random.normal(kv_, shape, jnp.float32).astype(dtype)
    do = jax.random.normal(kd, shape, jnp.float32).astype(dtype)
    scale = head_dim**-0.5

    out, lse = flash_attention(
        q, k, v, causal=causal, interpret=interpret, return_lse=True
    )

    mesh = Mesh(jax.devices()[:1], ("sp",))
    block = min(1024, seq)

    def inner(q, k, v, out, lse, do):
        return _ring_bwd_pallas(
            q, k, v, out, lse, do, None,
            axis_name="sp", n=n_steps, causal=causal, zigzag=False,
            scale=scale, block=block, interpret=interpret, self_loop=True,
        )

    ring_fn = jax.jit(shard_map(
        inner, mesh=mesh,
        in_specs=(P(),) * 6, out_specs=(P(), P(), P()),
    ))
    got = ring_fn(q, k, v, out, lse, do)

    def dense_loss(q, k, v):
        o = flash_attention(q, k, v, causal=causal, interpret=interpret)
        return jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32))

    want = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    worst = 0.0
    for a, b in zip(got, want):
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        rel = float(
            jnp.linalg.norm(a - b) / jnp.maximum(jnp.linalg.norm(b), 1e-9)
        )
        worst = max(worst, rel)
    assert worst < 2e-2, f"self-loop ring bwd parity failed: rel={worst}"
    return worst
