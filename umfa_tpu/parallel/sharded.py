"""shard_map wrappers: heads/batch/sequence-sharded fused attention.

The TPU-native replacement for the reference's nonexistent multi-device
story (SURVEY.md §5.8): batch rides "dp", attention heads ride "tp" (each
device runs the fused kernel on its resident heads — zero cross-device
traffic for dense attention), and long sequences ride "sp" via ring KV
rotation (ring.py). Collectives are XLA's, inserted by shard_map specs.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from umfa_tpu.utils.compat import shard_map

from umfa_tpu.engine.config import QuantizationConfig
from umfa_tpu.ops.attention import flash_attention
from umfa_tpu.ops.flash_fwd import BlockSizes
from umfa_tpu.parallel.ring import ring_flash_attention


def sharded_attention(
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "dp",
    head_axis: Optional[str] = "tp",
    seq_axis: Optional[str] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    quantization: Optional[QuantizationConfig] = None,
    block_sizes: BlockSizes = BlockSizes(),
    interpret: bool = False,
    jit: bool = True,
    zigzag: bool = False,
) -> Callable:
    """Build a sharded attention callable over `mesh`.

    Returned fn takes (q, k, v) of global shape (B, H, S, D):
      * B sharded over `data_axis`, H over `head_axis` (GQA: KV heads must
        divide the axis size), S over `seq_axis` (ring attention) or
        replicated per device.
    zigzag=True (ring + causal) balances causal work across the ring: the
    wrapper reorders the sequence into the zigzag layout before shard_map
    and inverts it on the output.
    """
    qkv_spec = P(data_axis, head_axis, seq_axis, None)
    kv_spec = P(data_axis, head_axis, seq_axis, None)

    def _local(q, k, v):
        quantized = quantization is not None and quantization.q_precision.is_integer
        if quantized and seq_axis is None:
            from umfa_tpu.ops.quant_attention import quantized_flash_attention

            return quantized_flash_attention(
                q, k, v, config=quantization, causal=causal, scale=scale,
                block_sizes=block_sizes, interpret=interpret,
            )
        if seq_axis is not None:
            local_attention = None
            vm_global = None
            if quantized:
                import dataclasses

                import jax.numpy as jnp

                from umfa_tpu.ops.quant_attention import (
                    quantized_flash_attention,
                )

                # PER-CHUNK smoothing shifts each chunk's LSE by a different
                # constant and breaks the cross-chunk online-softmax merge —
                # so the per-call smoothing stays off. GLOBAL (pmean over
                # the ring axis) K/V channel means ARE merge-safe: the
                # K-mean shift is the same for every chunk (softmax-
                # invariant across the merge), and since the merged weights
                # sum to 1 per row, the V mean adds back once after the full
                # ring. (The Q-mean term would need a per-chunk score
                # correction row — skipped; K/V smoothing carries most of
                # the accuracy win.)
                qcfg = dataclasses.replace(quantization, smooth=False)
                f32 = jnp.float32
                km = jax.lax.pmean(
                    jnp.mean(k.astype(f32), axis=2, keepdims=True), seq_axis
                )
                vm_global = jax.lax.pmean(
                    jnp.mean(v.astype(f32), axis=2, keepdims=True), seq_axis
                )
                k = (k.astype(f32) - km).astype(k.dtype)
                v = (v.astype(f32) - vm_global).astype(v.dtype)

                def local_attention(q, kc, vc, bias):
                    return quantized_flash_attention(
                        q, kc, vc, bias, config=qcfg, scale=scale,
                        block_sizes=block_sizes, interpret=interpret,
                        return_lse=True,
                    )

            out = ring_flash_attention(
                q, k, v, axis_name=seq_axis, causal=causal, scale=scale,
                block_sizes=block_sizes, interpret=interpret,
                local_attention=local_attention, zigzag=zigzag,
            )
            if vm_global is not None:
                group_r = out.shape[1] // vm_global.shape[1]
                vm_q = (
                    jnp.repeat(vm_global, group_r, axis=1)
                    if group_r > 1 else vm_global
                )
                out = (out.astype(jnp.float32) + vm_q).astype(out.dtype)
            return out
        return flash_attention(
            q, k, v, causal=causal, scale=scale,
            block_sizes=block_sizes, interpret=interpret,
        )

    fn = shard_map(
        _local,
        mesh=mesh,
        in_specs=(qkv_spec, kv_spec, kv_spec),
        out_specs=qkv_spec,
    )

    if zigzag:
        assert seq_axis is not None, "zigzag requires a ring (seq_axis)"
        from umfa_tpu.parallel.ring import zigzag_shard, zigzag_unshard

        n = mesh.shape[seq_axis]
        inner = fn

        def fn(q, k, v):
            out = inner(
                zigzag_shard(q, n), zigzag_shard(k, n), zigzag_shard(v, n)
            )
            return zigzag_unshard(out, n)

    return jax.jit(fn) if jit else fn
