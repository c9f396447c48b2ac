"""Attention descriptors & capability probe (reference-parity surface).

Maps the reference's descriptor types onto the TPU engine:
  * AttentionDescriptor (MFABridge.swift:1228-1245): matrix dims, transpose
    state, sparsity pattern, softmax scale, precisions → here a frozen
    dataclass that lowers to the kernel's static config (the jit cache key —
    the analogue of `setFunctionConstants` + the pipeline cache).
  * MultiHeadShape / MultiHeadAttentionDescriptor (MFABridge.swift:2204-2227).
  * mfa_get_quantized_capabilities (QuantizedLayoutManifest+FFI.swift:120-135).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple

import jax.numpy as jnp

from umfa_tpu.engine.config import Precision, QuantizationConfig
from umfa_tpu.ops.flash_fwd import BlockSizes


class SparsityPattern(enum.Enum):
    """Reference: AttentionDescriptor.sparsityPattern (.none/.causal +
    sliding-window per README.md:72)."""

    NONE = "none"
    CAUSAL = "causal"
    SLIDING_WINDOW = "sliding_window"


@dataclasses.dataclass(frozen=True)
class MultiHeadShape:
    """(batchSize, numHeads, sequenceLength, headDimension) —
    MFABridge.swift:2204-2227."""

    batch_size: int
    num_heads: int
    seq_len: int
    head_dim: int

    @property
    def bhsd(self) -> Tuple[int, int, int, int]:
        return (self.batch_size, self.num_heads, self.seq_len, self.head_dim)


@dataclasses.dataclass(frozen=True)
class AttentionDescriptor:
    """Static kernel configuration. Hashable: two calls with equal
    descriptors hit the same compiled executable (the reference's
    PipelineCacheKey role)."""

    shape: MultiHeadShape
    kv_seq_len: Optional[int] = None
    num_kv_heads: Optional[int] = None
    sparsity: SparsityPattern = SparsityPattern.NONE
    window: Optional[Tuple[int, int]] = None
    softmax_scale: Optional[float] = None
    input_precision: Precision = Precision.BF16
    low_precision_intermediates: bool = False  # FP32 intermediates mandatory
    quantization: Optional[QuantizationConfig] = None
    block_sizes: BlockSizes = BlockSizes()

    def __post_init__(self):
        if self.low_precision_intermediates:
            raise ValueError(
                "FP32 intermediates are mandatory (reference README.md:83-85)"
            )
        if self.sparsity == SparsityPattern.SLIDING_WINDOW and self.window is None:
            raise ValueError("sliding_window sparsity requires window=(l, r)")

    @property
    def causal(self) -> bool:
        return self.sparsity == SparsityPattern.CAUSAL

    @property
    def jdtype(self):
        return {
            Precision.FP16: jnp.float16,
            Precision.BF16: jnp.bfloat16,
            Precision.FP32: jnp.float32,
        }[self.input_precision]

    def __call__(self, q, k, v, bias=None, **overrides):
        """Run attention with this descriptor's configuration."""
        from umfa_tpu.api import attention

        kwargs = dict(
            is_causal=self.causal,
            window=self.window,
            scale=self.softmax_scale,
            quantization=self.quantization,
            block_sizes=self.block_sizes,
        )
        kwargs.update(overrides)
        return attention(q, k, v, bias, **kwargs)


def get_quantized_capabilities() -> dict:
    """Capability probe (reference: mfa_get_quantized_capabilities returns
    multi-head-backward=yes, blockwise-backward=yes, max_heads=128,
    max_block=256 — QuantizedLayoutManifest+FFI.swift:120-135)."""
    return {
        "multi_head_forward": True,
        "multi_head_backward": True,
        "blockwise_forward": True,
        "blockwise_backward": True,
        "int8": True,
        "int4": True,
        "asymmetric": True,
        "hadamard": True,
        "gqa": True,
        "sliding_window": True,
        "ring_attention": True,
        "max_heads": 128,
        "max_block_size": 256,
        "native_bfloat": True,  # reference: mfa_has_native_bfloat probe
    }
