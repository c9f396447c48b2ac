"""umfa_tpu — a TPU-native quantized flash-attention engine.

A from-scratch JAX/Pallas re-design of the capabilities of
bghira/universal-metal-flash-attention (see SURVEY.md): fused flash attention
forward/backward with FP32 intermediates and LSE, INT8/INT4 quantized attention
with tensor-/row-/block-wise scales dequantized inside the kernel, quantized
backward with straight-through-estimator gradients, causal / sliding-window /
arbitrary-bias masking, GQA, fused RoPE, Hadamard pre-rotation, MLA KV
decompression, and multi-host sharding (heads/KV over ICI, ring attention).

Public API (reference parity: `umfa.attention`, examples/python-ffi/src/umfa):

    from umfa_tpu import attention
    out = attention(q, k, v, is_causal=True)
"""

from umfa_tpu.api import (
    attention,
    attention_with_lse,
    set_quantization_mode,
    get_quantization_mode,
    clear_quantization_mode,
    use_quantization,
)
from umfa_tpu.engine.config import (
    QuantizationConfig,
    BlockSizeConfig,
    Precision,
    QuantMode,
    QuantStrategy,
)
from umfa_tpu.engine.stats import get_dispatch_stats, reset_dispatch_stats
from umfa_tpu.ops.attention import flash_attention
from umfa_tpu.ops.block_mask import (
    BlockMask,
    causal_block_mask,
    make_block_mask,
    segment_block_mask,
    sliding_window_block_mask,
)
from umfa_tpu.ops.quant import quantize, dequantize, QuantizedTensor
from umfa_tpu.ops.gemm import quantize_weight, quantized_matmul
from umfa_tpu.ops.rope import apply_rope, rope_attention
from umfa_tpu.ops.hadamard import hadamard_rotate
from umfa_tpu.ops.mla import (
    mla_absorbed_decode,
    mla_decompress,
    sparse_indexer_scores,
)

__version__ = "0.1.0"

__all__ = [
    "attention",
    "attention_with_lse",
    "flash_attention",
    "set_quantization_mode",
    "get_quantization_mode",
    "clear_quantization_mode",
    "use_quantization",
    "QuantizationConfig",
    "BlockSizeConfig",
    "Precision",
    "QuantMode",
    "QuantStrategy",
    "get_dispatch_stats",
    "reset_dispatch_stats",
    "quantize",
    "dequantize",
    "QuantizedTensor",
    "BlockMask",
    "make_block_mask",
    "causal_block_mask",
    "sliding_window_block_mask",
    "segment_block_mask",
    "quantize_weight",
    "quantized_matmul",
    "apply_rope",
    "rope_attention",
    "hadamard_rotate",
    "mla_absorbed_decode",
    "mla_decompress",
    "sparse_indexer_scores",
]
