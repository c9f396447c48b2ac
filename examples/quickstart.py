"""Quickstart: drop-in SDPA-shaped attention (reference parity:
examples/python-ffi quick start, README.md usage).

Run: python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import umfa_tpu


def main():
    rng = np.random.default_rng(0)
    B, H, S, D = 1, 8, 1024, 64
    q = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)

    # Dense fused attention.
    out = umfa_tpu.attention(q, k, v, is_causal=True)
    print("dense:", out.shape, out.dtype)

    # Sliding window + additive bias.
    bias = jnp.zeros((1, 1, S, S), jnp.float32)
    out = umfa_tpu.attention(q, k, v, bias, window=(256, 0))
    print("windowed:", out.shape)

    # Runtime INT8 quantization — process-global mode, like the reference's
    # set_quantization_mode (metal_sdpa_backend.cpp:3382).
    umfa_tpu.set_quantization_mode("int8", "row")
    out_q = umfa_tpu.attention(q, k, v, is_causal=True)
    umfa_tpu.clear_quantization_mode()
    print("int8:", out_q.shape)

    # Scoped quantization.
    with umfa_tpu.use_quantization("int4", "block"):
        out_q4 = umfa_tpu.attention(q, k, v)
    print("int4:", out_q4.shape)

    # FlexAttention-style mask_mod: compiled once into block-sparse
    # structure with per-mask auto-tuned tiles (SKIP tiles cost neither
    # compute nor DMA — also under quantization).
    doc_mask = lambda qi, ki: (qi // 256) == (ki // 256)
    out_s = umfa_tpu.attention(q, k, v, doc_mask)
    print("block-sparse (mask_mod):", out_s.shape)

    # Training: gradients flow through the fused kernel (FP32, STE for
    # quantized).
    def loss(q):
        return jnp.sum(umfa_tpu.attention(q, k, v, is_causal=True).astype(jnp.float32) ** 2)

    dq = jax.grad(loss)(q)
    print("grad:", dq.shape, dq.dtype)

    print("dispatch stats:", umfa_tpu.get_dispatch_stats())


if __name__ == "__main__":
    main()
