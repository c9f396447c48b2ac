"""Drop-in torch SDPA replacement running on the TPU.

TPU-native analogue of the reference's process-wide SDPA override
(examples/pytorch_sdpa_replacement.py and the ATen dispatcher override that
importing its extension installs, metal_sdpa_backend.cpp:3426-3432): after
`install_torch_sdpa()`, any torch model calling
`F.scaled_dot_product_attention` — including `nn.MultiheadAttention` and
HuggingFace `sdpa` attention backends — gets its attention computed by the
fused Pallas kernels, with no model changes.

Run: python examples/torch_sdpa_replacement.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import torch
import torch.nn.functional as F

from umfa_tpu.utils.interop import install_torch_sdpa


def main():
    torch.manual_seed(0)
    B, H, S, D = 2, 8, 1024, 64
    q = torch.randn(B, H, S, D)
    k = torch.randn(B, H, S, D)
    v = torch.randn(B, H, S, D)

    # Native torch reference (before the override).
    want = F.scaled_dot_product_attention(q, k, v, is_causal=True)

    uninstall = install_torch_sdpa()
    try:
        assert getattr(F.scaled_dot_product_attention, "_umfa_override", False)
        got = F.scaled_dot_product_attention(q, k, v, is_causal=True)
        rel = (got - want).norm() / want.norm()
        print(f"causal SDPA via umfa_tpu: relerr {rel:.2e}")

        # A whole torch module runs unmodified: MultiheadAttention calls
        # F.scaled_dot_product_attention internally.
        mha = torch.nn.MultiheadAttention(H * D, H, batch_first=True)
        x = torch.randn(B, S, H * D)
        with torch.no_grad():
            out_umfa, _ = mha(x, x, x, need_weights=False)
        uninstall()
        with torch.no_grad():
            out_native, _ = mha(x, x, x, need_weights=False)
        rel = (out_umfa - out_native).norm() / out_native.norm()
        print(f"nn.MultiheadAttention via umfa_tpu: relerr {rel:.2e}")

        # GQA + bool mask through the override.
        install_torch_sdpa()
        kg = torch.randn(B, H // 4, S, D)
        vg = torch.randn(B, H // 4, S, D)
        mask = torch.rand(S, S) > 0.1
        got = F.scaled_dot_product_attention(
            q, kg, vg, attn_mask=mask, enable_gqa=True
        )
        want = F.scaled_dot_product_attention(
            q.double(), kg.double(), vg.double(), attn_mask=mask,
            enable_gqa=True,
        ).float()
        rel = (got - want).norm() / want.norm()
        print(f"GQA + bool mask via umfa_tpu: relerr {rel:.2e}")
    finally:
        uninstall()


if __name__ == "__main__":
    main()
