"""Foreign-framework tensor interop.

Functional parity with the reference's zero-copy buffer interop
(MFABridge.swift:848-1053 wraps host pointers / foreign MTLBuffers;
mps_utils.mm steals torch's buffers). On TPU the equivalent is DLPack:
torch/numpy tensors come in without copies where the backends allow it, and
the public API stays framework-agnostic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def from_torch(t):
    """torch.Tensor → jax.Array (DLPack, zero-copy on shared backends)."""
    try:
        import torch  # noqa: F401
        import torch.utils.dlpack as tdl
    except ImportError as e:
        raise ImportError("torch not available") from e
    if t.device.type != "cpu":
        t = t.detach().cpu()
    else:
        t = t.detach()
    try:
        return jnp.from_dlpack(t.contiguous())
    except Exception:
        return jnp.asarray(t.numpy())


def to_torch(x: jax.Array):
    """jax.Array → torch.Tensor."""
    try:
        import torch
        import torch.utils.dlpack as tdl
    except ImportError as e:
        raise ImportError("torch not available") from e
    import numpy as np

    try:
        return tdl.from_dlpack(jax.device_get(x).__dlpack__())
    except Exception:
        return torch.from_numpy(np.asarray(jax.device_get(x)))


# Refcount for nested installs: the override is removed only when the LAST
# outstanding uninstaller runs, so an inner `with use_torch_sdpa():` cannot
# tear down an outer scope's override.
_sdpa_install_count = 0
_sdpa_native = None


def install_torch_sdpa():
    """Install a process-wide override of
    `torch.nn.functional.scaled_dot_product_attention` that routes through
    the fused TPU kernels — the role of the reference's ATen-dispatcher
    override that importing its extension installs for MPS tensors
    (examples/zimage/zimage_turbo.py:4-7, metal_sdpa_backend.cpp:3426-3432).
    torch here is CPU-only, so models run through torch end-to-end get
    their attention offloaded to the TPU; everything else stays in torch.

    Returns an `uninstall()` callable. Installs are refcounted: each call
    returns a single-shot uninstaller, and the native SDPA is restored only
    when every outstanding uninstaller has run — nesting-safe.
    """
    global _sdpa_install_count, _sdpa_native
    import torch
    import torch.nn.functional as F

    _sdpa_install_count += 1

    def make_uninstall():
        done = False

        def uninstall():
            nonlocal done
            global _sdpa_install_count, _sdpa_native
            if done:
                return
            done = True
            _sdpa_install_count -= 1
            if _sdpa_install_count == 0 and _sdpa_native is not None:
                F.scaled_dot_product_attention = _sdpa_native
                torch.nn.functional.scaled_dot_product_attention = _sdpa_native
                _sdpa_native = None

        return uninstall

    if _sdpa_install_count > 1:
        return make_uninstall()

    native = F.scaled_dot_product_attention
    _sdpa_native = native

    def sdpa(query, key, value, attn_mask=None, dropout_p=0.0,
             is_causal=False, scale=None, enable_gqa=False):
        # Train-time dropout, <4-D inputs, and exotic dtypes keep torch's
        # native path.
        if (dropout_p != 0.0 or query.dim() != 4 or query.dtype not in
                (torch.float16, torch.bfloat16, torch.float32)):
            return native(query, key, value, attn_mask=attn_mask,
                          dropout_p=dropout_p, is_causal=is_causal,
                          scale=scale, enable_gqa=enable_gqa)
        if not enable_gqa and key.shape[1] != query.shape[1]:
            # torch semantics: mismatched heads without enable_gqa is an
            # error — let native raise it.
            return native(query, key, value, attn_mask=attn_mask,
                          dropout_p=dropout_p, is_causal=is_causal,
                          scale=scale, enable_gqa=enable_gqa)
        return torch_sdpa(query, key, value, attn_mask=attn_mask,
                          is_causal=is_causal, scale=scale)

    sdpa._umfa_override = True
    F.scaled_dot_product_attention = sdpa
    torch.nn.functional.scaled_dot_product_attention = sdpa
    return make_uninstall()


class use_torch_sdpa:
    """Context manager scoping the SDPA override (the reference's
    `use_metal_sdpa()`, pytorch_custom_op_ffi/backend.py):

        with use_torch_sdpa():
            out = F.scaled_dot_product_attention(q, k, v)  # runs on TPU
    """

    def __enter__(self):
        self._uninstall = install_torch_sdpa()
        return self

    def __exit__(self, *exc):
        self._uninstall()
        return False


def torch_sdpa(q, k, v, attn_mask=None, is_causal=False, scale=None, **kwargs):
    """torch-tensor-shaped SDPA entry: accepts torch tensors, runs the fused
    TPU kernels, returns a torch tensor. The role of the reference's
    `torch.nn.functional.scaled_dot_product_attention` override
    (metal_sdpa_backend.cpp:3426-3432), minus the dispatcher-key hack that
    only makes sense in-process with torch's MPS runtime."""
    from umfa_tpu.api import attention

    jq, jk, jv = from_torch(q), from_torch(k), from_torch(v)
    jmask = from_torch(attn_mask) if attn_mask is not None else None
    out = attention(jq, jk, jv, jmask, is_causal=is_causal, scale=scale, **kwargs)
    return to_torch(out)
