"""Foreign-framework interop (dlpack torch↔jax + torch-shaped SDPA entry).

Parity: the reference's cross-framework buffer interop and torch SDPA
override (SURVEY.md N5/N6 — functional role, not mechanism)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from umfa_tpu.ops.attention import reference_attention
from umfa_tpu.utils.interop import from_torch, to_torch, torch_sdpa


def test_roundtrip():
    t = torch.randn(4, 8)
    j = from_torch(t)
    assert j.shape == (4, 8)
    np.testing.assert_allclose(np.asarray(j), t.numpy(), rtol=1e-6)
    t2 = to_torch(j)
    np.testing.assert_allclose(t2.numpy(), t.numpy(), rtol=1e-6)


def test_torch_sdpa_matches_torch(rng):
    q = torch.randn(1, 2, 64, 64)
    k = torch.randn(1, 2, 64, 64)
    v = torch.randn(1, 2, 64, 64)
    out = torch_sdpa(q, k, v, is_causal=True, interpret=True)
    assert isinstance(out, torch.Tensor)
    want = torch.nn.functional.scaled_dot_product_attention(
        q, k, v, is_causal=True
    )
    np.testing.assert_allclose(
        out.numpy(), want.numpy(), atol=1e-4, rtol=1e-4
    )


def test_torch_sdpa_bool_mask(rng):
    q = torch.randn(1, 2, 32, 64)
    k = torch.randn(1, 2, 32, 64)
    v = torch.randn(1, 2, 32, 64)
    mask = torch.rand(1, 1, 32, 32) > 0.2
    out = torch_sdpa(q, k, v, attn_mask=mask, interpret=True)
    want = torch.nn.functional.scaled_dot_product_attention(
        q, k, v, attn_mask=mask
    )
    np.testing.assert_allclose(out.numpy(), want.numpy(), atol=1e-4, rtol=1e-4)


def test_install_torch_sdpa_override():
    from umfa_tpu.utils.interop import install_torch_sdpa

    F = torch.nn.functional
    native = F.scaled_dot_product_attention
    q = torch.randn(1, 2, 64, 64)
    k = torch.randn(1, 2, 64, 64)
    v = torch.randn(1, 2, 64, 64)
    want = F.scaled_dot_product_attention(q, k, v, is_causal=True)
    uninstall = install_torch_sdpa()
    try:
        assert getattr(F.scaled_dot_product_attention, "_umfa_override", False)
        # Refcounted: a second install keeps the override; releasing it does
        # not tear down the first install's scope.
        uninstall2 = install_torch_sdpa()
        uninstall2()
        assert getattr(F.scaled_dot_product_attention, "_umfa_override", False)
        # Double-release of the same handle is a no-op (single-shot).
        uninstall2()
        assert getattr(F.scaled_dot_product_attention, "_umfa_override", False)
        out = F.scaled_dot_product_attention(q, k, v, is_causal=True)
        np.testing.assert_allclose(
            out.numpy(), want.numpy(), atol=1e-4, rtol=1e-4
        )
        # Dropout falls back to the native path (no error, stochastic out).
        F.scaled_dot_product_attention(q, k, v, dropout_p=0.5)
    finally:
        uninstall()
    assert F.scaled_dot_product_attention is native


def test_install_torch_sdpa_gqa():
    from umfa_tpu.utils.interop import install_torch_sdpa

    F = torch.nn.functional
    q = torch.randn(1, 4, 64, 64)
    k = torch.randn(1, 2, 64, 64)
    v = torch.randn(1, 2, 64, 64)
    want = F.scaled_dot_product_attention(q, k, v, enable_gqa=True)
    uninstall = install_torch_sdpa()
    try:
        out = F.scaled_dot_product_attention(q, k, v, enable_gqa=True)
        np.testing.assert_allclose(
            out.numpy(), want.numpy(), atol=1e-4, rtol=1e-4
        )
        # Head mismatch without enable_gqa must still raise (native
        # semantics preserved).
        with pytest.raises(RuntimeError):
            F.scaled_dot_product_attention(q, k, v)
    finally:
        uninstall()


def test_use_torch_sdpa_context_manager():
    from umfa_tpu.utils.interop import use_torch_sdpa

    F = torch.nn.functional
    native = F.scaled_dot_product_attention
    q = torch.randn(1, 2, 64, 64)
    want = F.scaled_dot_product_attention(q, q, q, is_causal=True)
    with use_torch_sdpa():
        assert getattr(F.scaled_dot_product_attention, "_umfa_override", False)
        out = F.scaled_dot_product_attention(q, q, q, is_causal=True)
    assert F.scaled_dot_product_attention is native
    np.testing.assert_allclose(out.numpy(), want.numpy(), atol=1e-4, rtol=1e-4)


def test_use_torch_sdpa_nesting_safe():
    """An inner scope exiting must NOT uninstall the outer scope's override
    (round-2 bug: install_torch_sdpa returned the same uninstaller when
    already installed, so the inner __exit__ tore down the outer scope)."""
    from umfa_tpu.utils.interop import install_torch_sdpa, use_torch_sdpa

    F = torch.nn.functional
    native = F.scaled_dot_product_attention
    with use_torch_sdpa():
        with use_torch_sdpa():
            assert getattr(F.scaled_dot_product_attention, "_umfa_override", False)
        # Inner exited; outer scope must still be overridden.
        assert getattr(F.scaled_dot_product_attention, "_umfa_override", False)
    assert F.scaled_dot_product_attention is native

    # Explicit install + nested context manager.
    uninstall = install_torch_sdpa()
    with use_torch_sdpa():
        pass
    assert getattr(F.scaled_dot_product_attention, "_umfa_override", False)
    uninstall()
    assert F.scaled_dot_product_attention is native
