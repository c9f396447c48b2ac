"""RoPE, Hadamard, MLA op tests (reference parity: rope_rotate kernels,
HadamardRotation, MLAOptimizedGEMMMFA + sparse indexer — SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.ops.attention import flash_attention, reference_attention
from umfa_tpu.ops.hadamard import hadamard_rotate
from umfa_tpu.ops.mla import mla_decompress, mla_attention, sparse_indexer_scores
from umfa_tpu.ops.rope import apply_rope, rope_angles, rope_attention
from umfa_tpu.utils.testing import TOL, make_qkv


# ---------------- RoPE ----------------

def test_rope_exact_inverse(rng):
    # negate_sin gives the exact inverse (reference: MFABridge.swift:269-319).
    x = jnp.asarray(rng.normal(0, 1, (1, 2, 64, 64)), jnp.float32)
    cos, sin = rope_angles(64, 64)
    y = apply_rope(x, cos, sin)
    x_back = apply_rope(y, cos, sin, negate_sin=True)
    np.testing.assert_allclose(x_back, x, atol=1e-5, rtol=1e-5)


def test_rope_preserves_norm(rng):
    x = jnp.asarray(rng.normal(0, 1, (1, 1, 32, 64)), jnp.float32)
    cos, sin = rope_angles(32, 64)
    y = apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        jnp.linalg.norm(y, axis=-1), jnp.linalg.norm(x, axis=-1),
        atol=1e-4, rtol=1e-4,
    )


def test_rope_relative_position_property(rng):
    # <rope(q, m), rope(k, n)> depends only on (m - n).
    q = jnp.asarray(rng.normal(0, 1, (64,)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (64,)), jnp.float32)
    cos, sin = rope_angles(32, 64)

    def dot_at(m, n):
        qm = apply_rope(q[None, None, None], cos[m : m + 1], sin[m : m + 1])
        kn = apply_rope(k[None, None, None], cos[n : n + 1], sin[n : n + 1])
        return float(jnp.sum(qm * kn))

    assert abs(dot_at(5, 3) - dot_at(10, 8)) < 1e-3
    assert abs(dot_at(7, 7) - dot_at(0, 0)) < 1e-3


def test_rope_attention_matches_manual(rng):
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    out = rope_attention(q, k, v, causal=True, interpret=True)
    cos, sin = rope_angles(128, 64)
    q_rot = apply_rope(q, cos, sin)
    k_rot = apply_rope(k, cos, sin)
    want = reference_attention(q_rot, k_rot, v, causal=True)
    np.testing.assert_allclose(out, want, **TOL["fp32"])


def test_rope_attention_grads(rng):
    # Gradients through fused RoPE+attention — the exact inverse rotation in
    # backward comes from autodiff of the orthogonal rotation.
    q, k, v = make_qkv(rng, 1, 1, 64, 64, 64)

    def loss(q, k, v):
        return jnp.sum(rope_attention(q, k, v, interpret=True) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


# ---------------- Hadamard ----------------

def test_hadamard_self_inverse(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 3, 16, 64)), jnp.float32)
    y = hadamard_rotate(hadamard_rotate(x))
    np.testing.assert_allclose(y, x, atol=1e-5, rtol=1e-5)


def test_hadamard_orthogonal(rng):
    # Norm-preserving (orthogonal transform).
    x = jnp.asarray(rng.normal(0, 1, (1, 1, 8, 128)), jnp.float32)
    y = hadamard_rotate(x)
    np.testing.assert_allclose(
        jnp.linalg.norm(y, axis=-1), jnp.linalg.norm(x, axis=-1),
        atol=1e-4, rtol=1e-4,
    )


def test_hadamard_blockwise(rng):
    x = jnp.asarray(rng.normal(0, 1, (4, 128)), jnp.float32)
    y = hadamard_rotate(x, block_size=32)
    # Self-inverse per block too.
    np.testing.assert_allclose(
        hadamard_rotate(y, block_size=32), x, atol=1e-5, rtol=1e-5
    )
    # Differs from full-width transform.
    assert not np.allclose(y, hadamard_rotate(x))


def test_hadamard_matches_matrix(rng):
    # Against the explicit Hadamard matrix H_4 (normalized).
    h4 = np.array(
        [[1, 1, 1, 1], [1, -1, 1, -1], [1, 1, -1, -1], [1, -1, -1, 1]],
        np.float32,
    ) / 2.0
    x = jnp.asarray(rng.normal(0, 1, (8, 4)), jnp.float32)
    want = np.asarray(x) @ h4.T
    np.testing.assert_allclose(hadamard_rotate(x), want, atol=1e-5, rtol=1e-5)


def test_hadamard_rejects_bad_sizes():
    x = jnp.zeros((4, 96))
    with pytest.raises(ValueError):
        hadamard_rotate(x, block_size=96)  # not a power of two
    with pytest.raises(ValueError):
        hadamard_rotate(x, block_size=64)  # 96 % 64 != 0


# ---------------- MLA ----------------

def test_mla_decompress_matches_einsum(rng):
    latent = jnp.asarray(rng.normal(0, 1, (2, 64, 32)), jnp.float32)
    w_k = jnp.asarray(rng.normal(0, 1, (32, 256)), jnp.float32)
    w_v = jnp.asarray(rng.normal(0, 1, (32, 256)), jnp.float32)
    k, v = mla_decompress(latent, w_k, w_v, num_heads=4)
    assert k.shape == (2, 4, 64, 64)
    want_k = np.einsum("bsl,lf->bsf", latent, w_k).reshape(2, 64, 4, 64)
    np.testing.assert_allclose(
        k, want_k.transpose(0, 2, 1, 3), atol=1e-4, rtol=1e-4
    )


def test_sparse_indexer_scores(rng):
    q = jnp.asarray(rng.normal(0, 1, (1, 16, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (1, 32, 64)), jnp.float32)
    s = sparse_indexer_scores(q, k)
    want = np.maximum(
        np.einsum("bqd,bkd->bqk", q, k) * (64**-0.5), 0.0
    )
    np.testing.assert_allclose(s, want, atol=1e-5, rtol=1e-5)
    assert (np.asarray(s) >= 0).all()


def test_mla_absorbed_decode_identity(rng):
    """Absorbed decode == decompress-then-attend (exact algebraic identity
    Q·Kᵀ = (Q·W_kᵀ)·latentᵀ, P·V = (P·latent)·W_v)."""
    from umfa_tpu.ops.mla import mla_absorbed_decode

    q = jnp.asarray(rng.normal(0, 1, (2, 4, 1, 64)), jnp.float32)
    latent = jnp.asarray(rng.normal(0, 1, (2, 48, 32)), jnp.float32)
    w_k = jnp.asarray(rng.normal(0, 0.2, (32, 256)), jnp.float32)
    w_v = jnp.asarray(rng.normal(0, 0.2, (32, 256)), jnp.float32)
    out = mla_absorbed_decode(q, latent, w_k, w_v)
    k, v = mla_decompress(latent, w_k, w_v, num_heads=4)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(out, want, atol=2e-4, rtol=2e-4)


def test_mla_absorbed_decode_length_mask(rng):
    """Rows past each sequence's fill length must not contribute."""
    from umfa_tpu.ops.mla import mla_absorbed_decode

    q = jnp.asarray(rng.normal(0, 1, (2, 4, 1, 64)), jnp.float32)
    latent = jnp.asarray(rng.normal(0, 1, (2, 48, 32)), jnp.float32)
    w_k = jnp.asarray(rng.normal(0, 0.2, (32, 256)), jnp.float32)
    w_v = jnp.asarray(rng.normal(0, 0.2, (32, 256)), jnp.float32)
    length = jnp.asarray([16, 48], jnp.int32)
    out = mla_absorbed_decode(q, latent, w_k, w_v, length=length)
    # Garbage in the dead tail must not change the result.
    poisoned = latent.at[0, 16:].set(1e4)
    out_p = mla_absorbed_decode(q, poisoned, w_k, w_v, length=length)
    np.testing.assert_allclose(out, out_p, atol=1e-6, rtol=1e-6)
    k, v = mla_decompress(latent[:1, :16], w_k, w_v, num_heads=4)
    want0 = reference_attention(q[:1], k, v)
    np.testing.assert_allclose(out[:1], want0, atol=2e-4, rtol=2e-4)


def test_mla_absorbed_decode_chunk_causal(rng):
    """Tq>1 continuation: query i sees cache rows <= chunk_start+i."""
    from umfa_tpu.ops.mla import mla_absorbed_decode

    tq, start, s_max = 8, 16, 24
    q = jnp.asarray(rng.normal(0, 1, (1, 4, tq, 64)), jnp.float32)
    latent = jnp.asarray(rng.normal(0, 1, (1, s_max, 32)), jnp.float32)
    w_k = jnp.asarray(rng.normal(0, 0.2, (32, 256)), jnp.float32)
    w_v = jnp.asarray(rng.normal(0, 0.2, (32, 256)), jnp.float32)
    out = mla_absorbed_decode(
        q, latent, w_k, w_v,
        length=jnp.asarray([s_max], jnp.int32), chunk_start=start,
    )
    k, v = mla_decompress(latent, w_k, w_v, num_heads=4)
    bias = jnp.where(
        jnp.arange(s_max)[None, :] > start + jnp.arange(tq)[:, None],
        -1e30, 0.0,
    )
    want = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(out, want, atol=2e-4, rtol=2e-4)


def test_mla_attention_end_to_end(rng):
    q = jnp.asarray(rng.normal(0, 1, (1, 4, 64, 64)), jnp.float32)
    latent = jnp.asarray(rng.normal(0, 1, (1, 64, 32)), jnp.float32)
    w_k = jnp.asarray(rng.normal(0, 0.2, (32, 256)), jnp.float32)
    w_v = jnp.asarray(rng.normal(0, 0.2, (32, 256)), jnp.float32)
    out = mla_attention(q, latent, w_k, w_v, causal=True, interpret=True)
    k, v = mla_decompress(latent, w_k, w_v, num_heads=4)
    want = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(out, want, **TOL["fp32"])


# ---------------------------------------------------------------------------
# In-kernel fused RoPE (rotate-half) — VERDICT r4 missing #2
# ---------------------------------------------------------------------------


def _rope_xla_halfsplit(x, cos, sin):
    return apply_rope(x, cos, sin, interleaved=False)


def test_rope_inkernel_matches_xla_rotation(rng):
    # Kernel-level: flash_attention_forward(rope_cos/sin) must equal
    # XLA-rotate-then-attend exactly (same rotate-half convention), on the
    # persistent-KV-cache path (num_q_blocks > 1 via small block sizes).
    from umfa_tpu.ops.flash_fwd import BlockSizes, flash_attention_forward

    B, H, S, D = 1, 2, 256, 64
    q = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.float32)
    cos, sin = rope_angles(S, D)
    bs = BlockSizes(block_q=128, block_k=128)
    out_fused, lse_fused = flash_attention_forward(
        q, k, v, rope_cos=cos, rope_sin=sin, block_sizes=bs, interpret=True
    )
    out_ref, lse_ref = flash_attention_forward(
        _rope_xla_halfsplit(q, cos, sin), _rope_xla_halfsplit(k, cos, sin),
        v, block_sizes=bs, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(lse_fused), np.asarray(lse_ref), atol=2e-5, rtol=2e-5
    )


def test_rope_inkernel_causal_gqa(rng):
    from umfa_tpu.ops.flash_fwd import BlockSizes, flash_attention_forward

    B, Hq, Hkv, S, D = 1, 4, 2, 256, 64
    q = jnp.asarray(rng.normal(0, 1, (B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, Hkv, S, D)), jnp.float32)
    cos, sin = rope_angles(S, D)
    bs = BlockSizes(block_q=128, block_k=128)
    out_fused, _ = flash_attention_forward(
        q, k, v, causal=True, rope_cos=cos, rope_sin=sin, block_sizes=bs,
        interpret=True,
    )
    out_ref, _ = flash_attention_forward(
        _rope_xla_halfsplit(q, cos, sin), _rope_xla_halfsplit(k, cos, sin),
        v, causal=True, block_sizes=bs, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )


def test_rope_attention_fused_grads(rng):
    # rope_attention(interleaved=False) routes in-kernel; its grads must
    # match plain autodiff through XLA-rotate + attention.
    from umfa_tpu import get_dispatch_stats

    B, H, S, D = 1, 2, 128, 64
    q = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.float32)
    cos, sin = rope_angles(S, D)

    def f_fused(q, k, v):
        return jnp.sum(
            rope_attention(
                q, k, v, cos, sin, interleaved=False, causal=True,
                interpret=True,
            ).astype(jnp.float32) ** 2
        )

    def f_ref(q, k, v):
        from umfa_tpu.ops.attention import flash_attention

        return jnp.sum(
            flash_attention(
                _rope_xla_halfsplit(q, cos, sin),
                _rope_xla_halfsplit(k, cos, sin), v, causal=True,
                interpret=True,
            ).astype(jnp.float32) ** 2
        )

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4,
            err_msg=f"d{name}",
        )


def test_rope_attention_interleaved_still_works(rng):
    # interleaved=True keeps the XLA two-pass route and stays correct.
    B, H, S, D = 1, 2, 64, 32
    q = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.float32)
    cos, sin = rope_angles(S, D)
    out = rope_attention(q, k, v, cos, sin, interpret=True)
    from umfa_tpu.ops.attention import reference_attention

    want = reference_attention(apply_rope(q, cos, sin), apply_rope(k, cos, sin), v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), atol=1e-4, rtol=1e-4
    )
