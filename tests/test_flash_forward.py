"""Dense fused forward vs naive reference — the analogue of the reference's
MultiHeadFFITests precision/shape sweeps (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.ops.attention import flash_attention, reference_attention
from umfa_tpu.ops.flash_fwd import flash_attention_forward, BlockSizes
from umfa_tpu.utils.testing import TOL, make_qkv, rel_err


@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_reference_fp32(rng, causal):
    # BASELINE config 1: B=1 H=8 D=64 S=1024 causal, interpret on CPU.
    q, k, v = make_qkv(rng, 1, 8, 1024, 1024, 64)
    out, lse = flash_attention_forward(q, k, v, causal=causal, interpret=True)
    want = reference_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(out, want, **TOL["fp32"])
    assert lse.shape == (1, 8, 1024)
    assert np.isfinite(np.asarray(lse)).all()


def test_lse_values(rng):
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    _, lse = flash_attention_forward(q, k, v, interpret=True)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (64**-0.5)
    want = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(lse, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "b,h,sq,sk,d",
    [
        (1, 1, 128, 128, 64),
        (2, 4, 256, 256, 64),
        (1, 2, 128, 512, 128),   # cross attention
        (1, 2, 512, 128, 64),    # cross attention, long q
        (1, 1, 100, 100, 64),    # ragged seq (padding path)
        (1, 1, 64, 192, 64),     # ragged kv
    ],
)
def test_forward_shapes(rng, b, h, sq, sk, d):
    q, k, v = make_qkv(rng, b, h, sq, sk, d)
    out, _ = flash_attention_forward(q, k, v, interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(out, want, **TOL["fp32"])


def test_forward_causal_ragged(rng):
    q, k, v = make_qkv(rng, 1, 2, 200, 200, 64)
    out, _ = flash_attention_forward(q, k, v, causal=True, interpret=True)
    want = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(out, want, **TOL["fp32"])


def test_forward_bf16(rng):
    q, k, v = make_qkv(rng, 1, 4, 256, 256, 64, dtype=jnp.bfloat16)
    out, _ = flash_attention_forward(q, k, v, interpret=True)
    want = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want), **TOL["bf16"]
    )


def test_custom_scale(rng):
    # Reference: test_scale_factor_fix.py — custom softmax scale.
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    out, _ = flash_attention_forward(q, k, v, scale=0.5, interpret=True)
    want = reference_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(out, want, **TOL["fp32"])
    # and causal != non-causal (reference: test_basic.py:214)
    out_c, _ = flash_attention_forward(q, k, v, causal=True, interpret=True)
    assert not np.allclose(out, out_c)


def test_gqa_zero_copy(rng):
    q, k, v = make_qkv(rng, 2, 8, 128, 128, 64, kv_heads=2)
    out, _ = flash_attention_forward(q, k, v, interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(out, want, **TOL["fp32"])


@pytest.mark.parametrize("window", [(64, 0), (32, 32), (-1, 16), (128, -1)])
def test_sliding_window(rng, window):
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    out, _ = flash_attention_forward(q, k, v, window=window, interpret=True)
    want = reference_attention(q, k, v, window=window)
    np.testing.assert_allclose(out, want, **TOL["fp32"])


def test_additive_bias_broadcast(rng):
    q, k, v = make_qkv(rng, 2, 4, 128, 128, 64)
    # (1, 1, Sq, Sk) broadcast bias
    bias = jnp.asarray(rng.normal(0, 1, (1, 1, 128, 128)), jnp.float32)
    out, _ = flash_attention_forward(q, k, v, bias, interpret=True)
    want = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(out, want, **TOL["fp32"])
    # per-head bias (1, H, Sq, Sk)
    bias_h = jnp.asarray(rng.normal(0, 1, (1, 4, 128, 128)), jnp.float32)
    out_h, _ = flash_attention_forward(q, k, v, bias_h, interpret=True)
    want_h = reference_attention(q, k, v, bias_h)
    np.testing.assert_allclose(out_h, want_h, **TOL["fp32"])


def test_alibi_style_q_broadcast_bias(rng):
    # (1, H, 1, Sk) bias broadcast over query rows — regression: broadcast
    # decision must precede padding (a padded-to-block bias read zeros for
    # every q row > 0).
    q, k, v = make_qkv(rng, 2, 4, 256, 256, 64)
    bias = jnp.asarray(rng.normal(0, 1, (1, 4, 1, 256)), jnp.float32)
    out, _ = flash_attention_forward(q, k, v, bias, interpret=True)
    want = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(out, want, **TOL["fp32"])


def test_bias_plus_causal(rng):
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    bias = jnp.asarray(rng.normal(0, 1, (1, 1, 128, 128)), jnp.float32)
    out, _ = flash_attention_forward(q, k, v, bias, causal=True, interpret=True)
    want = reference_attention(q, k, v, bias, causal=True)
    np.testing.assert_allclose(out, want, **TOL["fp32"])


def test_small_blocks(rng):
    bs = BlockSizes(block_q=64, block_k=64)
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    out, _ = flash_attention_forward(
        q, k, v, causal=True, block_sizes=bs, interpret=True
    )
    want = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(out, want, **TOL["fp32"])


def test_seq_smaller_than_block(rng):
    q, k, v = make_qkv(rng, 1, 2, 16, 16, 64)
    out, _ = flash_attention_forward(q, k, v, interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(out, want, **TOL["fp32"])


def test_kv_cache_active_shapes(rng):
    """Shapes with multiple q-blocks exercise the persistent KV VMEM cache
    (fill-on-first-touch; see _fwd_kernel): parity across dense / causal /
    window / GQA / bias with the cache engaged."""
    from umfa_tpu.ops.flash_fwd import flash_attention_forward

    for (hq, hkv, seq, d, causal, win) in [
        (2, 2, 2048, 64, False, None),
        (4, 2, 2048, 64, True, None),
        (2, 2, 1664, 64, True, (512, -1)),
        (2, 2, 2048, 128, False, (256, 128)),
    ]:
        q, k, v = make_qkv(rng, 1, hq, seq, seq, d, kv_heads=hkv)
        out, lse = flash_attention_forward(
            q, k, v, causal=causal, window=win, interpret=True
        )
        ke = jnp.repeat(k, hq // hkv, 1) if hkv != hq else k
        ve = jnp.repeat(v, hq // hkv, 1) if hkv != hq else v
        want = reference_attention(q, ke, ve, causal=causal, window=win)
        assert rel_err(out, want) < 2e-5, (hq, hkv, seq, d, causal, win)

    # bias + cache
    q, k, v = make_qkv(rng, 1, 2, 1536, 1536, 64)
    bias = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (1, 1, 1536, 1536)), jnp.float32
    )
    out, _ = flash_attention_forward(q, k, v, bias, interpret=True)
    want = reference_attention(q, k, v, bias)
    assert rel_err(out, want) < 2e-5


def test_causal_diag_subtile_path(rng):
    """The causal diagonal fast path (q-row sub-blocks over the visible
    column prefix, shared w x w triangle bias) must be active for plain
    causal calls and match the reference bit-tight, grads included."""
    from umfa_tpu.ops.flash_fwd import _diag_subtile_count

    # Path activation conditions (fwd prefers NS=2, bwd NS=4 — measured
    # per-direction on v5e, see _diag_subtile_count docstring).
    assert _diag_subtile_count(1024, 1024, True, None, 4096, False) == 2
    assert _diag_subtile_count(
        1024, 1024, True, None, 4096, False, prefer_ns=(4, 2)) == 4
    assert _diag_subtile_count(512, 512, True, None, 4096, False) == 2
    assert _diag_subtile_count(256, 256, True, None, 4096, False) == 2
    assert _diag_subtile_count(1024, 512, True, None, 4096, False) == 0
    assert _diag_subtile_count(1024, 1024, True, (64, 0), 4096, False) == 0
    assert _diag_subtile_count(1024, 1024, True, None, 4095, False) == 0
    assert _diag_subtile_count(1024, 1024, True, None, 4096, True) == 0
    assert _diag_subtile_count(1024, 1024, False, None, 4096, False) == 0

    # Multi-q-block causal parity (4 q-blocks, 4 diagonal tiles), explicit
    # equal tiles so the diagonal path engages, GQA exercises the shared
    # cache fill.
    from umfa_tpu.ops.attention import flash_attention

    q, k, v = make_qkv(rng, 1, 4, 1024, 1024, 64, kv_heads=2)
    bs = BlockSizes(block_q=256, block_k=256)
    out = flash_attention(
        q, k, v, causal=True, block_sizes=bs, interpret=True
    )
    want = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), **TOL["fp32"])

    g = jax.grad(lambda q: jnp.sum(flash_attention(
        q, k, v, causal=True, block_sizes=bs, interpret=True
    ) ** 2))(q)
    gr = jax.grad(lambda q: jnp.sum(reference_attention(
        q, k, v, causal=True
    ) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4, rtol=2e-4)


def test_causal_diag_rect_path(rng):
    """Rectangular diagonal mode (bq = 2*bk, plain causal at DEFAULT tiles,
    bf16-class inputs): the two partial tiles per q-tile split at the
    diagonal (shared w x w triangle on one half, one unmasked w-row update
    on the other) while FULL tiles run at the doubled q-tile rate. Measured
    v5e: FLUX-geometry causal 1.76 -> 1.63 ms; never loses elsewhere.
    fp32 must NOT take it (scoped-vmem OOM at bq=2048, measured)."""
    from umfa_tpu.ops.attention import flash_attention

    # bf16 default tiles at S=2048: bk=1024 -> rect engages (bq=2048).
    q, k, v = make_qkv(rng, 1, 4, 2048, 2048, 64, kv_heads=2)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(qb, kb, vb, causal=True, interpret=True)
    want = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want), atol=8e-3, rtol=8e-3
    )
    g = jax.grad(lambda q: jnp.sum(flash_attention(
        q, kb, vb, causal=True, interpret=True
    ).astype(jnp.float32) ** 2))(qb)
    gr = jax.grad(lambda q: jnp.sum(reference_attention(
        q.astype(jnp.float32), k, v, causal=True
    ) ** 2))(q).astype(jnp.float32)
    rel = float(jnp.linalg.norm(g.astype(jnp.float32) - gr)
                / jnp.linalg.norm(gr))
    assert rel < 2e-2, rel

    # fp32 stays on the square path and stays exact.
    out32 = flash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out32), np.asarray(want), **TOL["fp32"]
    )


@pytest.mark.parametrize("seq,causal,window", [
    (384, True, None),       # aligned, multi-small-tile causal
    (333, True, None),       # unaligned: KV tail padding + causal
    (333, False, (64, 0)),   # unaligned + window
    (130, True, None),       # barely above one lane tile
])
def test_odd_shape_parity(rng, seq, causal, window):
    """Padding/diagonal interaction fuzz: unaligned sequence lengths through
    forward AND gradients must match the reference (the diagonal fast paths
    must correctly disable or stay exact under KV-tail padding)."""
    from umfa_tpu.ops.attention import flash_attention

    q, k, v = make_qkv(rng, 1, 2, seq, seq, 64)
    bs = BlockSizes(
        block_q=128, block_k=128, block_q_dq=128, block_k_dq=128,
        block_q_dkv=128, block_k_dkv=128,
    )
    out = flash_attention(
        q, k, v, causal=causal, window=window, block_sizes=bs,
        interpret=True,
    )
    want = reference_attention(q, k, v, causal=causal, window=window)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), **TOL["fp32"]
    )

    g = jax.grad(lambda q: jnp.sum(flash_attention(
        q, k, v, causal=causal, window=window, block_sizes=bs,
        interpret=True,
    ) ** 2))(q)
    gr = jax.grad(lambda q: jnp.sum(reference_attention(
        q, k, v, causal=causal, window=window
    ) ** 2))(q)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(gr), atol=3e-4, rtol=3e-4
    )


def test_causal_diag_rect_kv_cache_branch(rng):
    """S=4096 rect mode on the DENSE kernel: num_q_blocks = 2 so
    use_kv_cache=True — the kcache/vcache reads, ones-column psum
    (D=64 < 128), and the two-tile-per-q-block fill schedule under GQA all
    run through _do_update_rect's cached branch (ADVICE r3: the S=2048 test
    only exercised the streaming branch). Engagement asserted via the
    shared gate."""
    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.flash_fwd import _rect_mode_ok

    assert _rect_mode_ok(
        causal=True, window=None, has_bias=False, has_map=False,
        has_fetch=False, default_blocks=True,
        block_k=1024, seq_q=4096, seq_k=4096,
    )
    q, k, v = make_qkv(rng, 1, 4, 4096, 4096, 64, kv_heads=2)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(qb, kb, vb, causal=True, interpret=True)
    ke, ve = jnp.repeat(k, 2, 1), jnp.repeat(v, 2, 1)
    want = reference_attention(q, ke, ve, causal=True)
    rel = rel_err(out, want)
    assert rel < 8e-3, rel


def test_diag_ns_env_validation(rng, monkeypatch):
    """UMFA_DIAG_NS is an A/B knob: a typo must not silently measure the
    no-diag path (ADVICE r3). Non-integers raise; integers that disable the
    path warn."""
    import warnings

    from umfa_tpu.ops.flash_fwd import _diag_subtile_count

    monkeypatch.setenv("UMFA_DIAG_NS", "two")
    with pytest.raises(ValueError, match="not an integer"):
        _diag_subtile_count(1024, 1024, True, None, 4096, False)

    monkeypatch.setenv("UMFA_DIAG_NS", "3")  # 1024 % 3 != 0 -> disables
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert _diag_subtile_count(1024, 1024, True, None, 4096, False) == 0
    assert any("NO-diag" in str(x.message) for x in w)

    monkeypatch.setenv("UMFA_DIAG_NS", "4")
    assert _diag_subtile_count(1024, 1024, True, None, 4096, False) == 4
