"""Quantized fused attention accuracy + STE backward acceptance.

Acceptance criteria from the reference (BASELINE.md): INT8 kernel-level
relative error small vs FP32; INT4 coarser; quantized backward
cosine ≥ 0.7 and relative error ≤ 30% vs the float reference
(docs/attic/QUANTIZED_TRAINING_BINDINGS.md:14)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.engine.config import (
    Precision,
    QuantMode,
    QuantStrategy,
    QuantizationConfig,
)
from umfa_tpu.ops.attention import reference_attention
from umfa_tpu.ops.quant_attention import quantized_flash_attention
from umfa_tpu.utils.testing import (
    BWD_COSINE_MIN,
    BWD_REL_ERR_MAX,
    INT4_REL_ERR,
    INT8_REL_ERR,
    cosine,
    make_qkv,
    rel_err,
)


def _cfg(precision, mode=QuantMode.ROW, strategy=QuantStrategy.SYMMETRIC,
         hadamard=False):
    return QuantizationConfig(
        q_precision=precision, k_precision=precision, v_precision=precision,
        mode=mode, strategy=strategy, hadamard=hadamard,
    )


@pytest.mark.parametrize("mode", [QuantMode.TENSOR, QuantMode.ROW, QuantMode.BLOCK])
def test_int8_accuracy(rng, mode):
    q, k, v = make_qkv(rng, 1, 4, 256, 256, 64)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT8, mode), interpret=True
    )
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT8_REL_ERR, mode


@pytest.mark.parametrize("strategy", [QuantStrategy.SYMMETRIC, QuantStrategy.ASYMMETRIC])
def test_int8_strategies(rng, strategy):
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT8, strategy=strategy), interpret=True
    )
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT8_REL_ERR, strategy


def test_int8_causal(rng):
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT8), causal=True, interpret=True
    )
    want = reference_attention(q, k, v, causal=True)
    assert rel_err(out, want) < INT8_REL_ERR


def test_int4_accuracy(rng):
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT4), interpret=True
    )
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT4_REL_ERR


def test_int4_blockwise_window_bias(rng):
    # BASELINE config 3 (reduced shape): INT4 block-wise + sliding window +
    # arbitrary bias.
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    bias = jnp.asarray(rng.normal(0, 0.5, (1, 1, 256, 256)), jnp.float32)
    win = (64, -1)
    out = quantized_flash_attention(
        q, k, v, bias, config=_cfg(Precision.INT4, QuantMode.BLOCK),
        window=win, interpret=True,
    )
    want = reference_attention(q, k, v, bias, window=win)
    # BLOCK granularity is coarser than ROW and windows shrink the softmax
    # support — slightly wider envelope on worst-case i.i.d. inputs.
    assert rel_err(out, want) < INT4_REL_ERR * 1.25


def test_mixed_precision_operands(rng):
    # Per-operand precision (reference: QuantizedAttention.Configuration).
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    cfg = QuantizationConfig(
        q_precision=Precision.INT8,
        k_precision=Precision.INT8,
        v_precision=Precision.INT4,
        mode=QuantMode.ROW,
    )
    out = quantized_flash_attention(q, k, v, config=cfg, interpret=True)
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT4_REL_ERR


def test_hadamard_rotation_path(rng):
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT4, hadamard=True), interpret=True
    )
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT4_REL_ERR


def test_hadamard_helps_outliers(rng):
    # Random-sign outliers in one channel (not removable by mean smoothing)
    # — FWHT spreads their energy across the block.
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    spike = np.zeros((1, 2, 128, 64), np.float32)
    spike[..., 3] = rng.choice([-30.0, 30.0], size=(1, 2, 128))
    q = q + jnp.asarray(spike)
    want = reference_attention(q, k, v)
    err_plain = rel_err(
        quantized_flash_attention(
            q, k, v, config=_cfg(Precision.INT4, QuantMode.TENSOR), interpret=True
        ),
        want,
    )
    err_had = rel_err(
        quantized_flash_attention(
            q, k, v,
            config=_cfg(Precision.INT4, QuantMode.TENSOR, hadamard=True),
            interpret=True,
        ),
        want,
    )
    assert err_had < err_plain


def test_pv_int8_fully_integer_path(rng):
    # Opt-in integer P·V: accuracy stays int8-grade despite per-tile V
    # scales + P rounding.
    import dataclasses

    q, k, v = make_qkv(rng, 1, 4, 256, 256, 64)
    cfg = dataclasses.replace(_cfg(Precision.INT8), pv_int8=True)
    out = quantized_flash_attention(q, k, v, config=cfg, interpret=True)
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT8_REL_ERR * 1.5
    # causal too
    out_c = quantized_flash_attention(
        q, k, v, config=cfg, causal=True, interpret=True
    )
    want_c = reference_attention(q, k, v, causal=True)
    assert rel_err(out_c, want_c) < INT8_REL_ERR * 1.5


def test_quantized_backward_ste(rng):
    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)

    def loss_q(q, k, v):
        return jnp.sum(
            quantized_flash_attention(
                q, k, v, config=_cfg(Precision.INT8), interpret=True
            )
            ** 2
        )

    def loss_f(q, k, v):
        return jnp.sum(reference_attention(q, k, v) ** 2)

    got = jax.grad(loss_q, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        assert cosine(g, w) >= BWD_COSINE_MIN, f"d{name} cosine"
        assert rel_err(g, w) <= BWD_REL_ERR_MAX, f"d{name} rel err"


def test_quantized_gqa(rng):
    q, k, v = make_qkv(rng, 1, 8, 128, 128, 64, kv_heads=2)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT8), interpret=True
    )
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT8_REL_ERR


def test_quantized_lse_close_to_dense(rng):
    # smooth=False: K-channel smoothing deliberately shifts LSE by a per-row
    # constant (softmax-invariant), so only the unsmoothed LSE is comparable.
    import dataclasses

    from umfa_tpu.ops.flash_fwd import flash_attention_forward

    q, k, v = make_qkv(rng, 1, 2, 128, 128, 64)
    cfg = dataclasses.replace(_cfg(Precision.INT8), smooth=False)
    _, lse_q = quantized_flash_attention(
        q, k, v, config=cfg, interpret=True, return_lse=True
    )
    _, lse_d = flash_attention_forward(q, k, v, interpret=True)
    np.testing.assert_allclose(lse_q, lse_d, atol=0.1, rtol=0.02)


# ---- block-sparse masks through the quantized kernels (VERDICT r1 #1) ----

def _block_diag_mask(seq, tile):
    """Tile-aligned block-diagonal mask: no PARTIAL tiles → bias is None."""
    q_ids = jnp.arange(seq)[:, None]
    k_ids = jnp.arange(seq)[None, :]
    return (q_ids // tile) == (k_ids // tile)


def test_quantized_tile_aligned_block_mask(rng):
    """Regression: the quantized route used to silently DROP tile-aligned
    BlockMasks (bias=None when no tile is PARTIAL) and attend everywhere
    (VERDICT r1 'What's weak #1')."""
    from umfa_tpu.ops.block_mask import make_block_mask
    from umfa_tpu.ops.flash_fwd import BlockSizes

    seq = 512
    bs = BlockSizes(block_q=128, block_k=128)
    mask = _block_diag_mask(seq, 128)
    bm = make_block_mask(mask, seq, seq, block_sizes=bs)
    assert bm.bias is None, "repro requires a bias-free (tile-aligned) mask"

    q, k, v = make_qkv(rng, 1, 2, seq, seq, 64)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT8), block_mask=bm,
        block_sizes=bs, interpret=True,
    )
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    want_masked = reference_attention(q, k, v, bias[None, None])
    want_unmasked = reference_attention(q, k, v)
    assert rel_err(out, want_masked) < INT8_REL_ERR
    assert rel_err(out, want_unmasked) > 0.1  # mask actually applied


def test_quantized_partial_block_mask(rng):
    """Mask with PARTIAL tiles (non-tile-aligned): quantized kernel applies
    the intra-tile bias AND skips fully-masked tiles."""
    from umfa_tpu.ops.block_mask import make_block_mask
    from umfa_tpu.ops.flash_fwd import BlockSizes

    seq = 384
    bs = BlockSizes(block_q=128, block_k=128)
    mask = _block_diag_mask(seq, 96)  # 96 not a multiple of 128 → partials
    bm = make_block_mask(mask, seq, seq, block_sizes=bs)
    assert bm.bias is not None

    q, k, v = make_qkv(rng, 1, 2, seq, seq, 64)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT8), block_mask=bm,
        block_sizes=bs, interpret=True,
    )
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    want = reference_attention(q, k, v, bias[None, None])
    assert rel_err(out, want) < INT8_REL_ERR


def test_quantized_block_mask_fully_masked_rows(rng):
    """Fully-masked query rows return exactly 0 (not the restored V-mean) —
    ADVICE r1: vm restoration must be gated on live rows."""
    from umfa_tpu.ops.block_mask import make_block_mask
    from umfa_tpu.ops.flash_fwd import BlockSizes

    seq = 384
    bs = BlockSizes(block_q=128, block_k=128)
    q_ids = jnp.arange(seq)[:, None]
    k_ids = jnp.arange(seq)[None, :]
    mask = (q_ids < 256) & ((q_ids // 128) == (k_ids // 128))
    bm = make_block_mask(mask, seq, seq, block_sizes=bs)

    q, k, v = make_qkv(rng, 1, 2, seq, seq, 64)
    cfg = _cfg(Precision.INT8)
    assert cfg.smooth
    out = quantized_flash_attention(
        q, k, v, config=cfg, block_mask=bm, block_sizes=bs, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out)[:, :, 256:], 0.0)
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    want = reference_attention(q, k, v, bias[None, None])
    assert rel_err(out[:, :, :256], want[:, :, :256]) < INT8_REL_ERR


def test_quantized_block_mask_grads(rng):
    """STE backward consumes the block-sparse structure: grads match the
    naive masked reference within the quantized-backward acceptance bounds."""
    from umfa_tpu.ops.block_mask import make_block_mask
    from umfa_tpu.ops.flash_fwd import BlockSizes

    seq = 256
    bs = BlockSizes(block_q=128, block_k=128)
    mask = _block_diag_mask(seq, 128)
    bm = make_block_mask(mask, seq, seq, block_sizes=bs)
    q, k, v = make_qkv(rng, 1, 2, seq, seq, 64)
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)[None, None]

    def loss_q(q, k, v):
        out = quantized_flash_attention(
            q, k, v, config=_cfg(Precision.INT8), block_mask=bm,
            block_sizes=bs, interpret=True,
        )
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        out = reference_attention(q, k, v, bias)
        return jnp.sum(out * jnp.cos(out))

    got = jax.grad(loss_q, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        assert cosine(g, w) > BWD_COSINE_MIN
        assert rel_err(g, w) < BWD_REL_ERR_MAX


def test_quantized_block_mask_gqa(rng):
    from umfa_tpu.ops.block_mask import make_block_mask
    from umfa_tpu.ops.flash_fwd import BlockSizes

    seq = 256
    bs = BlockSizes(block_q=128, block_k=128)
    mask = _block_diag_mask(seq, 128)
    bm = make_block_mask(mask, seq, seq, block_sizes=bs)
    q, k, v = make_qkv(rng, 1, 4, seq, seq, 64, kv_heads=2)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT8), block_mask=bm,
        block_sizes=bs, interpret=True,
    )
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    want = reference_attention(q, k, v, bias[None, None])
    assert rel_err(out, want) < INT8_REL_ERR


def test_hybrid_selects_block():
    """HYBRID auto-selection picks BLOCK for high per-row variance inputs
    (regression: the BLOCK branch used to be dead — VERDICT r1 #8)."""
    from umfa_tpu.ops.quant import choose_mode

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 2, 256, 64)), jnp.float32)
    assert choose_mode(x) == QuantMode.TENSOR or choose_mode(x) == QuantMode.ROW
    x_hot = x.at[:, :, 7].mul(1000.0)  # one outlier row → huge max/mean ratio
    assert choose_mode(x_hot) == QuantMode.BLOCK


# ---- quantized-NATIVE backward (VERDICT r1 #2) ----

def _native_vs_dequant_dense(rng, cfg, *, causal=False, window=None,
                             kv_heads=None, seq=256, heads=2, bias=None):
    """The native int8 backward must reproduce the dequant-dense STE grads."""
    from umfa_tpu.ops.flash_bwd import flash_attention_backward
    from umfa_tpu.ops.quant import dequantize
    from umfa_tpu.ops.quant_attention import (
        _quantize_operands,
        quantized_attention_forward,
    )
    from umfa_tpu.ops.quant_bwd import quantized_attention_backward

    q, k, v = make_qkv(rng, 1, heads, seq, seq, 64, kv_heads=kv_heads)
    qt_q, qt_k, qt_v, qm, vm, corr = _quantize_operands(q, k, v, cfg)
    out, lse = quantized_attention_forward(
        qt_q, qt_k, qt_v, bias, corr, causal=causal, window=window,
        interpret=True,
    )
    do = jnp.asarray(rng.normal(0, 1, out.shape), jnp.float32)

    corr_b = None
    if qm is not None:
        b, hq, _, d = qm.shape
        hkv = qt_k.orig_shape[1]
        grp = hq // hkv
        k_i8 = qt_k.values
        if cfg.k_precision == Precision.INT4:
            from umfa_tpu.ops.quant import unpack_int4
            k_i8 = unpack_int4(k_i8)
        cint = jnp.einsum(
            "bhgd,bhkd->bhgk",
            qm.reshape(b, hkv, grp, d), k_i8.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        corr_b = (cint * jnp.swapaxes(qt_k.scales, -1, -2)).reshape(
            b, hq, 1, seq
        )
    got = quantized_attention_backward(
        qt_q, qt_k, qt_v, out, lse, do, qm, vm, corr_b, bias,
        causal=causal, window=window, interpret=True,
    )

    q_dq = dequantize(qt_q, jnp.float32)
    k_dq = dequantize(qt_k, jnp.float32)
    v_dq = dequantize(qt_v, jnp.float32)
    if qm is not None:
        q_dq = q_dq + qm
    if vm is not None:
        v_dq = v_dq + vm
    want = flash_attention_backward(
        q_dq, k_dq, v_dq, out.astype(jnp.float32), lse, do, bias,
        causal=causal, window=window,
    )
    # bf16 matmuls on dequantized-on-load operands in the native kernels vs
    # fp32-HIGHEST in the dense path: agreement to bf16 grade. INT4's wider
    # per-row scales make the deq-product rounding relatively larger.
    tol = 2e-2 if Precision.INT4 in (
        cfg.q_precision, cfg.k_precision, cfg.v_precision
    ) else 5e-3
    for name, g, w in zip(("dq", "dk", "dv"), got, want):
        assert rel_err(g, w) < tol, (name, rel_err(g, w))


def test_native_backward_matches_dequant_dense(rng):
    _native_vs_dequant_dense(rng, _cfg(Precision.INT8))


def test_native_backward_causal(rng):
    _native_vs_dequant_dense(rng, _cfg(Precision.INT8), causal=True)


def test_native_backward_window(rng):
    _native_vs_dequant_dense(rng, _cfg(Precision.INT8), window=(64, 0))


def test_native_backward_int4(rng):
    _native_vs_dequant_dense(rng, _cfg(Precision.INT4, mode=QuantMode.BLOCK))


def test_native_backward_gqa(rng):
    _native_vs_dequant_dense(rng, _cfg(Precision.INT8), heads=4, kv_heads=2)


def test_native_backward_no_smooth(rng):
    cfg = QuantizationConfig(smooth=False)
    _native_vs_dequant_dense(rng, cfg)


def test_native_backward_bias(rng):
    rngb = np.random.default_rng(3)
    bias = jnp.asarray(rngb.normal(0, 1, (1, 1, 256, 256)), jnp.float32)
    _native_vs_dequant_dense(rng, _cfg(Precision.INT8), bias=bias)


def test_quantized_grad_via_api_uses_native(rng):
    """End-to-end jax.grad through the quantized op (symmetric → native
    kernels) stays within the quantized-backward acceptance bounds."""
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)

    def loss_q(q, k, v):
        out = quantized_flash_attention(
            q, k, v, config=_cfg(Precision.INT8), causal=True, interpret=True
        )
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        out = reference_attention(q, k, v, causal=True)
        return jnp.sum(out * jnp.cos(out))

    got = jax.grad(loss_q, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        assert cosine(g, w) > BWD_COSINE_MIN
        assert rel_err(g, w) < BWD_REL_ERR_MAX


def test_int4_default_recipe_bounds(rng):
    """Default INT4 recipe (Q/K int4 + in-kernel Hadamard + V int8):
    iid worst case within INT4_REL_ERR; structured (channel-outlier,
    moderately-peaked softmax) inputs within INT4_STRUCT_REL_ERR ~ the
    reference's ≈2% anchor (VERDICT r1 #4)."""
    from umfa_tpu.utils.testing import INT4_STRUCT_REL_ERR

    cfg = QuantizationConfig.from_mode_string("int4")
    assert cfg.v_precision == Precision.INT8 and cfg.hadamard

    # iid worst case
    q, k, v = make_qkv(rng, 1, 4, 512, 512, 64)
    out = quantized_flash_attention(q, k, v, config=cfg, interpret=True)
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT4_REL_ERR

    # structured: channel outliers + score std ~ 0.5
    qn = rng.normal(0, 1, (1, 4, 512, 64))
    kn = rng.normal(0, 1, (1, 4, 512, 64))
    ch = rng.choice(64, 4, replace=False)
    qn[..., ch] *= 8.0
    kn[..., ch] *= 8.0
    s = np.einsum("bhqd,bhkd->bhqk", qn, kn) / 8.0
    f = np.sqrt(0.5 / s.std())
    qs, ks = jnp.asarray(qn * f, jnp.float32), jnp.asarray(kn * f, jnp.float32)
    out_s = quantized_flash_attention(qs, ks, v, config=cfg, interpret=True)
    want_s = reference_attention(qs, ks, v)
    assert rel_err(out_s, want_s) < INT4_STRUCT_REL_ERR


def test_sparse_routes_through_fused_single_launch(rng):
    """Block-sparse + default int8 config must take the single-launch fused
    path (hold/fill cache-fill schedule), not the two-pass route."""
    from umfa_tpu.ops.block_mask import make_block_mask
    from umfa_tpu.ops.quant_fused_attn import fused_path_supported

    seq = 512
    bm = make_block_mask(_block_diag_mask(seq, 128), seq, seq)
    assert bm.hold_kv is not None and bm.fill_kv is not None
    cfg = QuantizationConfig()
    assert fused_path_supported(
        cfg, seq, 64, bm.block_map, bm.fetch_kv, bm.bias,
        causal=False, window=None, seq_q=seq,
        hold_kv=bm.hold_kv, fill_kv=bm.fill_kv,
        num_heads=2, num_kv_heads=2,
    )
    # bias_grad must fall back (sparse residuals have uninitialized
    # never-visited tiles the bias-grad dequantization would read).
    assert not fused_path_supported(
        cfg, seq, 64, bm.block_map, bm.fetch_kv, bm.bias,
        causal=False, window=None, seq_q=seq,
        hold_kv=bm.hold_kv, fill_kv=bm.fill_kv,
        num_heads=2, num_kv_heads=2, bias_grad=True,
    )


def test_int4_sparse_block_mask(rng):
    """Default INT4 recipe through a compiled block mask (fused path with
    nibble-packed residual emission under the hold schedule)."""
    from umfa_tpu.ops.block_mask import make_block_mask

    seq = 512
    mask = _block_diag_mask(seq, 256)
    bm = make_block_mask(mask, seq, seq)
    q, k, v = make_qkv(rng, 1, 2, seq, seq, 64)
    cfg4 = QuantizationConfig.from_mode_string("int4")
    out = quantized_flash_attention(
        q, k, v, config=cfg4, block_mask=bm, interpret=True
    )
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    want = reference_attention(q, k, v, bias[None, None])
    assert rel_err(out, want) < 0.25  # iid-gaussian int4 envelope

    # grads flow through the packed sparse residuals
    g = jax.grad(lambda q: jnp.sum(quantized_flash_attention(
        q, k, v, config=cfg4, block_mask=bm, interpret=True
    ).astype(jnp.float32) ** 2))(q)
    gr = jax.grad(lambda q: jnp.sum(reference_attention(
        q, k, v, bias[None, None]) ** 2))(q.astype(jnp.float32))
    ga = np.asarray(g, np.float32).ravel()
    gb = np.asarray(gr, np.float32).ravel()
    cos = float((ga * gb).sum() / (np.linalg.norm(ga) * np.linalg.norm(gb)))
    assert cos > 0.9, cos


def test_int4_structured_accuracy_envelope():
    """The default INT4 recipe (Q/K int4 + Hadamard, V int8) must stay in
    the reference's ~2% accuracy envelope on STRUCTURED activations
    (channel outliers + moderately peaked softmax — the distribution the
    reference's claim lives on; i.i.d. Gaussian is the 4-bit worst case
    and is bounded separately)."""
    sr = np.random.default_rng(1)
    B, H, S, D = 1, 2, 512, 64
    qs = sr.normal(0, 1, (B, H, S, D))
    ks = sr.normal(0, 1, (B, H, S, D))
    ch = sr.choice(D, 4, replace=False)
    qs[..., ch] *= 8.0
    ks[..., ch] *= 8.0
    s_std = float(
        np.einsum("bhqd,bhkd->bhqk", qs[:1, :1], ks[:1, :1]).std()
    ) / np.sqrt(D)
    f = np.sqrt(0.5 / s_std)
    q = jnp.asarray(qs * f, jnp.bfloat16)
    k = jnp.asarray(ks * f, jnp.bfloat16)
    v = jnp.asarray(sr.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
    cfg4 = QuantizationConfig.from_mode_string("int4")
    out = quantized_flash_attention(q, k, v, config=cfg4, interpret=True)
    want = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    assert rel_err(out, want) < 0.06, rel_err(out, want)  # measured ~0.024


def test_asymmetric_routes_through_fused_single_launch(rng):
    """ASYMMETRIC strategy must take the single-launch fused path (r2 sent
    it to the two-pass route, re-paying the quantizer passes — VERDICT r2
    missing #3): route assert + parity + zero-point residual contract."""
    from umfa_tpu.ops.quant_fused_attn import (
        fused_path_supported,
        fused_quantize_attend,
    )
    from umfa_tpu.ops.quant import dequantize, quantize

    cfg = _cfg(Precision.INT8, strategy=QuantStrategy.ASYMMETRIC)
    assert fused_path_supported(
        cfg, 256, 64, None, None, None,
        causal=False, window=None, seq_q=256,
    )

    # One-sided values: the regime asymmetric quantization exists for
    # (symmetric wastes half the int8 range on the empty negative side).
    q = jnp.asarray(rng.uniform(1.0, 3.0, (1, 2, 256, 64)), jnp.float32)
    k = jnp.asarray(rng.uniform(0.5, 2.0, (1, 2, 256, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (1, 2, 256, 64)), jnp.float32)

    out, lse, qt_q, qt_k, qt_v, qm, vm = fused_quantize_attend(
        q, k, v, smooth=False, strategy=QuantStrategy.ASYMMETRIC,
        interpret=True,
    )
    assert qt_q.strategy == QuantStrategy.ASYMMETRIC
    assert qt_q.zero_points is not None and qt_k.zero_points is not None
    # Emitted residuals match the two-pass quantizer contract exactly.
    for qt, x in ((qt_q, q), (qt_k, k), (qt_v, v)):
        ref_qt = quantize(
            x, Precision.INT8, QuantMode.ROW, QuantStrategy.ASYMMETRIC
        )
        dv = np.abs(
            np.asarray(qt.values, np.int32) - np.asarray(ref_qt.values, np.int32)
        )
        assert dv.max() <= 1 and np.mean(dv != 0) < 2e-3
        np.testing.assert_allclose(
            np.asarray(dequantize(qt)), np.asarray(dequantize(ref_qt)),
            rtol=1e-4, atol=1e-5,
        )
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT8_REL_ERR

    # End-to-end through the public op, gradients included.
    out2 = quantized_flash_attention(q, k, v, config=cfg, interpret=True)
    assert rel_err(out2, want) < INT8_REL_ERR
    g = jax.grad(lambda q: jnp.sum(quantized_flash_attention(
        q, k, v, config=cfg, interpret=True
    ).astype(jnp.float32) ** 2))(q)
    gr = jax.grad(lambda q: jnp.sum(
        reference_attention(q, k, v) ** 2
    ))(q)
    ga, gb = np.asarray(g, np.float32).ravel(), np.asarray(gr, np.float32).ravel()
    cos = float((ga * gb).sum() / (np.linalg.norm(ga) * np.linalg.norm(gb)))
    assert cos > 0.99, cos


def test_asymmetric_fused_smoothing_and_int4(rng):
    """ASYMMETRIC + smoothing + INT4 Q/K through the fused kernel."""
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    cfg = QuantizationConfig(
        q_precision=Precision.INT4, k_precision=Precision.INT4,
        v_precision=Precision.INT8, mode=QuantMode.ROW,
        strategy=QuantStrategy.ASYMMETRIC, hadamard=True,
    )
    from umfa_tpu.ops.quant_fused_attn import fused_path_supported

    assert fused_path_supported(
        cfg, 256, 64, None, None, None,
        causal=False, window=None, seq_q=256,
    )
    out = quantized_flash_attention(q, k, v, config=cfg, interpret=True)
    want = reference_attention(q, k, v)
    assert rel_err(out, want) < INT4_REL_ERR


def test_pv_int8_routes_through_fused_single_launch(rng):
    """config.pv_int8 must take the single-launch fused path (r2 sent it to
    the two-pass route and re-paid the quantizer passes — VERDICT r2 weak
    #2): route assert, the chunked local-max offset-encoded integer P·V
    accuracy bound (A = 255.49, per-256-column local max; measured ~1.5%
    iid vs 8.7% for r2's running-max truncation), causal, and STE
    gradients through the emitted per-chunk-scale V residuals."""
    import dataclasses

    from umfa_tpu.ops.quant_fused_attn import fused_path_supported

    cfg = dataclasses.replace(_cfg(Precision.INT8), pv_int8=True)
    assert fused_path_supported(
        cfg, 512, 64, None, None, None,
        causal=False, window=None, seq_q=512,
    )
    # Asymmetric V would need in-contraction zero-point compensation.
    acfg = dataclasses.replace(cfg, strategy=QuantStrategy.ASYMMETRIC)
    assert not fused_path_supported(
        acfg, 512, 64, None, None, None,
        causal=False, window=None, seq_q=512,
    )

    q, k, v = make_qkv(rng, 1, 2, 512, 512, 64)
    want = reference_attention(q, k, v)
    out = quantized_flash_attention(q, k, v, config=cfg, interpret=True)
    assert rel_err(out, want) < INT8_REL_ERR
    out_c = quantized_flash_attention(
        q, k, v, config=cfg, causal=True, interpret=True
    )
    want_c = reference_attention(q, k, v, causal=True)
    assert rel_err(out_c, want_c) < INT8_REL_ERR

    got = jax.grad(
        lambda q, k, v: jnp.sum(quantized_flash_attention(
            q, k, v, config=cfg, interpret=True
        ) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    ref = jax.grad(
        lambda q, k, v: jnp.sum(reference_attention(q, k, v) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for g, gr in zip(got, ref):
        assert cosine(g, gr) > BWD_COSINE_MIN
        assert rel_err(g, gr) < BWD_REL_ERR_MAX


def test_block_mode_routes_through_fused_single_launch(rng):
    """BLOCK granularity must take the single-launch fused path (r2 sent
    every non-ROW mode to the two-pass route — VERDICT r2 next #4): the
    in-register segment-max emits one scale per BlockSizeConfig rows
    (power-of-two-floored), residual metadata records BLOCK + the effective
    group, and STE gradients flow through the emitted residuals."""
    from umfa_tpu.ops.quant_fused_attn import (
        fused_path_supported,
        fused_quantize_attend,
    )

    cfg = _cfg(Precision.INT8, QuantMode.BLOCK)
    assert fused_path_supported(
        cfg, 512, 64, None, None, None,
        causal=False, window=None, seq_q=512,
    )
    # TENSOR still needs the two-pass cross-tile reduction.
    assert not fused_path_supported(
        _cfg(Precision.INT8, QuantMode.TENSOR), 512, 64, None, None, None,
        causal=False, window=None, seq_q=512,
    )

    q, k, v = make_qkv(rng, 1, 2, 512, 512, 64)
    want = reference_attention(q, k, v)
    out = quantized_flash_attention(q, k, v, config=cfg, interpret=True)
    assert rel_err(out, want) < INT8_REL_ERR

    # Scale structure: one scale per 64 K rows (default BlockSizeConfig.k),
    # constant within each group.
    _, _, qt_q, qt_k, _, _, _ = fused_quantize_attend(
        q, k, v, mode=QuantMode.BLOCK, interpret=True
    )
    assert qt_k.mode == QuantMode.BLOCK and qt_k.block_size == 64
    assert qt_q.block_size == 128  # BlockSizeConfig.q default
    sc = np.asarray(qt_k.scales)[0, 0, :, 0].reshape(-1, 64)
    assert (sc == sc[:, :1]).all()
    assert len(np.unique(sc)) == 512 // 64

    got = jax.grad(
        lambda q: jnp.sum(quantized_flash_attention(
            q, k, v, config=cfg, interpret=True
        ) ** 2)
    )(q)
    ref = jax.grad(
        lambda q: jnp.sum(reference_attention(q, k, v) ** 2)
    )(q)
    assert cosine(got, ref) > BWD_COSINE_MIN
    assert rel_err(got, ref) < BWD_REL_ERR_MAX


def test_quantized_backward_causal_diag_parity(rng):
    """The quantized backward's causal diagonal fast path (equal tiles)
    must produce the SAME gradients as the standard masked path (unequal
    tiles disable it) — diag-vs-nodiag relerr at bf16 reduction-order
    noise, not STE-envelope level."""
    import dataclasses

    from umfa_tpu.ops.flash_fwd import BlockSizes

    cfg = QuantizationConfig()
    q, k, v = make_qkv(rng, 1, 4, 1024, 1024, 64, kv_heads=2)

    bs_diag = BlockSizes(
        block_q=256, block_k=256, block_q_dq=256, block_k_dq=256,
        block_q_dkv=256, block_k_dkv=256,
    )
    bs_ref = dataclasses.replace(bs_diag, block_q_dq=512, block_q_dkv=512)

    def grads(bs):
        def loss(q, k, v):
            return jnp.sum(quantized_flash_attention(
                q, k, v, config=cfg, causal=True, block_sizes=bs,
                interpret=True,
            ) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    for name, a, b in zip(("dq", "dk", "dv"), grads(bs_diag), grads(bs_ref)):
        d = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))
        assert d < 5e-6, (name, d)


def test_quantized_window_auto_tiled(rng):
    """Plain window= through the QUANTIZED route gets the same analytic
    tile auto-tuning as the dense route (route counter + parity + grads)."""
    import umfa_tpu

    q, k, v = make_qkv(rng, 1, 2, 2048, 2048, 64)
    before = umfa_tpu.get_dispatch_stats().get("window_auto_tiled", 0)
    out = quantized_flash_attention(q, k, v, window=(256, 0), interpret=True)
    after = umfa_tpu.get_dispatch_stats().get("window_auto_tiled", 0)
    assert after == before + 1, "quantized window= did not auto-tile"
    want = reference_attention(q, k, v, window=(256, 0))
    assert rel_err(out, want) < INT8_REL_ERR

    g = jax.grad(lambda q: jnp.sum(quantized_flash_attention(
        q, k, v, window=(256, 0), interpret=True
    ) ** 2))(q)
    gr = jax.grad(lambda q: jnp.sum(
        reference_attention(q, k, v, window=(256, 0)) ** 2
    ))(q)
    assert cosine(g, gr) > 0.99


@pytest.mark.parametrize("seq,causal", [(333, True), (261, False)])
def test_quantized_odd_shape_parity(rng, seq, causal):
    """Unaligned sequence lengths through the fused quantized kernel
    (KV-tail padding + causal diagonal interaction fuzz)."""
    q, k, v = make_qkv(rng, 1, 2, seq, seq, 64)
    out = quantized_flash_attention(
        q, k, v, config=_cfg(Precision.INT8), causal=causal, interpret=True
    )
    want = reference_attention(q, k, v, causal=causal)
    assert rel_err(out, want) < INT8_REL_ERR


@pytest.mark.parametrize("variant", ["default", "smooth_q", "block"])
def test_quantized_causal_rect_path(rng, variant):
    """The fused-quant rectangular-diagonal path (bq = 2*bk) engages by
    default for plain causal quantized calls at seq >= 2048 — but through r3
    no quantized causal test reached it (all used seq <= 1024; ADVICE r3).
    Covers the default config plus the smooth_q (cc compensation row slicing)
    and BLOCK (segment-max scales) interactions inside _do_update_rect,
    output AND grads, and asserts the path actually engages."""
    from umfa_tpu.ops.flash_fwd import _rect_mode_ok

    assert _rect_mode_ok(
        causal=True, window=None, has_bias=False, has_map=False,
        has_fetch=False, default_blocks=True,
        block_k=1024, seq_q=2048, seq_k=2048,
    )
    if variant == "smooth_q":
        cfg = QuantizationConfig(smooth_q=True)
    elif variant == "block":
        cfg = QuantizationConfig(mode=QuantMode.BLOCK)
    else:
        cfg = QuantizationConfig()
    q, k, v = make_qkv(rng, 1, 2, 2048, 2048, 64)
    out = quantized_flash_attention(
        q, k, v, config=cfg, causal=True, interpret=True
    )
    want = reference_attention(q, k, v, causal=True)
    assert rel_err(out, want) < INT8_REL_ERR, variant

    g = jax.grad(lambda q: jnp.sum(quantized_flash_attention(
        q, k, v, config=cfg, causal=True, interpret=True
    ) ** 2))(q)
    gr = jax.grad(lambda q: jnp.sum(
        reference_attention(q, k, v, causal=True) ** 2
    ))(q)
    assert cosine(g, gr) > BWD_COSINE_MIN, variant
    assert rel_err(g, gr) < BWD_REL_ERR_MAX, variant


def test_quantized_causal_rect_multiblock(rng):
    """S=4096 rect mode: two q-tiles x four KV steps exercises the rect
    cache-fill/alias schedule (each KV tile filled at its first visible
    step, later q-tiles read pure VMEM) under GQA (ADVICE r3 #2)."""
    q, k, v = make_qkv(rng, 1, 4, 4096, 4096, 64, kv_heads=2)
    out = quantized_flash_attention(q, k, v, causal=True, interpret=True)
    want = reference_attention(
        q, jnp.repeat(k, 2, 1), jnp.repeat(v, 2, 1), causal=True
    )
    assert rel_err(out, want) < INT8_REL_ERR


# ---------------------------------------------------------------------------
# Dense-Q (q_precision bf16/fp16/fp32, K/V integer) — VERDICT r4 weak #3:
# at inference with the deq-bf16 compute cache, quantizing Q buys nothing.
# ---------------------------------------------------------------------------


def test_dense_q_accuracy_beats_full_int8(rng):
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    want = reference_attention(q, k, v)
    cfg_qd = QuantizationConfig(q_precision=Precision.BF16)
    cfg_i8 = QuantizationConfig()
    out_qd = quantized_flash_attention(q, k, v, config=cfg_qd, interpret=True)
    out_i8 = quantized_flash_attention(q, k, v, config=cfg_i8, interpret=True)
    e_qd = rel_err(out_qd, want)
    e_i8 = rel_err(out_i8, want)
    assert e_qd < INT8_REL_ERR
    # Removing Q's rounding noise must not HURT accuracy.
    assert e_qd <= e_i8 * 1.05


def test_dense_q_causal_window(rng):
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    cfg = QuantizationConfig(q_precision=Precision.BF16)
    out_c = quantized_flash_attention(
        q, k, v, config=cfg, causal=True, interpret=True
    )
    assert rel_err(out_c, reference_attention(q, k, v, causal=True)) < INT8_REL_ERR
    out_w = quantized_flash_attention(
        q, k, v, config=cfg, window=(128, 0), interpret=True
    )
    assert rel_err(out_w, reference_attention(q, k, v, window=(128, 0))) < INT8_REL_ERR


def test_dense_q_mode_string():
    cfg = QuantizationConfig.from_mode_string("int8-qdense")
    assert cfg.q_precision == Precision.BF16
    assert cfg.k_precision == Precision.INT8
    assert cfg.v_precision == Precision.INT8


def test_dense_q_backward_ste(rng):
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    cfg = QuantizationConfig(q_precision=Precision.BF16)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    g = jax.grad(
        loss(lambda q, k, v: quantized_flash_attention(
            q, k, v, config=cfg, interpret=True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_ref = jax.grad(
        loss(reference_attention), argnums=(0, 1, 2)
    )(q, k, v)
    for name, a, b in zip("qkv", g, g_ref):
        assert cosine(a, b) > BWD_COSINE_MIN, name
        assert rel_err(a, b) < BWD_REL_ERR_MAX, name
        assert a.dtype == q.dtype


def test_dense_q_int4_kv(rng):
    # Dense Q composes with INT4 K (Hadamard) / INT8 V.
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    cfg = QuantizationConfig(
        q_precision=Precision.BF16, k_precision=Precision.INT4,
        v_precision=Precision.INT8, hadamard=True,
    )
    out = quantized_flash_attention(q, k, v, config=cfg, interpret=True)
    assert rel_err(out, reference_attention(q, k, v)) < INT4_REL_ERR


def test_dense_q_two_pass_fallback_raises(rng):
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    cfg = QuantizationConfig(
        q_precision=Precision.BF16, mode=QuantMode.TENSOR
    )
    with pytest.raises(ValueError, match="dense-Q"):
        quantized_flash_attention(q, k, v, config=cfg, interpret=True)
