"""Block-sparse mask compilation (FlexAttention-style mask_mod)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import umfa_tpu
from umfa_tpu.ops.attention import flash_attention, reference_attention
from umfa_tpu.ops.block_mask import (
    FULL,
    PARTIAL,
    SKIP,
    causal_block_mask,
    make_block_mask,
    sliding_window_block_mask,
)
from umfa_tpu.ops.flash_fwd import BlockSizes
from umfa_tpu.utils.testing import TOL, make_qkv

BS = BlockSizes(block_q=128, block_k=128)


def test_causal_block_map_structure():
    bm = causal_block_mask(512, 512, block_sizes=BS)
    m = np.asarray(bm.block_map)[0, 0]
    assert m.shape == (4, 4)
    assert (np.diag(m) == PARTIAL).all()
    assert (m[np.triu_indices(4, 1)] == SKIP).all()
    assert (m[np.tril_indices(4, -1)] == FULL).all()
    assert float(bm.sparsity) == pytest.approx(6 / 16)


def test_block_mask_matches_reference(rng):
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    bm = causal_block_mask(256, 256, block_sizes=BS)
    out = flash_attention(q, k, v, block_mask=bm, interpret=True)
    want = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(out, want, **TOL["fp32"])


def test_mask_mod_through_public_api(rng):
    # Document/segment mask: tokens attend within 64-token documents.
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)

    def doc_mask(q_idx, k_idx):
        return (q_idx // 64) == (k_idx // 64)

    out = umfa_tpu.attention(q, k, v, doc_mask, interpret=True)
    q_ids = np.arange(256)[:, None]
    k_ids = np.arange(256)[None, :]
    bias = jnp.where(
        jnp.asarray((q_ids // 64) == (k_ids // 64)), 0.0, -1e30
    ).astype(jnp.float32)
    want = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4, rtol=1e-4)


def test_fully_aligned_doc_mask_has_no_bias():
    # 128-aligned documents with 128 blocks: every tile is FULL or SKIP —
    # no partial tiles, so no bias tensor is materialized at all.
    bm = make_block_mask(
        lambda q, kk: (q // 128) == (kk // 128), 512, 512, block_sizes=BS
    )
    assert bm.bias is None
    m = np.asarray(bm.block_map)[0, 0]
    assert (np.diag(m) == FULL).all()
    assert (m[~np.eye(4, dtype=bool)] == SKIP).all()


def test_block_mask_grads(rng):
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    bm = sliding_window_block_mask(256, 256, 64, 0, block_sizes=BS)

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, block_mask=bm, interpret=True) ** 2
        )

    def ref_loss(q, k, v):
        return jnp.sum(
            reference_attention(q, k, v, window=(64, 0)) ** 2
        )

    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=1e-4, rtol=1e-4
        )


def test_per_head_block_mask(rng):
    # Different pattern per head (e.g. local/global heads).
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    q_ids = np.arange(256)[:, None]
    k_ids = np.arange(256)[None, :]
    local = (np.abs(q_ids - k_ids) <= 32)
    full = np.ones_like(local)
    mask = jnp.asarray(np.stack([local, full])[None])  # (1, 2, S, S)
    bm = make_block_mask(mask, 256, 256, block_sizes=BS)
    assert bm.block_map.shape[1] == 2
    out = flash_attention(q, k, v, block_mask=bm, interpret=True)
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    want = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4, rtol=1e-4)


def test_segment_ids_packing(rng):
    # Two packed sequences per batch row + padding (-1).
    from umfa_tpu.ops.block_mask import segment_block_mask

    q, k, v = make_qkv(rng, 2, 2, 256, 256, 64)
    seg = np.zeros((2, 256), np.int32)
    seg[0, 100:200] = 1
    seg[0, 200:] = -1       # padding
    seg[1, 128:] = 1
    bm = segment_block_mask(jnp.asarray(seg), causal=True, block_sizes=BS)
    assert bm.block_map.shape[0] == 2
    out = flash_attention(q, k, v, block_mask=bm, interpret=True)
    mask = (seg[:, :, None] == seg[:, None, :]) & (seg[:, :, None] >= 0)
    mask = mask & (np.arange(256)[None, None, :] <= np.arange(256)[None, :, None])
    bias = jnp.where(jnp.asarray(mask[:, None]), 0.0, -1e30).astype(jnp.float32)
    want = np.asarray(reference_attention(q, k, v, bias))
    got = np.asarray(out)
    # Padded rows are fully masked (undefined); compare visible rows only.
    valid = (seg >= 0)
    np.testing.assert_allclose(
        got[0][:, valid[0]], want[0][:, valid[0]], atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(got[1], want[1], atol=1e-4, rtol=1e-4)


def test_ragged_seq_block_mask(rng):
    q, k, v = make_qkv(rng, 1, 1, 200, 200, 64)
    bm = causal_block_mask(200, 200, block_sizes=BS)
    out = flash_attention(q, k, v, block_mask=bm, interpret=True)
    want = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(out, want, **TOL["fp32"])


def test_sparse_gqa_grads_in_kernel_reduction(rng):
    """Compacted-fetch (BlockMask) + GQA backward now uses the in-kernel
    group reduction — dK/dV parity vs the naive reference (VERDICT r1 #10)."""
    seq = 384
    bs = BlockSizes(block_q=128, block_k=128)
    q_ids = jnp.arange(seq)[:, None]
    k_ids = jnp.arange(seq)[None, :]
    mask = (q_ids // 128) >= (k_ids // 128)  # block-causal, tile-aligned
    bm = make_block_mask(mask, seq, seq, block_sizes=bs)
    assert bm.fetch_q is not None

    q, k, v = make_qkv(rng, 1, 4, seq, seq, 64, kv_heads=2)
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)[None, None]

    def loss(q, k, v):
        out = flash_attention(q, k, v, block_mask=bm, interpret=True)
        return jnp.sum(out * jnp.sin(out))

    def ref_loss(q, k, v):
        out = reference_attention(q, k, v, bias)
        return jnp.sum(out * jnp.sin(out))

    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-4, rtol=2e-4,
            err_msg=f"d{name}",
        )


def test_sparse_gqa_quantized_grads(rng):
    """Quantized backward with BlockMask + GQA (native int8 kernels)."""
    from umfa_tpu.engine.config import Precision, QuantizationConfig
    from umfa_tpu.ops.quant_attention import quantized_flash_attention
    from umfa_tpu.utils.testing import BWD_COSINE_MIN, BWD_REL_ERR_MAX, cosine, rel_err

    seq = 256
    bs = BlockSizes(block_q=128, block_k=128)
    q_ids = jnp.arange(seq)[:, None]
    k_ids = jnp.arange(seq)[None, :]
    mask = (q_ids // 128) >= (k_ids // 128)
    bm = make_block_mask(mask, seq, seq, block_sizes=bs)
    q, k, v = make_qkv(rng, 1, 4, seq, seq, 64, kv_heads=2)
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)[None, None]

    def loss(q, k, v):
        out = quantized_flash_attention(
            q, k, v, config=QuantizationConfig(), block_mask=bm,
            block_sizes=bs, interpret=True,
        )
        return jnp.sum(out * jnp.sin(out))

    def ref_loss(q, k, v):
        out = reference_attention(q, k, v, bias)
        return jnp.sum(out * jnp.sin(out))

    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        assert cosine(g, w) > BWD_COSINE_MIN
        assert rel_err(g, w) < BWD_REL_ERR_MAX


def test_auto_tile_selection():
    """Per-mask tile auto-tuning (default BlockSizes): aligned document
    masks compile to matching small tiles (all SKIP/FULL, no bias); dense
    masks keep the big default tiles; explicit block_sizes are honored."""
    from umfa_tpu.ops.flash_fwd import BlockSizes

    doc = make_block_mask(
        lambda q, k: (q // 512) == (k // 512), 2048, 2048
    )
    assert (doc.block_q, doc.block_k) == (512, 512)
    assert doc.bias is None  # tile-aligned: no PARTIAL tiles anywhere

    dense = make_block_mask(lambda q, k: q >= 0, 4096, 4096)
    assert (dense.block_q, dense.block_k) == (512, 2048)

    pinned = make_block_mask(
        lambda q, k: (q // 512) == (k // 512), 2048, 2048,
        block_sizes=BlockSizes(block_q=512, block_k=1024),
    )
    assert (pinned.block_q, pinned.block_k) == (512, 1024)


def test_auto_tile_end_to_end():
    """Auto-tiled BlockMask through the public API matches the reference."""
    import numpy as np
    import umfa_tpu
    from umfa_tpu.ops.attention import reference_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (1, 2, 1024, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (1, 2, 1024, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (1, 2, 1024, 64)), jnp.float32)
    mask_mod = lambda qi, ki: (qi // 256) == (ki // 256)
    out = umfa_tpu.attention(q, k, v, mask_mod)
    q_ids = jnp.arange(1024)[:, None]
    k_ids = jnp.arange(1024)[None, :]
    bias = jnp.where(mask_mod(q_ids, k_ids), 0.0, -1e30)[None, None]
    want = reference_attention(q, k, v, bias)
    rel = float(jnp.linalg.norm(out - want) / jnp.linalg.norm(want))
    assert rel < 1e-5, rel


def test_window_auto_tiled_structure():
    """Plain window= calls compile an analytic tile structure (no O(S^2)
    element mask, bias=None); wide windows stay on the default walk."""
    from umfa_tpu.ops.block_mask import maybe_window_block_mask

    bm = maybe_window_block_mask(4096, 4096, (256, 0), False, 64)
    assert bm is not None
    assert bm.bias is None  # intra-tile masking stays in-kernel index math
    assert bm.fetch_kv is not None and bm.hold_kv is not None
    # The band should pick small tiles and skip most of the grid.
    assert bm.block_k <= 1024
    assert float(bm.sparsity) > 0.5
    # The analytic tile map matches the element-mask compiler's map.
    ref = sliding_window_block_mask(
        4096, 4096, 256, 0,
        block_sizes=BlockSizes(block_q=bm.block_q, block_k=bm.block_k),
    )
    np.testing.assert_array_equal(
        np.asarray(bm.block_map), np.asarray(ref.block_map)
    )
    np.testing.assert_array_equal(
        np.asarray(bm.fetch_kv), np.asarray(ref.fetch_kv)
    )

    # Wide window: no predicted win -> default path (None).
    assert maybe_window_block_mask(4096, 4096, (4096, -1), False, 64) is None


@pytest.mark.parametrize("window,causal", [((256, 0), False), ((192, 64), False),
                                           ((256, -1), True)])
def test_window_auto_tiled_parity(rng, window, causal):
    """window= through the auto-tiled route matches the reference, forward
    and gradients, and actually takes the route (dispatch counter)."""
    import umfa_tpu

    # S=2048: large enough that the auto-tuner predicts a win for every
    # parametrized window (at S<=1024 the whole sequence is one default
    # tile and maybe_window_block_mask correctly returns None).
    q, k, v = make_qkv(rng, 1, 2, 2048, 2048, 64)
    before = umfa_tpu.get_dispatch_stats().get("window_auto_tiled", 0)
    out = flash_attention(q, k, v, window=window, causal=causal)
    after = umfa_tpu.get_dispatch_stats().get("window_auto_tiled", 0)
    assert after == before + 1, "window= did not take the auto-tiled route"
    want = reference_attention(q, k, v, window=window, causal=causal)
    rel = float(jnp.linalg.norm(out - want) / jnp.linalg.norm(want))
    assert rel < 1e-5, rel

    def loss_fused(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, window=window, causal=causal) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            reference_attention(q, k, v, window=window, causal=causal) ** 2
        )

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_fused, g_ref):
        rel = float(jnp.linalg.norm(gf - gr) / (jnp.linalg.norm(gr) + 1e-30))
        assert rel < 1e-4, rel
