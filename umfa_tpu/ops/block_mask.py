"""Block-sparse mask compilation (FlexAttention-style mask_mod).

The reference materializes every mask into a dense FP32 [B,H,Sq,Skv] buffer
(mfa_prepare_mask, MFABridge.swift:153-243) and claims superior performance
vs FlexAttention (README.md:71). Here masks compile into per-tile structure
(SURVEY.md §7.3 "compile masks to per-block skip/partial structure"):

  * a (Bm, Hm, nq, nk) int32 block map — 0 = fully masked (the kernel skips
    the tile's matmuls and softmax entirely), 1 = partial (tile bias
    applied), 2 = fully visible (no bias read needed semantically; the bias
    operand is still streamed for partial tiles);
  * a canonical additive bias holding the intra-tile pattern, broadcast dims
    kept at size 1.

Construction happens once (it is O(Sq·Sk) like building the mask itself) and
the result is a pytree that can be reused across calls/jit.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from umfa_tpu.ops.flash_fwd import (
    DEFAULT_MASK_VALUE,
    BlockSizes,
    _choose_block,
    _round_up,
)

SKIP, PARTIAL, FULL = 0, 1, 2


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BlockMask:
    block_map: jax.Array            # (Bm, Hm, nq, nk) int32
    bias: Optional[jax.Array]       # canonical additive FP32 bias or None
    block_q: int
    block_k: int
    seq_q: int
    seq_k: int
    # Compacted scalar-prefetch tables (splash-attention style): entry s of
    # row o is the s-th VISIBLE tile index (-1 padding past the row's count).
    # The kernels' inner grid dimension shrinks to the global max visible
    # count, index maps fetch tiles from these tables (skipped steps alias a
    # neighbour → DMA elided), and visibility is simply id >= 0. Only built
    # from concrete (non-traced) masks.
    fetch_kv: Optional[jax.Array] = None   # (Bm, Hm, nq, max_vis_kv) int32
    fetch_q: Optional[jax.Array] = None    # (Bm, Hm, nk, max_vis_q) int32
    # Cache-fill schedule for the single-launch fused quantized kernel
    # (quant_fused_attn): at compacted step (qi, s), `hold_kv` is the tile
    # the K/V HBM buffer must hold (constant between first visits → DMA
    # elided), and `fill_kv` is 2 at the very first fill of the slice (the
    # kernel estimates smoothing means there), 1 at other first visits,
    # else 0. Tiles no row visits are never fetched or filled.
    hold_kv: Optional[jax.Array] = None    # (Bm, Hm, nq, max_vis_kv) int32
    fill_kv: Optional[jax.Array] = None    # (Bm, Hm, nq, max_vis_kv) int32

    def tree_flatten(self):
        return (
            self.block_map, self.bias, self.fetch_kv, self.fetch_q,
            self.hold_kv, self.fill_kv,
        ), (self.block_q, self.block_k, self.seq_q, self.seq_k)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            children[0], children[1], *aux,
            fetch_kv=children[2], fetch_q=children[3],
            hold_kv=children[4], fill_kv=children[5],
        )

    @property
    def sparsity(self) -> jax.Array:
        """Fraction of tiles skipped (observability)."""
        return jnp.mean((self.block_map == SKIP).astype(jnp.float32))


# Per-mask tile auto-tuning: candidate tilings scored with a cost model
# fitted to v5e step timings (r2): a grid step over a (bq, bk) tile costs
# ~C0 fixed (grid/DMA/stat overhead) + C1 per score element; PARTIAL tiles
# pay extra VPU mask passes (~C1_PARTIAL per element). Small tiles align
# better with mask structure (fewer PARTIAL, more SKIP) but amortize C0
# worse — exactly the "per-mask tile-size tuning" lever from r1.
_AUTO_TILE_CANDIDATES = (
    (512, 2048), (512, 1024), (512, 512), (256, 512), (256, 256),
)
_C0, _C1, _C1_PARTIAL = 0.7e-6, 3.0e-12, 1.0e-12
_C0_PAD = 0.2e-6


def _tile_map_np(mask_np, seq_q, seq_k, bq, bk):
    """Tile classification (numpy, concrete masks): (Bm, Hm, nq, nk) int."""
    import numpy as np

    bm, hm = mask_np.shape[:2]
    pq, pk = _round_up(seq_q, bq), _round_up(seq_k, bk)
    padded = np.zeros((bm, hm, pq, pk), bool)
    padded[:, :, :seq_q, :seq_k] = mask_np
    counts = padded.reshape(bm, hm, pq // bq, bq, pk // bk, bk).sum(
        axis=(3, 5)
    )
    q_in = np.minimum(np.arange(1, pq // bq + 1) * bq, seq_q) - np.minimum(
        np.arange(pq // bq) * bq, seq_q
    )
    k_in = np.minimum(np.arange(1, pk // bk + 1) * bk, seq_k) - np.minimum(
        np.arange(pk // bk) * bk, seq_k
    )
    in_bounds = q_in[:, None] * k_in[None, :]
    return np.where(
        counts >= in_bounds[None, None], FULL,
        np.where(counts > 0, PARTIAL, SKIP),
    )


def _predict_cost(tile_map, bq, bk) -> float:
    """Predicted kernel seconds per (batch, head) for a candidate tiling.

    Visible tiles pay full per-step + per-element cost; padded compaction
    steps (rows shorter than the global max width) alias the previous tile —
    DMA elided, compute skipped — and cost only a small step overhead."""
    vis = tile_map != SKIP
    slices = tile_map.shape[0] * tile_map.shape[1]
    row_counts = vis.sum(axis=-1)
    # The compacted inner grid dim is the GLOBAL max visible-per-row count.
    width = int(row_counts.max()) if vis.any() else 0
    nq = tile_map.shape[2]
    n_vis = float(vis.sum()) / slices
    padded_steps = nq * width - n_vis
    n_partial = float((tile_map == PARTIAL).sum()) / slices
    return (
        n_vis * (_C0 + _C1 * bq * bk)
        + padded_steps * _C0_PAD
        + n_partial * _C1_PARTIAL * bq * bk
    )


def make_block_mask(
    mask: Union[Callable, jax.Array],
    seq_q: int,
    seq_k: int,
    *,
    head_dim: int = 64,
    block_sizes: BlockSizes = BlockSizes(),
) -> BlockMask:
    """Compile a mask into block structure.

    mask: either a mask_mod callable `(q_idx, k_idx) -> bool` (True=attend;
    evaluated on broadcast index grids, FlexAttention-style) or a boolean
    array broadcastable to (B, H, Sq, Sk).

    With default `block_sizes`, the tiling is auto-tuned per mask: candidate
    tilings are scored by a fitted cost model (fixed per-step overhead +
    per-element compute + partial-tile mask surcharge) on the mask's actual
    tile structure, so e.g. a 512-aligned document mask compiles to 512×512
    tiles (everything SKIP/FULL) instead of paying 2048-wide PARTIAL tiles.
    Explicit block_sizes pin the tiling (required under jit tracing).
    """
    block_q = _choose_block(block_sizes.block_q, seq_q, head_dim)
    block_k = _choose_block(block_sizes.block_k, seq_k, head_dim)
    if callable(mask):
        q_ids = jnp.arange(seq_q)[:, None]
        k_ids = jnp.arange(seq_k)[None, :]
        # FlexAttention's mask_mod contract is broadcast-evaluated: a mask
        # depending on one index only (e.g. lambda q, k: k < valid_len)
        # returns a (1, Sk)/(Sq, 1) array — broadcast it to full shape.
        bool_mask = jnp.broadcast_to(
            jnp.asarray(mask(q_ids, k_ids), bool), (seq_q, seq_k)
        )[None, None]
    else:
        bool_mask = jnp.asarray(mask, bool)
        while bool_mask.ndim < 4:
            bool_mask = bool_mask[None]
    bm, hm, sq, sk = bool_mask.shape
    assert sq == seq_q and sk == seq_k, (bool_mask.shape, seq_q, seq_k)

    if block_sizes == BlockSizes() and not isinstance(
        bool_mask, jax.core.Tracer
    ):
        import numpy as np

        mask_np = np.asarray(bool_mask)
        best = (float("inf"), block_q, block_k)
        for bq, bk in _AUTO_TILE_CANDIDATES:
            bq = min(bq, _round_up(seq_q, 128))
            bk = min(bk, _round_up(seq_k, 128))
            cost = _predict_cost(
                _tile_map_np(mask_np, seq_q, seq_k, bq, bk), bq, bk
            )
            # Strict < keeps the earliest (largest-tile) candidate on ties.
            if cost < best[0] * 0.999:
                best = (cost, bq, bk)
        block_q, block_k = best[1], best[2]

    pq = _round_up(seq_q, block_q)
    pk = _round_up(seq_k, block_k)
    padded = jnp.zeros((bm, hm, pq, pk), bool).at[:, :, :seq_q, :seq_k].set(
        bool_mask
    )
    tiles = padded.reshape(bm, hm, pq // block_q, block_q, pk // block_k, block_k)
    any_vis = jnp.any(tiles, axis=(3, 5))
    # "Full" must ignore pad rows/cols: compare against the per-tile count of
    # in-bounds entries.
    q_in = (jnp.arange(pq) < seq_q).reshape(pq // block_q, block_q)
    k_in = (jnp.arange(pk) < seq_k).reshape(pk // block_k, block_k)
    in_bounds = (
        q_in.sum(-1)[:, None] * k_in.sum(-1)[None, :]
    )  # (nq, nk) in-bounds entry counts
    vis_count = tiles.sum(axis=(3, 5))
    all_vis = vis_count >= in_bounds[None, None]
    block_map = jnp.where(
        all_vis, FULL, jnp.where(any_vis, PARTIAL, SKIP)
    ).astype(jnp.int32)

    needs_bias = bool(jnp.any(block_map == PARTIAL))
    bias = None
    if needs_bias:
        bias = jnp.where(bool_mask, 0.0, DEFAULT_MASK_VALUE).astype(jnp.float32)

    fetch_kv = fetch_q = hold_kv = fill_kv = None
    if not isinstance(block_map, jax.core.Tracer):
        import numpy as np

        m = np.asarray(block_map)  # (Bm, Hm, nq, nk)
        fkv = _compact_ids(m)
        fetch_kv = jnp.asarray(fkv, jnp.int32)
        fetch_q = jnp.asarray(
            _compact_ids(np.swapaxes(m, 2, 3)), jnp.int32
        )
        hold, fill = _fill_schedule(fkv)
        hold_kv = jnp.asarray(hold, jnp.int32)
        fill_kv = jnp.asarray(fill, jnp.int32)
    return BlockMask(
        block_map=block_map, bias=bias,
        block_q=block_q, block_k=block_k, seq_q=seq_q, seq_k=seq_k,
        fetch_kv=fetch_kv, fetch_q=fetch_q,
        hold_kv=hold_kv, fill_kv=fill_kv,
    )


def _fill_schedule(fetch):
    """Cache-fill schedule from a compacted fetch table (numpy).

    Walking the grid in row-major (qi, step) order per slice: `hold[pos]`
    is the tile the K/V HBM buffer holds at each step — it only changes at
    a tile's FIRST visit, so every other step's DMA is elided — and
    `fill[pos]` marks first visits (2 for the slice's very first fill,
    where the fused kernel estimates its smoothing means)."""
    import numpy as np

    bm, hm, nq, w = fetch.shape
    hold = np.zeros_like(fetch)
    fill = np.zeros_like(fetch)
    for b in range(bm):
        for h in range(hm):
            seen = set()
            cur = 0
            any_fill = False
            for qi in range(nq):
                for s in range(w):
                    t = int(fetch[b, h, qi, s])
                    if t >= 0 and t not in seen:
                        seen.add(t)
                        cur = t
                        fill[b, h, qi, s] = 1 if any_fill else 2
                        any_fill = True
                    hold[b, h, qi, s] = cur
    return hold, fill


def _compact_ids(m):
    """Per row of the last dim, the list of visible tile indices. Padding
    past a row's count is encoded as -(last_visible + 1): still negative
    (visibility check is id >= 0) but decodes to the last visible tile
    (-id - 1), so padded grid steps alias the previous step's tile and their
    DMA is elided. Fully-masked rows are all -1 (decode → tile 0, invisible).
    Table width = global max visible count — the kernels' compacted inner
    grid dimension."""
    import numpy as np

    bm, hm, no, ni = m.shape
    counts = (m > 0).sum(axis=-1)
    width = max(int(counts.max()), 1)
    ids = np.full((bm, hm, no, width), -1, np.int32)
    for b in range(bm):
        for h in range(hm):
            for o in range(no):
                vis = np.nonzero(m[b, h, o] > 0)[0]
                if vis.size == 0:
                    continue
                ids[b, h, o, : vis.size] = vis
                ids[b, h, o, vis.size :] = -(int(vis[-1]) + 1)
    return ids


def causal_block_mask(seq_q: int, seq_k: int, **kwargs) -> BlockMask:
    return make_block_mask(lambda q, k: k <= q, seq_q, seq_k, **kwargs)


def segment_block_mask(
    segment_ids_q: jax.Array,
    segment_ids_k: Optional[jax.Array] = None,
    *,
    causal: bool = False,
    **kwargs,
) -> BlockMask:
    """Packed-sequence (segment-id) masking: tokens attend only within their
    segment. segment_ids_q: (B, Sq) int; negative ids never attend (padding).
    Produces a per-batch block map (B, 1, nq, nk)."""
    if segment_ids_k is None:
        segment_ids_k = segment_ids_q
    seg_q = jnp.asarray(segment_ids_q)
    seg_k = jnp.asarray(segment_ids_k)
    mask = (seg_q[:, :, None] == seg_k[:, None, :]) & (seg_q[:, :, None] >= 0)
    if causal:
        sq, sk = seg_q.shape[1], seg_k.shape[1]
        mask = mask & (jnp.arange(sk)[None, None, :] <= jnp.arange(sq)[None, :, None])
    return make_block_mask(mask[:, None], seg_q.shape[1], seg_k.shape[1], **kwargs)


def sliding_window_block_mask(
    seq_q: int, seq_k: int, left: int, right: int = 0, **kwargs
) -> BlockMask:
    def fn(q, k):
        keep = jnp.full(jnp.broadcast_shapes(q.shape, k.shape), True)
        if left >= 0:
            keep = keep & (k >= q - left)
        if right >= 0:
            keep = keep & (k <= q + right)
        return keep

    return make_block_mask(fn, seq_q, seq_k, **kwargs)


def _window_tile_map_np(seq_q, seq_k, bq, bk, left, right, causal):
    """Analytic SKIP/PARTIAL/FULL tile map for a sliding-window (± causal)
    mask — O(nq·nk), no O(Sq·Sk) element-mask materialization (a 32K window
    mask would be 1 GiB of bools). Element visibility is l(q) <= k <= u(q)
    with l(q) = q - left (or -inf) and u(q) = q + min(right, 0 if causal)
    (or +inf); both bounds are monotone in q, so tile classification needs
    only the tile's corner rows."""
    import numpy as np

    nq = _round_up(seq_q, bq) // bq
    nk = _round_up(seq_k, bk) // bk
    q0 = np.arange(nq) * bq
    q1 = np.minimum(q0 + bq, seq_q) - 1
    k0 = np.arange(nk) * bk
    k1 = np.minimum(k0 + bk, seq_k) - 1
    INF = 1 << 40
    lo_min = (q0 - left) if left >= 0 else np.full(nq, -INF)  # l(q0)
    lo_max = (q1 - left) if left >= 0 else np.full(nq, -INF)  # l(q1)
    u = right if right >= 0 else INF
    if causal:
        u = min(u, 0)
    hi_max = q1 + u if u < INF else np.full(nq, INF)  # u(q1)
    hi_min = q0 + u if u < INF else np.full(nq, INF)  # u(q0)
    visible = (k0[None, :] <= hi_max[:, None]) & (k1[None, :] >= lo_min[:, None])
    full = (k1[None, :] <= hi_min[:, None]) & (k0[None, :] >= lo_max[:, None])
    if seq_k % bk:
        full[:, -1] = False  # padded KV tail needs the intra-tile mask
    m = np.where(full, FULL, np.where(visible, PARTIAL, SKIP)).astype(np.int32)
    return m[None, None]  # (1, 1, nq, nk)


def _predict_cost_dense_walk(tile_map, bq, bk) -> float:
    """Predicted cost of the NON-compacted walk (the plain causal/window
    path): the grid iterates every (qi, ki) step; invisible steps skip
    compute (pl.when) and their DMA is elided, costing only step overhead."""
    vis = tile_map != SKIP
    slices = tile_map.shape[0] * tile_map.shape[1]
    n_vis = float(vis.sum()) / slices
    nq, nk = tile_map.shape[2], tile_map.shape[3]
    n_partial = float((tile_map == PARTIAL).sum()) / slices
    return (
        n_vis * (_C0 + _C1 * bq * bk)
        + (nq * nk - n_vis) * _C0_PAD
        + n_partial * _C1_PARTIAL * bq * bk
    )


@functools.lru_cache(maxsize=64)
def maybe_window_block_mask(
    seq_q: int,
    seq_k: int,
    window: tuple,
    causal: bool = False,
    head_dim: int = 64,
) -> Optional[BlockMask]:
    """Auto-tiled tile structure for a plain `window=` call, or None when the
    default masked walk is already predicted at least as fast (wide windows).

    The returned BlockMask carries ONLY tile structure (block_map + compacted
    fetch/fill tables) with bias=None: intra-tile masking stays the kernel's
    iota/compare index math, so no [Sq, Sk] bias ever hits HBM. The caller
    keeps causal/window in the kernel config. This closes the tile-granularity
    gap of round 2 (a 256-wide window touched ~2 of 4 KV tiles per q-row at
    the fixed 1024² tiling; reference sliding-window claim: README.md:72)."""
    import numpy as np

    left, right = window
    # Default masked path tiling: fwd q-tile request 1024, KV tiles 1024.
    bq_d = min(1024, _round_up(seq_q, 128))
    bk_d = min(1024, _round_up(seq_k, 128))
    default_cost = _predict_cost_dense_walk(
        _window_tile_map_np(seq_q, seq_k, bq_d, bk_d, left, right, causal),
        bq_d, bk_d,
    )
    best = (default_cost * 0.9, None, None, None)  # require >=10% predicted win
    seen = set()
    for bq, bk in _AUTO_TILE_CANDIDATES:
        # Run candidates through the kernel's own clamp so the tile sizes the
        # mask is built with are exactly what flash_attention_forward derives
        # (vmem cap at large head_dim, padding-waste avoidance).
        bq = _choose_block(bq, seq_q, head_dim)
        bk = _choose_block(bk, seq_k, head_dim)
        if (bq, bk) in seen:
            continue
        seen.add((bq, bk))
        m = _window_tile_map_np(seq_q, seq_k, bq, bk, left, right, causal)
        cost = _predict_cost(m, bq, bk)
        if cost < best[0]:
            best = (cost, bq, bk, m)
    if best[1] is None:
        return None
    _, block_q, block_k, m = best
    fkv = _compact_ids(m)
    hold, fill = _fill_schedule(fkv)
    return BlockMask(
        block_map=jnp.asarray(m, jnp.int32),
        bias=None,
        block_q=block_q,
        block_k=block_k,
        seq_q=seq_q,
        seq_k=seq_k,
        fetch_kv=jnp.asarray(fkv, jnp.int32),
        fetch_q=jnp.asarray(_compact_ids(np.swapaxes(m, 2, 3)), jnp.int32),
        hold_kv=jnp.asarray(hold, jnp.int32),
        fill_kv=jnp.asarray(fill, jnp.int32),
    )
