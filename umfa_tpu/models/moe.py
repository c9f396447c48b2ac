"""DeepSeek-style Mixture-of-Experts FFN, TPU-native.

Parity target: the MoE half of the reference's DeepSeek-V3.2 example
(examples/deepseek-v3.2-exp/model.py — 256 routed experts / 8 active,
shared experts, top-k renormalized sigmoid/softmax gating; README.md:66-72).
The reference runs its MoE through torch on the host; here the design is
TPU-first with two dispatch strategies, both static-shaped and jit-safe:

- "ragged" (default, dropless): sort the token→expert assignments by expert
  id and run the expert FFNs as grouped GEMMs via `jax.lax.ragged_dot`
  (MegaBlocks-style). No capacity drops, no (T, E, C) one-hot tensor; the
  MXU sees three dense ragged GEMMs. Best single-shard throughput.
- "dense" (GShard-style capacity dispatch): one-hot dispatch/combine
  einsums with a per-expert capacity. The dispatched (E, C, dim) tensor
  carries a clean `PartitionSpec(ep_axis)` over an expert-parallel mesh
  axis, so XLA lowers the dispatch einsum to an all-to-all over ICI — this
  is the path to use under expert parallelism (see `ep_specs`).

Gating: softmax router probs, top-k, renormalize over the selected experts
(DeepSeek `norm_topk_prob`), optional routed scaling, plus always-active
shared experts. The standard load-balance auxiliary loss (Switch/GShard
E·Σ f_e·p_e) is returned for training.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    dim: int = 256
    hidden: int = 512            # per-expert SwiGLU hidden width
    num_experts: int = 8         # routed experts
    top_k: int = 2
    n_shared: int = 0            # DeepSeek shared experts (always active)
    routed_scale: float = 1.0    # DeepSeek routed_scaling_factor
    capacity_factor: float = 1.5  # dense-dispatch path only
    dispatch: str = "ragged"     # "ragged" (dropless) | "dense" (capacity)
    dtype: str = "bfloat16"
    ep_axis: Optional[str] = None  # mesh axis for expert parallelism

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def init_params(key, cfg: MoEConfig) -> dict:
    keys = jax.random.split(key, 7)
    d, h, e = cfg.dim, cfg.hidden, cfg.num_experts
    s_in, s_hid = d**-0.5, h**-0.5
    p = {
        # Router stays fp32: tiny, and gate ordering is precision-sensitive.
        "router": jax.random.normal(keys[0], (d, e), jnp.float32) * s_in,
        "w1": jax.random.normal(keys[1], (e, d, h), cfg.jdtype) * s_in,
        "w3": jax.random.normal(keys[2], (e, d, h), cfg.jdtype) * s_in,
        "w2": jax.random.normal(keys[3], (e, h, d), cfg.jdtype) * s_hid,
    }
    if cfg.n_shared:
        hs = h * cfg.n_shared
        p["ws1"] = jax.random.normal(keys[4], (d, hs), cfg.jdtype) * s_in
        p["ws3"] = jax.random.normal(keys[5], (d, hs), cfg.jdtype) * s_in
        p["ws2"] = jax.random.normal(keys[6], (hs, d), cfg.jdtype) * (hs**-0.5)
    return p


def ep_specs(cfg: MoEConfig) -> dict:
    """PartitionSpecs for expert-parallel weight placement: the expert-
    stacked tensors shard their leading (expert) dim over `cfg.ep_axis`;
    router and shared experts replicate. Pair with dispatch="dense" so the
    (E, C, dim) dispatched activations shard the same way and XLA inserts
    the dispatch/combine all-to-alls."""
    from jax.sharding import PartitionSpec as P

    ep = cfg.ep_axis
    specs = {"router": P(), "w1": P(ep), "w3": P(ep), "w2": P(ep)}
    if cfg.n_shared:
        specs.update({"ws1": P(), "ws3": P(), "ws2": P()})
    return specs


def router_topk(
    params: dict, x: jax.Array, cfg: MoEConfig
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x: (T, dim) → (weights (T, K) f32, expert idx (T, K) i32,
    full probs (T, E) f32 for the aux loss)."""
    logits = jnp.einsum(
        "td,de->te", x.astype(jnp.float32), params["router"],
        precision=jax.lax.Precision.HIGHEST,
    )
    probs = jax.nn.softmax(logits, axis=-1)
    w, idx = jax.lax.top_k(probs, cfg.top_k)
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-20)  # norm_topk_prob
    return w * cfg.routed_scale, idx, probs


def load_balance_loss(probs: jax.Array, idx: jax.Array, num_experts: int):
    """Switch/GShard auxiliary loss: E · Σ_e f_e · p_e, minimized (=1) at a
    uniform route. probs: (T, E); idx: (T, K)."""
    f = jnp.zeros((num_experts,), jnp.float32)
    f = f.at[idx.reshape(-1)].add(1.0)
    f = f / jnp.maximum(f.sum(), 1.0)
    p = probs.mean(0)
    return num_experts * jnp.sum(f * p)


def _swiglu(xe, w1, w3, w2, dot):
    h = jax.nn.silu(dot(xe, w1)) * dot(xe, w3)
    return dot(h, w2)


def _moe_ragged(params, x, w, idx, cfg: MoEConfig):
    """Dropless dispatch: stable-sort the (T·K) assignments by expert id,
    grouped-GEMM through the experts with ragged_dot, scatter-add back."""
    t, d = x.shape
    k, e = cfg.top_k, cfg.num_experts
    flat_e = idx.reshape(-1)                      # (T·K,) expert of each slot
    order = jnp.argsort(flat_e, stable=True)      # slots grouped by expert
    tok = order // k                              # source token per sorted slot
    xs = x[tok]                                   # (T·K, d) gather
    group_sizes = jnp.zeros((e,), jnp.int32).at[flat_e].add(1)

    dot = lambda a, b: jax.lax.ragged_dot(
        a, b.astype(a.dtype), group_sizes,
        preferred_element_type=jnp.float32,
    ).astype(a.dtype)
    ys = _swiglu(xs, params["w1"], params["w3"], params["w2"], dot)
    ws = w.reshape(-1)[order].astype(jnp.float32)  # combine weight per slot
    y = jnp.zeros((t, d), jnp.float32).at[tok].add(
        ys.astype(jnp.float32) * ws[:, None]
    )
    return y


def _moe_dense(params, x, w, idx, cfg: MoEConfig):
    """GShard capacity dispatch: one-hot (T, E, C) dispatch/combine einsums.
    Tokens beyond an expert's capacity are dropped (their combine weight
    contributes nothing — the residual connection carries them). Under an
    `ep_axis` mesh the (E, C, d) dispatched block is sharding-constrained
    over experts so the einsums lower to ICI all-to-alls."""
    t, d = x.shape
    e = cfg.num_experts
    cap = max(int(cfg.capacity_factor * cfg.top_k * t / e), cfg.top_k)
    # (T, E) combine weights; top-k never repeats an expert per token.
    cw = jnp.zeros((t, e), jnp.float32)
    cw = cw.at[jnp.arange(t)[:, None], idx].set(w.astype(jnp.float32))
    chosen = cw > 0.0
    pos = jnp.cumsum(chosen.astype(jnp.int32), axis=0) - 1  # slot in expert
    keep = chosen & (pos < cap)
    disp = (
        jax.nn.one_hot(jnp.where(keep, pos, cap), cap, dtype=x.dtype)
        * keep.astype(x.dtype)[..., None]
    )  # (T, E, C)
    xe = jnp.einsum("tec,td->ecd", disp, x)
    if cfg.ep_axis is not None:
        from jax.sharding import PartitionSpec as P

        xe = jax.lax.with_sharding_constraint(xe, P(cfg.ep_axis))
    dot = lambda a, b: jnp.einsum(
        "ecx,exy->ecy", a, b.astype(a.dtype),
        preferred_element_type=jnp.float32,
    ).astype(a.dtype)
    ye = _swiglu(xe, params["w1"], params["w3"], params["w2"], dot)
    comb = disp.astype(jnp.float32) * cw[..., None]
    return jnp.einsum("tec,ecd->td", comb, ye.astype(jnp.float32))


def moe_ffn(
    params: dict, x: jax.Array, cfg: MoEConfig
) -> Tuple[jax.Array, jax.Array]:
    """x: (B, S, dim) → (y (B, S, dim), aux load-balance loss scalar)."""
    b, s, d = x.shape
    xf = x.reshape(b * s, d)
    w, idx, probs = router_topk(params, xf, cfg)
    aux = load_balance_loss(probs, idx, cfg.num_experts)
    if cfg.dispatch == "ragged":
        y = _moe_ragged(params, xf, w, idx, cfg)
    elif cfg.dispatch == "dense":
        y = _moe_dense(params, xf, w, idx, cfg)
    else:
        raise ValueError(f"unknown dispatch {cfg.dispatch!r}")
    if cfg.n_shared:
        yd = x.dtype
        h = jax.nn.silu(xf.astype(yd) @ params["ws1"]) * (
            xf.astype(yd) @ params["ws3"]
        )
        y = y + (h @ params["ws2"]).astype(jnp.float32)
    return y.reshape(b, s, d).astype(x.dtype), aux
