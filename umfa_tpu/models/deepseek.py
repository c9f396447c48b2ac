"""DeepSeek-V3.2-style demo model: MLA attention + MoE FFN + generation.

Parity target: the reference's random-weight DeepSeek example
(examples/deepseek-v3.2-exp/{model,generate}.py — MLA with latent KV
compression, sparse indexer, MoE routing, a token-by-token generate loop).
TPU-first differences: the whole decode step is one jit (no host loop over
heads/layers), generation carries a static-shape LatentKVCache pytree
through `lax`-friendly steps, and attention decode runs absorbed in latent
space (`mla_absorbed_decode`) so the per-step cache read is B·S·L bytes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from umfa_tpu.models import mla_model, moe
from umfa_tpu.ops.mla import mla_absorbed_decode
from umfa_tpu.serving.kv_cache import LatentKVCache, append_latent


@dataclasses.dataclass(frozen=True)
class DeepSeekConfig:
    vocab: int = 256
    dim: int = 256
    num_heads: int = 4
    latent_dim: int = 32
    depth: int = 2
    num_experts: int = 8
    top_k: int = 2
    n_shared: int = 1
    moe_hidden: int = 512
    indexer_topk: Optional[int] = None
    dtype: str = "bfloat16"
    interpret: bool = False

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    def mla(self) -> mla_model.MLAConfig:
        return mla_model.MLAConfig(
            dim=self.dim, num_heads=self.num_heads,
            latent_dim=self.latent_dim, causal=True, dtype=self.dtype,
            indexer_topk=self.indexer_topk, interpret=self.interpret,
        )

    def moe(self) -> moe.MoEConfig:
        return moe.MoEConfig(
            dim=self.dim, hidden=self.moe_hidden,
            num_experts=self.num_experts, top_k=self.top_k,
            n_shared=self.n_shared, dtype=self.dtype,
        )


def init_params(key, cfg: DeepSeekConfig) -> dict:
    keys = jax.random.split(key, 2 * cfg.depth + 2)
    layers = []
    for i in range(cfg.depth):
        layers.append({
            "attn": mla_model.init_params(keys[2 * i], cfg.mla()),
            "ffn": moe.init_params(keys[2 * i + 1], cfg.moe()),
            "ln1": jnp.ones((cfg.dim,), jnp.float32),
            "ln2": jnp.ones((cfg.dim,), jnp.float32),
        })
    return {
        "embed": jax.random.normal(
            keys[-2], (cfg.vocab, cfg.dim), cfg.jdtype) * 0.02,
        "lnf": jnp.ones((cfg.dim,), jnp.float32),
        "layers": layers,
    }


def _rms(x, g):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + 1e-6)
    return (y * g).astype(x.dtype)


def forward(params: dict, tokens: jax.Array, cfg: DeepSeekConfig):
    """tokens: (B, S) int32 → (logits (B, S, vocab), total aux loss)."""
    x = params["embed"][tokens]
    aux_total = 0.0
    for layer in params["layers"]:
        x = x + mla_model.attend(
            layer["attn"], _rms(x, layer["ln1"]),
            mla_model.compress_kv(layer["attn"], _rms(x, layer["ln1"])),
            cfg.mla(),
        )
        y, aux = moe.moe_ffn(layer["ffn"], _rms(x, layer["ln2"]), cfg.moe())
        x = x + y
        aux_total = aux_total + aux
    x = _rms(x, params["lnf"])
    logits = jnp.einsum(
        "bsd,vd->bsv", x.astype(jnp.float32),
        params["embed"].astype(jnp.float32),
    )
    return logits, aux_total


def init_caches(cfg: DeepSeekConfig, batch: int, max_len: int):
    from umfa_tpu.serving.kv_cache import init_latent_cache

    return [
        init_latent_cache(batch, max_len, cfg.latent_dim, cfg.jdtype)
        for _ in range(cfg.depth)
    ]


def decode_step(
    params: dict, tokens: jax.Array, caches, cfg: DeepSeekConfig,
    uniform_pos: bool = True,
) -> Tuple[jax.Array, list]:
    """tokens: (B, Tq) → (logits for the LAST position (B, vocab),
    updated caches). Attention decode is absorbed latent-space
    (mla_absorbed_decode); the FFN is the same MoE as training.

    `uniform_pos=True` (default) PROMISES uniform cache fill lengths across
    the batch and takes the in-place append fast path; continuous-batching
    callers with ragged cache.length MUST pass uniform_pos=False (the ragged
    scatter path). UMFA_DEBUG=1 NaN-poisons a broken promise
    (kv_cache._write_rows)."""
    b, tq = tokens.shape
    x = params["embed"][tokens]
    mcfg = cfg.mla()
    new_caches = []
    for layer, cache in zip(params["layers"], caches):
        ap = layer["attn"]
        xn = _rms(x, layer["ln1"])
        chunk_start = cache.length
        cache = append_latent(
            cache, mla_model.compress_kv(ap, xn),
            pos=cache.length[0] if uniform_pos else None,
        )
        q = jnp.einsum("bsd,de->bse", xn, ap["wq"]).reshape(
            b, tq, mcfg.num_heads, mcfg.head_dim).transpose(0, 2, 1, 3)
        att = mla_absorbed_decode(
            q, cache.latent, ap["w_k_up"], ap["w_v_up"],
            length=cache.length,
            chunk_start=chunk_start if tq > 1 else None,
        ).transpose(0, 2, 1, 3).reshape(b, tq, cfg.dim).astype(x.dtype)
        x = x + jnp.einsum("bsd,de->bse", att, ap["wo"])
        y, _ = moe.moe_ffn(layer["ffn"], _rms(x, layer["ln2"]), cfg.moe())
        x = x + y
        new_caches.append(cache)
    x = _rms(x[:, -1], params["lnf"])
    logits = jnp.einsum(
        "bd,vd->bv", x.astype(jnp.float32),
        params["embed"].astype(jnp.float32),
    )
    return logits, new_caches


def generate(
    params: dict,
    prompt: jax.Array,
    cfg: DeepSeekConfig,
    *,
    max_new_tokens: int,
    max_len: Optional[int] = None,
    greedy: bool = True,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Prefill the prompt (one chunked decode step), then generate
    token-by-token against the latent caches. prompt: (B, S0) int32 →
    (B, max_new_tokens). Greedy or categorical sampling."""
    b, s0 = prompt.shape
    max_len = max_len or (s0 + max_new_tokens)
    caches = init_caches(cfg, b, max_len)
    logits, caches = decode_step(params, prompt, caches, cfg)

    def pick(logits, k):
        if greedy:
            return jnp.argmax(logits, -1).astype(jnp.int32)
        return jax.random.categorical(k, logits).astype(jnp.int32)

    key = key if key is not None else jax.random.PRNGKey(0)
    tok = pick(logits, key)
    out = [tok]
    for i in range(max_new_tokens - 1):
        key, sub = jax.random.split(key)
        logits, caches = decode_step(params, tok[:, None], caches, cfg)
        tok = pick(logits, sub)
        out.append(tok)
    return jnp.stack(out, axis=1)
