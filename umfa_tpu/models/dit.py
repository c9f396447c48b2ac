"""FLUX-style DiT attention stack — the flagship workload.

Parity target: the reference's FLUX.1-Schnell benchmark workload
(examples/flux/flux_schnell_benchmark.py — DiT attention at 256-1024px
sequence lengths, SURVEY.md §2.2) re-expressed as a pure-JAX functional
model: adaLN-zero modulated pre-LN transformer blocks whose attention runs
through the fused umfa_tpu kernels (dense or runtime-quantized), with RoPE.

Parallelism-aware by construction: `DiTConfig.tp_axis`/`sp_axis` make the
same forward work inside shard_map with heads tensor-sharded over ICI
("tp", psum after out-proj / MLP row-sharded matmul) and sequence sharded
("sp", ring-attention KV rotation + global RoPE positions).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from umfa_tpu.engine.config import QuantizationConfig
from umfa_tpu.ops.attention import flash_attention
from umfa_tpu.ops.rope import apply_rope
from umfa_tpu.parallel.ring import ring_flash_attention


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    dim: int = 512
    num_heads: int = 8
    depth: int = 2
    mlp_ratio: int = 4
    causal: bool = False
    rope: bool = True
    dtype: str = "bfloat16"
    quantization: Optional[QuantizationConfig] = None
    # Axis names when running inside shard_map (None = single device).
    tp_axis: Optional[str] = None
    sp_axis: Optional[str] = None
    interpret: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def init_block_params(key, cfg: DiTConfig) -> dict:
    dim, heads, dh = cfg.dim, cfg.num_heads, cfg.head_dim
    hidden = dim * cfg.mlp_ratio
    keys = jax.random.split(key, 6)
    s = dim**-0.5
    return {
        "wqkv": jax.random.normal(keys[0], (dim, 3, heads, dh), cfg.jdtype) * s,
        "wo": jax.random.normal(keys[1], (heads, dh, dim), cfg.jdtype) * s,
        "w1": jax.random.normal(keys[2], (dim, hidden), cfg.jdtype) * s,
        "b1": jnp.zeros((hidden,), cfg.jdtype),
        "w2": jax.random.normal(keys[3], (hidden, dim), cfg.jdtype)
        * (hidden**-0.5),
        "b2": jnp.zeros((dim,), cfg.jdtype),
        # adaLN-zero modulation: cond -> (shift, scale, gate) x2.
        "wmod": jax.random.normal(keys[4], (dim, 6, dim), cfg.jdtype) * s * 0.1,
        "bmod": jnp.zeros((6, dim), cfg.jdtype),
    }


def init_params(key, cfg: DiTConfig) -> dict:
    keys = jax.random.split(key, cfg.depth)
    return {"blocks": [init_block_params(k, cfg) for k in keys]}


def _layernorm(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _tp_psum(x, cfg: DiTConfig):
    if cfg.tp_axis is not None:
        return jax.lax.psum(x, cfg.tp_axis)
    return x


def _attention(q, k, v, cfg: DiTConfig):
    """(B, H_loc, S_loc, Dh) → same; ring over sp when sharded."""
    if cfg.quantization is not None:
        from umfa_tpu.ops.quant_attention import quantized_flash_attention

        assert cfg.sp_axis is None, "quantized ring attention: later revision"
        return quantized_flash_attention(
            q, k, v, config=cfg.quantization, causal=cfg.causal,
            interpret=cfg.interpret,
        )
    if cfg.sp_axis is not None:
        return ring_flash_attention(
            q, k, v, axis_name=cfg.sp_axis, causal=cfg.causal,
            interpret=cfg.interpret,
        )
    return flash_attention(q, k, v, causal=cfg.causal, interpret=cfg.interpret)


def block_forward(params: dict, x: jax.Array, cond: jax.Array, cfg: DiTConfig):
    """One DiT block. x: (B, S_loc, dim) local shard; cond: (B, dim)."""
    mod = (
        jnp.einsum("bd,dme->bme", jax.nn.silu(cond.astype(jnp.float32)),
                   params["wmod"].astype(jnp.float32))
        + params["bmod"].astype(jnp.float32)
    ).astype(x.dtype)  # (B, 6, dim)
    shift_a, scale_a, gate_a, shift_m, scale_m, gate_m = (
        mod[:, i][:, None, :] for i in range(6)
    )

    # --- attention ---
    h = _layernorm(x) * (1 + scale_a) + shift_a
    qkv = jnp.einsum("bsd,dthe->btshe", h, params["wqkv"])  # t∈{q,k,v}
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # (B, S, H_loc, Dh)
    q = q.transpose(0, 2, 1, 3)  # (B, H_loc, S, Dh)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    if cfg.rope:
        s_loc = x.shape[1]
        if cfg.sp_axis is not None:
            # Global positions: this shard starts at sp_index * S_loc. RoPE
            # is applied BEFORE the ring rotation, so rotated K chunks carry
            # their own global positions — exactly what ring attention needs.
            start = jax.lax.axis_index(cfg.sp_axis) * s_loc
        else:
            start = 0
        inv_freq = 1.0 / (
            10000.0
            ** (jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim)
        )
        t = (start + jnp.arange(s_loc)).astype(jnp.float32)
        freqs = jnp.outer(t, inv_freq)
        cos, sin = jnp.cos(freqs), jnp.sin(freqs)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    attn = _attention(q, k, v, cfg)  # (B, H_loc, S, Dh)
    attn = jnp.einsum("bhse,hed->bsd", attn.astype(x.dtype), params["wo"])
    attn = _tp_psum(attn.astype(jnp.float32), cfg).astype(x.dtype)
    x = x + gate_a * attn

    # --- MLP (w1 column-sharded, w2 row-sharded over tp) ---
    h = _layernorm(x) * (1 + scale_m) + shift_m
    h = jnp.einsum("bsd,dk->bsk", h, params["w1"]) + params["b1"]
    h = jax.nn.gelu(h.astype(jnp.float32)).astype(x.dtype)
    h = jnp.einsum("bsk,kd->bsd", h, params["w2"])
    h = _tp_psum(h.astype(jnp.float32), cfg).astype(x.dtype)
    h = h + params["b2"]
    return x + gate_m * h


def forward(params: dict, x: jax.Array, cond: jax.Array, cfg: DiTConfig):
    """DiT stack forward. x: (B, S, dim), cond: (B, dim)."""
    for block in params["blocks"]:
        x = block_forward(block, x, cond, cfg)
    return x
