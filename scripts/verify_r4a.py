"""Round-4 WIP hardware verification driver (verify skill).

Drives every kernel path the uncommitted WIP touches on the REAL TPU:
  1. dense bf16 causal S=4096 (rect mode, refactored _rect_sub_update +
     KV-cache branch) — output parity vs reference.
  2. quantized causal S=2048 default/smooth_q/BLOCK (fused rect path +
     cheaper reciprocal quantize) — output parity.
  3. quantized causal S=4096 GQA (rect multi-block fill schedule).
  4. full (q,k,v) grads through quantized attention at S=2048 causal and
     S=1024 non-causal (quant_bwd deq caches: dQ KV-cache + dKV Q-cache,
     frozen index maps, new dimension semantics) — cosine vs dense grads.
  5. GQA quantized grads (group=4: dq cache on, dkv qcache off).
  6. decode_attention generic Tq>1 cliff guard (chunked route) on device.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import umfa_tpu  # noqa: F401
from umfa_tpu.engine.config import QuantizationConfig, QuantMode
from umfa_tpu.ops.attention import flash_attention, reference_attention
from umfa_tpu.ops.quant_attention import quantized_flash_attention

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def mk(b, h, s, d, kv_heads=None, dtype=jnp.float32):
    kvh = kv_heads or h
    q = jnp.asarray(rng.normal(0, 1, (b, h, s, d)), dtype)
    k = jnp.asarray(rng.normal(0, 1, (b, kvh, s, d)), dtype)
    v = jnp.asarray(rng.normal(0, 1, (b, kvh, s, d)), dtype)
    return q, k, v


def rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))


def cosine(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    return float(np.dot(a, b) / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-9))


# 1. dense bf16 rect (S=4096, GQA, D=64 -> ones-column + cache branch)
q, k, v = mk(1, 4, 4096, 64, kv_heads=2)
qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
out = flash_attention(qb, kb, vb, causal=True)
want = reference_attention(q, jnp.repeat(k, 2, 1), jnp.repeat(v, 2, 1), causal=True)
r = rel(out, want)
print("1 dense_rect_s4096_gqa rel", r, flush=True)
assert r < 8e-3, r

# 2. quantized causal rect S=2048 variants
q, k, v = mk(1, 2, 2048, 64)
want = reference_attention(q, k, v, causal=True)
for name, cfg in (
    ("default", QuantizationConfig()),
    ("smooth_q", QuantizationConfig(smooth_q=True)),
    ("block", QuantizationConfig(mode=QuantMode.BLOCK)),
):
    out = quantized_flash_attention(q, k, v, config=cfg, causal=True)
    r = rel(out, want)
    print(f"2 quant_rect_s2048_{name} rel", r, flush=True)
    assert r < 0.05, (name, r)

# 3. quantized causal rect S=4096 GQA
q4, k4, v4 = mk(1, 4, 4096, 64, kv_heads=2)
out = quantized_flash_attention(q4, k4, v4, causal=True)
want4 = reference_attention(
    q4, jnp.repeat(k4, 2, 1), jnp.repeat(v4, 2, 1), causal=True
)
r = rel(out, want4)
print("3 quant_rect_s4096_gqa rel", r, flush=True)
assert r < 0.05, r

# 4. full-grad quantized backward with deq caches
for tag, (qq, kk, vv), causal in (
    ("s2048_causal", mk(1, 2, 2048, 128), True),
    ("s1024_dense", mk(1, 2, 1024, 128), False),
):
    def qloss(q, k, v, causal=causal):
        return jnp.sum(
            quantized_flash_attention(q, k, v, causal=causal).astype(
                jnp.float32
            ) ** 2
        )

    def dloss(q, k, v, causal=causal):
        return jnp.sum(
            reference_attention(q, k, v, causal=causal).astype(jnp.float32)
            ** 2
        )

    gq = jax.grad(qloss, argnums=(0, 1, 2))(qq, kk, vv)
    gd = jax.grad(dloss, argnums=(0, 1, 2))(qq, kk, vv)
    for nm, a, b in zip("qkv", gq, gd):
        c = cosine(a, b)
        print(f"4 quant_bwd_{tag} d{nm} cosine", c, flush=True)
        assert c > 0.97, (tag, nm, c)

# 5. GQA quantized grads (group=4: dq KV-cache on, dkv q-cache off)
qq, kk, vv = mk(1, 8, 1024, 128, kv_heads=2)
gq = jax.grad(
    lambda q, k, v: jnp.sum(
        quantized_flash_attention(q, k, v, causal=True).astype(jnp.float32)
        ** 2
    ),
    argnums=(0, 1, 2),
)(qq, kk, vv)
gd = jax.grad(
    lambda q, k, v: jnp.sum(
        reference_attention(
            q, jnp.repeat(k, 4, 1), jnp.repeat(v, 4, 1), causal=True
        ).astype(jnp.float32) ** 2
    ),
    argnums=(0, 1, 2),
)(qq, kk, vv)
for nm, a, b in zip("qkv", gq, gd):
    c = cosine(a, b)
    print(f"5 quant_bwd_gqa d{nm} cosine", c, flush=True)
    assert c > 0.97, (nm, c)

# 6. decode cliff guard on device (small shapes; exercises the chunked route)
from umfa_tpu.serving import decode as dec
from umfa_tpu.serving.kv_cache import init_cache, append

dec._BIAS_BUDGET_BYTES = 16384
q_full, k_full, v_full = mk(1, 2, 64, 64)
cache = init_cache(1, 2, 128, 64, jnp.float32)
cache = append(cache, k_full, v_full)
out = dec.decode_attention(q_full[:, :, 24:], cache)
want = reference_attention(q_full, k_full, v_full, causal=True)[:, :, 24:]
r = rel(out, want)
print("6 decode_cliff_chunked rel", r, flush=True)
assert r < 1e-3, r

print("VERIFY_R4A_ALL_PASS", flush=True)
