"""Round-4c hardware verification: bf16 grad emission, structural ring
backward (self-loop Mosaic), Pallas quantized flash-decode kernel."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from umfa_tpu.ops.attention import flash_attention, reference_attention

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))


# 1. bf16 grad emission: dense + quantized grads on device, parity + dtypes.
q = jnp.asarray(rng.normal(0, 1, (1, 4, 2048, 128)), jnp.float32)
k = jnp.asarray(rng.normal(0, 1, (1, 4, 2048, 128)), jnp.float32)
v = jnp.asarray(rng.normal(0, 1, (1, 4, 2048, 128)), jnp.float32)
qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

g = jax.grad(
    lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, causal=True).astype(jnp.float32) ** 2
    ),
    argnums=(0, 1, 2),
)(qb, kb, vb)
gr = jax.grad(
    lambda q, k, v: jnp.sum(
        reference_attention(q, k, v, causal=True).astype(jnp.float32) ** 2
    ),
    argnums=(0, 1, 2),
)(q, k, v)
for nm, a, b in zip("qkv", g, gr):
    assert a.dtype == jnp.bfloat16, a.dtype
    r = rel(a, b)
    print(f"1 bf16grads_dense d{nm} rel", r, flush=True)
    assert r < 1.5e-2, (nm, r)

from umfa_tpu.ops.quant_attention import quantized_flash_attention

gq = jax.grad(
    lambda q, k, v: jnp.sum(
        quantized_flash_attention(q, k, v, causal=True).astype(jnp.float32)
        ** 2
    ),
    argnums=(0, 1, 2),
)(qb, kb, vb)
for nm, a, b in zip("qkv", gq, gr):
    assert a.dtype == jnp.bfloat16, a.dtype
    c = float(
        np.dot(np.asarray(a, np.float32).ravel(), np.asarray(b, np.float32).ravel())
        / max(
            np.linalg.norm(np.asarray(a, np.float32))
            * np.linalg.norm(np.asarray(b, np.float32)),
            1e-9,
        )
    )
    print(f"1 bf16grads_quant d{nm} cosine", c, flush=True)
    assert c > 0.97, (nm, c)

# 2. Structural ring backward: self-loop Mosaic compile + parity.
from umfa_tpu.parallel.ring_pallas import ring_pallas_selfloop_bwd_check

r = ring_pallas_selfloop_bwd_check(seq=1024, n_steps=4, causal=True)
print("2 ring_bwd_selfloop causal rel", r, flush=True)
r = ring_pallas_selfloop_bwd_check(seq=1024, n_steps=3, causal=False)
print("2 ring_bwd_selfloop noncausal rel", r, flush=True)

# 3. Pallas quantized flash-decode: Mosaic parity vs the XLA gemv.
import os

from umfa_tpu.serving import decode as dec
from umfa_tpu.serving.kv_cache import append_quantized, init_quantized_cache

B, Hq, Hkv, S, D = 8, 16, 8, 4096, 64
cache = init_quantized_cache(B, Hkv, S, D)
L = S - 64
kf = jnp.asarray(rng.normal(0, 1, (B, Hkv, L, D)), jnp.bfloat16)
vf = jnp.asarray(rng.normal(0, 1, (B, Hkv, L, D)), jnp.bfloat16)
cache = append_quantized(cache, kf, vf)
qd = jnp.asarray(rng.normal(0, 1, (B, Hq, 1, D)), jnp.bfloat16)
out = dec.decode_attention(qd, cache)
os.environ["UMFA_DISABLE_DECODE_KERNEL"] = "1"
want = dec.decode_attention(qd, cache)
del os.environ["UMFA_DISABLE_DECODE_KERNEL"]
r = rel(out, want)
print("3 decode_kernel_vs_gemv rel", r, flush=True)
assert r < 5e-3, r

# 3b. decode step timing smoke (in-process; fresh-process A/B via bench).
from umfa_tpu.utils.timing import time_op

t_k = time_op(
    lambda q: dec.decode_attention(q, cache), qd
)
os.environ["UMFA_DISABLE_DECODE_KERNEL"] = "1"
t_g = time_op(
    lambda q: dec.decode_attention(q, cache), qd
)
del os.environ["UMFA_DISABLE_DECODE_KERNEL"]
print(
    f"3 decode kernel {t_k * 1e6:.1f} us vs gemv {t_g * 1e6:.1f} us "
    f"({t_g / t_k:.2f}x)",
    flush=True,
)
print("VERIFY_R4C_ALL_PASS", flush=True)
