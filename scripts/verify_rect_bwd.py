"""Hardware validation + A/B timing of the rectangular backward (VERDICT
r3 #7). Parity at S=4096 GQA bf16, then slope-timed A/B of the causal
train step (full q,k,v grads) rect vs square at S=4096 D=128 FLUX-ish
geometry. Set UMFA_DISABLE_RECT_BWD=1 externally for the square leg —
both legs should run in FRESH processes for timing-grade numbers; this
script times in-process only as a smoke signal (validation-grade)."""
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from umfa_tpu.ops.attention import flash_attention, reference_attention

print("devices:", jax.devices(), "RECT_BWD disabled:",
      os.environ.get("UMFA_DISABLE_RECT_BWD"), flush=True)
rng = np.random.default_rng(0)


def rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))


# Parity: S=4096 GQA D=64 bf16 (both partial kinds + full rect tiles in
# both passes).
q = jnp.asarray(rng.normal(0, 1, (1, 4, 4096, 64)), jnp.float32)
k = jnp.asarray(rng.normal(0, 1, (1, 2, 4096, 64)), jnp.float32)
v = jnp.asarray(rng.normal(0, 1, (1, 2, 4096, 64)), jnp.float32)
qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

gf = jax.grad(
    lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, causal=True).astype(jnp.float32) ** 2
    ),
    argnums=(0, 1, 2),
)(qb, kb, vb)
gr = jax.grad(
    lambda q, k, v: jnp.sum(
        reference_attention(
            q, jnp.repeat(k, 2, 1), jnp.repeat(v, 2, 1), causal=True
        ).astype(jnp.float32) ** 2
    ),
    argnums=(0, 1, 2),
)(q, k, v)
for nm, a, b in zip("qkv", gf, gr):
    r = rel(a, b)
    print(f"rect_bwd_s4096_gqa d{nm} rel", r, flush=True)
    assert r < 1e-2, (nm, r)

# D=128 parity (FLUX head dim) at S=4096, no GQA.
q = jnp.asarray(rng.normal(0, 1, (1, 2, 4096, 128)), jnp.float32)
k = jnp.asarray(rng.normal(0, 1, (1, 2, 4096, 128)), jnp.float32)
v = jnp.asarray(rng.normal(0, 1, (1, 2, 4096, 128)), jnp.float32)
qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
gf = jax.grad(
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
for nm, a, b in zip("qkv", gf, gr):
    r = rel(a, b)
    print(f"rect_bwd_s4096_d128 d{nm} rel", r, flush=True)
    assert r < 1e-2, (nm, r)

# In-process slope timing (smoke; fresh-process A/B via bench/train_ab).
from umfa_tpu.utils.timing import time_op

B, H, S, D = 1, 8, 4096, 128
q = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)

step = jax.jit(jax.grad(
    lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, causal=True).astype(jnp.float32) ** 2
    ),
    argnums=(0, 1, 2),
))
t = time_op(step, q, k, v)
print(f"train_step_causal_s4096 ms {t * 1e3:.4f}", flush=True)
print("RECT_BWD_HW_PASS", flush=True)
