"""Fused-RoPE A/B (VERDICT r4 missing #2 / weak #4): in-kernel rotation
(flash_fwd rope_cos/rope_sin — Q at q-block load, K at cache fill) vs the
XLA two-pass composition (rotate in XLA, then the Pallas kernel — rotated
Q/K make one HBM round trip because pallas_call is an opaque custom call).

One fresh process per timing. Usage: python scripts/rope_ab.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

S4K = (2, 16, 4096, 64)
FLUX = (1, 24, 4608, 128)

VARIANTS = {
    # name -> (shape, fused, causal)
    "s4k_fused": (S4K, True, False),
    "s4k_xla": (S4K, False, False),
    "s4k_fused_causal": (S4K, True, True),
    "s4k_xla_causal": (S4K, False, True),
    "flux_fused": (FLUX, True, False),
    "flux_xla": (FLUX, False, False),
    "s4k_plain": (S4K, None, False),  # no rope at all (rotation cost ref)
}


def run_one(name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.flash_fwd import flash_attention_forward
    from umfa_tpu.ops.rope import apply_rope, rope_angles
    from umfa_tpu.utils.timing import time_op

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    shape, fused, causal = VARIANTS[name]
    B, H, S, D = shape
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
        for _ in range(3)
    )
    cos, sin = rope_angles(S, D)

    if fused is None:
        fn = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=causal))
    elif fused:
        fn = jax.jit(lambda q, k, v: flash_attention_forward(
            q, k, v, causal=causal, rope_cos=cos, rope_sin=sin)[0])
    else:
        def fn(q, k, v):
            qr = apply_rope(q, cos, sin, interleaved=False)
            kr = apply_rope(k, cos, sin, interleaved=False)
            return flash_attention(qr, kr, v, causal=causal)

        fn = jax.jit(fn)
    t = time_op(fn, q, k, v, iters=64)
    print(json.dumps({"name": name, "ms": t * 1e3}))


def main():
    if os.environ.get("_RAB_ONE"):
        run_one(os.environ["_RAB_ONE"])
        return
    results = {}
    for name in VARIANTS:
        env = dict(os.environ, _RAB_ONE=name)
        p = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=590,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if line:
            results[name] = json.loads(line[-1])["ms"]
            print(f"{name}: {results[name]:.4f} ms", file=sys.stderr)
        else:
            print(f"{name}: FAILED rc={p.returncode}\n{p.stderr[-400:]}",
                  file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
