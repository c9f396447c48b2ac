"""HBM bandwidth benchmark (GB/s).

Parity: benchmarks/MemoryBandwidthBenchmark.swift (GB/s reporting,
MemoryBandwidthBenchmark.swift:67-73). v5e HBM peak ≈ 819 GB/s.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from umfa_tpu.utils.timing import time_op

    rng = np.random.default_rng(0)
    results = {}
    for mb in (64, 256, 1024):
        n = mb * 1024 * 1024 // 4
        x = jnp.asarray(rng.normal(0, 1, (n,)), jnp.float32)
        y = jnp.asarray(rng.normal(0, 1, (n,)), jnp.float32)

        # saxpy: reads 2N, writes N floats -> 12 bytes/element.
        t = time_op(lambda x, y: x * 1.0001 + y, x, y, iters=32)
        gbps = 12 * n / t / 1e9
        results[f"saxpy_{mb}MB"] = {"ms": t * 1e3, "GBps": gbps}
        print(f"saxpy {mb}MB: {gbps:.0f} GB/s", file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
