"""Serving demo: GPT-style LM + KV caches + continuous batching.

Ties together the model layer (models/gpt.py), the serving layer (caches,
decode attention) and the continuous batcher — the end-to-end loop a
production deployment runs.

Run: python examples/serving_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from umfa_tpu.models import gpt
from umfa_tpu.serving.scheduler import ContinuousBatcher


def main():
    rng = np.random.default_rng(0)
    interpret = jax.default_backend() == "cpu"
    cfg = gpt.GPTConfig(
        vocab=128, dim=256, num_heads=8, num_kv_heads=4, depth=2,
        max_seq=128, dtype="float32", interpret=interpret,
    )
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)

    prompt = jnp.asarray(rng.integers(0, cfg.vocab, (2, 12)))
    out = gpt.generate(params, prompt, steps=8, cfg=cfg)
    print("generate:", out.shape, "->", np.asarray(out[0])[:20])

    batcher = ContinuousBatcher(num_slots=4)
    for _ in range(6):
        batcher.submit(prompt_len=12, max_new_tokens=4)
    rounds = 0
    while not batcher.idle:
        batcher.step()
        rounds += 1
    s = batcher.stats
    print(
        f"continuous batching: {s.completed} requests in {rounds} rounds, "
        f"mean slot occupancy {s.mean_occupancy:.2f}"
    )


if __name__ == "__main__":
    main()
