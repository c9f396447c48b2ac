"""Continuous batching scheduler tests (host logic + device decode loop)."""

import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.serving import decode_attention, init_cache
from umfa_tpu.serving.kv_cache import KVCache, append
from umfa_tpu.serving.scheduler import ContinuousBatcher, reset_slot


def test_batcher_fills_and_drains():
    b = ContinuousBatcher(num_slots=4)
    for _ in range(10):
        b.submit(prompt_len=8, max_new_tokens=3)
    steps = 0
    while not b.idle:
        b.step()
        steps += 1
        assert steps < 100
    assert b.stats.completed == 10
    assert b.stats.admitted == 10
    # With 10 jobs x 3 tokens over 4 slots the schedule needs ≥ ceil(30/4)
    # rounds; occupancy should be high.
    assert b.stats.mean_occupancy > 0.7


def test_batcher_slot_reuse_order():
    b = ContinuousBatcher(num_slots=2)
    first = b.submit(4, 1)
    second = b.submit(4, 5)
    third = b.submit(4, 1)
    admitted = []
    b.step(on_admit=lambda slot, req: admitted.append((slot, req.uid)))
    assert admitted == [(0, first), (1, second)]
    # first finishes after 1 token; third takes its slot next round.
    admitted.clear()
    b.step(on_admit=lambda slot, req: admitted.append((slot, req.uid)))
    assert admitted == [(0, third)]


def test_decode_loop_with_scheduler(rng):
    # End-to-end: 2 slots, 3 requests, cache-backed decode each round.
    heads, dim, max_len = 2, 64, 64
    cache = init_cache(2, heads, max_len, dim, jnp.float32)
    batcher = ContinuousBatcher(num_slots=2)
    for _ in range(3):
        batcher.submit(prompt_len=8, max_new_tokens=2)

    state = {"cache": cache}

    def on_admit(slot, req):
        # Prefill: write the prompt into the slot.
        k = jnp.asarray(rng.normal(0, 1, (1, heads, req.prompt_len, dim)),
                        jnp.float32)
        c = state["cache"]
        c = KVCache(
            k=c.k.at[slot, :, : req.prompt_len].set(k[0]),
            v=c.v.at[slot, :, : req.prompt_len].set(k[0]),
            length=c.length.at[slot].set(req.prompt_len),
        )
        state["cache"] = c

    def on_retire(slot, req):
        state["cache"] = reset_slot(state["cache"], slot)

    rounds = 0
    while not batcher.idle:
        mask = batcher.step(on_admit=on_admit, on_retire=on_retire)
        # Device step: decode one token for every slot (inactive slots
        # compute garbage that is simply not used — fixed shapes).
        q = jnp.asarray(rng.normal(0, 1, (2, heads, 1, dim)), jnp.float32)
        out = decode_attention(q, state["cache"], interpret=True)
        assert out.shape == (2, heads, 1, dim)
        assert np.isfinite(np.asarray(out)[mask]).all()
        rounds += 1
        assert rounds < 20
    assert batcher.stats.completed == 3
