"""MoE layer tests (parity target: the MoE half of the reference's
DeepSeek-V3.2 example — 256 routed / 8 active, shared experts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umfa_tpu.models import moe


def naive_moe(params, x, cfg):
    """Per-token loop reference: route, renormalize top-k, SwiGLU each
    chosen expert, weighted sum (+ shared experts)."""
    b, s, d = x.shape
    xf = np.asarray(x, np.float32).reshape(b * s, d)
    router = np.asarray(params["router"], np.float32)
    w1 = np.asarray(params["w1"], np.float32)
    w3 = np.asarray(params["w3"], np.float32)
    w2 = np.asarray(params["w2"], np.float32)
    logits = xf @ router
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    y = np.zeros_like(xf)
    silu = lambda z: z / (1.0 + np.exp(-z))
    for t in range(xf.shape[0]):
        idx = np.argsort(-probs[t])[: cfg.top_k]
        w = probs[t, idx] / probs[t, idx].sum()
        for e, wi in zip(idx, w):
            h = silu(xf[t] @ w1[e]) * (xf[t] @ w3[e])
            y[t] += cfg.routed_scale * wi * (h @ w2[e])
    if cfg.n_shared:
        ws1 = np.asarray(params["ws1"], np.float32)
        ws3 = np.asarray(params["ws3"], np.float32)
        ws2 = np.asarray(params["ws2"], np.float32)
        y += (silu(xf @ ws1) * (xf @ ws3)) @ ws2
    return y.reshape(b, s, d)


def make(cfg, seed=0, batch=2, seq=16):
    params = moe.init_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (batch, seq, cfg.dim)), cfg.jdtype)
    return params, x


@pytest.mark.parametrize("dispatch", ["ragged", "dense"])
def test_moe_matches_naive(dispatch):
    cfg = moe.MoEConfig(dim=32, hidden=48, num_experts=4, top_k=2,
                        dtype="float32", dispatch=dispatch,
                        capacity_factor=4.0)  # ample: no drops
    params, x = make(cfg)
    y, aux = moe.moe_ffn(params, x, cfg)
    want = naive_moe(params, x, cfg)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4, rtol=1e-4)
    assert float(aux) >= 1.0 - 1e-5  # E·Σf·p is minimized at 1


def test_moe_shared_experts_and_scale():
    cfg = moe.MoEConfig(dim=32, hidden=48, num_experts=4, top_k=2,
                        n_shared=1, routed_scale=0.7, dtype="float32",
                        capacity_factor=4.0)
    params, x = make(cfg)
    y, _ = moe.moe_ffn(params, x, cfg)
    np.testing.assert_allclose(
        np.asarray(y), naive_moe(params, x, cfg), atol=1e-4, rtol=1e-4
    )


def test_moe_ragged_equals_dense_under_ample_capacity():
    cfg_r = moe.MoEConfig(dim=32, hidden=48, num_experts=8, top_k=2,
                          dtype="float32", dispatch="ragged")
    cfg_d = moe.MoEConfig(dim=32, hidden=48, num_experts=8, top_k=2,
                          dtype="float32", dispatch="dense",
                          capacity_factor=8.0)
    params, x = make(cfg_r, seed=1)
    yr, _ = moe.moe_ffn(params, x, cfg_r)
    yd, _ = moe.moe_ffn(params, x, cfg_d)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yd),
                               atol=1e-4, rtol=1e-4)


def test_moe_dense_capacity_drops_are_bounded():
    """With capacity_factor < 1 some tokens drop — output stays finite and
    dropped tokens contribute zero (not garbage)."""
    cfg = moe.MoEConfig(dim=32, hidden=48, num_experts=4, top_k=2,
                        dtype="float32", dispatch="dense",
                        capacity_factor=0.5)
    params, x = make(cfg)
    y, _ = moe.moe_ffn(params, x, cfg)
    y = np.asarray(y)
    assert np.isfinite(y).all()
    cfg_full = dataclasses_replace(cfg, capacity_factor=8.0)
    y_full, _ = moe.moe_ffn(params, x, cfg_full)
    # dropped-token outputs are a strict subset → norm can only shrink
    assert np.linalg.norm(y) <= np.linalg.norm(np.asarray(y_full)) + 1e-5


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


@pytest.mark.parametrize("dispatch", ["ragged", "dense"])
def test_moe_grads(dispatch):
    cfg = moe.MoEConfig(dim=16, hidden=24, num_experts=4, top_k=2,
                        dtype="float32", dispatch=dispatch,
                        capacity_factor=4.0)
    params, x = make(cfg, batch=1, seq=8)

    def loss(p):
        y, aux = moe.moe_ffn(p, x, cfg)
        return jnp.sum(y**2) + 0.01 * aux

    g = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)
    # every expert weight gets gradient signal (all experts hit at T=8,K=2
    # is not guaranteed — just require SOME routed-expert signal)
    assert float(jnp.abs(g["w2"]).sum()) > 0
    assert float(jnp.abs(g["router"]).sum()) > 0


@pytest.mark.multidevice
def test_moe_expert_parallel_matches_single_device():
    """dense dispatch + ep-sharded expert weights on an 8-device mesh ==
    unsharded result (XLA inserts the dispatch/combine collectives)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = moe.MoEConfig(dim=32, hidden=64, num_experts=8, top_k=2,
                        dtype="float32", dispatch="dense",
                        capacity_factor=4.0, ep_axis="ep")
    params, x = make(cfg, seed=2, batch=2, seq=32)
    y_ref, aux_ref = moe.moe_ffn(params, x, dataclasses_replace(
        cfg, ep_axis=None))

    mesh = Mesh(np.array(jax.devices()[:8]), ("ep",))
    specs = moe.ep_specs(cfg)
    with mesh:
        params_s = {
            k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in params.items()
        }
        x_s = jax.device_put(x, NamedSharding(mesh, P()))
        y, aux = jax.jit(
            lambda p, xx: moe.moe_ffn(p, xx, cfg)
        )(params_s, x_s)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)
