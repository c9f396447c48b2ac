"""Sharding layer tests on the 8-virtual-device CPU mesh (SURVEY.md §4:
multi-device via XLA host simulation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from umfa_tpu.ops.attention import reference_attention
from umfa_tpu.parallel import make_mesh, ring_flash_attention, sharded_attention
from umfa_tpu.utils.testing import TOL, make_qkv

pytestmark = pytest.mark.multidevice


def test_make_mesh_infers_size():
    mesh = make_mesh(dp=2, sp=1, tp=-1)
    assert mesh.devices.shape == (2, 1, 4)
    assert mesh.axis_names == ("dp", "sp", "tp")


def test_head_and_batch_sharded(rng):
    mesh = make_mesh(dp=2, sp=1, tp=4)
    q, k, v = make_qkv(rng, 2, 8, 128, 128, 64)
    attn = sharded_attention(mesh, causal=True, interpret=True)
    out = attn(q, k, v)
    want = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), want, **TOL["fp32"])


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention(rng, causal):
    mesh = make_mesh(dp=1, sp=4, tp=2)
    q, k, v = make_qkv(rng, 1, 2, 512, 512, 64)
    attn = sharded_attention(
        mesh, seq_axis="sp", causal=causal, interpret=True
    )
    out = attn(q, k, v)
    want = reference_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4, rtol=1e-4)


def test_ring_attention_grads(rng):
    mesh = make_mesh(dp=1, sp=4, tp=1)
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    attn = sharded_attention(mesh, seq_axis="sp", causal=True, interpret=True)

    def loss(q, k, v):
        return jnp.sum(attn(q, k, v) ** 2)

    def ref_loss(q, k, v):
        return jnp.sum(reference_attention(q, k, v, causal=True) ** 2)

    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=1e-4, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_sharded_quantized(rng):
    from umfa_tpu.engine.config import QuantizationConfig

    mesh = make_mesh(dp=1, sp=1, tp=8)
    q, k, v = make_qkv(rng, 1, 8, 128, 128, 64)
    attn = sharded_attention(
        mesh, quantization=QuantizationConfig(), interpret=True
    )
    out = attn(q, k, v)
    want = reference_attention(q, k, v)
    err = np.linalg.norm(np.asarray(out) - want) / np.linalg.norm(want)
    assert err < 0.02


def test_zigzag_shard_roundtrip(rng):
    from umfa_tpu.parallel.ring import zigzag_shard, zigzag_unshard

    x = jnp.asarray(rng.normal(0, 1, (1, 2, 64, 8)), jnp.float32)
    y = zigzag_unshard(zigzag_shard(x, 4), 4)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_zigzag_ring_causal(rng):
    # Zigzag layout balances causal work across the ring; results must match
    # plain causal attention exactly after unsharding.
    mesh = make_mesh(dp=1, sp=4, tp=2)
    q, k, v = make_qkv(rng, 1, 2, 512, 512, 64)
    attn = sharded_attention(
        mesh, seq_axis="sp", causal=True, zigzag=True, interpret=True
    )
    out = attn(q, k, v)
    want = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4, rtol=1e-4)


def test_zigzag_ring_grads(rng):
    mesh = make_mesh(dp=1, sp=4, tp=1)
    q, k, v = make_qkv(rng, 1, 2, 256, 256, 64)
    attn = sharded_attention(
        mesh, seq_axis="sp", causal=True, zigzag=True, interpret=True
    )
    got = jax.grad(lambda q: jnp.sum(attn(q, k, v) ** 2))(q)
    want = jax.grad(
        lambda q: jnp.sum(reference_attention(q, k, v, causal=True) ** 2)
    )(q)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_quantized_ring_attention(rng):
    from umfa_tpu.engine.config import QuantizationConfig

    mesh = make_mesh(dp=1, sp=4, tp=2)
    q, k, v = make_qkv(rng, 1, 2, 512, 512, 64)
    attn = sharded_attention(
        mesh, seq_axis="sp", causal=True,
        quantization=QuantizationConfig(), interpret=True,
    )
    out = attn(q, k, v)
    want = np.asarray(reference_attention(q, k, v, causal=True))
    err = np.linalg.norm(np.asarray(out) - want) / np.linalg.norm(want)
    assert err < 0.03


def test_explicit_device_placement(rng):
    # Inputs pre-placed with NamedSharding still work.
    mesh = make_mesh(dp=2, sp=1, tp=4)
    q, k, v = make_qkv(rng, 2, 8, 128, 128, 64)
    sh = NamedSharding(mesh, P("dp", "tp", None, None))
    q, k, v = jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh)
    attn = sharded_attention(mesh, interpret=True)
    out = attn(q, k, v)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), want, **TOL["fp32"])


# ---- Pallas ring (in-kernel RDMA rotation, VERDICT r1 #6) ----

def _pallas_ring_harness(rng, *, causal, zigzag, n_dev=4, seq=256, grads=False):
    from jax.sharding import Mesh
    from jax import shard_map
    from umfa_tpu.parallel.ring import zigzag_shard, zigzag_unshard
    from umfa_tpu.parallel.ring_pallas import ring_flash_attention_pallas

    devices = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("sp",))
    q, k, v = make_qkv(rng, 1, 2, seq, seq, 64)

    def inner(q, k, v):
        return ring_flash_attention_pallas(
            q, k, v, axis_name="sp", causal=causal, zigzag=zigzag,
            interpret=True,
        )

    f = shard_map(
        inner, mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
        check_vma=False,
    )

    def run(q, k, v):
        if zigzag:
            q, k, v = (zigzag_shard(x, n_dev) for x in (q, k, v))
        out = f(q, k, v)
        if zigzag:
            out = zigzag_unshard(out, n_dev)
        return out

    out = jax.jit(run)(q, k, v)
    want = reference_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), atol=2e-4, rtol=2e-4
    )
    if grads:
        def loss(q, k, v):
            return jnp.sum(run(q, k, v) * jnp.cos(run(q, k, v)))

        def ref_loss(q, k, v):
            o = reference_attention(q, k, v, causal=causal)
            return jnp.sum(o * jnp.cos(o))

        # jit REQUIRED: unjitted grad dispatches the collective kernels
        # op-by-op, and eager per-device dispatch interleaves two ring
        # instances in inconsistent order across device threads —
        # deadlocks (both the structural and the jnp backward; r4 repro).
        got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        wantg = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for g, w, name in zip(got, wantg, "qkv"):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=2e-4, rtol=2e-4,
                err_msg=f"d{name}",
            )


@pytest.mark.parametrize("causal", [False, True])
def test_pallas_ring_parity(rng, causal):
    _pallas_ring_harness(rng, causal=causal, zigzag=False)


def test_pallas_ring_zigzag_causal(rng):
    _pallas_ring_harness(rng, causal=True, zigzag=True)


def test_pallas_ring_grads(rng):
    _pallas_ring_harness(rng, causal=True, zigzag=False, grads=True)


def test_pallas_ring_gqa(rng):
    from jax.sharding import Mesh
    from jax import shard_map
    from umfa_tpu.parallel.ring_pallas import ring_flash_attention_pallas

    n_dev = 4
    devices = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("sp",))
    q, k, v = make_qkv(rng, 1, 4, 256, 256, 64, kv_heads=2)

    f = shard_map(
        lambda q, k, v: ring_flash_attention_pallas(
            q, k, v, axis_name="sp", causal=False, interpret=True
        ),
        mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
        check_vma=False,
    )
    out = jax.jit(f)(q, k, v)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), atol=2e-4, rtol=2e-4
    )


def test_pallas_ring_selfloop_mode(rng):
    """Self-loop validation mode (VERDICT r3 #5): one device sends its own
    chunk to itself for n steps — the harness used to Mosaic-compile the
    full RDMA protocol on a single real chip. Checked here in interpret
    mode so the degenerate-ring routing (only step 0 computes; credits
    self-paired) stays correct."""
    from umfa_tpu.parallel.ring_pallas import ring_pallas_selfloop_check

    rel, _, _ = ring_pallas_selfloop_check(
        seq=512, n_steps=4, causal=True, interpret=True
    )
    assert rel < 5e-3
    rel, _, _ = ring_pallas_selfloop_check(
        seq=512, n_steps=3, causal=False, interpret=True
    )
    assert rel < 5e-3


def test_quantized_ring_accuracy_penalty_bounded(rng):
    """Bound the int8-ring accuracy penalty vs int8 single-chip (VERDICT r2
    weak #9). The ring quantizes per chunk with Q-mean smoothing forfeited
    (per-chunk LSE offsets break the merge) but keeps GLOBAL K/V-mean
    smoothing (pmean, merge-safe) — so the penalty must be small. Measured
    on structured activations (channel outliers), the distribution where
    smoothing matters."""
    from umfa_tpu.engine.config import QuantizationConfig
    from umfa_tpu.ops.quant_attention import quantized_flash_attention

    sr = np.random.default_rng(3)
    B, H, S, D = 1, 2, 512, 64
    qn = sr.normal(0, 1, (B, H, S, D))
    kn = sr.normal(0, 1, (B, H, S, D))
    ch = sr.choice(D, 4, replace=False)
    qn[..., ch] *= 8.0
    kn[..., ch] *= 8.0
    s = np.einsum("bhqd,bhkd->bhqk", qn, kn) / np.sqrt(D)
    f = np.sqrt(0.5 / s.std())
    q = jnp.asarray(qn * f, jnp.float32)
    k = jnp.asarray(kn * f, jnp.float32)
    v = jnp.asarray(sr.normal(0, 1, (B, H, S, D)), jnp.float32)

    want = np.asarray(reference_attention(q, k, v, causal=True))

    def relerr(x):
        return float(
            np.linalg.norm(np.asarray(x, np.float32) - want)
            / np.linalg.norm(want)
        )

    cfg = QuantizationConfig()  # default int8 recipe (full smoothing)
    err_single = relerr(
        quantized_flash_attention(q, k, v, config=cfg, causal=True,
                                  interpret=True)
    )

    mesh = make_mesh(dp=1, sp=4, tp=2)
    attn = sharded_attention(
        mesh, seq_axis="sp", causal=True, quantization=cfg, interpret=True
    )
    err_ring = relerr(attn(q, k, v))

    # Documented bound (docs/PERFORMANCE.md "Quantized ring accuracy"): the
    # ring may lose at most 50% relative on top of single-chip int8 and must
    # stay inside the absolute int8 envelope.
    assert err_ring < 0.03, err_ring
    assert err_ring <= err_single * 1.5 + 5e-3, (err_ring, err_single)


# ---------------- pipeline parallelism ----------------

def _mlp_stage(p, x):
    return jnp.tanh(x @ p["w"]) + p["b"]


def _stacked_mlp(key, stages, dim):
    keys = jax.random.split(key, 2)
    return {
        "w": jax.random.normal(keys[0], (stages, dim, dim), jnp.float32)
        * dim**-0.5,
        "b": jax.random.normal(keys[1], (stages, dim), jnp.float32) * 0.1,
    }


@pytest.mark.parametrize("pp,micro", [(4, 8), (8, 8), (2, 2)])
def test_pipeline_matches_sequential(rng, pp, micro):
    from jax.sharding import Mesh
    from umfa_tpu.parallel import pipeline_apply

    dim, batch = 16, 16
    params = _stacked_mlp(jax.random.PRNGKey(0), pp, dim)
    x = jnp.asarray(rng.normal(0, 1, (batch, dim)), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:pp]), ("pp",))
    out = pipeline_apply(
        _mlp_stage, params, x, mesh=mesh, axis="pp", num_microbatches=micro
    )
    want = x
    for i in range(pp):
        want = _mlp_stage({"w": params["w"][i], "b": params["b"][i]}, want)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_grads(rng):
    from jax.sharding import Mesh
    from umfa_tpu.parallel import pipeline_apply

    pp, dim, batch = 4, 8, 8
    params = _stacked_mlp(jax.random.PRNGKey(1), pp, dim)
    x = jnp.asarray(rng.normal(0, 1, (batch, dim)), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:pp]), ("pp",))

    def loss_pipe(p):
        y = pipeline_apply(_mlp_stage, p, x, mesh=mesh, axis="pp",
                           num_microbatches=4)
        return jnp.sum(y**2)

    def loss_seq(p):
        y = x
        for i in range(pp):
            y = _mlp_stage({"w": p["w"][i], "b": p["b"][i]}, y)
        return jnp.sum(y**2)

    g_pipe = jax.grad(loss_pipe)(params)
    g_seq = jax.grad(loss_seq)(params)
    for k in g_pipe:
        np.testing.assert_allclose(np.asarray(g_pipe[k]),
                                   np.asarray(g_seq[k]),
                                   atol=1e-4, rtol=1e-4)


def test_pipeline_rejects_bad_microbatch():
    from jax.sharding import Mesh
    from umfa_tpu.parallel import pipeline_apply

    params = _stacked_mlp(jax.random.PRNGKey(0), 2, 4)
    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    with pytest.raises(ValueError):
        pipeline_apply(_mlp_stage, params, jnp.zeros((6, 4)), mesh=mesh,
                       num_microbatches=4)


def test_pallas_ring_grads_zigzag(rng):
    """Structural reverse ring (VERDICT r3 #6) under the zigzag layout:
    global-position masking in the bwd kernel's keep-mask."""
    _pallas_ring_harness(rng, causal=True, zigzag=True, grads=True)


def test_pallas_ring_bwd_matches_jnp_ring(rng, monkeypatch):
    """The structural Pallas reverse ring and the jnp ppermute fallback
    (UMFA_RING_BWD=jnp) compute the same gradients."""
    from jax.sharding import Mesh
    from jax import shard_map
    from umfa_tpu.parallel.ring_pallas import ring_flash_attention_pallas

    n_dev = 4
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("sp",))
    q, k, v = make_qkv(rng, 1, 4, 256, 256, 64, kv_heads=2)

    f = shard_map(
        lambda q, k, v: ring_flash_attention_pallas(
            q, k, v, axis_name="sp", causal=True, interpret=True
        ),
        mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
        check_vma=False,
    )

    def loss(q, k, v):
        return jnp.sum(f(q, k, v) ** 2)

    # Fresh jax.jit per env setting: UMFA_RING_BWD is read at trace time.
    g_pallas = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    monkeypatch.setenv("UMFA_RING_BWD", "jnp")
    g_jnp = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", g_pallas, g_jnp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5,
            err_msg=f"d{name}",
        )


def test_pallas_ring_selfloop_bwd_mode(rng):
    """Self-loop validation of the STRUCTURAL reverse ring (VERDICT r3 #6):
    dual-buffer (KV + f32 dKV) RDMA, phase-split send-overlaps-dQ schedule,
    capacity credits, RMW accumulation — interpret-checked here; the
    tpu-marked twin Mosaic-compiles it on the real chip."""
    from umfa_tpu.parallel.ring_pallas import ring_pallas_selfloop_bwd_check

    assert ring_pallas_selfloop_bwd_check(
        seq=512, n_steps=4, causal=True, interpret=True
    ) < 2e-2
    assert ring_pallas_selfloop_bwd_check(
        seq=512, n_steps=3, causal=False, interpret=True
    ) < 2e-2
