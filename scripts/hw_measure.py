"""Round-3 hardware validation + measurement (run when the TPU relay is up).

Drives every round-3 kernel path on the real device (Mosaic validation —
interpret mode can't vouch for pl.ds slices / int dots) and captures the
timings the round-3 claims need. One fresh subprocess per stage.

CAVEAT (learned from this script's own output): per-STAGE isolation is not
enough for timings — a stage that runs parity+grad checks before its
time_op reads up to ~25% off (diag_fwd read causal 1.495 ms vs ~1.44
fresh; the pv stage read FLUX int8 2.40 vs 1.98 fresh). Use this script
for PARITY/VALIDATION; take timing claims from `bench.py` (one fresh
process per timing) or `scripts/tile_ab.py`. Structured JSON per stage to
stdout at the end.

Usage:
  python scripts/hw_measure.py              # orchestrate all stages
  python scripts/hw_measure.py --stage X    # one stage (internal)

Stages:
  diag_fwd     causal diag sub-tiling parity + S=4K causal/dense fwd ms
  diag_bwd     bwd parity + train-step ms, (1024,1024) vs (2048,1024) A/B
  pv           pv_int8 parity + S=4K + FLUX A/B vs non-pv int8 and bf16
  block_win    BLOCK-mode fused + quantized window auto-tiling parity + ms
  serving      model-level GPT int8-KV decode tokens/s vs dense cache
  mla          absorbed latent-cache decode vs dense-cache decode (MLA)
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGES = ["diag_fwd", "diag_bwd", "pv", "block_win", "serving", "mla"]
STAGE_TIMEOUT_S = 1500


def _note(msg):
    print(f"[hw {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# Stage bodies (each runs in a fresh process on the TPU)
# --------------------------------------------------------------------------


def _setup():
    import jax

    if os.environ.get("UMFA_HW_ALLOW_CPU") != "1":
        assert jax.default_backend() != "cpu", "TPU required for hw_measure"
    return jax


def _rand(rng, shape, dtype):
    import jax.numpy as jnp

    return jnp.asarray(rng.normal(0, 1, shape), dtype)


def _relerr(x, ref):
    import numpy as np

    x = np.asarray(x, np.float32)
    ref = np.asarray(ref, np.float32)
    return float(np.linalg.norm(x - ref) / np.linalg.norm(ref))


def stage_diag_fwd():
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.ops.attention import flash_attention, reference_attention
    from umfa_tpu.utils.timing import time_op

    rng = np.random.default_rng(0)
    B, H, S, D = 2, 16, 4096, 64
    q, k, v = (_rand(rng, (B, H, S, D), jnp.bfloat16) for _ in range(3))

    # Parity first (grads too — the LSE residual feeds the backward).
    qs, ks, vs = (x[:1, :2].astype(jnp.float32) for x in (q, k, v))
    want = reference_attention(qs, ks, vs, causal=True)
    got = flash_attention(qs, ks, vs, causal=True)
    rel = _relerr(got, want)
    assert rel < 2e-6, f"causal diag fwd parity {rel}"
    g = jax.grad(lambda q: jnp.sum(flash_attention(q, ks, vs, causal=True) ** 2))(qs)
    gr = jax.grad(lambda q: jnp.sum(reference_attention(q, ks, vs, causal=True) ** 2))(qs)
    grel = _relerr(g, gr)
    assert grel < 3e-5, f"causal diag grad parity {grel}"

    f_causal = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))
    f_dense = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    t_causal = time_op(f_causal, q, k, v, iters=64)
    t_dense = time_op(f_dense, q, k, v, iters=64)
    return {
        "parity": {"fwd_relerr": rel, "grad_relerr": grel},
        "causal_ms_s4k": t_causal * 1e3,   # r2: 1.48; target <= ~1.25
        "dense_ms_s4k": t_dense * 1e3,     # r2: 1.68; must not regress
    }


def stage_diag_bwd():
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.flash_fwd import BlockSizes
    from umfa_tpu.utils.timing import time_op

    rng = np.random.default_rng(0)
    B, H, S, D = 1, 8, 4096, 64
    q, k, v = (_rand(rng, (B, H, S, D), jnp.bfloat16) for _ in range(3))

    bs_2048 = BlockSizes(
        block_q=1024, block_k=1024, block_q_dq=2048, block_k_dq=1024,
        block_q_dkv=2048, block_k_dkv=1024,
    )  # r2 default (diag disabled: bq != bk)

    def step(bs):
        def loss(q, k, v):
            kw = {} if bs is None else {"block_sizes": bs}
            return jnp.sum(flash_attention(q, k, v, causal=True, **kw) ** 2)
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    t_diag = time_op(step(None), q, k, v, iters=32)      # (1024,1024) + diag
    t_r2 = time_op(step(bs_2048), q, k, v, iters=32)     # (2048,1024) no diag
    # dense (non-causal) train-step no-regression check
    def dense_loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)
    t_dense = time_op(jax.jit(jax.grad(dense_loss, argnums=(0, 1, 2))), q, k, v, iters=32)
    return {
        "causal_train_ms_diag_1024": t_diag * 1e3,
        "causal_train_ms_r2_2048x1024": t_r2 * 1e3,
        "dense_train_ms": t_dense * 1e3,   # r2: 0.99
    }


def stage_pv():
    jax = _setup()
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.engine.config import Precision, QuantMode, QuantizationConfig
    from umfa_tpu.ops.attention import reference_attention
    from umfa_tpu.ops.quant_attention import quantized_flash_attention
    from umfa_tpu.utils.timing import time_op

    def qcfg(**kw):
        return dataclasses.replace(QuantizationConfig(), **kw)

    rng = np.random.default_rng(0)
    out = {}
    for name, (B, H, S, D) in (
        ("s4k", (2, 16, 4096, 64)),
        ("flux", (1, 24, 4608, 128)),
    ):
        q, k, v = (_rand(rng, (B, H, S, D), jnp.bfloat16) for _ in range(3))
        pv = jax.jit(lambda q, k, v: quantized_flash_attention(
            q, k, v, config=qcfg(pv_int8=True)))
        nopv = jax.jit(lambda q, k, v: quantized_flash_attention(
            q, k, v, config=qcfg()))
        from umfa_tpu.ops.attention import flash_attention

        bf16 = jax.jit(lambda q, k, v: flash_attention(q, k, v))
        qs, ks, vs = (x[:1, :2].astype(jnp.float32) for x in (q, k, v))
        want = reference_attention(qs, ks, vs)
        rel = _relerr(quantized_flash_attention(
            qs, ks, vs, config=qcfg(pv_int8=True)), want)
        assert rel < 0.025, f"pv_int8 {name} parity {rel}"
        relc = _relerr(quantized_flash_attention(
            qs, ks, vs, config=qcfg(pv_int8=True), causal=True),
            reference_attention(qs, ks, vs, causal=True))
        out[name] = {
            "relerr_iid": rel,
            "relerr_iid_causal": relc,
            "pv_ms": time_op(pv, q, k, v, iters=64) * 1e3,
            "int8_ms": time_op(nopv, q, k, v, iters=64) * 1e3,
            "bf16_ms": time_op(bf16, q, k, v, iters=64) * 1e3,
        }
    return out


def stage_block_win():
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np

    import umfa_tpu
    from umfa_tpu.engine.config import Precision, QuantMode, QuantizationConfig
    from umfa_tpu.ops.attention import flash_attention, reference_attention
    from umfa_tpu.ops.quant_attention import quantized_flash_attention
    from umfa_tpu.utils.timing import time_op

    rng = np.random.default_rng(0)
    B, H, S, D = 2, 16, 4096, 64
    q, k, v = (_rand(rng, (B, H, S, D), jnp.bfloat16) for _ in range(3))

    # BLOCK mode through the fused kernel (Mosaic: segment-max concat).
    cfgb = QuantizationConfig(mode=QuantMode.BLOCK)
    qs, ks, vs = (x[:1, :2].astype(jnp.float32) for x in (q, k, v))
    want = reference_attention(qs, ks, vs)
    relb = _relerr(quantized_flash_attention(qs, ks, vs, config=cfgb), want)
    assert relb < 0.02, f"BLOCK fused parity {relb}"

    blk = jax.jit(lambda q, k, v: quantized_flash_attention(q, k, v, config=cfgb))
    t_blk = time_op(blk, q, k, v, iters=64)

    # Quantized window auto-tiling.
    before = umfa_tpu.get_dispatch_stats().get("window_auto_tiled", 0)
    relw = _relerr(
        quantized_flash_attention(qs, ks, vs, window=(256, 0)),
        reference_attention(qs, ks, vs, window=(256, 0)),
    )
    assert umfa_tpu.get_dispatch_stats().get("window_auto_tiled", 0) > before
    assert relw < 0.02, f"quant window parity {relw}"
    qwin = jax.jit(lambda q, k, v: quantized_flash_attention(
        q, k, v, window=(256, 0)))
    dwin = jax.jit(lambda q, k, v: flash_attention(q, k, v, window=(256, 0)))
    return {
        "block_fused": {"relerr": relb, "ms": t_blk * 1e3},
        "window": {
            "quant_relerr": relw,
            "quant_ms": time_op(qwin, q, k, v, iters=64) * 1e3,
            "dense_ms": time_op(dwin, q, k, v, iters=64) * 1e3,  # r2: 1.18 fixed-tile
        },
    }


def stage_serving():
    # Reuse bench.py's model-level serving stage (fresh process anyway).
    import bench

    return bench.stage_serving(cpu=False)


def stage_mla():
    """MLA latent-cache absorbed decode vs dense-KV-cache decode at
    DeepSeek-ish geometry (dim 1024, 16 heads, latent 128 = 8x compression,
    ctx 4096). Decode is KV-bandwidth-bound: the absorbed path reads
    B·S·L bytes/step vs 2·B·H·S·D for the dense cache (16x fewer here)."""
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.models import mla_model
    from umfa_tpu.ops.mla import mla_decompress
    from umfa_tpu.serving import kv_cache as kvc
    from umfa_tpu.serving.decode import decode_attention
    from umfa_tpu.utils.timing import time_op

    rng = np.random.default_rng(0)
    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:
        dim, heads, latent, batch, ctx = 256, 4, 32, 2, 256
    else:
        dim, heads, latent, batch, ctx = 1024, 16, 128, 8, 4096
    cfg = mla_model.MLAConfig(
        dim=dim, num_heads=heads, latent_dim=latent,
        dtype="float32" if on_cpu else "bfloat16",
        interpret=on_cpu,
    )
    d = cfg.head_dim
    params = mla_model.init_params(jax.random.PRNGKey(0), cfg)
    fill = ctx - 64
    x_fill = _rand(rng, (batch, fill, dim), cfg.jdtype)
    lat_fill = mla_model.compress_kv(params, x_fill)

    lcache = kvc.init_latent_cache(batch, ctx, latent, cfg.jdtype)
    lcache = kvc.append_latent(lcache, lat_fill)
    k_fill, v_fill = mla_decompress(
        lat_fill, params["w_k_up"], params["w_v_up"], num_heads=heads
    )
    dcache = kvc.init_cache(batch, heads, ctx, d, cfg.jdtype)
    dcache = kvc.append(dcache, k_fill, v_fill)

    x0 = _rand(rng, (batch, 1, dim), cfg.jdtype)
    CHUNK = 2 if on_cpu else 8

    def absorbed_chunk(params, x, cache):
        def body(i, carry):
            x, cache = carry
            y, cache = mla_model.decode_step(params, x, cache, cfg)
            return y.astype(x.dtype), cache

        return jax.lax.fori_loop(0, CHUNK, body, (x, cache))

    def dense_chunk(params, x, cache):
        def body(i, carry):
            x, cache = carry
            b = x.shape[0]
            lat_new = mla_model.compress_kv(params, x)
            k_new, v_new = mla_decompress(
                lat_new, params["w_k_up"], params["w_v_up"], num_heads=heads
            )
            cache = kvc.append(cache, k_new, v_new)
            q = jnp.einsum("bsd,de->bse", x, params["wq"]).reshape(
                b, 1, heads, d).transpose(0, 2, 1, 3)
            att = decode_attention(q, cache)
            att = att.transpose(0, 2, 1, 3).reshape(b, 1, dim).astype(x.dtype)
            y = x + jnp.einsum("bsd,de->bse", att, params["wo"])
            return y.astype(x.dtype), cache

        return jax.lax.fori_loop(0, CHUNK, body, (x, cache))

    iters = 2 if on_cpu else 16
    _note("mla: timing absorbed latent-cache decode")
    t_abs = time_op(absorbed_chunk, params, x0, lcache, iters=iters) / CHUNK
    _note("mla: timing dense-cache decode")
    t_dense = time_op(dense_chunk, params, x0, dcache, iters=iters) / CHUNK

    # Parity: one absorbed step vs one dense step from identical state.
    y_abs, _ = absorbed_chunk(params, x0, lcache)
    y_dense, _ = dense_chunk(params, x0, dcache)
    bytes_ratio = (2 * heads * d) / latent
    return {
        "absorbed_step_ms": t_abs * 1e3,
        "dense_step_ms": t_dense * 1e3,
        "speedup": t_dense / t_abs,
        "parity_relerr": _relerr(y_abs, y_dense),
        "cache_bytes_ratio": bytes_ratio,
        "config": dict(dim=dim, heads=heads, latent=latent, batch=batch,
                       ctx=ctx, chunk=CHUNK),
    }


# --------------------------------------------------------------------------


def orchestrate():
    results, errors = {}, {}
    for stage in STAGES:
        with tempfile.NamedTemporaryFile(
            mode="r", suffix=".json", prefix=f"hw_{stage}_", delete=False
        ) as f:
            out_path = f.name
        cmd = [sys.executable, "-u", os.path.abspath(__file__),
               "--stage", stage, "--out", out_path]
        _note(f"stage {stage}: launching")
        try:
            proc = subprocess.run(cmd, timeout=STAGE_TIMEOUT_S, stdout=sys.stderr)
            if proc.returncode == 0:
                with open(out_path) as f:
                    results[stage] = json.load(f)
                _note(f"stage {stage}: ok")
            else:
                errors[stage] = f"rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            errors[stage] = "timeout"
        finally:
            try:
                os.unlink(out_path)
            except OSError:
                pass
    print(json.dumps({"results": results, "errors": errors}, indent=1))
    return 0 if not errors else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage")
    ap.add_argument("--out")
    args = ap.parse_args()
    if not args.stage:
        sys.exit(orchestrate())
    result = globals()[f"stage_{args.stage}"]()
    with open(args.out, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
