"""Headline benchmark (driver-run on real TPU) — outage-hardened orchestrator.

North star (BASELINE.json): INT8 row-wise fused flash attention vs BF16 XLA
SDPA at seq 4K — target >= 1.3x throughput with accuracy within the reference
envelope. Prints ONE JSON headline line on stdout; details on stderr.

Design (round 3): the TPU relay has multi-hour outages during which backend
init HANGS (not errors). So the orchestrator never touches jax itself:
it probes the backend in a bounded-timeout subprocess (with retry), then runs
each measurement stage in its own fresh subprocess. A stage that dies or
times out yields a structured error record instead of killing the run; on
total outage the headline line is `{"error": "tpu_unavailable", ...}` with
rc=0 so the driver can distinguish outage from crash. Reference anchor for
benchmark-artifact discipline: reference .github/workflows/ci.yml:199-206
(bench JSON as CI artifact).

Measurement discipline (hardened again late round 3): ONE PROCESS PER
TIMING, not per stage. Round 2's phantom "int8 1.41 ms" and round 3's
hw_measure causal-fwd reading (1.495 ms in a stage that had run parity +
grads first, vs 1.170 ms fresh — 28% contamination from same-process
history) both came from multiple time_op calls sharing a process. Stages
now compute accuracy/parity in-process but delegate every time_op to a
fresh `--time NAME` subprocess; a persistent JAX compilation cache
(.jax_cache/) keeps the per-process Mosaic recompile cost near zero after
the first run.

Stages (each `python bench.py --stage NAME --out FILE`):
  probe    backend init only
  core     bf16 XLA SDPA / fused / int8 / int4 at S=4K + accuracy
  train    dense vs int8 vs int4 training step (fwd+bwd)
  flux     D=128 FLUX-geometry profile
  masks    causal / sliding-window / block-sparse doc mask
  serving  model-level GPT decode tokens/s, dense vs int8 KV cache
  mla      absorbed latent-cache decode vs dense-cache decode
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE_METRIC = "int8_fused_attn_speedup_vs_bf16_xla_sdpa_seq4k"
BASELINE_X = 1.3  # BASELINE.json target

# Stage order = priority order: core carries the headline, then the claim
# sets that have never been driver-verified (masks/serving/mla timed out in
# r2 AND r3 — VERDICT r3 weak #2) BEFORE the train/flux re-confirmations.
# If the global deadline runs out, later stages are skipped — but the
# headline (with every extra measured so far) is re-emitted after EVERY
# stage, so a mid-run kill still leaves a complete-so-far artifact.
STAGES = ["core", "masks", "serving", "mla", "train", "flux"]
STAGE_TIMEOUT_S = {
    # Worst case ~1-4 min Mosaic compile per new kernel shape per timing
    # subprocess on a COLD .jax_cache; warm-cache stages run in ~2 min
    # (healthy relay: ~25 s per timing subprocess, measured r4).
    "core": 2400,
    "masks": 2000,
    "serving": 1200,
    "mla": 900,
    "train": 1500,
    "flux": 1000,
}
PROBE_TIMEOUT_S = 300
PROBE_ATTEMPTS = 2
TIME_TIMEOUT_S = 590


def _note(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _shield(payload: str):
    """Print a JSON payload so the driver can NEVER mistake it for the
    headline: the driver merges stdout+stderr and takes the LAST parseable
    JSON line (r3's artifact captured a stray `{"s": ...}` timing fragment
    this way — VERDICT r3 weak #1). Every line gets a `#` prefix."""
    for ln in payload.splitlines():
        print(f"# {ln}", file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# Orchestrator
# --------------------------------------------------------------------------


def _run_stage(stage, timeout_s, force_cpu):
    """Run one stage in a fresh subprocess; return (dict_or_None, err_or_None)."""
    with tempfile.NamedTemporaryFile(
        mode="r", suffix=".json", prefix=f"bench_{stage}_", delete=False
    ) as f:
        out_path = f.name
    cmd = [sys.executable, "-u", os.path.abspath(__file__), "--stage", stage,
           "--out", out_path]
    if force_cpu:
        cmd.append("--cpu")
    _note(f"stage {stage}: launching (timeout {timeout_s}s)")
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, timeout=timeout_s, stdout=sys.stderr)
    except subprocess.TimeoutExpired:
        _note(f"stage {stage}: TIMEOUT after {timeout_s}s")
        return None, "timeout"
    dt = time.time() - t0
    if proc.returncode != 0:
        _note(f"stage {stage}: rc={proc.returncode} after {dt:.0f}s")
        return None, f"rc={proc.returncode}"
    try:
        with open(out_path) as f:
            result = json.load(f)
    except Exception as e:  # noqa: BLE001
        return None, f"unreadable_output: {e}"
    finally:
        try:
            os.unlink(out_path)
        except OSError:
            pass
    _note(f"stage {stage}: done in {dt:.0f}s")
    return result, None


def _emit_headline(value, extra=None, error=None):
    line = {
        "metric": HEADLINE_METRIC,
        "value": round(value, 4) if value else 0.0,
        "unit": "x",
        "vs_baseline": round(value / BASELINE_X, 4) if value else 0.0,
    }
    if error:
        line["error"] = error
    if extra:
        line["extra"] = extra
    print(json.dumps(line), flush=True)


def orchestrate():
    force_cpu = os.environ.get("UMFA_BENCH_FORCE_CPU") == "1"
    # Default 3300 s: strictly inside the driver's observed ~3600 s kill
    # window (r3: rc=124), so the in-bench skip logic fires first and the
    # final full-extras headline still reaches stdout.
    deadline = time.time() + float(os.environ.get("UMFA_BENCH_DEADLINE_S", "3300"))

    # --- probe: bounded-timeout backend init with retry --------------------
    backend = None
    if force_cpu:
        backend = "cpu"
    else:
        for attempt in range(1, PROBE_ATTEMPTS + 1):
            res, err = _run_stage("probe", PROBE_TIMEOUT_S, force_cpu)
            if res is not None:
                backend = res.get("backend")
                _note(f"probe: backend={backend} devices={res.get('n_devices')}")
                break
            _note(f"probe attempt {attempt}/{PROBE_ATTEMPTS} failed: {err}")
            if attempt < PROBE_ATTEMPTS:
                time.sleep(20)
    if backend is None:
        _note("TPU backend unavailable (relay outage) — emitting structured record")
        _emit_headline(None, error="tpu_unavailable")
        return

    # --- stages -------------------------------------------------------------
    def _headline_from(results):
        """Emit the headline with everything measured SO FAR. Called after
        every stage so a mid-run kill (driver timeout, relay outage) still
        leaves the newest complete-so-far line as the last parseable JSON."""
        core = results.get("core", {})
        if "error" in core or "bf16_xla_sdpa" not in core:
            _emit_headline(
                None, error=f"core_stage_failed: {core.get('error')}",
                extra=_extras(results),
            )
            return
        sp = core["bf16_xla_sdpa"]["ms"] / core["int8_fused"]["ms"]
        _emit_headline(sp, extra=_extras(results))

    results = {"backend": backend}
    for stage in STAGES:
        remaining = deadline - time.time()
        if remaining < 120:
            results[stage] = {"error": "skipped_deadline"}
            _note(f"stage {stage}: skipped (deadline)")
            continue
        timeout_s = min(STAGE_TIMEOUT_S[stage], int(remaining))
        res, err = _run_stage(stage, timeout_s, force_cpu)
        results[stage] = res if res is not None else {"error": err}
        _headline_from(results)

    _shield(json.dumps(results, indent=2))
    _headline_from(results)


def _extras(results):
    """Flatten the full round claim set into the headline line."""

    def g(*path, default=None):
        cur = results
        for p in path:
            if not isinstance(cur, dict) or p not in cur:
                return default
            cur = cur[p]
        return round(cur, 4) if isinstance(cur, float) else cur

    return {
        "bf16_sdpa_ms": g("core", "bf16_xla_sdpa", "ms"),
        "bf16_fused_ms": g("core", "bf16_fused", "ms"),
        "int8_ms": g("core", "int8_fused", "ms"),
        "int8_relerr": g("core", "int8_fused", "relerr_iid"),
        "int8_pv_ms": g("core", "int8_pv_fused", "ms"),
        "int8_pv_relerr": g("core", "int8_pv_fused", "relerr_iid"),
        "int4_ms": g("core", "int4_fused", "ms"),
        "int4_relerr_iid": g("core", "int4_fused", "relerr_iid"),
        "int4_relerr_struct": g("core", "int4_fused", "relerr_struct"),
        "causal_ms": g("masks", "causal", "ms"),
        "window_ms": g("masks", "window", "ms"),
        "sparse_speedup": g("masks", "doc_mask", "speedup_vs_dense"),
        "train_dense_ms": g("train", "dense", "ms"),
        "train_int8_ms": g("train", "int8", "ms"),
        "train_int4_ms": g("train", "int4", "ms"),
        "flux_bf16_ms": g("flux", "bf16_fused", "ms"),
        "flux_int8_ms": g("flux", "int8_fused", "ms"),
        "serving_int8_speedup": g("serving", "int8", "speedup_vs_dense_cache"),
        "mla_latent_decode_speedup": g("mla", "speedup"),
        "mla_absorbed_step_ms": g("mla", "absorbed_step_ms"),
    }


# --------------------------------------------------------------------------
# Per-timing subprocess machinery
# --------------------------------------------------------------------------


def _timed(name, cpu):
    """Per-iteration seconds for TIMINGS[name], measured in a FRESH process
    (one timing per process — same-process history contaminates readings by
    up to ~28%, see module docstring). CPU mode (tests/smoke) runs
    in-process: those numbers are never artifacts."""
    if cpu or os.environ.get("UMFA_BENCH_INPROC") == "1":
        return _run_timing(name, cpu)
    with tempfile.NamedTemporaryFile(
        mode="r", suffix=".json", prefix=f"time_{name}_", delete=False
    ) as f:
        out_path = f.name
    cmd = [sys.executable, "-u", os.path.abspath(__file__),
           "--time", name, "--out", out_path]
    _note(f"timing {name}: fresh process")
    try:
        proc = subprocess.run(cmd, timeout=TIME_TIMEOUT_S, stdout=sys.stderr)
        if proc.returncode != 0:
            raise RuntimeError(f"timing {name} failed: rc={proc.returncode}")
        with open(out_path) as f:
            return json.load(f)["s"]
    except subprocess.TimeoutExpired:
        raise RuntimeError(f"timing {name} timed out ({TIME_TIMEOUT_S}s)")
    finally:
        try:
            os.unlink(out_path)
        except OSError:
            pass


def _run_timing(name, cpu):
    from umfa_tpu.utils.timing import time_op

    fn, args, iters, scale = TIMINGS[name](cpu)
    return time_op(fn, *args, iters=iters) * scale


# --------------------------------------------------------------------------
# Worker setup + shared builders
# --------------------------------------------------------------------------


def _setup_worker(cpu):
    if cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax  # noqa: F811

    # Persistent compilation cache: makes the one-process-per-timing design
    # cheap (a timing subprocess re-loads its executable instead of paying
    # the 1-4 min Mosaic remote compile again).
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — older jax without the knobs
        pass
    return jax


def _rand_qkv(rng, shape, dtype):
    import jax.numpy as jnp

    return tuple(jnp.asarray(rng.normal(0, 1, shape), dtype) for _ in range(3))


def _core_setup(cpu):
    jax = _setup_worker(cpu)
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.engine.config import Precision, QuantizationConfig, QuantMode
    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.quant_attention import quantized_flash_attention

    on_cpu = jax.default_backend() == "cpu"
    B, H, S, D = (1, 2, 256, 64) if on_cpu else (2, 16, 4096, 64)
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, (B, H, S, D), jnp.bfloat16)
    scale = D**-0.5

    @jax.jit
    def xla_sdpa(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    def qcfg(prec, mode=QuantMode.ROW):
        return QuantizationConfig(
            q_precision=prec, k_precision=prec, v_precision=prec, mode=mode
        )

    cfg4 = QuantizationConfig.from_mode_string("int4")
    cfg8pv = dataclasses.replace(qcfg(Precision.INT8), pv_int8=True)
    fns = {
        "sdpa": xla_sdpa,
        "fused": jax.jit(lambda q, k, v: flash_attention(q, k, v)),
        "int8": jax.jit(lambda q, k, v: quantized_flash_attention(
            q, k, v, config=qcfg(Precision.INT8))),
        "int4": jax.jit(lambda q, k, v: quantized_flash_attention(
            q, k, v, config=cfg4)),
        "int8pv": jax.jit(lambda q, k, v: quantized_flash_attention(
            q, k, v, config=cfg8pv)),
    }
    return {
        "shape": (B, H, S, D), "q": q, "k": k, "v": v,
        "iters": 8 if on_cpu else 64, "fns": fns,
    }


def _t_core(variant):
    def build(cpu):
        s = _core_setup(cpu)
        return s["fns"][variant], (s["q"], s["k"], s["v"]), s["iters"], 1.0

    return build


def _train_setup(cpu):
    jax = _setup_worker(cpu)
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.engine.config import QuantizationConfig
    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.quant_attention import quantized_flash_attention

    on_cpu = jax.default_backend() == "cpu"
    B, H, S, D = (1, 2, 256, 64) if on_cpu else (1, 8, 4096, 64)
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, (B, H, S, D), jnp.bfloat16)

    def step(fn):
        # Full gradients (q, k, v): grad w.r.t. q alone lets XLA DCE the
        # entire dK/dV pallas pass — r3's "train step" silently timed only
        # fwd + dQ (discovered via scripts/train_ab.py, r4).
        def loss(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))

    cfg8 = QuantizationConfig()
    cfg4 = QuantizationConfig.from_mode_string("int4")
    fns = {
        "dense": step(lambda q, k, v: flash_attention(q, k, v)),
        "int8": step(lambda q, k, v: quantized_flash_attention(
            q, k, v, config=cfg8)),
        "int4": step(lambda q, k, v: quantized_flash_attention(
            q, k, v, config=cfg4)),
    }
    return {
        "shape": (B, H, S, D), "q": q, "k": k, "v": v,
        "iters": 2 if on_cpu else 16, "fns": fns,
    }


def _t_train(variant):
    def build(cpu):
        s = _train_setup(cpu)
        return s["fns"][variant], (s["q"], s["k"], s["v"]), s["iters"], 1.0

    return build


def _flux_setup(cpu):
    jax = _setup_worker(cpu)
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.engine.config import QuantizationConfig
    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.quant_attention import quantized_flash_attention

    on_cpu = jax.default_backend() == "cpu"
    B, H, S, D = (1, 2, 128, 128) if on_cpu else (1, 24, 4608, 128)
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, (B, H, S, D), jnp.bfloat16)
    cfg8 = QuantizationConfig()
    fns = {
        "bf16": jax.jit(lambda q, k, v: flash_attention(q, k, v)),
        "int8": jax.jit(lambda q, k, v: quantized_flash_attention(
            q, k, v, config=cfg8)),
    }
    return {
        "shape": (B, H, S, D), "q": q, "k": k, "v": v,
        "iters": 2 if on_cpu else 32, "fns": fns,
    }


def _t_flux(variant):
    def build(cpu):
        s = _flux_setup(cpu)
        return s["fns"][variant], (s["q"], s["k"], s["v"]), s["iters"], 1.0

    return build


def _masks_setup(cpu):
    jax = _setup_worker(cpu)
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.ops.attention import flash_attention
    from umfa_tpu.ops.block_mask import segment_block_mask

    on_cpu = jax.default_backend() == "cpu"
    B, H, S, D = (1, 2, 256, 64) if on_cpu else (2, 16, 4096, 64)
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, (B, H, S, D), jnp.bfloat16)
    win = 128 if on_cpu else 256
    seg = jnp.repeat(jnp.arange(8), S // 8)[None, :]  # (1, S) segment ids
    bm = segment_block_mask(seg)
    fns = {
        "dense": jax.jit(lambda q, k, v: flash_attention(q, k, v)),
        "causal": jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True)),
        "window": jax.jit(lambda q, k, v: flash_attention(
            q, k, v, window=(win, 0))),
        "sparse": jax.jit(lambda q, k, v: flash_attention(
            q, k, v, block_mask=bm)),
    }
    return {
        "shape": (B, H, S, D), "q": q, "k": k, "v": v, "win": win,
        "iters": 4 if on_cpu else 64, "fns": fns,
    }


def _t_masks(variant):
    def build(cpu):
        s = _masks_setup(cpu)
        return s["fns"][variant], (s["q"], s["k"], s["v"]), s["iters"], 1.0

    return build


def _serving_setup(cpu, cache_kind):
    jax = _setup_worker(cpu)
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.models import gpt

    on_cpu = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    if on_cpu:
        dim, heads, kv_heads, depth, batch, ctx = 256, 4, 2, 2, 2, 128
    else:
        dim, heads, kv_heads, depth, batch, ctx = 1024, 16, 8, 8, 8, 4096
    cfg = gpt.GPTConfig(
        vocab=32768 if not on_cpu else 128,
        dim=dim, num_heads=heads, num_kv_heads=kv_heads, depth=depth,
        max_seq=ctx, dtype="bfloat16" if not on_cpu else "float32",
        kv_cache=cache_kind, interpret=on_cpu,
    )
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    caches = gpt.init_caches(cfg, batch)
    prompt = jnp.asarray(
        rng.integers(0, cfg.vocab, (batch, ctx - 64)), jnp.int32
    )
    _, caches = jax.jit(
        lambda p, t, c: gpt.forward_with_cache(p, t, c, cfg, prefill=True)
    )(params, prompt, caches)
    tok = jnp.asarray(rng.integers(0, cfg.vocab, (batch, 1)), jnp.int32)

    # Inner decode loop so cache appends update in place under XLA
    # aliasing (flat per-step calls copy-on-write the full cache).
    CHUNK = 2 if on_cpu else 8

    def decode_chunk(params, tok, caches, cfg=cfg):
        def body(i, carry):
            tok, caches = carry
            logits, caches = gpt.forward_with_cache(params, tok, caches, cfg)
            return (
                jnp.argmax(logits[:, -1:], axis=-1).astype(tok.dtype),
                caches,
            )

        tok, caches = jax.lax.fori_loop(0, CHUNK, body, (tok, caches))
        return tok, caches

    return {
        "fn": decode_chunk, "args": (params, tok, caches),
        "iters": 2 if on_cpu else 16, "chunk": CHUNK, "batch": batch,
        "config": dict(dim=dim, heads=heads, kv_heads=kv_heads, depth=depth,
                       batch=batch, ctx=ctx),
    }


def _t_serving(cache_kind):
    def build(cpu):
        s = _serving_setup(cpu, cache_kind)
        return s["fn"], s["args"], s["iters"], 1.0 / s["chunk"]

    return build


def _mla_setup(cpu, kind):
    """MLA decode at DeepSeek-ish geometry (dim 1024, 16 heads, latent 128 =
    8x KV compression, ctx 4096). `kind` = "absorbed" (latent cache +
    weight-absorbed attention) or "dense" (decompress + dense KV cache).
    Decode is KV-bound: the latent cache is B*S*L bytes vs 2*B*H*S*D dense
    (16x fewer here) — and at this geometry 8 MB, which fits VMEM, so the
    absorbed path leaves the HBM-bandwidth regime entirely."""
    jax = _setup_worker(cpu)
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.models import mla_model
    from umfa_tpu.ops.mla import mla_decompress
    from umfa_tpu.serving import kv_cache as kvc
    from umfa_tpu.serving.decode import decode_attention

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
    x_fill = jnp.asarray(rng.normal(0, 1, (batch, fill, dim)), cfg.jdtype)
    lat_fill = mla_model.compress_kv(params, x_fill)
    x0 = jnp.asarray(rng.normal(0, 1, (batch, 1, dim)), cfg.jdtype)
    CHUNK = 2 if on_cpu else 8

    if kind == "absorbed":
        lcache = kvc.init_latent_cache(batch, ctx, latent, cfg.jdtype)
        cache = kvc.append_latent(lcache, lat_fill)

        def chunk(params, x, cache):
            def body(i, carry):
                x, cache = carry
                y, cache = mla_model.decode_step(params, x, cache, cfg)
                return y.astype(x.dtype), cache

            return jax.lax.fori_loop(0, CHUNK, body, (x, cache))
    else:
        k_fill, v_fill = mla_decompress(
            lat_fill, params["w_k_up"], params["w_v_up"], num_heads=heads
        )
        dcache = kvc.init_cache(batch, heads, ctx, d, cfg.jdtype)
        cache = kvc.append(dcache, k_fill, v_fill)

        def chunk(params, x, cache):
            def body(i, carry):
                x, cache = carry
                b = x.shape[0]
                lat_new = mla_model.compress_kv(params, x)
                k_new, v_new = mla_decompress(
                    lat_new, params["w_k_up"], params["w_v_up"],
                    num_heads=heads,
                )
                cache = kvc.append(cache, k_new, v_new)
                q = jnp.einsum("bsd,de->bse", x, params["wq"]).reshape(
                    b, 1, heads, d).transpose(0, 2, 1, 3)
                att = decode_attention(q, cache)
                att = att.transpose(0, 2, 1, 3).reshape(b, 1, dim).astype(
                    x.dtype)
                y = x + jnp.einsum("bsd,de->bse", att, params["wo"])
                return y.astype(x.dtype), cache

            return jax.lax.fori_loop(0, CHUNK, body, (x, cache))

    return {
        "fn": chunk, "args": (params, x0, cache),
        "iters": 2 if on_cpu else 16, "chunk": CHUNK,
        "heads": heads, "d": d, "latent": latent,
        "config": dict(dim=dim, heads=heads, latent=latent, batch=batch,
                       ctx=ctx, chunk=CHUNK),
    }


def _t_mla(kind):
    def build(cpu):
        s = _mla_setup(cpu, kind)
        return s["fn"], s["args"], s["iters"], 1.0 / s["chunk"]

    return build


TIMINGS = {
    "core_sdpa": _t_core("sdpa"),
    "core_fused": _t_core("fused"),
    "core_int8": _t_core("int8"),
    "core_int4": _t_core("int4"),
    "core_int8pv": _t_core("int8pv"),
    "train_dense": _t_train("dense"),
    "train_int8": _t_train("int8"),
    "train_int4": _t_train("int4"),
    "flux_bf16": _t_flux("bf16"),
    "flux_int8": _t_flux("int8"),
    "masks_dense": _t_masks("dense"),
    "masks_causal": _t_masks("causal"),
    "masks_window": _t_masks("window"),
    "masks_sparse": _t_masks("sparse"),
    "serving_dtype": _t_serving("dtype"),
    "serving_int8": _t_serving("int8"),
    "mla_absorbed": _t_mla("absorbed"),
    "mla_dense": _t_mla("dense"),
}


# --------------------------------------------------------------------------
# Worker stages (fresh process each; all time_op via _timed subprocesses)
# --------------------------------------------------------------------------


def stage_probe(cpu):
    jax = _setup_worker(cpu)
    return {"backend": jax.default_backend(), "n_devices": len(jax.devices())}


def stage_core(cpu):
    s = _core_setup(cpu)
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.engine.config import Precision, QuantMode, QuantStrategy
    from umfa_tpu.ops.attention import reference_attention
    from umfa_tpu.ops.quant import dequantize, quantize

    B, H, S, D = s["shape"]
    q, k, v = s["q"], s["k"], s["v"]
    flops = 4 * B * H * S * S * D  # fwd, non-causal

    _note("core: timing bf16 XLA SDPA / fused / int8 / int4 / int8pv")
    t_sdpa = _timed("core_sdpa", cpu)
    t_fused = _timed("core_fused", cpu)
    t_int8 = _timed("core_int8", cpu)
    t_int4 = _timed("core_int4", cpu)
    t_int8pv = _timed("core_int8pv", cpu)

    # Accuracy vs FP32 reference on the same inputs (in-process: not timing).
    want = np.asarray(
        reference_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )
    )

    def relerr(x, ref):
        x = np.asarray(x, np.float32)
        return float(np.linalg.norm(x - ref) / np.linalg.norm(ref))

    fns = s["fns"]
    err8 = relerr(fns["int8"](q, k, v), want)
    err8pv = relerr(fns["int8pv"](q, k, v), want)
    err4 = relerr(fns["int4"](q, k, v), want)
    errb = relerr(fns["fused"](q, k, v), want)

    # Structured-input accuracy (LLM-activation-like: channel outliers +
    # moderately peaked softmax). The i.i.d. Gaussian case above is the worst
    # case for 4-bit score noise; the reference's "INT4 ~ 2%" anchors the
    # QUANTIZER round-trip (reference PERFORMANCE_RESULTS.md:47-52).
    sr = np.random.default_rng(1)
    qs_np = sr.normal(0, 1, (B, H, S, D))
    ks_np = sr.normal(0, 1, (B, H, S, D))
    ch = sr.choice(D, 4, replace=False)
    qs_np[..., ch] *= 8.0
    ks_np[..., ch] *= 8.0
    s_std = float(
        np.einsum("bhqd,bhkd->bhqk", qs_np[:1, :1], ks_np[:1, :1]).std()
    ) / np.sqrt(D)
    f = np.sqrt(0.5 / s_std)
    qs = jnp.asarray(qs_np * f, jnp.bfloat16)
    ks = jnp.asarray(ks_np * f, jnp.bfloat16)
    vs = jnp.asarray(sr.normal(0, 1, (B, H, S, D)), jnp.bfloat16)
    want_s = np.asarray(
        reference_attention(
            qs.astype(jnp.float32), ks.astype(jnp.float32),
            vs.astype(jnp.float32)
        )
    )
    err8_s = relerr(fns["int8"](qs, ks, vs), want_s)
    err4_s = relerr(fns["int4"](qs, ks, vs), want_s)

    def roundtrip_relerr(x, prec):
        qt = quantize(x, prec, QuantMode.ROW, QuantStrategy.SYMMETRIC)
        xr = np.asarray(dequantize(qt, jnp.float32))
        xf = np.asarray(x, np.float32)
        return float(np.linalg.norm(xr - xf) / np.linalg.norm(xf))

    rng = np.random.default_rng(0)
    uni = jnp.asarray(rng.uniform(-1, 1, (1, 1, 1024, 64)), jnp.float32)

    def tf(t):
        return flops / t / 1e12

    return {
        "shape": [B, H, S, D],
        "bf16_xla_sdpa": {"ms": t_sdpa * 1e3, "tflops": tf(t_sdpa)},
        "bf16_fused": {"ms": t_fused * 1e3, "tflops": tf(t_fused), "relerr": errb},
        "int8_fused": {
            "ms": t_int8 * 1e3, "tflops": tf(t_int8),
            "relerr_iid": err8, "relerr_struct": err8_s,
        },
        "int8_pv_fused": {
            "ms": t_int8pv * 1e3, "tflops": tf(t_int8pv),
            "relerr_iid": err8pv,
        },
        "int4_fused": {
            "ms": t_int4 * 1e3, "tflops": tf(t_int4),
            "relerr_iid": err4, "relerr_struct": err4_s,
        },
        "quantizer_roundtrip_relerr": {
            "int8": roundtrip_relerr(uni, Precision.INT8),
            "int4": roundtrip_relerr(uni, Precision.INT4),
        },
    }


def stage_train(cpu):
    s = _train_setup(cpu)
    from umfa_tpu.utils.timing import attention_flops

    B, H, S, D = s["shape"]
    flops = attention_flops(B, H, S, S, D, backward=True)
    out = {}
    for name in ("dense", "int8", "int4"):
        _note(f"train: timing {name} step")
        t = _timed(f"train_{name}", cpu)
        out[name] = {"ms": t * 1e3, "tflops": flops / t / 1e12}
    out["int8"]["speedup_vs_dense"] = out["dense"]["ms"] / out["int8"]["ms"]
    qkv = 3 * B * H * S * D
    out["residual_bytes_ratio"] = {
        "int8": (qkv + 3 * B * H * S * 4) / (qkv * 2),
        "int4": (qkv // 2 + 3 * B * H * S * 4) / (qkv * 2),
    }
    return out


def stage_flux(cpu):
    s = _flux_setup(cpu)
    B, H, S, D = s["shape"]
    flops = 4 * B * H * S * S * D
    _note("flux: timing bf16 + int8 fused (D=128)")
    t_f = _timed("flux_bf16", cpu)
    t_8 = _timed("flux_int8", cpu)
    return {
        "shape": [B, H, S, D],
        "bf16_fused": {"ms": t_f * 1e3, "tflops": flops / t_f / 1e12},
        "int8_fused": {
            "ms": t_8 * 1e3, "tflops": flops / t_8 / 1e12,
            "speedup_vs_bf16_fused": t_f / t_8,
        },
    }


def stage_masks(cpu):
    s = _masks_setup(cpu)
    B, H, S, D = s["shape"]
    _note("masks: timing dense / causal / window / sparse")
    t_d = _timed("masks_dense", cpu)
    t_c = _timed("masks_causal", cpu)
    t_w = _timed("masks_window", cpu)
    t_s = _timed("masks_sparse", cpu)

    flops = 4 * B * H * S * S * D
    return {
        "shape": [B, H, S, D],
        "dense": {"ms": t_d * 1e3},
        "causal": {
            "ms": t_c * 1e3,
            # visible-element TFLOP/s and fraction of dense per-tile rate
            "tflops_visible": flops / 2 / t_c / 1e12,
            "per_tile_efficiency_vs_dense": (t_d / 2) / t_c,
        },
        "window": {"ms": t_w * 1e3, "window": [s["win"], 0],
                   "speedup_vs_dense": t_d / t_w},
        "doc_mask": {"ms": t_s * 1e3, "sparsity": 0.875,
                     "speedup_vs_dense": t_d / t_s},
    }


def stage_serving(cpu):
    # Config/batch resolved ONCE before the loop (ADVICE r3: binding batch
    # inside one loop branch made correctness depend on iteration order).
    # _serving_setup goes through _setup_worker, which pins the backend
    # correctly before any jax query.
    s = _serving_setup(cpu, "dtype")
    batch = s["batch"]
    results = {"config": s["config"]}
    del s
    for cache_kind in ("dtype", "int8"):
        _note(f"serving: timing decode ({cache_kind} cache)")
        t = _timed(f"serving_{cache_kind}", cpu)
        results[cache_kind] = {
            "decode_step_ms": t * 1e3,
            "tokens_per_s": batch / t,
        }
    results["int8"]["speedup_vs_dense_cache"] = (
        results["dtype"]["decode_step_ms"] / results["int8"]["decode_step_ms"]
    )
    return results


def stage_mla(cpu):
    """MLA absorbed latent-cache decode vs dense-cache decode (the serving
    claim for the MLA family)."""
    import numpy as np

    _note("mla: timing absorbed + dense decode")
    t_abs = _timed("mla_absorbed", cpu)
    t_dense = _timed("mla_dense", cpu)

    # Parity: one absorbed step vs one dense step from identical state
    # (in-process: not a timing).
    sa = _mla_setup(cpu, "absorbed")
    sd = _mla_setup(cpu, "dense")
    y_abs, _ = sa["fn"](*sa["args"])
    y_dense, _ = sd["fn"](*sd["args"])
    y_abs = np.asarray(y_abs, np.float32)
    y_dense = np.asarray(y_dense, np.float32)
    rel = float(np.linalg.norm(y_abs - y_dense) / np.linalg.norm(y_dense))
    bytes_ratio = (2 * sa["heads"] * sa["d"]) / sa["latent"]
    return {
        "absorbed_step_ms": t_abs * 1e3,
        "dense_step_ms": t_dense * 1e3,
        "speedup": t_dense / t_abs,
        "parity_relerr": rel,
        "cache_bytes_ratio": bytes_ratio,
        "config": sa["config"],
    }


STAGE_FNS = {
    "probe": stage_probe,
    "core": stage_core,
    "train": stage_train,
    "flux": stage_flux,
    "masks": stage_masks,
    "serving": stage_serving,
    "mla": stage_mla,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=sorted(STAGE_FNS), default=None)
    ap.add_argument("--time", choices=sorted(TIMINGS), default=None,
                    dest="time_name")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.time_name is not None:
        t = _run_timing(args.time_name, args.cpu)
        payload = json.dumps({"s": t})
        if args.out:
            with open(args.out, "w") as f:
                f.write(payload)
        _shield(payload)
        return

    if args.stage is None:
        orchestrate()
        return

    result = STAGE_FNS[args.stage](args.cpu)
    payload = json.dumps(result, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload)
    _shield(payload)


if __name__ == "__main__":
    main()
