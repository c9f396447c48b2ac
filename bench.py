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

Round-5 restructure (VERDICT r4 next-step #1: three driver runs in a row
died with every non-core extra null): the stage layer is GONE from the
orchestrator. It now runs a FLAT priority-ordered queue of per-timing
subprocess jobs and re-emits the headline line — carrying every number
measured so far — after EVERY SINGLE TIMING, so a kill at any point
loses at most the one in-flight timing. Priority = never-driver-captured
claims first (serving, mla, masks, train before the r4-captured int4/pv
re-confirmations), accuracy sweeps after the timings (their values were
captured in r4 artifacts; ms claims were not). masks_dense is deduped
onto core_fused (identical fn, shape, and inputs).

CLI (subprocess entrypoints):
  --time NAME   one timing in a fresh process (TIMINGS registry)
  --stage NAME  probe | acc_core | acc_mla (accuracy/parity, no timings)
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

# Flat priority-ordered job queue. ("time", NAME) = one fresh-process
# timing; ("acc", STAGE) = an accuracy/parity stage (no timings inside).
# Order: headline trio first, then the claim sets that have NEVER been
# driver-captured (serving / mla / masks / train / flux — null through
# BENCH_r02..r04), then accuracy, then the r4-captured known-slow
# variants (int4 2.42 ms, pv_int8 4.35 ms) last. The headline line is
# re-emitted after EVERY job with everything measured so far.
JOBS = [
    ("time", "core_sdpa"),
    ("time", "core_int8"),       # headline exists after this job
    ("time", "core_fused"),
    ("time", "core_int8qd"),     # dense-Q serving config (KV int8, Q bf16)
    ("time", "serving_dtype"),
    ("time", "serving_int8"),
    ("time", "serving_attn_dtype"),
    ("time", "serving_attn_int8"),
    ("time", "mla_absorbed"),
    ("time", "mla_dense"),
    ("time", "masks_causal"),
    ("time", "masks_window"),
    ("time", "masks_sparse"),
    ("time", "train_dense"),
    ("time", "train_int8"),
    ("time", "train_int4"),
    ("time", "flux_bf16"),
    ("time", "flux_int8"),
    ("time", "longctx_dense"),   # S=32K single-chip long-context claim
    ("time", "longctx_causal"),  # (§5.7: builder-only through r4)
    ("acc", "acc_core"),
    ("time", "core_int4"),
    ("time", "core_int8pv"),
    ("acc", "acc_mla"),
]
ACC_TIMEOUT_S = 590
PROBE_TIMEOUT_S = 300
PROBE_ATTEMPTS = 2
TIME_TIMEOUT_S = 590
# Cold-compile outliers (r5 recon: core_int8pv's Mosaic compile alone blew
# the 590 s budget; it's last-priority so a long timeout risks nothing).
TIME_TIMEOUT_OVERRIDE_S = {"core_int8pv": 900}


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
    # Default 3300 s: strictly inside the driver's observed kill window, so
    # the in-bench skip logic fires first. But because the headline is
    # re-emitted after EVERY job, even an external kill (rc=124) leaves the
    # newest complete-so-far line as the last parseable JSON on stdout.
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

    # --- flat job queue -----------------------------------------------------
    results = {"backend": backend, "times": {}, "acc": {}}

    def _headline_from():
        t = results["times"]
        sdpa, int8 = t.get("core_sdpa"), t.get("core_int8")
        if sdpa and int8:
            _emit_headline(sdpa / int8, extra=_extras(results))
        else:
            _emit_headline(None, error="headline_pending", extra=_extras(results))

    def _run_job(kind, name):
        remaining = deadline - time.time()
        if remaining < 90:
            _note(f"job {name}: skipped (deadline)")
            return False
        t0 = time.time()
        if kind == "time":
            try:
                budget = TIME_TIMEOUT_OVERRIDE_S.get(name, TIME_TIMEOUT_S)
                results["times"][name] = _timed(
                    name, force_cpu, timeout_s=min(budget, remaining)
                )
            except RuntimeError as e:  # noqa: BLE001
                _note(f"job {name}: FAILED ({e})")
                results["times"][name] = None
        else:
            res, err = _run_stage(
                name, min(ACC_TIMEOUT_S, int(remaining)), force_cpu
            )
            results["acc"][name] = res if res is not None else {"error": err}
        _note(f"job {name}: done in {time.time() - t0:.0f}s")
        _headline_from()
        return True

    for kind, name in JOBS:
        _run_job(kind, name)

    # Retry pass: a single timing can stall on a relay hiccup (observed:
    # the SAME job 14 s one run, 590 s-timeout the next, local cache hit
    # both times). One retry each with whatever deadline is left — a
    # second attempt usually lands in a healthy relay window.
    for kind, name in JOBS:
        failed = (
            results["times"].get(name) is None if kind == "time"
            else "error" in results["acc"].get(name, {})
        )
        if failed:
            _note(f"job {name}: retrying after failure")
            _run_job(kind, name)

    _shield(json.dumps(results, indent=2))
    _headline_from()


def _extras(results):
    """Flatten the full round claim set into the headline line (flat
    times/acc layout). Derived ratios appear as soon as both legs exist."""
    t = results.get("times", {})
    acc = results.get("acc", {})

    def ms(name):
        s = t.get(name)
        # < 100 ns per op is not a measurement (time_op clamps an inverted
        # slope to 1e-9 s); report null rather than a garbage ratio.
        return round(s * 1e3, 4) if s and s > 1e-7 else None

    def ratio(num, den):
        a, b = t.get(num), t.get(den)
        if not (a and b) or a <= 1e-7 or b <= 1e-7:
            return None
        return round(a / b, 4)

    def g(stage, *path):
        cur = acc.get(stage, {})
        for p in path:
            if not isinstance(cur, dict) or p not in cur:
                return None
            cur = cur[p]
        return round(cur, 4) if isinstance(cur, float) else cur

    return {
        "bf16_sdpa_ms": ms("core_sdpa"),
        "bf16_fused_ms": ms("core_fused"),
        "int8_ms": ms("core_int8"),
        "int8_relerr": g("acc_core", "int8_relerr_iid"),
        "int8_qdense_ms": ms("core_int8qd"),
        "int8_qdense_relerr": g("acc_core", "int8qd_relerr_iid"),
        "int8_pv_ms": ms("core_int8pv"),
        "int8_pv_relerr": g("acc_core", "int8pv_relerr_iid"),
        "int4_ms": ms("core_int4"),
        "int4_relerr_iid": g("acc_core", "int4_relerr_iid"),
        "int4_relerr_struct": g("acc_core", "int4_relerr_struct"),
        "causal_ms": ms("masks_causal"),
        "window_ms": ms("masks_window"),
        "sparse_ms": ms("masks_sparse"),
        # dense baseline for the mask speedups = core_fused (identical fn,
        # shape, and inputs — masks_dense was a duplicate timing slot).
        "sparse_speedup": ratio("core_fused", "masks_sparse"),
        "window_speedup": ratio("core_fused", "masks_window"),
        "longctx_dense_ms": ms("longctx_dense"),
        "longctx_causal_ms": ms("longctx_causal"),
        "longctx_causal_ratio": ratio("longctx_causal", "longctx_dense"),
        "train_dense_ms": ms("train_dense"),
        "train_int8_ms": ms("train_int8"),
        "train_int4_ms": ms("train_int4"),
        "train_int8_speedup": ratio("train_dense", "train_int8"),
        "flux_bf16_ms": ms("flux_bf16"),
        "flux_int8_ms": ms("flux_int8"),
        "serving_dense_step_ms": ms("serving_dtype"),
        "serving_int8_step_ms": ms("serving_int8"),
        "serving_int8_speedup": ratio("serving_dtype", "serving_int8"),
        "serving_attn_dense_ms": ms("serving_attn_dtype"),
        "serving_attn_int8_ms": ms("serving_attn_int8"),
        "serving_attn_int8_speedup": ratio(
            "serving_attn_dtype", "serving_attn_int8"
        ),
        "mla_latent_decode_speedup": ratio("mla_dense", "mla_absorbed"),
        "mla_absorbed_step_ms": ms("mla_absorbed"),
        "mla_parity_relerr": g("acc_mla", "parity_relerr"),
    }


# --------------------------------------------------------------------------
# Per-timing subprocess machinery
# --------------------------------------------------------------------------


def _timed(name, cpu, timeout_s=None):
    """Per-iteration seconds for TIMINGS[name], measured in a FRESH process
    (one timing per process — same-process history contaminates readings by
    up to ~28%, see module docstring). CPU mode (tests/smoke) runs
    in-process: those numbers are never artifacts."""
    timeout_s = timeout_s or TIME_TIMEOUT_S
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
        proc = subprocess.run(cmd, timeout=timeout_s, stdout=sys.stderr)
        if proc.returncode != 0:
            raise RuntimeError(f"timing {name} failed: rc={proc.returncode}")
        with open(out_path) as f:
            return json.load(f)["s"]
    except subprocess.TimeoutExpired:
        raise RuntimeError(f"timing {name} timed out ({timeout_s}s)")
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
    cfg8qd = QuantizationConfig.from_mode_string("int8-qdense")
    fns = {
        "sdpa": xla_sdpa,
        "fused": jax.jit(lambda q, k, v: flash_attention(q, k, v)),
        "int8": jax.jit(lambda q, k, v: quantized_flash_attention(
            q, k, v, config=qcfg(Precision.INT8))),
        "int8qd": jax.jit(lambda q, k, v: quantized_flash_attention(
            q, k, v, config=cfg8qd)),
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


def _longctx_setup(cpu):
    """Single-chip long-context (S=32K): flash tiling keeps working-set in
    VMEM where the materializing baseline cannot run at all (the [S,S]
    score tensor alone is 4 GB). causal:dense ratio witnesses the
    diagonal/rectangular sub-tiling (ideal 0.5; r3 builder-measured 0.65)."""
    jax = _setup_worker(cpu)
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.ops.attention import flash_attention

    on_cpu = jax.default_backend() == "cpu"
    B, H, S, D = (1, 2, 512, 64) if on_cpu else (1, 16, 32768, 64)
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, (B, H, S, D), jnp.bfloat16)
    fns = {
        "dense": jax.jit(lambda q, k, v: flash_attention(q, k, v)),
        "causal": jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True)),
    }
    return {
        "shape": (B, H, S, D), "q": q, "k": k, "v": v,
        "iters": 2 if on_cpu else 16, "fns": fns,
    }


def _t_longctx(variant):
    def build(cpu):
        s = _longctx_setup(cpu)
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


def _serving_attn_setup(cpu, cache_kind):
    """Decode ATTENTION in isolation (depth x decode_attention per step,
    no model, no append): the kernel-level int8-KV claim. The model-level
    step above carries a ~0.4-0.6 ms/step while-loop carry-copy tax on
    this backend (byte-proportional, hits BOTH cache kinds — measured
    r5, scripts/serving_ab.py + minimal repros in docs/PERFORMANCE.md)
    that compresses the model-level ratio; the attention read path is
    where the reference's "quantized up to 1.3x in memory-bound
    workloads" claim lives (README.md:70)."""
    jax = _setup_worker(cpu)
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.serving.decode import decode_attention
    from umfa_tpu.serving import kv_cache as kvc

    on_cpu = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    if on_cpu:
        heads, kv_heads, depth, batch, ctx, d = 4, 2, 2, 2, 128, 64
    else:
        heads, kv_heads, depth, batch, ctx, d = 16, 8, 8, 8, 4096, 64
    fill = ctx - 64
    k = jnp.asarray(rng.normal(0, 1, (batch, kv_heads, fill, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (batch, kv_heads, fill, d)), jnp.bfloat16)
    caches = []
    for _ in range(depth):
        if cache_kind == "int8":
            c = kvc.init_quantized_cache(batch, kv_heads, ctx, d)
            c = kvc.append_quantized(c, k, v)
        else:
            c = kvc.init_cache(batch, kv_heads, ctx, d, jnp.bfloat16)
            c = kvc.append(c, k, v)
        caches.append(c)
    q1 = jnp.asarray(rng.normal(0, 1, (batch, heads, 1, d)), jnp.bfloat16)
    CHUNK = 2 if on_cpu else 8
    interpret = on_cpu

    def chunk(q1, caches):
        def body(i, carry):
            x, caches = carry
            for cache in caches:
                att = decode_attention(
                    q1 + x * 0, cache, interpret=interpret
                )
                x = x + att * 1e-6
            return x, caches

        return jax.lax.fori_loop(0, CHUNK, body, (q1 * 0, caches))

    return {
        "fn": chunk, "args": (q1, caches),
        "iters": 2 if on_cpu else 16, "chunk": CHUNK,
    }


def _t_serving_attn(cache_kind):
    def build(cpu):
        s = _serving_attn_setup(cpu, cache_kind)
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

    # The absorbed step is ~10 us: at 16 iters the whole measured region
    # is ~1-2 ms and relay RTT jitter can INVERT the slope (pass-3 r5
    # emitted 0.0 ms / a 4.7e6x ratio). 256 iters puts the region at
    # ~30-40 ms, two orders above the jitter floor.
    iters = 2 if on_cpu else (256 if kind == "absorbed" else 16)
    return {
        "fn": chunk, "args": (params, x0, cache),
        "iters": iters, "chunk": CHUNK,
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
    "core_int8qd": _t_core("int8qd"),
    "core_int4": _t_core("int4"),
    "core_int8pv": _t_core("int8pv"),
    "train_dense": _t_train("dense"),
    "train_int8": _t_train("int8"),
    "train_int4": _t_train("int4"),
    "flux_bf16": _t_flux("bf16"),
    "flux_int8": _t_flux("int8"),
    "longctx_dense": _t_longctx("dense"),
    "longctx_causal": _t_longctx("causal"),
    "masks_dense": _t_masks("dense"),
    "masks_causal": _t_masks("causal"),
    "masks_window": _t_masks("window"),
    "masks_sparse": _t_masks("sparse"),
    "serving_dtype": _t_serving("dtype"),
    "serving_int8": _t_serving("int8"),
    "serving_attn_dtype": _t_serving_attn("dtype"),
    "serving_attn_int8": _t_serving_attn("int8"),
    "mla_absorbed": _t_mla("absorbed"),
    "mla_dense": _t_mla("dense"),
}


# --------------------------------------------------------------------------
# Worker stages (fresh process each; all time_op via _timed subprocesses)
# --------------------------------------------------------------------------


def stage_probe(cpu):
    jax = _setup_worker(cpu)
    return {"backend": jax.default_backend(), "n_devices": len(jax.devices())}


def stage_acc_core(cpu):
    """Accuracy sweep at the core S=4K geometry — NO timings (those are
    orchestrated as per-job fresh processes). Same-process accuracy calls
    are fine: relerr does not care about warm-cache contamination."""
    s = _core_setup(cpu)
    import jax.numpy as jnp
    import numpy as np

    from umfa_tpu.engine.config import Precision, QuantMode, QuantStrategy
    from umfa_tpu.ops.attention import reference_attention
    from umfa_tpu.ops.quant import dequantize, quantize

    B, H, S, D = s["shape"]
    q, k, v = s["q"], s["k"], s["v"]

    _note("acc_core: relerr vs fp32 reference (int8 / int8pv / int4 / fused)")
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
    err8qd = relerr(fns["int8qd"](q, k, v), want)
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

    return {
        "shape": [B, H, S, D],
        "fused_relerr": errb,
        "int8_relerr_iid": err8,
        "int8_relerr_struct": err8_s,
        "int8qd_relerr_iid": err8qd,
        "int8pv_relerr_iid": err8pv,
        "int4_relerr_iid": err4,
        "int4_relerr_struct": err4_s,
        "quantizer_roundtrip_relerr": {
            "int8": roundtrip_relerr(uni, Precision.INT8),
            "int4": roundtrip_relerr(uni, Precision.INT4),
        },
    }


def stage_acc_mla(cpu):
    """MLA decode parity: one absorbed step vs one dense step from identical
    state (no timings — those are orchestrated per-job)."""
    import numpy as np

    sa = _mla_setup(cpu, "absorbed")
    sd = _mla_setup(cpu, "dense")
    y_abs, _ = sa["fn"](*sa["args"])
    y_dense, _ = sd["fn"](*sd["args"])
    y_abs = np.asarray(y_abs, np.float32)
    y_dense = np.asarray(y_dense, np.float32)
    rel = float(np.linalg.norm(y_abs - y_dense) / np.linalg.norm(y_dense))
    return {
        "parity_relerr": rel,
        "cache_bytes_ratio": (2 * sa["heads"] * sa["d"]) / sa["latent"],
        "config": sa["config"],
    }


STAGE_FNS = {
    "probe": stage_probe,
    "acc_core": stage_acc_core,
    "acc_mla": stage_acc_mla,
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
