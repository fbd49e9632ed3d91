#!/usr/bin/env python
"""Headline benchmark: fused sampler step latency at SDXL latent shape.

Times the table-compiled DPM-Solver++(2M) update — the per-step sampler work
excluding the model — inside a device-resident ``lax.scan`` at SDXL
``1x4x128x128`` latents.  The headline is a **least-squares marginal**: total
scan time is measured at four scan lengths (1k..16k steps) x several
interleaved repetitions, and the per-step cost is the fitted slope.  The fit
spread across repetitions is reported and the script refuses to print a
headline that is non-positive (the round-2 two-point estimator went below the
dev-tunnel noise floor and published a negative number; the 15k-step length
spread puts ~12 ms of signal over ~1 ms of jitter).

Also reported, in the same JSON line:
  * Pallas vs XLA and f32 vs bf16 A/B (same estimator, interleaved),
  * the single-step dispatch path a torch-pipeline wrapper pays, decomposed
    into dispatch floor / signature plumbing / actual update work,
  * end-to-end DiT serving throughput + model-forward MFU (bf16 and f32),
  * correctness guards: sigma tables vs the committed 33-point reference
    goldens, a live randomized-stack bit-exactness sweep against the
    reference tree when mounted, and the compiled device trajectory vs the
    float64 host oracle.

Robustness contract (the round-3 artifact was lost to an external timeout —
rc 124, nothing printed):
  * the cumulative result line is printed + flushed **immediately after the
    required headline/guard sections**, then RE-printed after every optional
    section completes — the driver takes the last JSON line, and every print
    is a complete valid artifact on its own;
  * ``main`` runs under a global wall-clock budget
    (``SKRAMPLE_BENCH_BUDGET_S``, default 900 s): a section whose estimated
    cost exceeds what is left is skipped with a ``*_skipped_budget`` key,
    and sections check the budget between timing cells so they bail with
    partial results instead of overrunning;
  * corrupted persistent-compile-cache entries (truncated zstd frames left
    behind by a killed run) are detected and evicted up front — the r03 tail
    shows jax warning ``ZstdError ... did not decompress full frame`` and
    silently recompiling everything;
  * SIGTERM/SIGALRM print the current cumulative line before exiting, so
    even a hard kill cannot lose measured sections.

Reference anchor: the always-prints harness ethos of the reference's
``scripts/overhead.py:12-26``.

Prints JSON lines of the form (last one is the most complete):
  {"metric": ..., "value": <us/step>, "unit": "us", "vs_baseline": <5us / value>, ...}
"""

from __future__ import annotations

import json
import os
import random
import signal
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_US = 5.0  # BASELINE.json target: fused step < 5 us on TPU v5e
HEADLINE_LENGTHS = (1000, 6000, 11000, 16000)
AB_LENGTHS = (1000, 16000)

# The driver keeps only a ~2000-char TAIL of stdout and parses the last
# {"metric": ...} JSON line out of it.  Round 4's cumulative line grew past
# that window, the front (metric/value/vs_baseline) was clipped off, and the
# scoreboard recorded `parsed: null` despite rc 0.  Contract since round 5:
# after every cumulative print, a COMPACT summary line (hard cap below,
# pinned by tests/test_bench_harness.py) is printed LAST, so the final line
# always parses inside the window whatever the full artifact grows to.
COMPACT_MAX_CHARS = 1500
_COMPACT_KEYS = (
    # identity + headline (the driver's four parse targets lead)
    "metric", "value", "unit", "vs_baseline",
    "spread_us", "headline_variant", "fit_reps", "ab_us",
    # correctness guards
    "max_dsigma_vs_reference", "max_dsigma_random_stacks_live", "latent_mse_vs_f64_oracle",
    # cross-round drift vs the committed expected ranges
    "regressions",
    # scoreboard summaries of the optional sections
    "mfu_model_fwd_marginal_bf16", "mfu_model_fwd_marginal_int8", "img_per_s_marginal_int8",
    "request_constant_ms_bf16", "request_constant_is_tunnel",
    "ms_train_step_bf16", "mfu_train_step_bf16", "mfu_model_fwd_mmdit_cfg",
    # run health
    "headline_provisional", "bench_interrupted_signal", "bench_elapsed_s", "backend",
)

# Expected ranges from BASELINE.md's validated on-chip runs (rounds 2-4),
# widened for the dev tunnel's documented timing variance.  A metric outside
# its range lands in the artifact's `regressions` list — the guard the round-4
# verdict asked for after pallas_bf16 drifted 0.91 -> 1.16 us unremarked.
# Dotted keys index into nested dicts (ab_us.*).
EXPECTED_RANGES: dict[str, tuple[float, float]] = {
    "value": (0.4, 1.4),                      # pallas_f32 headline: 0.65-1.25 observed
    "ab_us.pallas_bf16": (0.5, 1.3),          # 0.91-1.16 observed; >1.3 = real drift
    "ab_us.xla_f32": (1.6, 2.8),              # 2.18-2.43 observed
    "ab_us.xla_bf16": (1.4, 2.4),             # 1.84-1.95 observed
    "max_dsigma_vs_reference": (0.0, 0.0),    # bit-exact, always
    "latent_mse_vs_f64_oracle": (0.0, 1e-12),
    "mfu_model_fwd_marginal_bf16": (0.65, 1.0),   # 0.79-0.80 observed
    "mfu_model_fwd_marginal_int8": (0.75, 1.25),  # 0.93-1.01 (bf16-peak denom)
    "ms_train_step_bf16": (6.0, 10.0),        # 7.49-8.1 observed
    "mfu_model_fwd_mmdit_cfg": (0.55, 0.85),  # 0.689-0.735 observed
}

_RESULT: dict = {}


def _lookup(doc: dict, dotted: str):
    for part in dotted.split("."):
        if not isinstance(doc, dict) or part not in doc:
            return None
        doc = doc[part]
    return doc


def check_regressions(doc: dict) -> list[str]:
    """Metrics outside their committed expected range, as compact strings.

    Only metrics PRESENT in the artifact are checked (budget-skipped sections
    never count as regressions); the list is capped so it cannot blow the
    compact line's budget."""
    out = []
    for key, (lo, hi) in EXPECTED_RANGES.items():
        v = _lookup(doc, key)
        if v is None or not isinstance(v, (int, float)):
            continue
        if not lo <= v <= hi:
            out.append(f"{key}={v:.4g} outside [{lo:g}, {hi:g}]")
    if len(out) > 5:
        out = out[:5] + [f"+{len(out) - 5} more"]
    return out


def compact_line() -> str:
    """The <= COMPACT_MAX_CHARS summary JSON printed LAST on every emit.

    Keys are dropped from the back of _COMPACT_KEYS (never the driver's four
    parse targets) until the line fits; in practice it fits with everything."""
    doc = {k: _RESULT[k] for k in _COMPACT_KEYS if k in _RESULT}
    doc["regressions"] = check_regressions(_RESULT)
    line = json.dumps(doc)
    drop = [k for k in reversed(_COMPACT_KEYS) if k not in ("metric", "value", "unit", "vs_baseline")]
    while len(line) > COMPACT_MAX_CHARS and drop:
        doc.pop(drop.pop(0), None)
        line = json.dumps(doc)
    return line


def emit(update: dict | None = None) -> None:
    """(Re-)print the cumulative artifact, then the compact summary line.

    Both are complete valid JSON artifacts; the compact one is always LAST so
    the driver's bounded tail window always contains a parseable headline."""
    if update:
        _RESULT.update(update)
    if "value" in _RESULT:
        print(json.dumps(_RESULT), flush=True)
        print(compact_line(), flush=True)


class Budget:
    """Global wall-clock budget; sections poll it between timing cells."""

    def __init__(self, total_s: float):
        self.t0 = time.monotonic()
        self.total = total_s

    def left(self) -> float:
        return self.total - (time.monotonic() - self.t0)

    def ok(self, need_s: float = 0.0) -> bool:
        return self.left() > need_s


def _sanitize_compile_cache(path: str | Path, budget_s: float = 75.0, max_bytes: int = 16 << 30) -> int:
    """Evict corrupted persistent-cache entries (truncated zstd frames).

    A bench run killed by the driver's external timeout leaves half-written
    entries behind; jax then warns (``ZstdError: ... did not decompress full
    frame``) and recompiles on every later run — the exact r03 failure tail.

    The cache grows multi-GB across a round (22 GB observed), so validation
    is NEWEST-FIRST under a time budget: torn entries are precisely the
    newest ones (the write in flight at kill time), so the likely-corrupt
    tail is always checked and older entries are left unvalidated when the
    budget runs out (a missed torn oldie costs one warn+recompile, not the
    run).  Entries beyond ``max_bytes`` cumulative (oldest first) are LRU-
    pruned outright to bound both disk and future sanitize cost."""
    root = Path(path)
    if not root.is_dir():
        return 0
    try:
        import zstandard
    except ImportError:  # jax would be on the zlib path; nothing to check
        return 0
    try:
        files = sorted(root.glob("*-cache"), key=lambda f: f.stat().st_mtime, reverse=True)
    except OSError:
        return 0
    dropped = 0
    total = 0
    t0 = time.monotonic()
    for f in files:
        try:
            size = f.stat().st_size
        except OSError:
            continue
        total += size
        if total > max_bytes:  # LRU prune: oldest entries past the cap
            try:
                f.unlink(missing_ok=True)
                dropped += 1
            except OSError:
                pass
            continue
        if time.monotonic() - t0 > budget_s:
            continue  # keep, unvalidated — the likely-torn newest are done
        try:
            with f.open("rb") as fh:
                if fh.read(4) != b"\x28\xb5\x2f\xfd":
                    continue  # not a zstd frame (other compressor); leave it
                fh.seek(0)
                # decompressobj + .eof, NOT read_to_iter: the streaming
                # iterator stops silently at EOF on a truncated frame
                # (verified), which is exactly the r03 corruption mode
                obj = zstandard.ZstdDecompressor().decompressobj()
                while chunk := fh.read(1 << 22):
                    obj.decompress(chunk)
                complete = obj.eof
        except OSError:
            continue
        except Exception:  # noqa: BLE001 — any decode fault means corrupt
            complete = False
        if not complete:
            try:
                # a frame still being WRITTEN by a concurrent run has exactly
                # the torn signature; leave very fresh files alone (a real
                # torn oldie costs one warn+recompile, not the run)
                if time.time() - f.stat().st_mtime < 10.0:
                    continue
                f.unlink(missing_ok=True)
                dropped += 1
            except OSError:
                pass
    return dropped


def _median_spread(slopes: list[float]) -> tuple[float, float]:
    "(median, spread): spread is max-min for <=4 reps, IQR beyond that."
    arr = np.asarray(slopes, np.float64)
    value = float(np.median(arr))
    if arr.size <= 4:
        spread = float(arr.max() - arr.min())
    else:
        spread = float(np.percentile(arr, 75) - np.percentile(arr, 25))
    return value, spread


def headline_section(jax, jnp, sampler, schedule, transform, shape, budget: Budget, provisional=None) -> dict:
    """Least-squares marginal step time, Pallas/XLA x f32/bf16 interleaved.

    ``provisional``: callback fired with a rough 2-point us/step estimate as
    soon as the headline variant's FIRST two executables are compiled —
    main() emits it as a provisional artifact, so a cold compile cache (a
    validation run this round lost every executable to the cache's LRU cap
    and the external timeout killed the run with NOTHING printed) can no
    longer lose the round's scoreboard line."""
    from skrample_tpu.ops import CompiledDenoiser, compile_sampler

    on_tpu = jax.default_backend() == "tpu"

    def model_fn(x, t, s, a):
        # minimal elementwise stand-in: isolates sampler-update cost
        return x * jnp.asarray(0.999, x.dtype)

    variants: dict[str, tuple[str, object]] = {"xla_f32": ("xla", jnp.float32), "xla_bf16": ("xla", jnp.bfloat16)}
    if on_tpu:
        variants["pallas_f32"] = ("pallas", jnp.float32)
        variants["pallas_bf16"] = ("pallas", jnp.bfloat16)
    headline = "pallas_f32" if on_tpu else "xla_f32"

    # Compile every (variant, length) executable up front so timing runs are
    # interleaved back-to-back with no compile work between them.  The
    # headline variant compiles first — its extreme lengths FIRST so the
    # provisional slope can be taken after two compiles; A/B variants
    # compile only while the budget holds, so a slow cold-cache start
    # degrades to a headline-only section instead of losing the artifact.
    runners: dict[tuple[str, int], tuple] = {}
    ab_dropped: list[str] = []
    head_order = sorted(HEADLINE_LENGTHS, key=lambda n: (n != min(HEADLINE_LENGTHS), n != max(HEADLINE_LENGTHS)))
    for name in [headline, *[v for v in variants if v != headline]]:
        if name != headline and not budget.ok(45):
            ab_dropped.append(name)
            continue
        kernel, dtype = variants[name]
        for steps in head_order if name == headline else AB_LENGTHS:
            compiled = compile_sampler(sampler, schedule, transform, steps)
            denoiser = CompiledDenoiser.build(compiled, dtype=dtype, kernel=kernel)
            xd = jnp.ones(shape, dtype)
            run = jax.jit(lambda x, d=denoiser: d.run(model_fn, x))
            np.asarray(run(xd))  # compile + warm; forced host transfer (see below)
            runners[(name, steps)] = (run, xd)
            if provisional is not None and len(runners) == 2:
                (lo, hi) = sorted(n for _, n in runners)
                ts = {}
                for n in (lo, hi):
                    t0 = time.perf_counter()
                    np.asarray(runners[(name, n)][0](runners[(name, n)][1]))
                    ts[n] = time.perf_counter() - t0
                rough = (ts[hi] - ts[lo]) / (hi - lo) * 1e6
                if rough > 0:
                    provisional(round(rough, 4), headline)
    for name in ab_dropped:
        del variants[name]

    def time_cell(key: tuple[str, int]) -> float:
        # every wait is a host transfer, not block_until_ready: through the
        # axon tunnel a block_until_ready-only warm-up was observed to make
        # later block_until_ready calls return while the scan was still in
        # flight (the round-2 negative headline's likely mechanism); the
        # transfer constant is identical across scan lengths, so the slope
        # is unaffected
        run, xd = runners[key]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(run(xd))
            best = min(best, time.perf_counter() - t0)
        return best

    all_lengths = sorted({n for _, n in runners})
    times: dict[tuple[str, int], list[float]] = {k: [] for k in runners}

    def run_reps(reps: int) -> None:
        for _ in range(reps):
            # lengths outer, variants inner: every rep sees all variants
            # back-to-back, so drift affects them equally (interleaved A/B)
            for n in all_lengths:
                for name in variants:
                    if (name, n) in times:
                        times[(name, n)].append(time_cell((name, n)))

    def fit(name: str) -> tuple[float, float, float]:
        "(slope us/step median, spread us, intercept ms median) across reps."
        lengths = [n for v, n in times if v == name]
        lengths.sort()
        reps = len(times[(name, lengths[0])])
        slopes, intercepts = [], []
        for r in range(reps):
            ys = [times[(name, n)][r] for n in lengths]
            if len(lengths) > 2:
                slope, intercept = np.polyfit(lengths, ys, 1)
            else:
                slope = (ys[1] - ys[0]) / (lengths[1] - lengths[0])
                intercept = ys[0] - slope * lengths[0]
            slopes.append(slope * 1e6)
            intercepts.append(intercept * 1e3)
        value, spread = _median_spread(slopes)
        return value, spread, float(np.median(intercepts))

    run_reps(3)
    value, spread, intercept_ms = fit(headline)
    attempts = 1
    while (not value > 0 or not spread < value) and attempts < 3 and budget.ok(30):
        run_reps(4)  # noise won an attempt: widen the sample and refit
        value, spread, intercept_ms = fit(headline)
        attempts += 1
    assert value > 0, f"headline slope non-positive after {attempts} attempts: {value} us (spread {spread})"

    ab = {}
    for name in variants:
        v, s, _ = fit(name)
        ab[name] = round(v, 4)
        ab[name + "_spread"] = round(s, 4)

    return {
        "value": round(value, 4),
        "spread_us": round(spread, 4),
        # spread >= value after all retries: publish, but say the spread won
        **({"headline_spread_exceeds_value": True} if not spread < value else {}),
        "fit_reps": len(times[(headline, all_lengths[0])]),
        "scan_lengths": list(HEADLINE_LENGTHS),
        "scan_constant_ms": round(intercept_ms, 3),
        "us_per_step_incl_dispatch_1000": round((intercept_ms * 1e3 + value * 1000) / 1000, 3),
        "ab_us": ab,
        **({"ab_variants_skipped_budget": ab_dropped} if ab_dropped else {}),
        "headline_variant": headline,
    }


def dispatch_section(jax, jnp, sampler, schedule, transform, shape, budget: Budget, steps: int = 256) -> dict:
    """The per-step cost of the no-scan wrapper path, decomposed.

    Every loop issues its dispatches asynchronously and blocks once at the
    end, mirroring how a torch-pipeline driver overlaps host and device:

      null1     — 1 dispatch/step, single-arg identity: the dispatch floor.
      nullsig   — 1 dispatch/step with the *exact* jitted_step signature
                  (weights row + sample + prediction + ring, ring donated)
                  but an empty body: floor + argument/pytree plumbing.
      step      — 1 dispatch/step, the real fused update (jitted_step).
      indexed   — 1 dispatch/step, jitted_step_indexed: the weight table
                  stays on device and the host passes only the step index.
      path      — 2 dispatches/step (model stand-in + update): what a
                  wrapper user actually pays per denoise step.
    """
    from skrample_tpu.ops import CompiledDenoiser, compile_sampler

    compiled = compile_sampler(sampler, schedule, transform, steps)
    denoiser = CompiledDenoiser.build(compiled, dtype=jnp.float32)
    jstep = denoiser.jitted_step()
    jstep_idx = denoiser.jitted_step_indexed()
    w_rows = [denoiser.weights[n] for n in range(steps)]
    idx = np.arange(steps, dtype=np.int32)

    donate = (3,) if jax.default_backend() != "cpu" else ()
    nullsig = jax.jit(lambda w, x, o, ring: (x, ring), donate_argnums=donate)
    null1 = jax.jit(lambda v: v + jnp.float32(0))

    def timed_interleaved(loops: dict[str, object], reps: int = 5) -> dict[str, float]:
        """Best-of-reps per loop, round-robin so tunnel/host drift hits every
        loop equally (sequential timing made the subtraction fields
        incoherent — nullsig once measured faster than null)."""
        for loop in loops.values():
            loop()  # compile / warm
        best = {name: float("inf") for name in loops}
        for _ in range(reps):
            for name, loop in loops.items():
                t0 = time.perf_counter()
                loop()
                best[name] = min(best[name], time.perf_counter() - t0)
            if not budget.ok(20):
                break  # best-of-so-far is still a coherent decomposition
        return {name: t / steps * 1e6 for name, t in best.items()}

    def loop_null1():
        v = jnp.ones(shape, jnp.float32)
        for _ in range(steps):
            v = null1(v)
        np.asarray(v)  # forced transfer, not block_until_ready (tunnel quirk)

    def loop_nullsig():
        xx = jnp.ones(shape, jnp.float32)
        o = xx * jnp.float32(0.5)
        ring = denoiser.init_ring(xx)
        for n in range(steps):
            xx, ring = nullsig(w_rows[n], xx, o, ring)
        np.asarray(xx)

    def loop_step():
        xx = jnp.ones(shape, jnp.float32)
        o = xx * jnp.float32(0.5)
        ring = denoiser.init_ring(xx)
        for n in range(steps):
            xx, ring = jstep(w_rows[n], xx, o, ring)
        np.asarray(xx)

    def loop_indexed():
        xx = jnp.ones(shape, jnp.float32)
        o = xx * jnp.float32(0.5)
        ring = denoiser.init_ring(xx)
        for n in range(steps):
            xx, ring = jstep_idx(idx[n], xx, o, ring)
        np.asarray(xx)

    def loop_path():
        xx = jnp.ones(shape, jnp.float32)
        ring = denoiser.init_ring(xx)
        for n in range(steps):
            o = xx * jnp.float32(0.999)
            xx, ring = jstep(w_rows[n], xx, o, ring)
        np.asarray(xx)

    loops = {"null1": loop_null1, "nullsig": loop_nullsig, "step": loop_step, "indexed": loop_indexed, "path": loop_path}
    t = timed_interleaved(loops)
    # the decomposition only means something if the parts are ordered
    # (null <= nullsig <= step); tunnel noise can invert them — retry once
    # with a wider sample, then flag rather than publish a negative part
    if not (t["null1"] <= t["nullsig"] <= t["step"]) and budget.ok(60):
        t = timed_interleaved(loops, reps=9)
    unstable = not (t["null1"] <= t["nullsig"] <= t["step"])
    t_null1, t_nullsig, t_step, t_indexed, t_path = (t[k] for k in ("null1", "nullsig", "step", "indexed", "path"))

    return {
        **({"dispatch_decomposition_unstable": True} if unstable else {}),
        "us_single_step_dispatch_path": round(t_path, 3),
        "us_null_dispatch": round(t_null1, 3),
        "us_nullsig_dispatch": round(t_nullsig, 3),
        "us_step_only": round(t_step, 3),
        "us_step_only_indexed": round(t_indexed, 3),
        # decomposition of one update dispatch
        "us_signature_plumbing": round(t_nullsig - t_null1, 3),
        "us_update_work": round(t_step - t_nullsig, 3),
        # continuity with BENCH_r02 fields
        "us_single_step_overhead_vs_null": round(t_path - 2 * t_null1, 3),
        # the 2-dispatch path vs the sum of its measured parts
        "us_path_residual": round(t_path - t_null1 - t_step, 3),
    }


def dit_forward_flops(config, batch: int, height: int, width: int) -> float:
    "Analytic matmul FLOPs (2*M*N*K per matmul) of one DiT forward pass."
    N = (height // config.patch) * (width // config.patch)
    D = config.dim
    pd = config.channels * config.patch * config.patch
    per_block = (
        6 * N * D * D  # qkv: 2*(N,D)@(D,3D)
        + 4 * N * N * D  # attention: scores + combine, 2*N^2*D each
        + 2 * N * D * D  # proj
        + 4 * config.mlp_ratio * N * D * D  # mlp in+out: 2*N*D*(r*D) each way
        + 12 * D * D  # adaLN modulation (per-sample, N-free)
    )
    io = 4 * N * pd * D  # patch_in + final_out, 2*N*pd*D each
    temb = 2 * 256 * D + 2 * D * D + 4 * D * D  # t-mlps + final_mod
    return float(batch * (config.depth * per_block + io + temb))


def serving_section(jax, jnp, budget: Budget, batch: int = 4, steps: int = 25, hw: int = 64, dim: int = 512, depth: int = 8) -> dict:
    """End-to-end DiT serving (25-step denoise, one dispatch per request) and
    model-forward MFU, bf16 and f32.

    Peak used for MFU: TPU v5e bf16 matmul peak 197 TFLOP/s (published),
    for BOTH dtypes — at JAX's default matmul precision, f32 matmuls run as
    single bf16 passes on the MXU (measured: a multi-pass /3 assumption put
    the f32 figure at an impossible 1.01), so bf16 peak is the honest
    denominator.  Raw effective TFLOP/s is reported alongside.

    The headline config uses heads=4 (head_dim 128): a head width that
    matches the 128-lane tile lets the fused-qkv flash kernel slice each
    head straight out of the qkv matmul output (no transposes, no split
    copies, full-depth MXU contraction in the score matmul) and the fused
    adaLN kernel normalizes in one HBM pass — measured 87% model-forward
    MFU vs 53% for the same-FLOPs heads=8 transpose path (the `_h8` A/B
    row, round 2's config), and 25% for einsum attention (`_full_attn`).

    The `int8` rows run the same flagship with `DiT.quantize_params`
    (dynamic W8A8 block matmuls on the MXU's 2x-rate int8 mode,
    `ops/quant.py`); their `mfu_*` fields keep the bf16 peak as the
    denominator, so >1.0 is possible and simply means
    faster-than-bf16-peak.

    Cases are ordered headline-first and each additional case (and the
    marginal-throughput block) starts only while the budget holds; dropped
    cases land in ``serving_cases_skipped_budget``."""
    from skrample_tpu import scheduling
    from skrample_tpu.models import DiT, DiTConfig
    from skrample_tpu.pipeline import GenerationPipeline
    from skrample_tpu.sampling import models, structured

    device = str(jax.devices()[0]).lower()
    peak_bf16 = 197e12 if "v5 lite" in device or "v5e" in device else None

    out: dict = {"batch": batch, "steps": steps, "latent_hw": hw}
    # headline: flash with the TPU-native head shape.  A/B rows hold the
    # head shape or the kernel fixed so each win is attributable.
    cases = [
        ("bf16", jnp.bfloat16, "flash", 4),
        ("int8", jnp.bfloat16, "flash", 4),  # W8A8 block matmuls (ops/quant.py)
        ("f32", jnp.float32, "flash", 4),
        ("bf16_h8", jnp.bfloat16, "flash", 8),
        ("bf16_full_attn", jnp.bfloat16, "full", 8),
    ]
    key = jax.random.PRNGKey(1)

    def build_pipe(config, dit, params, n_steps):
        return GenerationPipeline(
            model_fn=dit.as_sampleable(params),
            sampler=structured.DPM(order=2),
            schedule=scheduling.FlowShift(scheduling.Linear()),
            model_transform=models.FlowModel(),
            steps=n_steps,
            latent_shape=(batch, 4, hw, hw),
            donate=False,  # re-time the same request
        )

    def timed(pipe, reps=3):
        np.asarray(pipe.generate(key))  # warm; forced transfer (tunnel quirk)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(pipe.generate(key))
            best = min(best, time.perf_counter() - t0)
        return best

    marginal_tags: dict[str, tuple] = {}
    skipped: list[str] = []
    for i, (tag, dtype, attention, heads) in enumerate(cases):
        if i > 0 and not budget.ok(75):  # ~compile + timing cost of one case
            skipped.append(tag)
            continue
        config = DiTConfig(dim=dim, depth=depth, heads=heads, compute_dtype=dtype, attention=attention)
        dit = DiT(config)
        params = dit.init(jax.random.PRNGKey(0))
        if tag == "int8":
            params = dit.quantize_params(params)
        best = timed(build_pipe(config, dit, params, steps))

        flops = dit_forward_flops(config, batch, hw, hw) * steps
        eff = flops / best
        out[f"img_per_s_{tag}"] = round(batch / best, 3)
        out[f"ms_per_image_{tag}"] = round(best / batch * 1e3, 3)
        out[f"tflops_eff_{tag}"] = round(eff / 1e12, 3)
        if peak_bf16:
            out[f"mfu_model_fwd_{tag}"] = round(eff / peak_bf16, 4)
        if tag in ("bf16", "int8"):
            marginal_tags[tag] = (config, dit, params)
    if skipped:
        out["serving_cases_skipped_budget"] = skipped

    if not budget.ok(90):  # marginal block: 2 more compiles + timing rounds
        out["serving_marginal_skipped_budget"] = True
        return out

    # marginal (steady-state) throughput: slope over two step counts removes
    # the per-request dispatch constant (~30 ms through the dev tunnel, ~0 on
    # a local chip).  ALL (tag, length) cells are timed in one alternating
    # round-robin: sequential timing let tunnel drift land entirely on one
    # cell — it once published a negative request constant, and in round 3 it
    # made the bf16-vs-int8 marginal comparison incoherent across blocks.
    pipes = {
        (tag, n): build_pipe(config, dit, params, n)
        for tag, (config, dit, params) in marginal_tags.items()
        for n in (steps, 2 * steps)
    }
    for p in pipes.values():
        np.asarray(p.generate(key))
    bests = {k: float("inf") for k in pipes}
    reps, todo = 4, set(marginal_tags)
    for attempt in range(3):
        for _ in range(reps):
            for k, p in pipes.items():
                t0 = time.perf_counter()
                np.asarray(p.generate(key))
                bests[k] = min(bests[k], time.perf_counter() - t0)
        for tag in sorted(todo):
            config, dit, params = marginal_tags[tag]
            marginal = (bests[(tag, 2 * steps)] - bests[(tag, steps)]) / steps
            constant = bests[(tag, steps)] - marginal * steps
            if not (marginal > 0 and constant > 0):
                continue  # noise won this attempt for this tag: widen and retry
            out[f"us_per_model_step_marginal_{tag}"] = round(marginal * 1e6, 1)
            out[f"img_per_s_marginal_{tag}"] = round(batch / (marginal * steps), 3)
            out[f"request_constant_ms_{tag}"] = round(constant * 1e3, 3)
            # attribution: the ~30 ms constant is the dev tunnel's per-request
            # dispatch floor (~0 on a locally attached chip), so the
            # full-request mfu_model_fwd_* rows above are floored by it —
            # the *_marginal rows are the steady-state serving ceiling, and
            # continuous batching amortizes the constant in production
            out["request_constant_is_tunnel"] = True
            out["full_request_rows_include_dispatch_constant"] = True
            if peak_bf16:
                out[f"mfu_model_fwd_marginal_{tag}"] = round(
                    dit_forward_flops(config, batch, hw, hw) / marginal / peak_bf16, 4
                )
            todo.discard(tag)
        if not todo or not budget.ok(45):
            break
        reps = 6
    out["attention"] = "flash (Pallas online-softmax); *_full_attn = einsum A/B"
    return out


def training_section(jax, jnp, budget: Budget, batch: int = 4, hw: int = 64, dim: int = 512, depth: int = 8) -> dict:
    """Flow-matching train step (loss + grads + adamw) on the flagship DiT,
    slope-timed across two scan lengths so the dispatch constant drops out.

    Exercises the Pallas flash-attention *backward* (score tiles recomputed
    in VMEM from the saved logsumexp — the (N, N) matrix never exists in
    HBM) plus the fused-qkv forward and fused adaLN.  MFU uses the standard
    3x-forward-FLOPs convention for fwd+bwd; attention recompute inside the
    backward is extra work that convention does not credit."""
    import optax

    from skrample_tpu.models import DiT, DiTConfig

    config = DiTConfig(dim=dim, depth=depth, heads=4, compute_dtype=jnp.bfloat16, attention="flash")
    model = DiT(config)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)
    peak_bf16 = 197e12 if "v5" in str(jax.devices()[0]).lower() else None

    def loss_fn(p, x0, noise, sigma):
        s = sigma[:, None, None, None]
        xt = (1 - s) * x0 + s * noise
        pred = model.apply(p, xt, sigma * 1000.0)
        return jnp.mean((pred - (noise - x0)) ** 2)

    def make_step(update_fn):
        def train_step(carry, key):
            p, o = carry
            kd, kn, kt = jax.random.split(key, 3)
            x0 = jax.random.normal(kd, (batch, 4, hw, hw), jnp.float32)
            noise = jax.random.normal(kn, (batch, 4, hw, hw), jnp.float32)
            sigma = jax.random.uniform(kt, (batch,), minval=1e-3, maxval=1.0)
            loss, grads = jax.value_and_grad(loss_fn)(p, x0, noise, sigma)
            return update_fn(p, o, grads), loss

        return train_step

    # 2 -> 20 steps puts ~150 ms of signal over the tunnel's jitter; the
    # first cut used 2 -> 8 (~50 ms) and published a negative slope once.
    # Warm-up and timing both force a host transfer of the losses: through
    # the axon tunnel, a block_until_ready-only warm-up left every later
    # block_until_ready on that executable returning in ~1 ms while 160 ms
    # of scanned work was still in flight (measured; np.asarray was the only
    # change that restored coherent 8 ms/step slopes)
    lengths = (2, 20)
    lo, hi = lengths

    def measure(train_step, state0) -> float:
        "Interleaved LS-slope over the two scan lengths; -1 if noise wins."
        runners = {}
        for n in lengths:
            runners[n] = jax.jit(
                lambda p, o, n=n: jax.lax.scan(train_step, (p, o), jax.random.split(jax.random.PRNGKey(1), n))
            )
            np.asarray(runners[n](params, state0)[1])

        best = {n: float("inf") for n in lengths}
        step_s = -1.0
        reps = 4
        for _attempt in range(3):
            for _ in range(reps):
                for n in lengths:  # interleaved so drift hits both lengths
                    t0 = time.perf_counter()
                    np.asarray(runners[n](params, state0)[1])
                    best[n] = min(best[n], time.perf_counter() - t0)
            step_s = (best[hi] - best[lo]) / (hi - lo)
            if step_s > 0 or not budget.ok(60):
                return step_s
            reps = 6  # noise won this attempt: widen the sample
        return -1.0

    def adamw_update(p, o, grads):
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    step_s = measure(make_step(adamw_update), opt_state)
    if not step_s > 0:
        # refuse to publish a garbage number; the field's absence is the signal
        return {"train_bench_unstable": True}

    flops = 3.0 * dit_forward_flops(config, batch, hw, hw)
    out = {
        "ms_train_step_bf16": round(step_s * 1e3, 3),
        "train_steps_per_s": round(1.0 / step_s, 2),
    }
    if peak_bf16:
        out["mfu_train_step_bf16"] = round(flops / step_s / peak_bf16, 4)

    if not budget.ok(90):  # the 8-bit leg is 2 more fwd+bwd scan compiles
        out["train8_skipped_budget"] = True
        return out

    # Same step with int8 block-quantized moments (optim.adamw8bit): the
    # fused dequant->update->requant reads ~4 B/param of moment state
    # instead of 16, so the update leg gets cheaper as models grow.
    from skrample_tpu import optim as sk_optim

    opt8 = sk_optim.adamw8bit(1e-4)
    opt8_state = jax.jit(opt8.init)(params)

    def adamw8_update(p, o, grads):
        updates, o = opt8.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    step8_s = measure(make_step(adamw8_update), opt8_state)
    if step8_s > 0:
        out["ms_train_step8_bf16"] = round(step8_s * 1e3, 3)
    out["opt_state_bytes_8bit_vs_adam"] = round(
        sk_optim.optimizer_state_bytes(opt8_state) / sk_optim.optimizer_state_bytes(opt_state), 4
    )
    return out


def mmdit_section(jax, jnp, budget: Budget, batch: int = 4, hw: int = 64, steps: int = 25) -> dict:
    """Text-conditioned serving: MMDiT (SD3/Flux-class dual-stream) with
    classifier-free guidance, slope-timed like the training section.

    This is the realistic conditioned-serving workload — 1024 image + 128
    text joint tokens through the fused-qkv Pallas joint attention, CFG
    running cond+uncond in one batched forward (2x the FLOPs of an uncond
    step).  MFU denominates the *guided* FLOPs against the bf16 peak."""
    from skrample_tpu.models import MMDiT, MMDiTConfig
    from skrample_tpu.models.mmdit import mmdit_forward_flops

    config = MMDiTConfig(dim=512, depth=8, heads=4, context_dim=512, context_tokens=128, compute_dtype=jnp.bfloat16)
    model = MMDiT(config)
    params = model.init(jax.random.PRNGKey(0))
    # adaLN-zero inits at exactly zero output; perturb so nothing folds away
    params = jax.tree.map(
        lambda leaf: leaf + 0.02 * jax.random.normal(jax.random.PRNGKey(7), leaf.shape, leaf.dtype), params
    )
    ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, config.context_dim), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 4, hw, hw), jnp.float32)
    fn = model.as_sampleable(params, ctx, guidance_scale=3.0)
    peak_bf16 = 197e12 if "v5" in str(jax.devices()[0]).lower() else None

    def loop(y, n):
        def body(carry, i):
            t = i.astype(jnp.float32) * 40.0
            return carry - jnp.float32(0.02) * fn(carry, t, 1.0, 0.0), None

        out, _ = jax.lax.scan(body, y, jnp.arange(n))
        return jnp.float32(out.astype(jnp.float32).sum())

    lengths = (2, 10)
    runners = {}
    for n in lengths:
        runners[n] = jax.jit(lambda y, n=n: loop(y, n))
        np.asarray(runners[n](x))  # warm; forced host transfer (tunnel quirk)
    best = {n: float("inf") for n in lengths}
    lo, hi = lengths
    step_s = -1.0
    reps = 3
    for _attempt in range(3):
        for _ in range(reps):
            for n in lengths:  # interleaved so tunnel drift hits both lengths
                t0 = time.perf_counter()
                np.asarray(runners[n](x))
                best[n] = min(best[n], time.perf_counter() - t0)
        step_s = (best[hi] - best[lo]) / (hi - lo)
        if step_s > 0 or not budget.ok(30):
            break
        reps = 5
    if not step_s > 0:
        return {"mmdit_bench_unstable": True}

    flops = 2.0 * mmdit_forward_flops(config, batch, hw, hw)  # CFG = 2x fwd
    out = {
        "us_per_model_step_mmdit_cfg": round(step_s * 1e6, 1),
        "img_per_s_marginal_mmdit_cfg": round(batch / (step_s * steps), 3),
    }
    if peak_bf16:
        out["mfu_model_fwd_mmdit_cfg"] = round(flops / step_s / peak_bf16, 4)
    return out


def sigma_guards() -> dict:
    """Bit-exactness of the schedule layer vs the reference.

    1. The committed 33-point golden tables (generated from the reference by
       scripts/generate_golden_fixtures.py) for all 21 fixture stacks.
    2. When /root/reference is mounted: a live randomized-stack sweep —
       random base x sub x modifier structures with randomized parameters,
       full (timestep, sigma, alpha) tables compared bit-for-bit."""
    out: dict = {}

    golden_path = Path(__file__).parent / "tests" / "fixtures" / "schedules.json"
    if golden_path.exists():
        from tests.fixture_common import SCHEDULE_STACKS

        golden = json.loads(golden_path.read_text())
        deltas = []
        for name, tables in golden.items():
            mine = SCHEDULE_STACKS[name].points_np(np.linspace(1, 0, 33))
            deltas.append(np.abs(mine - np.asarray(tables["points33"])).max())
        out["max_dsigma_vs_reference"] = float(max(deltas))
        out["sigma_guard_points"] = 33
        out["sigma_guard_stacks"] = len(golden)

    reference = Path("/root/reference")
    if (reference / "skrample").is_dir():
        sys.path.insert(0, str(reference))
        try:
            import skrample.scheduling as r_sched

            from skrample_tpu import scheduling as m_sched

            rng = random.Random(20260816)
            worst = 0.0
            cases = 12
            for _ in range(cases):
                base_kind = rng.choice(["linear", "linear_vp", "scaled", "zsnr"])
                sub_kind = rng.choice([None, "karras", "exponential", "beta", "probit"])
                mod_kind = rng.choice([None, "flowshift", "hyper", "sinner"])
                base_kw = {
                    "linear": {},
                    "linear_vp": {"sigma_start": 14.6},
                    "scaled": {
                        "beta_start": rng.uniform(1e-4, 2e-3),
                        "beta_end": rng.uniform(5e-3, 2e-2),
                        "beta_scale": rng.choice([1, 2]),
                    },
                    "zsnr": {},
                }[base_kind]
                sub_kw = {
                    None: {},
                    "karras": {"rho": rng.uniform(3, 10)},
                    "exponential": {"rho": rng.uniform(0.5, 2)},
                    "beta": {"alpha": rng.uniform(0.3, 1.0), "beta": rng.uniform(0.3, 1.0)},
                    "probit": {"scale": rng.uniform(1, 5)},
                }[sub_kind]
                mod_kw = {
                    None: {},
                    "flowshift": {"shift": rng.uniform(0.5, 6)},
                    "hyper": {"scale": rng.uniform(1, 4)},
                    "sinner": {"scale": rng.uniform(1, 3)},
                }[mod_kind]

                def build(mod):
                    names = {"linear": "Linear", "linear_vp": "Linear", "scaled": "Scaled", "zsnr": "ZSNR"}
                    schedule = getattr(mod, names[base_kind])(**base_kw)
                    if sub_kind:
                        schedule = getattr(mod, sub_kind.capitalize())(schedule, **sub_kw)
                    if mod_kind:
                        names = {"flowshift": "FlowShift", "hyper": "Hyper", "sinner": "Sinner"}
                        schedule = getattr(mod, names[mod_kind])(schedule, **mod_kw)
                    return schedule

                t = np.linspace(1, 0, 33)
                ref = build(r_sched).points_np(t)
                mine = build(m_sched).points_np(t)
                diff = np.abs(mine - ref)
                both_nan = np.isnan(mine) & np.isnan(ref)
                diff = np.where(both_nan, 0.0, diff)  # identical NaNs agree
                worst = max(worst, float(np.nanmax(diff) if np.isnan(diff).any() else diff.max()))
                assert not (np.isnan(diff) & ~both_nan).any(), "NaN on one side only"
            out["max_dsigma_random_stacks_live"] = worst
            out["sigma_guard_random_cases"] = cases
        except ImportError:
            out["max_dsigma_random_stacks_live"] = None
    else:
        out["max_dsigma_random_stacks_live"] = None
    return out


def oracle_guard(jax, jnp, sampler, schedule, transform) -> float:
    "Compiled device trajectory vs the float64 host oracle (25 steps)."
    from skrample_tpu.ops import CompiledDenoiser, compile_sampler
    from skrample_tpu.sampling import interface

    oracle_steps = 25
    small = (1, 4, 16, 16)
    x64 = np.random.default_rng(0).normal(size=small)
    compiled_small = compile_sampler(sampler, schedule, transform, oracle_steps)
    denoiser_small = CompiledDenoiser.build(compiled_small, dtype=jnp.float32)

    def np_model(x, t, s, a):
        return x * 0.9 + np.sin(np.float64(t) / 500) * 0.05

    def jx_model(x, t, s, a):
        return x * jnp.float32(0.9) + jnp.sin(t / 500) * jnp.float32(0.05)

    oracle = interface.StructuredFunctionalAdapter(sampler).sample_model(
        x64, np_model, transform, schedule, oracle_steps
    )
    device = np.asarray(denoiser_small.run(jx_model, jnp.asarray(x64, jnp.float32)))
    return float(np.mean((device - oracle) ** 2))


def main() -> None:
    budget = Budget(float(os.environ.get("SKRAMPLE_BENCH_BUDGET_S", "900")))

    def _emergency(signum, frame):  # noqa: ARG001 — signal handler signature
        # external kill (driver timeout) or own alarm: save what we measured,
        # but exit NONZERO (3) so callers can tell an interrupted run from a
        # clean one by rc alone — the bench_interrupted_signal key carries the
        # detail for artifact readers (advisor round-4 finding)
        _RESULT.setdefault("bench_interrupted_signal", signum)
        emit()
        sys.exit(3 if "value" in _RESULT else 1)

    signal.signal(signal.SIGTERM, _emergency)
    signal.signal(signal.SIGALRM, _emergency)
    signal.alarm(int(budget.total) + 60)  # insurance past the soft budget

    cache_dir = "/tmp/skrample_tpu_xla_cache"
    evicted = _sanitize_compile_cache(cache_dir)

    import jax
    import jax.numpy as jnp

    try:  # warm restarts: persist compiled executables across bench runs
        from skrample_tpu.utils import enable_compilation_cache

        enable_compilation_cache(cache_dir)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass

    from skrample_tpu import scheduling
    from skrample_tpu.sampling import models, structured

    sampler = structured.DPM(order=2)
    schedule = scheduling.FlowShift(scheduling.Linear())
    transform = models.FlowModel()
    shape = (1, 4, 128, 128)

    def _transient(exc: Exception) -> bool:
        # dev-tunnel infrastructure faults (remote compile service hiccups),
        # not code: retrying is correct, crashing loses the round artifact
        msg = str(exc)
        return any(s in msg for s in ("remote_compile", "read body", "UNAVAILABLE", "DEADLINE_EXCEEDED"))

    def run_section(fn, *args, required: bool, attempts: int = 3, **kw):
        for attempt in range(attempts):
            try:
                return fn(*args, **kw)
            except Exception as exc:  # noqa: BLE001 — filtered below
                if not _transient(exc) or attempt == attempts - 1 or not budget.ok(60):
                    if required:
                        raise
                    return {f"{fn.__name__}_unavailable": str(exc)[:160]}
        return None  # unreachable

    # --- required sections: headline + correctness guards, then PRINT ------
    def _provisional(rough_us: float, variant: str) -> None:
        # an artifact exists from the FIRST two compiles on: a cold compile
        # cache + external kill can cost precision, never the scoreboard line
        _RESULT.update(
            {
                "metric": (
                    "fused sampler step (DPM++2M, FlowShift(Linear), SDXL 1x4x128x128 f32, "
                    f"{variant}, PROVISIONAL 2-point slope; full fit follows)"
                ),
                "value": rough_us,
                "unit": "us",
                "vs_baseline": round(BASELINE_US / rough_us, 3),
                "headline_provisional": True,
                "backend": jax.default_backend(),
            }
        )
        emit()

    head = run_section(
        headline_section, jax, jnp, sampler, schedule, transform, shape, budget, required=True, provisional=_provisional
    )
    _RESULT.pop("headline_provisional", None)
    guards = sigma_guards()
    latent_mse = oracle_guard(jax, jnp, sampler, schedule, transform)

    value = head.pop("value")
    _RESULT.update(
        {
            "metric": (
                "fused sampler step (DPM++2M, FlowShift(Linear), SDXL 1x4x128x128 f32, "
                f"{head['headline_variant']}, least-squares marginal in scan)"
            ),
            "value": value,
            "unit": "us",
            "vs_baseline": round(BASELINE_US / value, 3),
            **head,
            **guards,
            "latent_mse_vs_f64_oracle": latent_mse,
            **({"compile_cache_entries_evicted": evicted} if evicted else {}),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        }
    )
    emit()  # the artifact exists from this point on, whatever happens below

    # --- optional sections, gated on remaining budget -----------------------
    # (name, estimated cost to be worth starting, callable) — ordered by
    # scoreboard value: serving MFU > training > conditioned MMDiT > the
    # dispatch decomposition (round-2/3 continuity data, cheap but last)
    optional = [
        ("serving", 180.0, lambda: run_section(serving_section, jax, jnp, budget, required=False)),
        ("training", 150.0, lambda: run_section(training_section, jax, jnp, budget, required=False)),
        ("mmdit", 120.0, lambda: run_section(mmdit_section, jax, jnp, budget, required=False)),
        ("dispatch", 90.0, lambda: run_section(dispatch_section, jax, jnp, sampler, schedule, transform, shape, budget, required=False)),
    ]
    only = os.environ.get("SKRAMPLE_BENCH_SECTIONS")  # comma list, for debugging
    for name, estimate, thunk in optional:
        if only is not None and name not in only.split(","):
            continue
        if not budget.ok(estimate):
            emit({f"{name}_skipped_budget": round(budget.left(), 1)})
            continue
        section = thunk()
        if section:
            emit(section)

    emit({"bench_elapsed_s": round(time.monotonic() - budget.t0, 1)})


if __name__ == "__main__":
    sys.exit(main())
