"""The bench.py artifact contract (the driver's scoreboard machinery).

Round 3 lost the perf artifact to an external timeout (rc 124, nothing
printed) and a corrupted persistent-compile-cache entry.  These tests pin
the harness pieces that prevent a repeat, hermetically (no TPU, no timing):
cache sanitization, the wall-clock budget, and the cumulative single-line
emit discipline.  Reference anchor: the always-prints harness ethos of the
reference's ``scripts/overhead.py:12-26``.
"""

from __future__ import annotations

import importlib.util
import io
import json
import sys
from contextlib import redirect_stdout
from pathlib import Path

import pytest


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", Path(__file__).parent.parent / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._RESULT.clear()
    return mod


def _zstd_bytes(payload: bytes) -> bytes:
    import zstandard

    return zstandard.ZstdCompressor().compress(payload)


def _incompressible(n: int) -> bytes:
    import numpy as np

    return np.random.default_rng(0).integers(0, 256, n, dtype=np.uint8).tobytes()


def test_sanitize_drops_truncated_entries_only(bench, tmp_path: Path) -> None:
    import os
    import time

    good = tmp_path / "jit_f-aaaa-cache"
    good.write_bytes(_zstd_bytes(b"x" * 4096))
    corrupt = tmp_path / "jit_g-bbbb-cache"
    # a genuinely torn frame: incompressible payload, cut mid-frame (a
    # compressible one fits its whole frame in the prefix and read paths
    # that stop silently at EOF — the r03 corruption mode — pass it)
    corrupt.write_bytes(_zstd_bytes(_incompressible(1 << 16))[:1000])
    old = time.time() - 600  # past the concurrent-writer grace window
    os.utime(corrupt, (old, old))
    foreign = tmp_path / "jit_h-cccc-cache"
    foreign.write_bytes(b"not-zstd-at-all")  # other compressor: leave it
    unrelated = tmp_path / "notes.txt"
    unrelated.write_text("keep")

    dropped = bench._sanitize_compile_cache(tmp_path)
    assert dropped == 1
    assert good.exists() and foreign.exists() and unrelated.exists()
    assert not corrupt.exists()


def test_sanitize_spares_fresh_torn_entries(bench, tmp_path: Path) -> None:
    """A torn frame with a NOW mtime is a concurrent run's write in flight,
    not r03 corruption — it must be left alone (advisor round-4 finding)."""
    in_flight = tmp_path / "jit_w-dddd-cache"
    in_flight.write_bytes(_zstd_bytes(_incompressible(1 << 16))[:1000])
    assert bench._sanitize_compile_cache(tmp_path) == 0
    assert in_flight.exists()


def test_sanitize_missing_dir_is_noop(bench, tmp_path: Path) -> None:
    assert bench._sanitize_compile_cache(tmp_path / "nope") == 0


def test_budget_counts_down(bench) -> None:
    b = bench.Budget(1000.0)
    assert b.ok() and b.ok(900.0)
    assert not b.ok(1000.5)
    b.total = -1.0  # force expiry
    assert not b.ok()
    assert b.left() < 0


def test_emit_is_cumulative_and_always_complete(bench) -> None:
    """Every print is a full valid artifact; each emit ends with the compact
    summary line, so the LAST line always parses inside the driver's window."""
    out = io.StringIO()
    with redirect_stdout(out):
        bench.emit({"metric": "m"})  # no value yet: must stay silent
        assert out.getvalue() == ""
        bench.emit({"value": 1.25, "unit": "us"})
        bench.emit({"extra_section": 7})
    lines = [ln for ln in out.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 4  # (cumulative, compact) x 2 emits
    docs = [json.loads(ln) for ln in lines]
    for doc in docs:  # every line parses as a complete artifact
        assert doc["metric"] == "m" and doc["value"] == 1.25
    assert "extra_section" not in docs[0]
    assert docs[2]["extra_section"] == 7  # cumulative carries everything
    assert len(lines[-1]) <= bench.COMPACT_MAX_CHARS  # compact is LAST


def _stuffed_result(bench) -> None:
    "Fill _RESULT to beyond-round-4 size: a ~4k-char cumulative artifact."
    bench._RESULT.update(
        {
            "metric": (
                "fused sampler step (DPM++2M, FlowShift(Linear), SDXL 1x4x128x128 "
                "f32, pallas_f32, least-squares marginal in scan)"
            ),
            "value": 0.95,
            "unit": "us",
            "vs_baseline": 5.27,
            "spread_us": 0.13,
            "headline_variant": "pallas_f32",
            "fit_reps": 3,
            "ab_us": {
                "pallas_f32": 0.95, "pallas_f32_spread": 0.1,
                "pallas_bf16": 1.16, "pallas_bf16_spread": 0.1,
                "xla_f32": 2.2, "xla_f32_spread": 0.2,
                "xla_bf16": 1.9, "xla_bf16_spread": 0.2,
            },
            "max_dsigma_vs_reference": 0.0,
            "latent_mse_vs_f64_oracle": 1.2e-14,
            "mfu_model_fwd_marginal_bf16": 0.794,
            "mfu_model_fwd_marginal_int8": 0.93,
            "ms_train_step_bf16": 7.49,
            "mfu_model_fwd_mmdit_cfg": 0.735,
            "bench_elapsed_s": 598.5,
            "backend": "tpu",
            **{f"padding_section_key_{i}": "x" * 64 for i in range(48)},
        }
    )


def test_compact_line_fits_window_with_required_keys(bench) -> None:
    """THE round-4 gating flaw: the last line must fit the driver's ~2000-char
    tail window and carry the parse targets, however big the artifact gets."""
    _stuffed_result(bench)
    out = io.StringIO()
    with redirect_stdout(out):
        bench.emit({"one_more": 1})
    lines = [ln for ln in out.getvalue().splitlines() if ln.strip()]
    assert len(json.dumps(bench._RESULT)) > 2000  # the cumulative would clip
    last = lines[-1]
    assert len(last) <= bench.COMPACT_MAX_CHARS
    doc = json.loads(last)
    for key in ("metric", "value", "unit", "vs_baseline", "spread_us",
                "headline_variant", "max_dsigma_vs_reference",
                "latent_mse_vs_f64_oracle", "regressions", "bench_elapsed_s"):
        assert key in doc, key
    assert doc["value"] == 0.95 and doc["vs_baseline"] == 5.27
    assert "padding_section_key_0" not in doc  # bulk stays on the cumulative


def test_compact_line_sheds_optional_keys_under_pressure(bench) -> None:
    "A pathologically long metric string still yields a fitting, parseable line."
    bench._RESULT.update(
        {"metric": "m" * 1400, "value": 1.0, "unit": "us", "vs_baseline": 5.0,
         "ab_us": {"pallas_f32": 1.0}, "bench_elapsed_s": 1.0}
    )
    line = bench.compact_line()
    assert len(line) <= bench.COMPACT_MAX_CHARS
    doc = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in doc


def test_regression_guard_flags_out_of_range(bench) -> None:
    doc = {
        "value": 0.95,
        "ab_us": {"pallas_bf16": 1.6},  # above [0.5, 1.3]: the r04 drift case
        "max_dsigma_vs_reference": 0.0,
        "ms_train_step_bf16": 7.49,
    }
    flagged = bench.check_regressions(doc)
    assert flagged == ["ab_us.pallas_bf16=1.6 outside [0.5, 1.3]"]


def test_regression_guard_ignores_absent_sections(bench) -> None:
    "Budget-skipped sections must not read as regressions."
    assert bench.check_regressions({"value": 0.95}) == []
    # sigma guard: any nonzero is a regression
    assert bench.check_regressions({"value": 0.95, "max_dsigma_vs_reference": 1e-9})


def test_regression_guard_caps_its_length(bench) -> None:
    doc = {k: -1e9 for k in ("value", "ms_train_step_bf16", "mfu_model_fwd_mmdit_cfg",
                             "max_dsigma_vs_reference", "latent_mse_vs_f64_oracle",
                             "mfu_model_fwd_marginal_bf16", "mfu_model_fwd_marginal_int8")}
    flagged = bench.check_regressions(doc)
    assert len(flagged) == 6 and flagged[-1].startswith("+")


def test_interrupted_run_exits_nonzero(bench) -> None:
    "rc must distinguish an interrupted run from a clean one (advisor finding)."
    src = (Path(__file__).parent.parent / "bench.py").read_text()
    assert 'sys.exit(3 if "value" in _RESULT else 1)' in src


def test_headline_fields_contract(bench) -> None:
    """The driver parses metric/value/unit/vs_baseline from the line; pin the
    constant and the spelling so a refactor cannot silently break parsing."""
    assert bench.BASELINE_US == 5.0
    src = (Path(__file__).parent.parent / "bench.py").read_text()
    for key in ('"metric"', '"value"', '"unit"', '"vs_baseline"'):
        assert key in src
    # the required sections must print BEFORE any optional section runs
    assert src.index("emit()  # the artifact exists") < src.index('("dispatch"')


def test_sanitize_lru_prunes_beyond_cap(bench, tmp_path: Path) -> None:
    "Oldest entries beyond max_bytes go; newest stay validated/kept."
    files = []
    for i in range(4):
        f = tmp_path / f"jit_{i}-cache"
        f.write_bytes(_zstd_bytes(_incompressible(1 << 14)))
        os_utime = __import__("os").utime
        os_utime(f, (1_000_000 + i, 1_000_000 + i))  # i=3 newest
        files.append(f)
    size = files[0].stat().st_size
    dropped = bench._sanitize_compile_cache(tmp_path, max_bytes=int(2.5 * size))
    assert dropped == 2
    assert files[3].exists() and files[2].exists()  # newest two kept
    assert not files[0].exists() and not files[1].exists()


def test_sanitize_time_budget_keeps_unvalidated(bench, tmp_path: Path) -> None:
    "Budget exhaustion must KEEP older entries, not drop them."
    good_old = tmp_path / "jit_old-cache"
    good_old.write_bytes(_zstd_bytes(_incompressible(1 << 14)))
    __import__("os").utime(good_old, (1_000_000, 1_000_000))
    torn_new = tmp_path / "jit_new-cache"
    torn_new.write_bytes(_zstd_bytes(_incompressible(1 << 16))[:1000])
    dropped = bench._sanitize_compile_cache(tmp_path, budget_s=0.0)
    # the invariant: budget exhaustion skips VALIDATION, never deletes —
    # unvalidated entries survive (a torn oldie costs one warn+recompile)
    assert good_old.exists()
    assert dropped <= 1  # the newest may or may not have been reached in time
    if dropped == 0:
        assert torn_new.exists()


def test_provisional_headline_emits_after_two_compiles(bench) -> None:
    """A cold compile cache + external kill must still leave an artifact:
    the provisional callback fires from the headline section after two
    executables and produces a complete, parseable line."""
    import jax
    import jax.numpy as jnp

    from skrample_tpu import scheduling
    from skrample_tpu.sampling import models, structured

    calls = []
    out = io.StringIO()
    with redirect_stdout(out):

        def provisional(rough, variant):
            calls.append((rough, variant))
            bench._RESULT.update(
                {"metric": f"provisional {variant}", "value": rough, "unit": "us",
                 "vs_baseline": round(5.0 / rough, 3), "headline_provisional": True}
            )
            bench.emit()

        head = bench.headline_section(
            jax,
            jnp,
            structured.DPM(order=2),
            scheduling.FlowShift(scheduling.Linear()),
            models.FlowModel(),
            (1, 4, 16, 16),
            bench.Budget(600.0),
            provisional=provisional,
        )
    assert len(calls) == 1 and calls[0][0] > 0
    lines = [ln for ln in out.getvalue().splitlines() if ln.strip()]
    assert lines, "provisional emit must print"
    doc = json.loads(lines[-1])
    assert doc["headline_provisional"] is True and doc["value"] > 0
    assert head["value"] > 0  # the full fit still lands afterwards
    # the provisional marker must reach the compact line for BENCH readers
    assert '"headline_provisional"' in lines[-1]
