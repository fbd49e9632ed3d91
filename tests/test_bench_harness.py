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
    good = tmp_path / "jit_f-aaaa-cache"
    good.write_bytes(_zstd_bytes(b"x" * 4096))
    corrupt = tmp_path / "jit_g-bbbb-cache"
    # a genuinely torn frame: incompressible payload, cut mid-frame (a
    # compressible one fits its whole frame in the prefix and read paths
    # that stop silently at EOF — the r03 corruption mode — pass it)
    corrupt.write_bytes(_zstd_bytes(_incompressible(1 << 16))[:1000])
    foreign = tmp_path / "jit_h-cccc-cache"
    foreign.write_bytes(b"not-zstd-at-all")  # other compressor: leave it
    unrelated = tmp_path / "notes.txt"
    unrelated.write_text("keep")

    dropped = bench._sanitize_compile_cache(tmp_path)
    assert dropped == 1
    assert good.exists() and foreign.exists() and unrelated.exists()
    assert not corrupt.exists()


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
    "Every print is a full valid artifact; the LAST line is the most complete."
    out = io.StringIO()
    with redirect_stdout(out):
        bench.emit({"metric": "m"})  # no value yet: must stay silent
        assert out.getvalue() == ""
        bench.emit({"value": 1.25, "unit": "us"})
        bench.emit({"extra_section": 7})
    lines = [ln for ln in out.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 2
    first, last = (json.loads(ln) for ln in (lines[0], lines[-1]))
    for doc in (first, last):  # both parse as complete artifacts
        assert doc["metric"] == "m" and doc["value"] == 1.25
    assert "extra_section" not in first
    assert last["extra_section"] == 7


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
