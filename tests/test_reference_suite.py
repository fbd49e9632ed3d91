"""THE parity test: run the reference implementation's own test files against
this library through the ``skrample`` compat aliases.

Skipped when /root/reference is absent.  Covers ~2100 reference test cases:
golden trajectories, schedule tables, property suites, RK wrapper
trajectories, Brownian wiring, tableau validation, noise spectra/energy."""

import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.soak  # reference-suite subprocess tier: full tier only

REFERENCE = Path("/root/reference")
if not (REFERENCE / "tests").is_dir():
    pytest.skip("reference tree not mounted", allow_module_level=True)

SUITES = {
    "self_scheduling": "self_scheduling.py",
    "miscellaneous": "miscellaneous.py",
    "self_sampling": "self_sampling.py",
    "self_noise": "self_noise.py",
}


@pytest.mark.parametrize("suite", SUITES.values(), ids=list(SUITES))
def test_reference_suite(suite: str) -> None:
    env_path = f"{Path(__file__).parent}:{Path(__file__).parent.parent}"
    result = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "ref_suite_plugin", str(REFERENCE / "tests" / suite)],
        capture_output=True,
        text=True,
        timeout=1200,
        env={"PYTHONPATH": env_path, "PATH": __import__("os").environ["PATH"], "HOME": __import__("os").environ.get("HOME", "/root")},
        cwd=str(Path(__file__).parent.parent),
    )
    summary = result.stdout.strip().splitlines()[-1] if result.stdout.strip() else result.stderr[-500:]
    assert result.returncode == 0, f"{suite}: {summary}\n{result.stdout[-2000:]}"
    assert "passed" in summary, summary
