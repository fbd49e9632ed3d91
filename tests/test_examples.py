"""Hermetic example programs execute end to end (soak tier).

The examples double as executable documentation AND as e2e assertions
(each one asserts determinism/equivalence properties inline, e.g.
``text_to_video.py`` asserts prompt-dependence and packing-invariant
results).  This guard keeps them from rotting as the library moves —
every release-notes claim that points at an example stays runnable.

Reference anchor: the reference's examples are exercised implicitly by its
diffusers test tier (``/root/reference/tests/diffusers_pipes.py``); here
they run as themselves.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.soak  # a few CPU-minutes each: full tier only

EXAMPLES = Path(__file__).parent.parent / "examples"

HERMETIC = [
    "structured_loop.py",
    "compiled_loop.py",
    "continuous_batching.py",
    "text_to_image.py",
    "text_to_video.py",
    "controlnet_guided.py",
    "pixel_space_serving.py",
    # round-5: every remaining example that needs no weights or network
    "functional_rk.py",
    "adaptive_device_loop.py",
    "streaming_preview.py",
    "serve_dynamic_batching.py",
    "serve_int8.py",
    "text_conditioned_serving.py",
    "sharded_generation.py",
    "video_latents_sharded.py",
    "train_flow_matching.py",
]

# examples demonstrating multi-chip sharding get a virtual 8-device host
VIRTUAL_MESH = {"sharded_generation.py", "video_latents_sharded.py"}

# examples with a CLI: pass flags that keep the CPU smoke small
EXTRA_ARGV = {
    "train_flow_matching.py": ["--steps", "40"],
}


@pytest.mark.parametrize("name", HERMETIC)
def test_example_runs(name: str) -> None:
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
    }
    env["JAX_PLATFORMS"] = "cpu"
    if name in VIRTUAL_MESH:
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    # the runpy + jax.config recipe: the dev host pins the backend through a
    # site hook that env vars alone do not override (docs/ROUND3 timing
    # notes) — configure jax BEFORE the example module runs
    argv = [str(EXAMPLES / name), *EXTRA_ARGV.get(name, [])]
    script = (
        "import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = {argv!r}; "
        f"import runpy; runpy.run_path({str(EXAMPLES / name)!r}, run_name='__main__')"
    )
    result = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=str(EXAMPLES.parent),
    )
    assert result.returncode == 0, f"{name}:\n{result.stdout[-1500:]}\n{result.stderr[-2000:]}"
