"""Preemption / resume fault injection (SURVEY §5 elastic-recovery row).

A real training run is SIGKILL'd mid-epoch (the example's
``--abort-after-step`` fault injector — the process dies exactly as a
preemption would, with the latest async orbax save possibly mid-write),
restored from the :class:`~skrample_tpu.models.TrainCheckpointer` + the
:class:`~skrample_tpu.data.EpochLoader` O(1) cursor (``iter_from``), run to
the same global step as an uninterrupted twin, and the FULL train state —
params, EMA shadow, optimizer moments — is bit-compared.

Determinism contract under test: per-step keys are ``fold_in(key, n)`` by
GLOBAL step and batch ``n`` is ``EpochLoader.batch_at(n)``, so a resumed
run replays the exact stream without replaying the steps; orbax commits
atomically, so the interrupted write is discarded and restore sees the last
complete step.

The reference has no trainer at all (SURVEY §2.0); its closest analog is
mid-trajectory sampling entry (``include``/``initial``,
``/root/reference/skrample/sampling/functional.py:117-147``), which
``tests/test_e2e.py`` covers.  This file covers the training-side story the
TPU build adds.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

EXAMPLE = Path(__file__).parent.parent / "examples" / "train_flow_matching.py"
UNTIL = 8
TINY = [
    "--host-loader",
    "--until",
    str(UNTIL),
    "--save-every",
    "3",
    "--dim",
    "64",
    "--depth",
    "1",
    "--heads",
    "2",
    "--size",
    "8",
    "--batch",
    "4",
]


def _run(orbax_dir: Path, *extra: str, devices: int = 1) -> subprocess.CompletedProcess:
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
    }
    env["JAX_PLATFORMS"] = "cpu"
    if devices > 1:
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    return subprocess.run(
        [sys.executable, str(EXAMPLE), "--orbax", str(orbax_dir), *TINY, *extra],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=str(EXAMPLE.parent.parent),
    )


def _assert_trees_bitequal(a, b, where: str) -> None:
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert jax.tree.structure(a) == jax.tree.structure(b), where
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=where)


def _final_states(dir_a: Path, dir_b: Path):
    from skrample_tpu.models import TrainCheckpointer

    with TrainCheckpointer(dir_a) as ca, TrainCheckpointer(dir_b) as cb:
        assert ca.latest_step() == UNTIL
        assert cb.latest_step() == UNTIL
        return ca.restore(UNTIL), cb.restore(UNTIL)


def _check_kill_and_resume(tmp_path: Path, *extra: str, devices: int = 1) -> None:
    straight, killed = tmp_path / "straight", tmp_path / "killed"

    done = _run(straight, *extra, devices=devices)
    assert done.returncode == 0, done.stderr[-2000:]

    interrupted = _run(killed, "--abort-after-step", "4", *extra, devices=devices)
    # the injector SIGKILLs the process mid-epoch: no clean exit, no final save
    assert interrupted.returncode == -signal.SIGKILL, (
        interrupted.returncode,
        interrupted.stdout[-500:],
        interrupted.stderr[-1000:],
    )
    assert "aborting after step 4 (fault injection)" in interrupted.stdout

    resumed = _run(killed, "--resume", *extra, devices=devices)
    assert resumed.returncode == 0, resumed.stderr[-2000:]
    assert "resumed from" in resumed.stdout, resumed.stdout
    # it restored a mid-run step (the committed save at step 3), not the end
    restored_at = int(resumed.stdout.split("at step")[1].split()[0])
    assert 0 < restored_at < UNTIL, resumed.stdout

    state_a, state_b = _final_states(straight, killed)
    assert int(state_a["step"]) == int(state_b["step"]) == UNTIL
    _assert_trees_bitequal(state_a["params"], state_b["params"], "params")
    _assert_trees_bitequal(state_a["ema"], state_b["ema"], "ema shadow")
    _assert_trees_bitequal(state_a["opt_state"], state_b["opt_state"], "optimizer moments")


def test_sigkill_mid_epoch_resume_bitexact(tmp_path: Path) -> None:
    "Plain single-device adamw: kill at step 4, resume from the step-3 save."
    _check_kill_and_resume(tmp_path)


@pytest.mark.soak  # two more subprocesses on an 8-device mesh: full tier only
def test_sigkill_resume_fsdp_adamw8bit_bitexact(tmp_path: Path) -> None:
    """The sharded variant: FSDP (ZeRO-3 over dp) + int8-moment adamw8bit.

    Restore goes through ``like=`` with the sharded live tree, so every
    leaf — params, int8 moment blocks and their scales, the EMA shadow —
    lands as its dp-shard and still bit-matches the uninterrupted twin."""
    _check_kill_and_resume(tmp_path, "--dp", "2", "--fsdp", "--opt8", devices=2)


def test_resume_refuses_without_flag(tmp_path: Path) -> None:
    "A stale checkpoint dir must not silently hijack a fresh run."
    d = tmp_path / "ck"
    done = _run(d, "--until", "1")  # last --until wins: one cheap step
    assert done.returncode == 0, done.stderr[-2000:]
    second = _run(d, "--until", "1")
    assert second.returncode != 0
    assert "--resume" in (second.stdout + second.stderr)
