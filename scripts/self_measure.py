#!/usr/bin/env python
"""Regenerate the golden-value fixtures from THIS implementation.

``generate_golden_fixtures.py`` seeds the fixtures from the reference tree;
once parity is established, this script re-emits the same files from our own
code so future regressions are caught even without the reference mounted.
Run with --check to verify without writing.

Usage: python scripts/self_measure.py [--check]
"""

from __future__ import annotations

import json
import math
import random
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from fixture_common import MODEL_TYPES, SCHEDULE_STACKS, STRUCTURED_SAMPLERS  # noqa: E402

from skrample_tpu import scheduling  # noqa: E402
from skrample_tpu.sampling import functional, interface, structured, tableaux  # noqa: E402

FIXTURES = Path(__file__).resolve().parent.parent / "tests" / "fixtures"
MEASURED_STEPS = 7
MEASURED_SEED = 42

FUNCTIONAL_SAMPLERS = {
    "RKUltra(2)": functional.RKUltra(order=2, providers={2: tableaux.RKE2.Heun}),
    "RKUltra(4)": functional.RKUltra(order=4),
    "RKUltra(8)": functional.RKUltra(order=8),
    "RKUltra(2,sde)": functional.RKUltra(order=2, providers={2: tableaux.RKE2.Heun}, stochasticity=1),
    "DynasauRK(2)": functional.DynasauRK(order=2),
    "DynasauRK(3)": functional.DynasauRK(order=3),
    "DynasauRK(4)": functional.DynasauRK(order=4),
    "RKMoire(2)": functional.RKMoire(order=2),
    "RKMoire(5)": functional.RKMoire(order=5),
}


def capture(sampler, schedule, model) -> list[float]:
    samples: list[float] = []
    random.seed(MEASURED_SEED)
    adapter = (
        interface.StructuredFunctionalAdapter(sampler)
        if isinstance(sampler, structured.StructuredSampler)
        else sampler
    )
    adapter.generate_model(
        lambda x, t, s, a: x - math.sin(t),
        model,
        scheduling.Hyper(schedule),
        lambda _: random.random(),
        MEASURED_STEPS,
        callback=lambda x, i, d: samples.append(x),
    )
    return samples


def schedule_payload() -> dict:
    out = {}
    for name, schedule in SCHEDULE_STACKS.items():
        out[name] = {
            "points7": schedule.points_np(np.linspace(1, 0, 7)).tolist(),
            "points33": schedule.points_np(np.linspace(1, 0, 33)).tolist(),
            "schedule11": schedule.schedule_np(11).tolist(),
        }
    return out


def trajectory_payload() -> dict:
    schedules = {"Linear": scheduling.Linear(), "Scaled": scheduling.Scaled()}
    model_types = {k: v for k, v in MODEL_TYPES.items() if k != "NoiseModel"}
    out = {}
    for s_name, sampler in {**STRUCTURED_SAMPLERS, **FUNCTIONAL_SAMPLERS}.items():
        for sch_name, schedule in schedules.items():
            for m_name, model in model_types.items():
                out[f"{s_name}|{sch_name}|{m_name}"] = capture(sampler, schedule, model)
    return out


def main() -> None:
    check = "--check" in sys.argv
    schedules = schedule_payload()
    trajectories = {"steps": MEASURED_STEPS, "seed": MEASURED_SEED, "trajectories": trajectory_payload()}

    if check:
        old_s = json.loads((FIXTURES / "schedules.json").read_text())
        old_t = json.loads((FIXTURES / "sampler_trajectories.json").read_text())
        for name in old_s:
            np.testing.assert_allclose(schedules[name]["points7"], old_s[name]["points7"], rtol=1e-12)
        for key in old_t["trajectories"]:
            np.testing.assert_allclose(
                trajectories["trajectories"][key], old_t["trajectories"][key], rtol=1e-9, atol=1e-12
            )
        print("self-measure check OK: implementation matches committed fixtures")
    else:
        (FIXTURES / "schedules.json").write_text(json.dumps(schedules, indent=1))
        (FIXTURES / "sampler_trajectories.json").write_text(json.dumps(trajectories, indent=1))
        print("fixtures rewritten from the current implementation")


if __name__ == "__main__":
    main()
