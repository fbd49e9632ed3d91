#!/usr/bin/env python
"""Generate golden-value fixtures for the test suite from the reference
implementation (Beinsezii/skrample, mounted read-only at /root/reference).

The fixtures pin the numeric contract: schedule tables bit-for-bit and sampler
trajectories to float64.  Committed as JSON so the tests stay hermetic when
the reference tree is absent.

Run:  python scripts/generate_golden_fixtures.py
"""

from __future__ import annotations

import json
import math
import random
import sys
from pathlib import Path

import numpy as np

REFERENCE = "/root/reference"
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"

sys.path.insert(0, REFERENCE)

import skrample.scheduling as r_sched  # noqa: E402
from skrample.sampling import functional as r_func  # noqa: E402
from skrample.sampling import interface as r_iface  # noqa: E402
from skrample.sampling import models as r_models  # noqa: E402
from skrample.sampling import structured as r_struct  # noqa: E402


def schedule_fixtures() -> dict:
    "Schedule stacks evaluated at 7 and 33 points, float64 exact."
    stacks: dict[str, r_sched.SkrampleSchedule] = {
        "Linear": r_sched.Linear(),
        "Scaled": r_sched.Scaled(),
        "ScaledB1": r_sched.Scaled(beta_scale=1),
        "ZSNR": r_sched.ZSNR(),
        "Karras(Linear)": r_sched.Karras(r_sched.Linear()),
        "Beta(Linear)": r_sched.Beta(r_sched.Linear()),
        "Exponential(Linear)": r_sched.Exponential(r_sched.Linear()),
        "Probit(Linear)": r_sched.Probit(r_sched.Linear()),
        "Hyper(Linear)": r_sched.Hyper(r_sched.Linear()),
        "Sinner(Linear)": r_sched.Sinner(r_sched.Linear()),
        "Hyper(Hyper(Linear))": r_sched.Hyper(r_sched.Hyper(r_sched.Linear())),
        "Karras(Scaled)": r_sched.Karras(r_sched.Scaled()),
        "Beta(Scaled)": r_sched.Beta(r_sched.Scaled()),
        "Exponential(Scaled)": r_sched.Exponential(r_sched.Scaled()),
        "Probit(Scaled)": r_sched.Probit(r_sched.Scaled()),
        "Hyper(Scaled)": r_sched.Hyper(r_sched.Scaled()),
        "Sinner(Scaled)": r_sched.Sinner(r_sched.Scaled()),
        "Hyper(Hyper(Scaled))": r_sched.Hyper(r_sched.Hyper(r_sched.Scaled())),
        "FlowShift(Linear)": r_sched.FlowShift(r_sched.Linear()),
        "FlowShift(Beta(ZSNR))": r_sched.FlowShift(r_sched.Beta(r_sched.ZSNR())),
        "Hyper(FlowShift(Karras(Scaled)))": r_sched.Hyper(r_sched.FlowShift(r_sched.Karras(r_sched.Scaled()))),
    }
    out = {}
    for name, schedule in stacks.items():
        out[name] = {
            "points7": schedule.points_np(np.linspace(1, 0, 7)).tolist(),
            "points33": schedule.points_np(np.linspace(1, 0, 33)).tolist(),
            "schedule11": schedule.schedule_np(11).tolist(),
        }
    return out


MEASURED_STEPS = 7
MEASURED_SEED = 42


def capture(sampler, schedule, model) -> list[float]:
    "Reference trajectory harness: scalar model x - sin(t), seeded RNG."
    samples: list[float] = []
    random.seed(MEASURED_SEED)
    adapter = (
        r_iface.StructuredFunctionalAdapter(sampler)
        if isinstance(sampler, r_struct.StructuredSampler)
        else sampler
    )
    adapter.generate_model(
        lambda x, t, s, a: x - math.sin(t),
        model,
        r_sched.Hyper(schedule),
        lambda _: random.random(),
        MEASURED_STEPS,
        callback=lambda x, i, d: samples.append(x),
    )
    return samples


def sampler_fixtures() -> dict:
    samplers: dict[str, object] = {
        "Euler": r_struct.Euler(),
        "Euler(sde)": r_struct.Euler(stochasticity=1),
        "DPM(1)": r_struct.DPM(order=1),
        "DPM(2)": r_struct.DPM(order=2),
        "DPM(3)": r_struct.DPM(order=3),
        "DPM(2,sde)": r_struct.DPM(order=2, stochasticity=1),
        "DPM(2,sde.5)": r_struct.DPM(order=2, stochasticity=0.5),
        "Adams(4)": r_struct.Adams(order=4),
        "Adams(9)": r_struct.Adams(order=9),
        "UniP(2)": r_struct.UniP(order=2),
        "UniP(3,fast)": r_struct.UniP(order=3, fast_solve=True),
        "UniPC(2)": r_struct.UniPC(order=2),
        "UniPC(3)": r_struct.UniPC(order=3),
        "UniPC(2,adams3)": r_struct.UniPC(order=2, predictor=r_struct.Adams(order=3)),
        "SPC": r_struct.SPC(),
        "SPC(pow2)": r_struct.SPC(power=2),
        "SPC(dpm2)": r_struct.SPC(predictor=r_struct.DPM(order=2)),
        "DPM(2,noderiv)": r_struct.DPM(order=2, derivative_transform=None),
        "DPM(3,velderiv)": r_struct.DPM(order=3, derivative_transform=r_models.VelocityModel()),
        "Adams(4,scalex)": r_struct.Adams(order=4, derivative_transform=r_models.ScaleX()),
        "RKUltra(2)": r_func.RKUltra(order=2, providers={2: r_func.tableaux.RKE2.Heun}),
        "RKUltra(4)": r_func.RKUltra(order=4),
        "RKUltra(8)": r_func.RKUltra(order=8),
        "RKUltra(2,sde)": r_func.RKUltra(order=2, providers={2: r_func.tableaux.RKE2.Heun}, stochasticity=1),
        "DynasauRK(2)": r_func.DynasauRK(order=2),
        "DynasauRK(3)": r_func.DynasauRK(order=3),
        "DynasauRK(4)": r_func.DynasauRK(order=4),
        "RKMoire(2)": r_func.RKMoire(order=2),
        "RKMoire(5)": r_func.RKMoire(order=5),
    }
    schedules = {"Linear": r_sched.Linear(), "Scaled": r_sched.Scaled()}
    model_types = {
        "DataModel": r_models.DataModel(),
        "FlowModel": r_models.FlowModel(),
        "VelocityModel": r_models.VelocityModel(),
    }

    out = {}
    for s_name, sampler in samplers.items():
        for sch_name, schedule in schedules.items():
            for m_name, model in model_types.items():
                key = f"{s_name}|{sch_name}|{m_name}"
                out[key] = capture(sampler, schedule, model)
    return out


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "schedules.json").write_text(json.dumps(schedule_fixtures(), indent=1))
    print("wrote schedules.json")
    (OUT / "sampler_trajectories.json").write_text(
        json.dumps({"steps": MEASURED_STEPS, "seed": MEASURED_SEED, "trajectories": sampler_fixtures()}, indent=1)
    )
    print("wrote sampler_trajectories.json")


if __name__ == "__main__":
    main()
