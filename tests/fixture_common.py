"""Shared fixture loading + the class matrices used across test modules."""

from __future__ import annotations

import json
from pathlib import Path

from skrample_tpu import scheduling
from skrample_tpu.sampling import models, structured

FIXTURES = Path(__file__).parent / "fixtures"


def load_fixture(name: str) -> dict:
    return json.loads((FIXTURES / name).read_text())


SCHEDULE_STACKS: dict[str, scheduling.SkrampleSchedule] = {
    "Linear": scheduling.Linear(),
    "Scaled": scheduling.Scaled(),
    "ScaledB1": scheduling.Scaled(beta_scale=1),
    "ZSNR": scheduling.ZSNR(),
    "Karras(Linear)": scheduling.Karras(scheduling.Linear()),
    "Beta(Linear)": scheduling.Beta(scheduling.Linear()),
    "Exponential(Linear)": scheduling.Exponential(scheduling.Linear()),
    "Probit(Linear)": scheduling.Probit(scheduling.Linear()),
    "Hyper(Linear)": scheduling.Hyper(scheduling.Linear()),
    "Sinner(Linear)": scheduling.Sinner(scheduling.Linear()),
    "Hyper(Hyper(Linear))": scheduling.Hyper(scheduling.Hyper(scheduling.Linear())),
    "Karras(Scaled)": scheduling.Karras(scheduling.Scaled()),
    "Beta(Scaled)": scheduling.Beta(scheduling.Scaled()),
    "Exponential(Scaled)": scheduling.Exponential(scheduling.Scaled()),
    "Probit(Scaled)": scheduling.Probit(scheduling.Scaled()),
    "Hyper(Scaled)": scheduling.Hyper(scheduling.Scaled()),
    "Sinner(Scaled)": scheduling.Sinner(scheduling.Scaled()),
    "Hyper(Hyper(Scaled))": scheduling.Hyper(scheduling.Hyper(scheduling.Scaled())),
    "FlowShift(Linear)": scheduling.FlowShift(scheduling.Linear()),
    "FlowShift(Beta(ZSNR))": scheduling.FlowShift(scheduling.Beta(scheduling.ZSNR())),
    "Hyper(FlowShift(Karras(Scaled)))": scheduling.Hyper(
        scheduling.FlowShift(scheduling.Karras(scheduling.Scaled()))
    ),
}

STRUCTURED_SAMPLERS: dict[str, structured.StructuredSampler] = {
    "Euler": structured.Euler(),
    "Euler(sde)": structured.Euler(stochasticity=1),
    "DPM(1)": structured.DPM(order=1),
    "DPM(2)": structured.DPM(order=2),
    "DPM(3)": structured.DPM(order=3),
    "DPM(2,sde)": structured.DPM(order=2, stochasticity=1),
    "DPM(2,sde.5)": structured.DPM(order=2, stochasticity=0.5),
    "Adams(4)": structured.Adams(order=4),
    "Adams(9)": structured.Adams(order=9),
    "UniP(2)": structured.UniP(order=2),
    "UniP(3,fast)": structured.UniP(order=3, fast_solve=True),
    "UniPC(2)": structured.UniPC(order=2),
    "UniPC(3)": structured.UniPC(order=3),
    "UniPC(2,adams3)": structured.UniPC(order=2, predictor=structured.Adams(order=3)),
    "SPC": structured.SPC(),
    "SPC(pow2)": structured.SPC(power=2),
    "SPC(dpm2)": structured.SPC(predictor=structured.DPM(order=2)),
    "DPM(2,noderiv)": structured.DPM(order=2, derivative_transform=None),
    "DPM(3,velderiv)": structured.DPM(order=3, derivative_transform=models.VelocityModel()),
    "Adams(4,scalex)": structured.Adams(order=4, derivative_transform=models.ScaleX()),
}

MODEL_TYPES: dict[str, models.DiffusionModel] = {
    "DataModel": models.DataModel(),
    "NoiseModel": models.NoiseModel(),
    "FlowModel": models.FlowModel(),
    "VelocityModel": models.VelocityModel(),
}

ALL_STRUCTURED: list[type[structured.StructuredSampler]] = [
    structured.Adams,
    structured.DPM,
    structured.Euler,
    structured.SPC,
    structured.UniPC,
    structured.UniP,
]

ALL_SCHEDULES: list[type[scheduling.ScheduleCommon]] = [scheduling.Linear, scheduling.Scaled]

ALL_MODIFIERS: list[type] = [
    scheduling.NoSub,
    scheduling.NoMod,
    scheduling.Beta,
    scheduling.FlowShift,
    scheduling.Karras,
    scheduling.Exponential,
    scheduling.Probit,
    scheduling.Hyper,
    scheduling.Sinner,
]
