"""Sampler layer: golden trajectory parity with the reference plus the
behavioral property suite (round trips, history/noise requirements,
Euler-Maruyama equivalence, adapter equivalence, type polymorphism)."""

import itertools
import math
import random
from dataclasses import replace

import numpy as np
import pytest
import torch

from fixture_common import ALL_STRUCTURED, MODEL_TYPES, STRUCTURED_SAMPLERS, load_fixture
from skrample_tpu import scheduling
from skrample_tpu.common import DeltaPoint, Point, Step
from skrample_tpu.sampling import functional, interface, models, structured, tableaux, traits

GOLDEN = load_fixture("sampler_trajectories.json")
MEASURED_STEPS = GOLDEN["steps"]
MEASURED_SEED = GOLDEN["seed"]

FUNCTIONAL_SAMPLERS: dict[str, functional.FunctionalSampler] = {
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

SCHEDULES = {"Linear": scheduling.Linear(), "Scaled": scheduling.Scaled()}


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


@pytest.mark.parametrize("key", sorted(GOLDEN["trajectories"].keys()))
def test_golden_trajectory(key: str) -> None:
    s_name, sch_name, m_name = key.split("|")
    sampler = STRUCTURED_SAMPLERS.get(s_name) or FUNCTIONAL_SAMPLERS[s_name]
    mine = capture(sampler, SCHEDULES[sch_name], MODEL_TYPES[m_name])
    ref = GOLDEN["trajectories"][key]
    np.testing.assert_allclose(mine, ref, rtol=1e-9, atol=1e-12, err_msg=key)


@pytest.mark.parametrize(
    ("model_type", "schedule", "eta"),
    itertools.product(MODEL_TYPES.values(), [scheduling.Linear, scheduling.Scaled], [-1.5, 0, 0.5, 1]),
)
def test_model_transform_roundtrip(model_type, schedule, eta: float) -> None:
    transform = model_type
    sample, output, noise = 0.8, 0.3, 0.6
    point_from = schedule().point(0.6)

    x = transform.to_x(sample, output, point_from)
    assert abs(output - transform.from_x(sample, x, point_from)) < 1e-12

    for t_next in (0.05, 0):  # include 0 to validate the X-hat consistency
        delta = DeltaPoint(point_from, schedule().point(t_next))
        forward = transform.forward(sample, output, delta, noise, eta)
        forward_x = models.DataModel().forward(sample, x, delta, noise, eta)
        assert abs(forward - forward_x) < 1e-12
        assert abs(output - transform.backward(sample, forward, delta, noise, eta)) < 1e-12


@pytest.mark.parametrize(
    ("model_from", "model_to", "schedule", "t_to"),
    itertools.product(
        MODEL_TYPES.values(),
        [*MODEL_TYPES.values(), models.ScaleX()],
        [scheduling.Linear, scheduling.Scaled],
        (0.05, 0.0),
    ),
)
def test_model_convert(model_from, model_to, schedule, t_to: float) -> None:
    convert = models.ModelConvert(model_from, model_to)
    sample, output = 0.8, 0.3
    delta = DeltaPoint(schedule().point(0.2), schedule().point(t_to))

    def model(x, t, s, a):
        return output

    x_direct = convert.transform_from.forward(sample, model(sample, *delta.point_from), delta)
    x_converted = convert.transform_to.forward(sample, convert.wrap_model_call(model)(sample, *delta.point_from), delta)
    assert abs(x_direct - x_converted) < 1e-12


@pytest.mark.parametrize(
    ("sigma", "alpha", "sample", "noise"),
    itertools.product([1, 0.65, 0], [1, 0.35, 0], [-1.5, 0, 0.5, 1.5], [-1.5, 0, 0.5, 1.5]),
)
def test_point_noise_roundtrip(sigma, alpha, sample, noise) -> None:
    point = Point(sigma, sigma, alpha)
    noisy = point.add_noise(sample, noise)
    clean = point.remove_noise(noisy, noise)
    if alpha != 0:
        assert abs(sample - clean) < 1e-15
    else:
        assert abs(noisy - clean) < 1e-15


@pytest.mark.parametrize(
    ("sampler", "schedule"),
    itertools.product(
        [
            *(cls() for cls in ALL_STRUCTURED),
            *(cls(order=cls.max_order()) for cls in ALL_STRUCTURED if issubclass(cls, structured.StructuredMultistep)),
        ],
        [scheduling.Scaled(), scheduling.FlowShift(scheduling.Linear())],
    ),
)
def test_type_polymorphism(sampler, schedule) -> None:
    "Float / numpy f64 / torch f64 must agree to 1e-12."
    eps = 1e-12
    rng = random.Random(3)
    i, o, n = rng.random(), rng.random(), rng.random()
    step = Step.from_int(4, 10)
    prev = [
        structured.SKSamples(
            rng.random(),
            rng.random(),
            Step((a := rng.random()), a * 2),
            rng.random(),
            rng.random(),
        )
        for _ in range(9)
    ]

    scalar = sampler.sample(i, o, step, models.DataModel(), schedule, n, previous=prev).final
    ndarr = sampler.sample(
        np.array([i], dtype=np.float64),
        np.array([o], dtype=np.float64),
        step,
        models.DataModel(),
        schedule,
        np.array([o], dtype=np.float64),
        previous=prev,
    ).final.item()
    tensor = sampler.sample(
        torch.tensor([i], dtype=torch.float64),
        torch.tensor([o], dtype=torch.float64),
        step,
        models.DataModel(),
        schedule,
        torch.tensor([n], dtype=torch.float64),
        previous=prev,
    ).final.item()

    assert abs(tensor - scalar) < eps
    assert abs(tensor - ndarr) < eps
    assert abs(scalar - ndarr) < eps


def _order_sweep() -> list[structured.StructuredSampler]:
    out: list[structured.StructuredSampler] = []
    for cls in ALL_STRUCTURED:
        if issubclass(cls, structured.StructuredMultistep):
            out.extend(cls(order=o + 1) for o in range(cls.min_order(), cls.max_order()))
        else:
            out.append(cls())
    out.extend(
        structured.UniPC(order=o1, predictor=structured.Adams(order=o2)) for o1 in range(1, 4) for o2 in range(1, 4)
    )
    out.extend(
        structured.SPC(predictor=structured.Adams(order=o1), corrector=structured.Adams(order=o2))
        for o1 in range(1, 4)
        for o2 in range(1, 4)
    )
    return out


@pytest.mark.parametrize("sampler", _order_sweep())
def test_require_previous_sufficient(sampler) -> None:
    "Truncating history to require_previous must not change the result."
    sample, prediction = 1.5, 0.5
    previous = tuple(
        structured.SKSamples(n / 2, n * 2, Step.from_int(n, 100), 1 / (n + 1), n * 1.5) for n in range(100)
    )

    full = sampler.sample(sample, prediction, Step.from_int(31, 100), models.DataModel(), scheduling.Linear(), None, previous)
    trimmed = sampler.sample(
        sample,
        prediction,
        Step.from_int(31, 100),
        models.DataModel(),
        scheduling.Linear(),
        None,
        previous[len(previous) - sampler.require_previous :],
    )
    assert full == trimmed


def _stochastic_sweep() -> list[structured.StructuredSampler]:
    out: list[structured.StructuredSampler] = []
    for cls in ALL_STRUCTURED:
        if issubclass(cls, traits.Stochastic):
            out.extend(cls(stochasticity=n) for n in [-1, 0, 0.1, 1])
        else:
            out.append(cls())
    out.extend(structured.UniPC(predictor=structured.DPM(stochasticity=n)) for n in (0, 1))
    out.extend(
        structured.SPC(predictor=structured.DPM(stochasticity=n1), corrector=structured.DPM(stochasticity=n2))
        for n1 in (0, 1)
        for n2 in (0, 1)
    )
    return out


@pytest.mark.parametrize("sampler", _stochastic_sweep())
def test_require_noise_flag(sampler) -> None:
    "Noise affects the output exactly when require_noise is set."
    sample, prediction, noise = 1.5, 0.5, -0.5
    step = 31
    previous = tuple(
        structured.SKSamples(n / 2, n * 2, Step.from_int(n, 100), 1 / (n + 1), n * 1.5) for n in range(step)
    )

    with_noise = sampler.sample(
        sample, prediction, Step.from_int(step, 100), models.DataModel(), scheduling.Linear(), noise, previous
    )
    without = sampler.sample(
        sample,
        prediction,
        Step.from_int(step, 100),
        models.DataModel(),
        scheduling.Linear(),
        None,
        [replace(p, noise=None) for p in previous],
    )
    without = replace(without, noise=with_noise.noise)
    assert (with_noise == without) ^ sampler.require_noise


@pytest.mark.parametrize(
    ("model", "schedule", "noise"),
    itertools.product(
        MODEL_TYPES.values(),
        [scheduling.Sinner(scheduling.Linear()), scheduling.Scaled()],
        [False, True],
    ),
)
def test_dpm1_equals_maruyama(model, schedule, noise: bool) -> None:
    "DPM(order=1, SDE) must track Euler-Maruyama exactly."
    if isinstance(model, models.NoiseModel) and isinstance(schedule.space, scheduling.FlowMatching):
        return  # epsilon over complement sigma=1 divides by zero

    dpm = interface.StructuredFunctionalAdapter(structured.DPM(order=1, stochasticity=noise))
    maru = interface.StructuredFunctionalAdapter(structured.Euler(stochasticity=int(noise)))

    def fake_model(x, _t, s, _a):
        return x + math.sin(x) * s

    rng = random.Random(17)
    steps = rng.randint(5, 51)
    data_init = 1 / (rng.random() + 1e-4) * (rng.randint(0, 1) * 2 - 1)

    random.seed(0)
    data_dpm = dpm.sample_model(data_init, fake_model, model, schedule, steps, rng=lambda _: random.random())
    random.seed(0)
    data_maru = maru.sample_model(data_init, fake_model, model, schedule, steps, rng=lambda _: random.random())

    assert abs(data_dpm - data_maru) < 1e-12


@pytest.mark.parametrize(
    ("sampler", "schedule", "steps"),
    itertools.product(
        [structured.DPM(o, n) for o in range(1, 4) for n in [False, True]],
        [scheduling.Linear(), scheduling.Scaled()],
        [1, 3, 4, 9, 512],
    ),
)
def test_functional_adapter_equivalence(sampler, schedule, steps: int) -> None:
    "Adapter loop must equal the hand-rolled structured loop exactly."

    def fake_model(x, _t, s, _a):
        return x + math.sin(x) * s

    sample = 1.5
    adapter = interface.StructuredFunctionalAdapter(sampler)
    noise = [random.Random(5).random() for _ in range(steps)]

    rng = iter(noise)
    transform = models.FlowModel()
    sample_f = adapter.sample_model(sample, fake_model, transform, schedule, steps, rng=lambda _: next(rng))

    rng = iter(noise)
    table = schedule.schedule(steps)
    sample_s = sample
    previous: list[structured.SKSamples[float]] = []
    for n, (t, s, a) in enumerate(table):
        result = sampler.sample(
            sample_s,
            fake_model(sample_s, t, s, a),
            Step.from_int(n, len(table)),
            transform,
            schedule,
            next(rng),
            previous,
        )
        previous.append(result)
        sample_s = result.final

    assert sample_s == sample_f
