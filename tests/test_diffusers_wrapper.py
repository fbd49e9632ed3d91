"""Diffusers-compat wrapper: config import equivalences (against raw config
dicts — the diffusers package is not needed), wrapper-vs-functional loop
parity, the compiled-FMA fast path vs the polymorphic fallback, the
inside-out RK wrappers, and Brownian noise threading."""

import itertools
import math
import random

import numpy as np
import pytest
import torch

from skrample_tpu import scheduling
from skrample_tpu.common import Point, Step
from skrample_tpu.diffusers import (
    DIFFUSERS_CLASS_MAP,
    DynasauRKWrapperScheduler,
    RKUltraWrapperScheduler,
    SkrampleWrapperScheduler,
    parse_diffusers_config,
)
from skrample_tpu.noise import Brownian
from skrample_tpu.sampling import models, structured
from skrample_tpu.sampling.models import FlowModel, NoiseModel, VelocityModel

FLOW_CONFIG = {
    "_class_name": "FlowMatchEulerDiscreteScheduler",
    "base_image_seq_len": 256,
    "base_shift": 0.5,
    "max_image_seq_len": 4096,
    "max_shift": 1.15,
    "num_train_timesteps": 1000,
    "shift": 3.0,
    "use_dynamic_shifting": True,
}
SCALED_CONFIG = {
    "_class_name": "EulerDiscreteScheduler",
    "beta_end": 0.012,
    "beta_schedule": "scaled_linear",
    "beta_start": 0.00085,
    "clip_sample": False,
    "num_train_timesteps": 1000,
    "prediction_type": "epsilon",
    "steps_offset": 1,
    "timestep_spacing": "leading",
    "trained_betas": None,
    "use_karras_sigmas": False,
}


def assert_wrapper(expected: SkrampleWrapperScheduler, config: dict) -> None:
    built = SkrampleWrapperScheduler.from_diffusers_config(config)
    expected.fake_config = built.fake_config
    assert expected.sampler == built.sampler
    assert expected.schedule == built.schedule
    assert expected.model == built.model


@pytest.mark.parametrize(
    ("flag", "mod", "algo", "noise", "dfpred", "skpred", "order"),
    [
        (flag, mod, algo, noise, dfpred, skpred, order)
        for (flag, mod), (algo, noise), (dfpred, skpred), order in itertools.product(
            [
                ("lower_order_final", None),
                ("use_karras_sigmas", scheduling.Karras),
                ("use_exponential_sigmas", scheduling.Exponential),
                ("use_beta_sigmas", scheduling.Beta),
            ],
            [("dpmsolver", False), ("dpmsolver++", False), ("sde-dpmsolver", True), ("sde-dpmsolver++", True)],
            [("epsilon", NoiseModel()), ("v_prediction", VelocityModel())],
            range(1, 4),
        )
    ],
)
def test_dpm_config(flag, mod, algo, noise, dfpred, skpred, order) -> None:
    config = SCALED_CONFIG | {
        "_class_name": "DPMSolverMultistepScheduler",
        "prediction_type": dfpred,
        "solver_order": order,
        "algorithm_type": algo,
        flag: True,
    }
    assert_wrapper(
        SkrampleWrapperScheduler(
            structured.DPM(stochasticity=noise, order=order),
            mod(scheduling.Scaled()) if mod else scheduling.Scaled(),
            skpred,
        ),
        config,
    )


def test_dpm_flow_config() -> None:
    assert_wrapper(
        SkrampleWrapperScheduler(
            structured.DPM(order=2), scheduling.FlowShift(scheduling.Linear()), FlowModel()
        ),
        FLOW_CONFIG | {"_class_name": "DPMSolverMultistepScheduler", "flow_shift": 3.0},
    )


def test_euler_config() -> None:
    assert_wrapper(SkrampleWrapperScheduler(structured.Euler(), scheduling.Scaled()), SCALED_CONFIG)


def test_euler_ancestral_config() -> None:
    assert_wrapper(
        SkrampleWrapperScheduler(structured.DPM(order=1, stochasticity=True), scheduling.Scaled()),
        SCALED_CONFIG | {"_class_name": "EulerAncestralDiscreteScheduler"},
    )


def test_euler_flow_config() -> None:
    assert_wrapper(
        SkrampleWrapperScheduler(structured.Euler(), scheduling.FlowShift(scheduling.Linear()), FlowModel()),
        FLOW_CONFIG,
    )


def test_ipndm_config() -> None:
    assert_wrapper(
        SkrampleWrapperScheduler(structured.Adams(order=4), scheduling.Scaled()),
        SCALED_CONFIG | {"_class_name": "IPNDMScheduler"},
    )


def test_unipc_config() -> None:
    assert_wrapper(
        SkrampleWrapperScheduler(structured.UniPC(order=2), scheduling.Scaled()),
        SCALED_CONFIG | {"_class_name": "UniPCMultistepScheduler", "solver_order": 2},
    )


def test_zsnr_config() -> None:
    assert_wrapper(
        SkrampleWrapperScheduler(structured.Euler(), scheduling.ZSNR(), VelocityModel()),
        SCALED_CONFIG | {"rescale_betas_zero_snr": True, "prediction_type": "v_prediction"},
    )


@pytest.mark.parametrize(
    ("karras", "exp", "beta", "subschedule"),
    [
        (True, True, True, scheduling.Karras),
        (False, True, True, scheduling.Exponential),
        (True, False, True, scheduling.Karras),
        (True, True, False, scheduling.Karras),
        (True, False, False, scheduling.Karras),
        (False, True, False, scheduling.Exponential),
        (False, False, True, scheduling.Beta),
        (False, False, False, None),
    ],
)
def test_subschedule_priority_vp(karras, exp, beta, subschedule) -> None:
    config = SCALED_CONFIG | {
        "_class_name": "DPMSolverMultistepScheduler",
        "use_karras_sigmas": karras,
        "use_exponential_sigmas": exp,
        "use_beta_sigmas": beta,
        "use_flow_sigmas": False,
        "flow_shift": 3,
    }
    assert_wrapper(
        SkrampleWrapperScheduler(
            structured.DPM(), scheduling.Scaled() if subschedule is None else subschedule(scheduling.Scaled())
        ),
        config,
    )


@pytest.mark.parametrize(
    ("karras", "exp", "beta", "subschedule"),
    [
        # flow sigmas override karras/exponential (Cosmos quirk) but not beta
        (True, True, True, scheduling.FlowShift),
        (False, True, True, scheduling.FlowShift),
        (True, False, True, scheduling.FlowShift),
        (True, True, False, scheduling.FlowShift),
        (True, False, False, scheduling.FlowShift),
        (False, True, False, scheduling.FlowShift),
        (False, False, True, scheduling.Beta),
        (False, False, False, scheduling.FlowShift),
    ],
)
def test_subschedule_priority_fm(karras, exp, beta, subschedule) -> None:
    config = FLOW_CONFIG | {
        "_class_name": "DPMSolverMultistepScheduler",
        "use_karras_sigmas": karras,
        "use_exponential_sigmas": exp,
        "use_beta_sigmas": beta,
        "use_flow_sigmas": True,
        "flow_shift": 3,
    }
    assert_wrapper(
        SkrampleWrapperScheduler(structured.DPM(), subschedule(scheduling.Linear()), FlowModel()),
        config,
    )


def test_class_map_instantiable() -> None:
    for cls, props in DIFFUSERS_CLASS_MAP.values():
        cls(**props)


def test_parse_defaults_to_dpm() -> None:
    parsed = parse_diffusers_config({"_class_name": "SomethingUnknownScheduler"})
    assert parsed.sampler is structured.DPM


def test_mu_hotswap() -> None:
    mu = 1.2345
    a = SkrampleWrapperScheduler(
        structured.DPM(), scheduling.Hyper(scheduling.FlowShift(scheduling.Hyper(scheduling.Linear())))
    )
    b = SkrampleWrapperScheduler(
        structured.DPM(),
        scheduling.Hyper(scheduling.FlowShift(scheduling.Hyper(scheduling.Linear()), shift=math.exp(mu))),
    )
    a.set_timesteps(123, mu=mu)
    assert a.schedule == b.schedule


def drive_wrapper(wrapper, steps: int, seed: int = 0, shape=(1, 4, 8, 8)) -> torch.Tensor:
    "Run the wrapper exactly the way a diffusers pipeline would."
    generator = torch.Generator().manual_seed(42)
    torch.manual_seed(seed)
    wrapper.set_timesteps(steps)
    sample = torch.randn(shape, dtype=torch.float64)
    model_seed = torch.Generator().manual_seed(-7)

    for t in wrapper.timesteps:
        output = sample * 0.9 + torch.randn(shape, generator=model_seed.clone_state(), dtype=torch.float64) * 0.05
        sample = wrapper.step(output, t, sample, generator=generator, return_dict=False)[0]
    return sample


@pytest.mark.parametrize(
    ("sampler", "schedule", "model"),
    [
        (structured.Euler(), scheduling.Scaled(), NoiseModel()),
        (structured.DPM(order=2), scheduling.FlowShift(scheduling.Linear()), FlowModel()),
        (structured.DPM(order=3, stochasticity=1), scheduling.Scaled(), VelocityModel()),
        (structured.UniPC(order=2), scheduling.Karras(scheduling.Scaled()), NoiseModel()),
        (structured.UniPC(order=3, stochasticity=1), scheduling.Linear(), FlowModel()),
        (structured.Adams(order=4), scheduling.Scaled(), NoiseModel()),
        (structured.SPC(), scheduling.Linear(), FlowModel()),
    ],
    ids=str,
)
def test_compiled_path_equals_fallback(sampler, schedule, model) -> None:
    "The table-compiled FMA step must equal the polymorphic sampler exactly."
    steps = 9
    kwargs = dict(sampler=sampler, schedule=schedule, model=model, compute_scale=torch.float64)

    fast = SkrampleWrapperScheduler(**kwargs)
    result_fast = drive_wrapper(fast, steps)

    slow = SkrampleWrapperScheduler(**kwargs)
    slow._ensure_compiled = lambda start: None  # force the polymorphic path
    result_slow = drive_wrapper(slow, steps)

    np.testing.assert_allclose(result_fast.numpy(), result_slow.numpy(), rtol=1e-12, atol=1e-12)


def test_wrapper_matches_functional() -> None:
    "Wrapper-driven loop == functional adapter loop for a deterministic sampler."
    steps = 8
    wrapper = SkrampleWrapperScheduler(
        structured.DPM(order=2),
        scheduling.FlowShift(scheduling.Linear()),
        FlowModel(),
        compute_scale=torch.float64,
    )
    wrapper.set_timesteps(steps)

    def model(x, t, s, a):
        return x * 0.8 + math.sin(t / 100) * 0.1

    sample0 = torch.full([1, 4], 1.5, dtype=torch.float64)
    expected = wrapper.functional_sample_model(sample0.clone(), model, steps)

    sample = sample0.clone()
    for n, t in enumerate(wrapper.timesteps):
        point = Point(*wrapper.schedule_np[n])
        sample = wrapper.step(model(sample, *point), t, sample, return_dict=False)[0]

    np.testing.assert_allclose(sample.numpy(), expected.numpy(), rtol=1e-12, atol=1e-12)


def test_wrapper_sigmas_surface() -> None:
    wrapper = SkrampleWrapperScheduler(structured.Euler(), scheduling.Scaled())
    wrapper.set_timesteps(10)
    assert len(wrapper.timesteps) == 10
    assert len(wrapper.sigmas) == 11
    assert wrapper.sigmas[-1] == 0
    assert wrapper.order == 1
    assert wrapper.init_noise_sigma == 1
    config = wrapper.config
    assert config["num_train_timesteps"] == 1000
    assert config.num_train_timesteps == 1000  # attr duck-type


@pytest.mark.parametrize(
    ("wrapper_cls", "model", "transform", "schedule", "order", "stochasticity"),
    [
        (w, m, t, s, o, n)
        for w, m, t, s, o, n in itertools.product(
            [RKUltraWrapperScheduler, DynasauRKWrapperScheduler],
            [models.DataModel, models.FlowModel],
            [None, models.DataModel, models.VelocityModel, models.ScaleX],
            [scheduling.Sinner(scheduling.Linear()), scheduling.Scaled()],
            [0, 2, 3, 4, 99],
            [0, 1],
        )
        # thin: full order sweep on one config, spot checks elsewhere
        if (m is models.FlowModel and t is models.DataModel and n == 0)
        or (o == 3 and isinstance(s, scheduling.Scaled))
    ],
)
def test_rk_wrapper_inside_out(wrapper_cls, model, transform, schedule, order, stochasticity) -> None:
    """The inside-out RK wrapper must reproduce the functional sampler's
    trajectory point-by-point and bit-for-bit at the end."""
    samples_ref: list[float] = []
    points_ref: list[Point] = []
    samples_wrap: list[float] = []
    points_wrap: list[Point] = []

    def fake_model(x: float, _t: float, s: float, _a: float) -> float:
        return x + math.sin(x) * s

    def model_ref(x, t, s, a):
        samples_ref.append(x)
        points_ref.append(Point(t, s, a))
        return fake_model(x, t, s, a)

    def model_wrap(x, t, s, a):
        samples_wrap.append(x)
        points_wrap.append(Point(t, s, a))
        return fake_model(x, t, s, a)

    wrapper = wrapper_cls(
        schedule,
        sampler_order=order,
        stochasticity=stochasticity,
        model=model(),
        derivative_transform=transform() if transform else None,
        compute_scale=torch.float64,
    )

    rng = random.Random(1234)
    steps = rng.randint(5, 20)
    data_init = 1 / (rng.random() + 1e-4) * (rng.randint(0, 1) * 2 - 1)

    generator = torch.Generator().manual_seed(42)
    # identical independent stream for the functional reference: the wrapper
    # draws its noise from `generator`'s stream via torch_noise.Random
    generator_rng = generator.clone_state()

    wrapper.set_timesteps(steps)

    if stochasticity:
        rng_fn = lambda s: torch.randn([1], generator=generator_rng).item()  # noqa: E731
    else:
        rng_fn = None

    data_ref = wrapper.functional_sample_model(data_init, model_ref, steps, rng=rng_fn)

    data_wrap: float = data_init
    for n, (t, s) in enumerate(zip(wrapper.timesteps, wrapper.sigmas)):
        output = model_wrap(data_wrap, t.item(), *(x.item() for x in wrapper.schedule.space.normalize(s.item())))

        np.testing.assert_allclose(points_wrap[n], points_ref[n], rtol=0, atol=1e-15)
        assert abs(samples_ref[n] - samples_wrap[n]) < 1e-8

        data_wrap = (
            wrapper.step(
                torch.tensor(output, dtype=torch.float64).unsqueeze(0),
                t,
                torch.tensor(data_wrap, dtype=torch.float64).unsqueeze(0),
                generator=generator,
                return_dict=False,
            )[0]
            .squeeze(0)
            .item()
        )

    assert abs(data_ref - data_wrap) < 1e-8


@pytest.mark.parametrize("schedule", [scheduling.Sinner(scheduling.Linear()), scheduling.Scaled()], ids=str)
def test_wrapper_brownian(schedule) -> None:
    wrapper = SkrampleWrapperScheduler(
        sampler=structured.Euler(stochasticity=1),
        schedule=schedule,
        model=models.DataModel(),
        compute_scale=torch.float64,
        noise_type=Brownian,
    )
    generator = torch.Generator().manual_seed(42)
    steps, begin = 11, 5
    wrapper.set_timesteps(steps)
    wrapper.set_begin_index(begin)

    for t in wrapper.timesteps[begin:]:
        wrapper.step(
            torch.randn([1, 16, 32], dtype=torch.float64),
            t,
            torch.randn([1, 16, 32], dtype=torch.float64),
            return_dict=False,
            generator=generator,
        )

    assert wrapper._noise_generator is not None
    assert len(wrapper._noise_generator.generators) == 1
    assert isinstance(wrapper._noise_generator.generators[0], Brownian)


def test_rku_brownian() -> None:
    wrapper = RKUltraWrapperScheduler(
        schedule=scheduling.Scaled(),
        sampler_order=4,
        stochasticity=1,
        model=models.DataModel(),
        compute_scale=torch.float64,
        noise_type=Brownian,
    )
    generator = torch.Generator().manual_seed(42)
    wrapper.set_timesteps(10)
    begin = 1 * wrapper.order
    wrapper.set_begin_index(begin)

    for t in wrapper.timesteps[begin:]:
        wrapper.step(
            torch.randn([1, 16, 32], dtype=torch.float64),
            t,
            torch.randn([1, 16, 32], dtype=torch.float64),
            return_dict=False,
            generator=generator,
        )

    assert wrapper._noise_generator is not None
    assert isinstance(wrapper._noise_generator.generators[0], Brownian)


def test_scale_noise_img2img() -> None:
    wrapper = SkrampleWrapperScheduler(structured.Euler(), scheduling.Scaled(), compute_scale=torch.float64)
    wrapper.set_timesteps(10)
    sample = torch.randn([1, 4, 4], dtype=torch.float64)
    noise = torch.randn([1, 4, 4], dtype=torch.float64)
    t = wrapper.timesteps[3]
    noised = wrapper.add_noise(sample, noise, t.unsqueeze(0))
    point = Point(*wrapper.schedule_np[3])
    expected = sample * point.alpha + noise * point.sigma
    np.testing.assert_allclose(noised.numpy(), expected.numpy())


def test_wrapper_edge_probes():
    "Codified /verify probes: error surfaces and degenerate configurations."
    import pytest as _pytest
    import torch

    from skrample_tpu import scheduling
    from skrample_tpu.diffusers import SkrampleWrapperScheduler
    from skrample_tpu.sampling import models, structured

    w = SkrampleWrapperScheduler(
        sampler=structured.DPM(order=2),
        schedule=scheduling.FlowShift(scheduling.Linear()),
        model=models.FlowModel(),
    )

    # set_timesteps with no arguments is a silent no-op (reference parity)
    w.set_timesteps()
    assert w._steps == 50

    # a timestep not in the schedule raises a KeyError naming it
    w.set_timesteps(8)
    latent = torch.zeros(1, 4, 8, 8)
    with _pytest.raises(KeyError):
        w.step(latent, 123456.0, latent)

    # steps=1 with a high-order sampler ramps down and stays finite
    w2 = SkrampleWrapperScheduler(
        sampler=structured.UniPC(order=3),
        schedule=scheduling.FlowShift(scheduling.Linear()),
        model=models.FlowModel(),
    )
    w2.set_timesteps(1)
    x = torch.full((1, 4, 8, 8), 0.5)
    out = w2.step(x * 0.1, w2.timesteps[0], x).prev_sample
    assert torch.isfinite(out).all()

    # non-affine SPC(power=2) transparently uses the polymorphic fallback
    w3 = SkrampleWrapperScheduler(
        sampler=structured.SPC(power=2),
        schedule=scheduling.FlowShift(scheduling.Linear()),
        model=models.FlowModel(),
    )
    w3.set_timesteps(4)
    x = torch.full((1, 4, 8, 8), 0.3)
    for t in w3.timesteps:
        x = w3.step(x * 0.2, t, x).prev_sample
    assert w3._compile_failed  # the compiler rejected it; fallback ran


def test_wrapper_state_checkpoint_resume():
    "Mid-trajectory preemption: save state, rebuild the wrapper, resume identically."
    import torch

    from skrample_tpu import scheduling
    from skrample_tpu.diffusers import SkrampleWrapperScheduler
    from skrample_tpu.sampling import models, structured

    def make():
        w = SkrampleWrapperScheduler(
            sampler=structured.DPM(order=2),
            schedule=scheduling.FlowShift(scheduling.Linear()),
            model=models.FlowModel(),
            compute_scale=torch.float64,
        )
        w.set_timesteps(10)
        return w

    def model_out(x, t):
        return x * 0.8 + float(t) * 1e-4

    # uninterrupted run
    w_full = make()
    x = torch.full((1, 4, 8, 8), 0.5, dtype=torch.float64)
    for t in w_full.timesteps:
        x = w_full.step(model_out(x, t), t, x).prev_sample
    expected = x

    # interrupted at step 4, state carried to a fresh wrapper
    w_a = make()
    x = torch.full((1, 4, 8, 8), 0.5, dtype=torch.float64)
    for t in w_a.timesteps[:4]:
        x = w_a.step(model_out(x, t), t, x).prev_sample
    state = w_a.state_dict()

    w_b = make()
    w_b.load_state_dict(state)
    for t in w_b.timesteps[4:]:
        x = w_b.step(model_out(x, t), t, x).prev_sample

    torch.testing.assert_close(x, expected, rtol=0, atol=0)

    # mismatched step counts are rejected
    w_c = make()
    w_c.set_timesteps(7)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        w_c.load_state_dict(state)


def test_rk_wrapper_state_checkpoint_resume():
    "RK inside-out state survives preemption BETWEEN stages."
    import torch

    from skrample_tpu import scheduling
    from skrample_tpu.diffusers import RKUltraWrapperScheduler
    from skrample_tpu.sampling import models

    def make():
        w = RKUltraWrapperScheduler(
            schedule=scheduling.FlowShift(scheduling.Linear()),
            sampler_order=2,
            model=models.FlowModel(),
            compute_scale=torch.float64,
        )
        w.set_timesteps(4)
        return w

    def model_out(x, t):
        return x * 0.7 + float(t) * 1e-4

    w_full = make()
    x = torch.full((1, 4, 8, 8), 0.5, dtype=torch.float64)
    for t in w_full.timesteps:
        x = w_full.step(model_out(x, t), t, x).prev_sample
    expected = x

    # interrupt mid-RK-step (after 3 presented timesteps = 1.5 RK steps)
    w_a = make()
    x = torch.full((1, 4, 8, 8), 0.5, dtype=torch.float64)
    for t in w_a.timesteps[:3]:
        x = w_a.step(model_out(x, t), t, x).prev_sample
    state = w_a.state_dict()
    assert state["derivatives"], "must capture a half-completed RK step"

    w_b = make()
    w_b.load_state_dict(state)
    for t in w_b.timesteps[3:]:
        x = w_b.step(model_out(x, t), t, x).prev_sample

    torch.testing.assert_close(x, expected, rtol=0, atol=0)
