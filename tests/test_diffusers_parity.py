"""Parity vs real diffusers schedulers (requires the `diffusers` package —
skipped when absent; the golden fixtures pin this parity transitively).

Mirrors the reference's dual-sample strategy: run our sampler and the
diffusers scheduler side-by-side over a FixedSchedule imported from the
diffusers scheduler itself, isolating sampler math from schedule math."""

import pytest

diffusers = pytest.importorskip("diffusers")

import torch  # noqa: E402

from skrample_tpu.common import Step  # noqa: E402
from skrample_tpu.sampling.models import DiffusionModel, FlowModel, NoiseModel, VelocityModel  # noqa: E402
from skrample_tpu.sampling.structured import DPM, Euler, SKSamples, StructuredSampler, UniPC  # noqa: E402
from skrample_tpu.scheduling import FixedSchedule, FlowMatching, VariancePreserving  # noqa: E402

from diffusers.schedulers.scheduling_dpmsolver_multistep import DPMSolverMultistepScheduler  # noqa: E402
from diffusers.schedulers.scheduling_euler_ancestral_discrete import EulerAncestralDiscreteScheduler  # noqa: E402
from diffusers.schedulers.scheduling_euler_discrete import EulerDiscreteScheduler  # noqa: E402
from diffusers.schedulers.scheduling_flow_match_euler_discrete import FlowMatchEulerDiscreteScheduler  # noqa: E402
from diffusers.schedulers.scheduling_unipc_multistep import UniPCMultistepScheduler  # noqa: E402

SCALED_CONFIG = {
    "beta_end": 0.012,
    "beta_schedule": "scaled_linear",
    "beta_start": 0.00085,
    "num_train_timesteps": 1000,
    "prediction_type": "epsilon",
    "steps_offset": 1,
    "timestep_spacing": "leading",
}
FLOW_CONFIG = {
    "num_train_timesteps": 1000,
    "shift": 3.0,
    "use_dynamic_shifting": True,
    "base_shift": 0.5,
    "max_shift": 1.15,
    "base_image_seq_len": 256,
    "max_image_seq_len": 4096,
}

EPSILON, FLOW, VELOCITY = NoiseModel(), FlowModel(), VelocityModel()


def fake_model(t: torch.Tensor) -> torch.Tensor:
    t = t @ torch.randn(t.shape, generator=torch.Generator(t.device).manual_seed(-1), dtype=t.dtype)
    return t / t.std()


def dual_sample(ours: StructuredSampler, theirs, transform: DiffusionModel, steps: range, mu=None):
    our_sample = torch.zeros([1, 4, 32, 32], dtype=torch.float32)
    their_sample = our_sample.clone()
    seed = torch.manual_seed(0)
    initial_noise = torch.randn(our_sample.shape, generator=seed, dtype=our_sample.dtype)

    if isinstance(theirs, FlowMatchEulerDiscreteScheduler):
        theirs.set_timesteps(steps.stop, mu=mu)
        their_sample = theirs.scale_noise(
            sample=their_sample, timestep=theirs.timesteps[steps.start].unsqueeze(0), noise=initial_noise
        )
    else:
        theirs.set_timesteps(steps.stop)
        their_sample = theirs.add_noise(
            original_samples=their_sample, noise=initial_noise, timesteps=theirs.timesteps[steps.start].unsqueeze(0)
        )

    space = FlowMatching() if isinstance(transform, FlowModel) else VariancePreserving()
    schedule = FixedSchedule.from_regular(theirs.timesteps.numpy(), theirs.sigmas[:-1].numpy(), space)

    our_sample = ours.add_noise(our_sample, initial_noise, schedule.ipoint(steps.start / steps.stop))

    history: list[SKSamples] = []
    for step in steps:
        noise = torch.randn(our_sample.shape, generator=seed.clone_state(), dtype=our_sample.dtype)
        our_step = Step.from_int(step, steps.stop)
        our_output = fake_model(ours.scale_input(our_sample, schedule.ipoint(our_step.time_from)))
        result = ours.sample(our_sample, our_output, our_step, transform, schedule, noise, history)
        our_sample = result.final
        history.append(result)

        if isinstance(theirs, FlowMatchEulerDiscreteScheduler):
            their_output = fake_model(their_sample)
        else:
            their_output = fake_model(theirs.scale_model_input(sample=their_sample, timestep=theirs.timesteps[step]))

        from inspect import signature

        if "generator" in signature(theirs.step).parameters:
            their_sample = theirs.step(
                model_output=their_output, sample=their_sample, timestep=theirs.timesteps[step], generator=seed
            )[0]
        else:
            their_sample = theirs.step(model_output=their_output, sample=their_sample, timestep=theirs.timesteps[step])[0]

    return our_sample, their_sample


def compare(a: torch.Tensor, b: torch.Tensor, margin: float = 1e-8) -> None:
    assert a.isfinite().all() and b.isfinite().all()
    mse = (a - b).square().mean().item()
    assert mse <= margin, mse


STEP_RANGES = [range(0, 2), range(0, 11), range(3, 6), range(2, 23)]


@pytest.mark.parametrize("steps", STEP_RANGES)
@pytest.mark.parametrize(("pred", "transform"), [("epsilon", EPSILON), ("v_prediction", VELOCITY)])
def test_euler(pred, transform, steps) -> None:
    compare(
        *dual_sample(
            Euler(),
            EulerDiscreteScheduler.from_config(SCALED_CONFIG, prediction_type=pred),
            transform,
            steps,
        )
    )


@pytest.mark.parametrize("steps", STEP_RANGES)
@pytest.mark.parametrize(("pred", "transform"), [("epsilon", EPSILON), ("v_prediction", VELOCITY)])
def test_euler_ancestral(pred, transform, steps) -> None:
    compare(
        *dual_sample(
            DPM(order=1, stochasticity=True),
            EulerAncestralDiscreteScheduler.from_config(SCALED_CONFIG, prediction_type=pred),
            transform,
            steps,
        )
    )


@pytest.mark.parametrize("steps", STEP_RANGES)
def test_euler_flow(steps) -> None:
    compare(
        *dual_sample(
            Euler(), FlowMatchEulerDiscreteScheduler.from_config(FLOW_CONFIG), FLOW, steps, mu=0.7
        )
    )


@pytest.mark.parametrize("steps", STEP_RANGES)
@pytest.mark.parametrize("order", range(1, 4))
@pytest.mark.parametrize("stochastic", (False, True))
@pytest.mark.parametrize(("pred", "transform"), [("epsilon", EPSILON), ("v_prediction", VELOCITY)])
def test_dpm(pred, transform, order, stochastic, steps) -> None:
    if stochastic and order >= 3:
        return
    compare(
        *dual_sample(
            DPM(order=order, stochasticity=stochastic),
            DPMSolverMultistepScheduler.from_config(
                SCALED_CONFIG,
                algorithm_type="sde-dpmsolver++" if stochastic else "dpmsolver++",
                final_sigmas_type="zero",
                solver_order=order,
                prediction_type=pred,
            ),
            transform,
            steps,
        ),
        margin=1e-5 if order >= 3 else 1e-8,
    )


@pytest.mark.parametrize("steps", STEP_RANGES)
@pytest.mark.parametrize("order", range(1, 5))
@pytest.mark.parametrize(("pred", "transform"), [("epsilon", EPSILON), ("v_prediction", VELOCITY)])
def test_unipc(pred, transform, order, steps) -> None:
    compare(
        *dual_sample(
            UniPC(order=order, fast_solve=True),
            UniPCMultistepScheduler.from_config(
                SCALED_CONFIG, final_sigmas_type="zero", solver_order=order, prediction_type=pred
            ),
            transform,
            steps,
        ),
        margin=1e-11 * 10**order,
    )
