"""Parity vs independently-written discrete scheduler oracles.

This is the executable replacement for the reference's diffusers-dependent
parity tier (``diffusers`` cannot be installed in this environment): the
oracles in :mod:`discrete_oracles` implement the same published algorithms
the diffusers schedulers do — discrete cumprod tables, Euler / ancestral /
Heun / DPM-Solver++(2M) updates — written from the papers, not from this
library's code.

Tiers mirrored from the reference suite:
  * schedule tables vs the discrete grids (0.5-2%, continuous-vs-discrete),
  * the dual-sample harness over a FixedSchedule imported from the oracle
    grid (isolating sampler math from schedule math) at MSE <= 1e-8,
  * the wrapper driven like a pipeline loop vs the oracle trajectory.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
import torch

import discrete_oracles as oracle
from skrample_tpu import scheduling
from skrample_tpu.diffusers import SkrampleWrapperScheduler
from skrample_tpu.sampling import interface, models, structured

RNG = np.random.default_rng(42)
SHAPE = (2, 4, 8, 8)


def pseudo_eps(x: np.ndarray, timestep: float) -> np.ndarray:
    "Deterministic stand-in model: smooth in x and t, epsilon-prediction."
    return 0.8 * x + math.sin(timestep / 300.0) * 0.3


def fixed_vp_schedule(timesteps: np.ndarray, sigmas: np.ndarray) -> scheduling.FixedSchedule:
    return scheduling.FixedSchedule.from_regular(timesteps, sigmas, scheduling.VariancePreserving())


def run_structured(sampler, schedule, transform, timesteps, x0, noises=None):
    "Drive a structured sampler over the oracle grid via the adapter."
    steps = len(timesteps)
    draws = iter(noises if noises is not None else [])

    def model(x, t, s, a):
        return pseudo_eps(x, t)

    rng = (lambda _step: next(draws)) if noises is not None else None
    return interface.StructuredFunctionalAdapter(sampler).sample_model(
        x0.copy(), model, transform, schedule, steps, rng=rng
    )


# =============================================================================
# Tier 1: schedule tables vs the discrete grids
# =============================================================================


@pytest.mark.parametrize("steps", range(2, 12))
def test_scaled_sigma_table_vs_discrete(steps: int) -> None:
    "Continuous Scaled closed form vs the discrete cumprod grid, <= 1%."
    t_oracle, s_oracle = oracle.euler_discrete_grid(steps)
    mine = scheduling.Scaled().schedule_np(steps)
    my_regular = scheduling.VariancePreserving().regularize(mine[:, 1])

    np.testing.assert_allclose(mine[:, 0], t_oracle, rtol=0.02)
    np.testing.assert_allclose(my_regular, s_oracle, rtol=0.01)


@pytest.mark.parametrize("steps", range(2, 12))
def test_zsnr_table_vs_discrete(steps: int) -> None:
    "ZSNR rescale, continuous vs the discrete algorithm-1 table."
    t_oracle, s_oracle = oracle.euler_discrete_grid(steps, zsnr=True)
    mine = scheduling.ZSNR().schedule_np(steps)
    my_regular = scheduling.VariancePreserving().regularize(mine[:, 1])
    # the terminal sigma diverges to inf at exactly zero SNR; compare the
    # normalized sigma there instead
    np.testing.assert_allclose(mine[:, 0], t_oracle, rtol=0.02)
    np.testing.assert_allclose(
        mine[:, 1], oracle.vp_normalize(s_oracle)[0], rtol=0.02, atol=5e-4
    )


@pytest.mark.parametrize("steps", range(2, 12))
@pytest.mark.parametrize("shift", [1.0, 3.0])
def test_flowmatch_table_vs_discrete(steps: int, shift: float) -> None:
    "FlowShift(Linear) vs the discrete flow-match grid — near-exact."
    t_oracle, s_oracle = oracle.flowmatch_grid(steps, shift=shift)
    stack = scheduling.FlowShift(scheduling.Linear(), shift=shift) if shift != 1.0 else scheduling.Linear()
    mine = stack.schedule_np(steps)

    np.testing.assert_allclose(mine[:, 1], s_oracle, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(mine[:, 0], t_oracle, rtol=1e-9, atol=1e-9)


# =============================================================================
# Tier 2: dual-sample harness at MSE <= 1e-8
# =============================================================================


def mse(a: np.ndarray, b: np.ndarray) -> float:
    assert np.isfinite(a).all() and np.isfinite(b).all()
    return float(np.mean((a - b) ** 2))


@pytest.mark.parametrize("steps", [3, 7, 20])
def test_euler_matches_discrete(steps: int) -> None:
    timesteps, sigmas = oracle.euler_discrete_grid(steps)
    schedule = fixed_vp_schedule(timesteps, sigmas)
    x0 = RNG.normal(size=SHAPE)
    s_norm, a_norm = oracle.vp_normalize(sigmas[0])
    x0 = x0 * 1.0  # oracle and sampler both start from the same normalized latent

    mine = run_structured(structured.Euler(), schedule, models.NoiseModel(), timesteps, x0)

    reg = np.concatenate([sigmas, [0.0]])
    x = x0.copy()
    for n, t in enumerate(timesteps):
        x = oracle.euler_step(x, pseudo_eps(x, t), reg[n], reg[n + 1])

    assert mse(mine, x) <= 1e-8


@pytest.mark.parametrize("steps", [3, 7, 20])
def test_ancestral_matches_discrete(steps: int) -> None:
    "DPM(order=1, SDE) must equal the Euler-ancestral update."
    timesteps, sigmas = oracle.euler_discrete_grid(steps)
    schedule = fixed_vp_schedule(timesteps, sigmas)
    x0 = RNG.normal(size=SHAPE)
    noises = [RNG.normal(size=SHAPE) for _ in range(steps)]

    mine = run_structured(
        structured.DPM(order=1, stochasticity=1), schedule, models.NoiseModel(), timesteps, x0, noises=noises
    )

    reg = np.concatenate([sigmas, [0.0]])
    x = x0.copy()
    for n, t in enumerate(timesteps):
        if reg[n + 1] > 0:
            x = oracle.ancestral_step(x, pseudo_eps(x, t), reg[n], reg[n + 1], noises[n])
        else:  # terminal: no variance left to split
            x = oracle.euler_step(x, pseudo_eps(x, t), reg[n], reg[n + 1])

    assert mse(mine, x) <= 1e-8


@pytest.mark.parametrize("steps", [3, 7, 20, 50])
@pytest.mark.parametrize("order", [1, 2])
def test_dpmpp_2m_matches_discrete(steps: int, order: int) -> None:
    timesteps, sigmas = oracle.euler_discrete_grid(steps)
    schedule = fixed_vp_schedule(timesteps, sigmas)
    x0 = RNG.normal(size=SHAPE)

    mine = run_structured(structured.DPM(order=order), schedule, models.NoiseModel(), timesteps, x0)

    def model(x, t, reg_sigma):
        return pseudo_eps(x, t)

    theirs = oracle.dpmpp_2m_trajectory(x0.copy(), model, timesteps, sigmas, order=order)
    assert mse(mine, theirs) <= 1e-8


@pytest.mark.parametrize("steps", [4, 10])
def test_heun_matches_rkultra(steps: int) -> None:
    "RKUltra with the Heun pair must equal the discrete 2nd-order Heun update."
    from skrample_tpu.sampling import tableaux
    from skrample_tpu.sampling.rk_solvers import RKUltra

    timesteps, sigmas = oracle.euler_discrete_grid(steps)
    schedule = fixed_vp_schedule(timesteps, sigmas)
    x0 = RNG.normal(size=SHAPE)

    # eps-space trapezoid: the discrete Heun combines raw epsilon outputs,
    # so the derivative-space conversion must be off
    sampler = RKUltra(order=2, providers={2: tableaux.RKE2.Heun}, derivative_transform=None)

    def model(x, t, s, a):
        return pseudo_eps(x, t)

    mine = sampler.sample_model(x0.copy(), model, models.NoiseModel(), schedule, steps)

    def scaled_model(x, t, reg):
        return pseudo_eps(x, t)

    reg = np.concatenate([sigmas, [0.0]])
    x = x0.copy()
    for n, t in enumerate(timesteps):
        if reg[n + 1] > 0:
            t_next = timesteps[n + 1] if n + 1 < steps else 0.0
            x = oracle.heun_step(x, scaled_model, t, t_next, reg[n], reg[n + 1])
        else:
            # terminal hop: the second stage sits at sigma=0 where the model
            # is undefined; both sides degrade to the Euler move
            x = oracle.euler_step(x, pseudo_eps(x, t), reg[n], reg[n + 1])

    assert mse(mine, x) <= 1e-8


@pytest.mark.parametrize("steps", [4, 9])
def test_flow_euler_matches_discrete(steps: int) -> None:
    "Flow-match Euler: ours over the imported grid vs the straight-line update."
    timesteps, sigmas = oracle.flowmatch_grid(steps, shift=3.0)
    schedule = scheduling.FixedSchedule.from_regular(timesteps, sigmas, scheduling.FlowMatching())
    x0 = RNG.normal(size=SHAPE)

    def velocity(x, t):
        return 0.7 * x - math.cos(t / 500.0) * 0.2

    def model(x, t, s, a):
        return velocity(x, t)

    mine = interface.StructuredFunctionalAdapter(structured.Euler()).sample_model(
        x0.copy(), model, models.FlowModel(), schedule, steps
    )

    reg = np.concatenate([sigmas, [0.0]])
    x = x0.copy()
    for n, t in enumerate(timesteps):
        x = x + (reg[n + 1] - reg[n]) * velocity(x, t)

    assert mse(mine, x) <= 1e-8


# =============================================================================
# Tier 3: the wrapper driven like a pipeline loop
# =============================================================================


@pytest.mark.parametrize("order", [1, 2])
def test_wrapper_pipeline_loop_matches_discrete(order: int) -> None:
    """SkrampleWrapperScheduler driven exactly as a diffusers pipeline would
    (set_timesteps -> iterate .timesteps -> step) over the oracle grid must
    reproduce the oracle DPM++(2M) trajectory — this validates the timestep
    presentation, index lookup, casting, and history management end to end."""
    steps = 12
    timesteps, sigmas = oracle.euler_discrete_grid(steps)
    schedule = fixed_vp_schedule(timesteps, sigmas)

    wrapper = SkrampleWrapperScheduler(
        sampler=structured.DPM(order=order),
        schedule=schedule,
        model=models.NoiseModel(),
        compute_scale=torch.float64,
    )
    wrapper.set_timesteps(steps)

    x0 = RNG.normal(size=SHAPE)
    latent = torch.from_numpy(x0.copy())
    for t in wrapper.timesteps:
        eps = 0.8 * latent + math.sin(float(t) / 300.0) * 0.3
        latent = wrapper.step(eps, t, latent).prev_sample

    def model(x, t, reg_sigma):
        return pseudo_eps(x, t)

    theirs = oracle.dpmpp_2m_trajectory(x0.copy(), model, timesteps, sigmas, order=order)
    assert mse(latent.numpy(), theirs) <= 1e-8


@pytest.mark.parametrize("steps", [4, 9, 25])
@pytest.mark.parametrize("order", [1, 2, 3])
def test_unipc_matches_discrete(steps: int, order: int) -> None:
    "UniPC (correct-then-predict) vs the independent phi-function formulation."
    timesteps, sigmas = oracle.euler_discrete_grid(steps)
    schedule = fixed_vp_schedule(timesteps, sigmas)
    x0 = RNG.normal(size=SHAPE)

    mine = run_structured(structured.UniPC(order=order), schedule, models.NoiseModel(), timesteps, x0)

    def model(x, t, reg_sigma):
        return pseudo_eps(x, t)

    theirs = oracle.unipc_trajectory(x0.copy(), model, timesteps, sigmas, order=order)
    assert mse(mine, theirs) <= 1e-8 * 10 ** (order - 1)


# =============================================================================
# Tier 4: the dynamic-shifting (mu) FlowMatch path (VERDICT r2 item 5)
# =============================================================================


@pytest.mark.parametrize("steps", [4, 9, 25])
@pytest.mark.parametrize("mu", [0.0, 0.7, 1.15])
def test_flowmatch_mu_grid_matches_discrete(steps: int, mu: float) -> None:
    """set_timesteps(mu=...) must hot-swap FlowShift to shift=exp(mu) and
    present exactly the published dynamic-shifting sigma grid."""
    t_oracle, s_oracle = oracle.flowmatch_dynamic_grid(steps, mu)

    wrapper = SkrampleWrapperScheduler(
        sampler=structured.Euler(),
        schedule=scheduling.FlowShift(scheduling.Linear()),  # initial shift overridden by mu
        model=models.FlowModel(),
        compute_scale=torch.float64,
    )
    wrapper.set_timesteps(steps, mu=mu)

    np.testing.assert_allclose(wrapper.sigmas.numpy()[:steps], s_oracle, rtol=1e-9, atol=1e-12)
    assert float(wrapper.sigmas[-1]) == 0.0  # diffusers' terminal zero
    np.testing.assert_allclose(wrapper.timesteps.numpy(), t_oracle, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("steps", [5, 11])
@pytest.mark.parametrize("mu", [0.5, 1.15])
def test_flowmatch_mu_loop_matches_discrete(steps: int, mu: float) -> None:
    "A full mu-driven pipeline loop vs the discrete straight-line update."
    _, s_oracle = oracle.flowmatch_dynamic_grid(steps, mu)

    wrapper = SkrampleWrapperScheduler(
        sampler=structured.Euler(),
        schedule=scheduling.FlowShift(scheduling.Linear()),
        model=models.FlowModel(),
        compute_scale=torch.float64,
    )
    wrapper.set_timesteps(steps, mu=mu)

    def velocity(x, t):
        return 0.7 * x - math.cos(t / 500.0) * 0.2

    x0 = RNG.normal(size=SHAPE)
    latent = torch.from_numpy(x0.copy())
    for t in wrapper.timesteps:
        latent = wrapper.step(velocity(latent, float(t)), t, latent).prev_sample

    reg = np.concatenate([s_oracle, [0.0]])
    x = x0.copy()
    for n in range(steps):
        x = x + (reg[n + 1] - reg[n]) * velocity(x, reg[n] * 1000.0)

    assert mse(latent.numpy(), x) <= 1e-8
