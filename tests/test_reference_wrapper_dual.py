"""Live dual-run of OUR diffusers wrapper against the REFERENCE's wrapper.

The reference's wrapper layer imports cleanly with torch alone (diffusers is
only a TYPE_CHECKING import there), so the single most user-visible surface
— `set_timesteps` / `timesteps` / `sigmas` / `step` driven exactly like a
pipeline — can be validated against the reference implementation directly,
with shared torch.Generator noise streams.  Skipped when /root/reference is
absent."""

import math
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.soak  # live dual-run vs the reference wrapper: full tier only

REFERENCE = Path("/root/reference")
if not (REFERENCE / "skrample").is_dir():
    pytest.skip("reference tree not mounted", allow_module_level=True)

sys.path.insert(0, str(REFERENCE))

import skrample.diffusers as r_wrap  # noqa: E402
import skrample.scheduling as r_sched  # noqa: E402
from skrample.sampling import models as r_models  # noqa: E402
from skrample.sampling import structured as r_struct  # noqa: E402

import skrample_tpu.diffusers as m_wrap  # noqa: E402
import skrample_tpu.scheduling as m_sched  # noqa: E402
from skrample_tpu.sampling import models as m_models  # noqa: E402
from skrample_tpu.sampling import structured as m_struct  # noqa: E402

SHAPE = (2, 4, 8, 8)


def drive(wrapper, steps: int, seed: int, mu: float | None = None) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    "One pipeline-style loop; returns (timesteps, sigmas, final latent)."
    if mu is not None:
        wrapper.set_timesteps(steps, mu=mu)
    else:
        wrapper.set_timesteps(steps)
    torch.manual_seed(seed)
    latent = torch.randn(*SHAPE, dtype=torch.float64)
    generator = torch.Generator().manual_seed(seed + 1)

    timesteps = wrapper.timesteps.to(torch.float64).numpy().copy()
    sigmas = wrapper.sigmas.to(torch.float64).numpy().copy()

    for t in wrapper.timesteps:
        output = latent * 0.8 + math.sin(float(t) / 300.0) * 0.3
        latent = wrapper.step(output, t, latent, generator=generator).prev_sample

    return timesteps, sigmas, latent.to(torch.float64).numpy()


CASES = [
    ("euler-flow", dict(kind="euler", model="flow", schedule="flowlinear"), {}),
    ("euler-flow-mu", dict(kind="euler", model="flow", schedule="flowlinear"), {"mu": math.log(4.0)}),
    ("dpm2-scaled", dict(kind="dpm2", model="noise", schedule="karras_scaled"), {}),
    ("dpm1sde-scaled", dict(kind="dpm1sde", model="noise", schedule="scaled"), {}),
    ("unipc2-zsnr", dict(kind="unipc2", model="velocity", schedule="zsnr"), {}),
    ("spc-linear", dict(kind="spc", model="flow", schedule="flowlinear"), {}),
]


def build_wrapper(lib_wrap, lib_sched, lib_struct, lib_models, spec: dict):
    schedule = {
        "flowlinear": lambda s: s.FlowShift(s.Linear()),
        "scaled": lambda s: s.Scaled(),
        "karras_scaled": lambda s: s.Karras(s.Scaled()),
        "zsnr": lambda s: s.ZSNR(),
    }[spec["schedule"]](lib_sched)
    sampler = {
        "euler": lambda st: st.Euler(),
        "dpm2": lambda st: st.DPM(order=2),
        "dpm1sde": lambda st: st.DPM(order=1, stochasticity=1),
        "unipc2": lambda st: st.UniPC(order=2),
        "spc": lambda st: st.SPC(),
    }[spec["kind"]](lib_struct)
    model = {
        "flow": lib_models.FlowModel(),
        "noise": lib_models.NoiseModel(),
        "velocity": lib_models.VelocityModel(),
    }[spec["model"]]
    return lib_wrap.SkrampleWrapperScheduler(
        sampler=sampler, schedule=schedule, model=model, compute_scale=torch.float64
    )


@pytest.mark.parametrize(("name", "spec", "kwargs"), CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("steps", [3, 9])
def test_wrapper_dual_run(name: str, spec: dict, kwargs: dict, steps: int) -> None:
    mine = build_wrapper(m_wrap, m_sched, m_struct, m_models, spec)
    theirs = build_wrapper(r_wrap, r_sched, r_struct, r_models, spec)

    t_m, s_m, x_m = drive(mine, steps, seed=steps * 101, **kwargs)
    t_r, s_r, x_r = drive(theirs, steps, seed=steps * 101, **kwargs)

    np.testing.assert_array_equal(t_m, t_r)  # bit-exact tables
    np.testing.assert_array_equal(s_m, s_r)
    np.testing.assert_allclose(x_m, x_r, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("steps", [4, 8])
def test_rk_wrapper_dual_run(steps: int) -> None:
    "The inside-out RK wrapper: stage presentation and trajectory parity."
    mine = m_wrap.RKUltraWrapperScheduler(
        schedule=m_sched.FlowShift(m_sched.Linear()),
        sampler_order=2,
        model=m_models.FlowModel(),
        compute_scale=torch.float64,
    )
    theirs = r_wrap.RKUltraWrapperScheduler(
        schedule=r_sched.FlowShift(r_sched.Linear()),
        sampler_order=2,
        model=r_models.FlowModel(),
        compute_scale=torch.float64,
    )

    t_m, s_m, x_m = drive(mine, steps, seed=steps * 31)
    t_r, s_r, x_r = drive(theirs, steps, seed=steps * 31)

    np.testing.assert_allclose(t_m, t_r, rtol=1e-12)
    np.testing.assert_allclose(x_m, x_r, rtol=1e-9, atol=1e-12)


def test_from_diffusers_config_dual() -> None:
    "Config import parity: identical tables from identical raw configs."
    flux_like = {
        "_class_name": "FlowMatchEulerDiscreteScheduler",
        "num_train_timesteps": 1000,
        "shift": 3.0,
        "use_dynamic_shifting": False,
    }
    sdxl_like = {
        "_class_name": "DPMSolverMultistepScheduler",
        "num_train_timesteps": 1000,
        "beta_start": 0.00085,
        "beta_end": 0.012,
        "beta_schedule": "scaled_linear",
        "prediction_type": "epsilon",
        "solver_order": 2,
        "use_karras_sigmas": True,
    }
    for config in (flux_like, sdxl_like):
        mine = m_wrap.SkrampleWrapperScheduler.from_diffusers_config(config, compute_scale=torch.float64)
        theirs = r_wrap.SkrampleWrapperScheduler.from_diffusers_config(config, compute_scale=torch.float64)
        t_m, s_m, x_m = drive(mine, 7, seed=5)
        t_r, s_r, x_r = drive(theirs, 7, seed=5)
        np.testing.assert_array_equal(t_m, t_r)
        np.testing.assert_array_equal(s_m, s_r)
        np.testing.assert_allclose(x_m, x_r, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("case", range(30))
def test_wrapper_dual_fuzz(case: int) -> None:
    "Randomized sampler/schedule/model wrapper configs, dual-run vs the reference."
    import random

    rng = random.Random(55_000 + case)

    kind = rng.choice(["euler", "dpm", "adams", "unipc"])
    order = rng.randint(1, 4)
    sde = rng.choice([0, 0, 1])
    model_kind = rng.choice(["flow", "noise", "velocity"])
    sched_kind = rng.choice(["flowlinear", "scaled", "karras_scaled", "zsnr", "beta_linear"])
    steps = rng.randint(2, 11)
    mu = rng.choice([None, math.log(rng.uniform(1.5, 5))]) if sched_kind == "flowlinear" else None

    def build(wrap_mod, sched_mod, struct_mod, models_mod):
        schedule = {
            "flowlinear": lambda: sched_mod.FlowShift(sched_mod.Linear()),
            "scaled": lambda: sched_mod.Scaled(),
            "karras_scaled": lambda: sched_mod.Karras(sched_mod.Scaled()),
            "zsnr": lambda: sched_mod.ZSNR(),
            "beta_linear": lambda: sched_mod.Beta(sched_mod.Linear()),
        }[sched_kind]()
        sampler = {
            "euler": lambda: struct_mod.Euler(stochasticity=sde),
            "dpm": lambda: struct_mod.DPM(order=order, stochasticity=sde),
            "adams": lambda: struct_mod.Adams(order=order),
            "unipc": lambda: struct_mod.UniPC(order=min(order, 3)),
        }[kind]()
        model = {
            "flow": models_mod.FlowModel(),
            "noise": models_mod.NoiseModel(),
            "velocity": models_mod.VelocityModel(),
        }[model_kind]
        return wrap_mod.SkrampleWrapperScheduler(
            sampler=sampler, schedule=schedule, model=model, compute_scale=torch.float64
        )

    mine = build(m_wrap, m_sched, m_struct, m_models)
    theirs = build(r_wrap, r_sched, r_struct, r_models)

    kwargs = {"mu": mu} if mu is not None else {}
    try:
        t_r, s_r, x_r = drive(theirs, steps, seed=case, **kwargs)
    except (ZeroDivisionError, ValueError) as err:
        # degenerate config (e.g. epsilon-prediction on a flow schedule where
        # alpha hits exactly 0): we must fail the same way — error-for-error
        with pytest.raises(type(err)):
            drive(mine, steps, seed=case, **kwargs)
        return

    t_m, s_m, x_m = drive(mine, steps, seed=case, **kwargs)
    np.testing.assert_array_equal(t_m, t_r)
    np.testing.assert_array_equal(s_m, s_r)
    if np.isfinite(x_r).all():
        np.testing.assert_allclose(x_m, x_r, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("steps", [4, 8])
def test_dynasau_wrapper_dual_run(steps: int) -> None:
    "The per-step-generated-tableau wrapper against the reference's."
    mine = m_wrap.DynasauRKWrapperScheduler(
        schedule=m_sched.FlowShift(m_sched.Linear()),
        sampler_order=3,
        model=m_models.FlowModel(),
        compute_scale=torch.float64,
    )
    theirs = r_wrap.DynasauRKWrapperScheduler(
        schedule=r_sched.FlowShift(r_sched.Linear()),
        sampler_order=3,
        model=r_models.FlowModel(),
        compute_scale=torch.float64,
    )

    t_m, s_m, x_m = drive(mine, steps, seed=steps * 77)
    t_r, s_r, x_r = drive(theirs, steps, seed=steps * 77)

    np.testing.assert_allclose(t_m, t_r, rtol=1e-12)
    np.testing.assert_allclose(x_m, x_r, rtol=1e-9, atol=1e-12)


def test_config_export_dual() -> None:
    "as_diffusers_config reverse translation matches the reference's."
    import skrample.sampling.structured as rst

    mine = m_wrap.as_diffusers_config(
        m_struct.DPM(order=2, stochasticity=1), m_sched.Karras(m_sched.Scaled()), m_models.NoiseModel()
    )
    theirs = r_wrap.as_diffusers_config(
        rst.DPM(order=2, stochasticity=1), r_sched.Karras(r_sched.Scaled()), r_models.NoiseModel()
    )
    # keys must agree; values agree except the library-typed entries
    assert set(mine) == set(theirs)
    for key in mine:
        a, b = mine[key], theirs[key]
        if isinstance(a, (int, float, str, bool)) and isinstance(b, (int, float, str, bool)):
            assert a == b, key
        else:
            assert type(a).__name__ == type(b).__name__, key
