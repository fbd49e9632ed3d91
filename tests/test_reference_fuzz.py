"""Adversarial cross-validation against the live reference implementation
(skipped when /root/reference is absent): randomized sampler x schedule x
predictor configs run through BOTH libraries on the scalar path must agree to
float64 precision.  Catches anything the fixed golden matrix misses."""

import math
import random
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.soak  # live-reference randomized fuzz tier: full tier only

REFERENCE = Path("/root/reference")
if not (REFERENCE / "skrample").is_dir():
    pytest.skip("reference tree not mounted", allow_module_level=True)

sys.path.insert(0, str(REFERENCE))

import skrample.scheduling as r_sched  # noqa: E402
from skrample.sampling import functional as r_func  # noqa: E402
from skrample.sampling import interface as r_iface  # noqa: E402
from skrample.sampling import models as r_models  # noqa: E402
from skrample.sampling import structured as r_struct  # noqa: E402

from skrample_tpu import scheduling as m_sched  # noqa: E402
from skrample_tpu.sampling import functional as m_func  # noqa: E402
from skrample_tpu.sampling import interface as m_iface  # noqa: E402
from skrample_tpu.sampling import models as m_models  # noqa: E402
from skrample_tpu.sampling import structured as m_struct  # noqa: E402


def random_config(rng: random.Random) -> tuple[dict, dict]:
    "One random (reference kwargs, mine kwargs) pair of sampler/schedule/model specs."
    sampler_kind = rng.choice(["euler", "dpm", "adams", "unip", "unipc", "spc"])
    order = rng.randint(1, 9)
    stochasticity = rng.choice([0, 0, rng.random(), 1])
    fast = rng.random() < 0.5
    dt_kind = rng.choice(["data", "none", "velocity", "noise", "scalex"])

    schedule_kind = rng.choice(["linear", "linear_vp", "scaled", "zsnr"])
    sub_kind = rng.choice([None, "karras", "exponential", "beta", "probit"])
    mod_kind = rng.choice([None, "flowshift", "hyper", "sinner"])
    model_kind = rng.choice(["data", "flow", "velocity"])

    steps = rng.randint(2, 14)
    return (
        dict(
            sampler=sampler_kind,
            order=order,
            stochasticity=stochasticity,
            fast=fast,
            dt=dt_kind,
            schedule=schedule_kind,
            sub=sub_kind,
            mod=mod_kind,
            model=model_kind,
            steps=steps,
        ),
        {},
    )


def build(spec: dict, sched_mod, struct_mod, models_mod):
    dt = {
        "data": models_mod.DataModel(),
        "none": None,
        "velocity": models_mod.VelocityModel(),
        "noise": models_mod.NoiseModel(),
        "scalex": models_mod.ScaleX(),
    }[spec["dt"]]

    match spec["sampler"]:
        case "euler":
            sampler = struct_mod.Euler(stochasticity=spec["stochasticity"])
        case "dpm":
            sampler = struct_mod.DPM(
                order=spec["order"], stochasticity=spec["stochasticity"], derivative_transform=dt
            )
        case "adams":
            sampler = struct_mod.Adams(
                order=spec["order"], stochasticity=spec["stochasticity"], derivative_transform=dt
            )
        case "unip":
            sampler = struct_mod.UniP(
                order=spec["order"], stochasticity=spec["stochasticity"], derivative_transform=dt,
                fast_solve=spec["fast"],
            )
        case "unipc":
            sampler = struct_mod.UniPC(
                order=spec["order"], stochasticity=spec["stochasticity"], derivative_transform=dt,
                fast_solve=spec["fast"],
            )
        case "spc":
            sampler = struct_mod.SPC(derivative_transform=dt)

    base = {
        "linear": sched_mod.Linear(),
        "linear_vp": sched_mod.Linear(sigma_start=14.6),
        "scaled": sched_mod.Scaled(),
        "zsnr": sched_mod.ZSNR(),
    }[spec["schedule"]]

    schedule = base
    if spec["sub"] and isinstance(base, sched_mod.ScheduleCommon):
        schedule = {
            "karras": sched_mod.Karras,
            "exponential": sched_mod.Exponential,
            "beta": sched_mod.Beta,
            "probit": sched_mod.Probit,
        }[spec["sub"]](schedule)
    if spec["mod"]:
        schedule = {
            "flowshift": sched_mod.FlowShift,
            "hyper": sched_mod.Hyper,
            "sinner": sched_mod.Sinner,
        }[spec["mod"]](schedule)

    model = {
        "data": models_mod.DataModel(),
        "flow": models_mod.FlowModel(),
        "velocity": models_mod.VelocityModel(),
    }[spec["model"]]

    return sampler, schedule, model


def run_scalar(adapter_mod, sampler, schedule, model, steps: int, seed: int) -> list[float]:
    samples: list[float] = []
    random.seed(seed)
    adapter_mod.StructuredFunctionalAdapter(sampler).generate_model(
        lambda x, t, s, a: x - math.sin(t) * 0.7 + math.cos(x) * 0.1,
        model,
        schedule,
        lambda _: random.random(),
        steps,
        callback=lambda x, i, d: samples.append(x),
    )
    return samples


@pytest.mark.parametrize("seed", range(150))
def test_fuzz_structured(seed: int) -> None:
    rng = random.Random(seed)
    spec, _ = random_config(rng)
    if spec["model"] == "flow" and spec["schedule"] in ("scaled", "zsnr") and spec["sampler"] in ("unip", "unipc"):
        pass  # still valid; log-SNR handles VP

    r_sampler, r_schedule, r_model = build(spec, r_sched, r_struct, r_models)
    m_sampler, m_schedule, m_model = build(spec, m_sched, m_struct, m_models)

    try:
        ref = run_scalar(r_iface, r_sampler, r_schedule, r_model, spec["steps"], seed)
    except (ZeroDivisionError, ValueError, OverflowError) as err:
        # the reference rejects this config; ours must reject it identically
        with pytest.raises(type(err)):
            run_scalar(m_iface, m_sampler, m_schedule, m_model, spec["steps"], seed)
        return

    mine = run_scalar(m_iface, m_sampler, m_schedule, m_model, spec["steps"], seed)
    np.testing.assert_allclose(mine, ref, rtol=1e-9, atol=1e-12, err_msg=str(spec))


@pytest.mark.parametrize("seed", range(40))
def test_fuzz_rk(seed: int) -> None:
    rng = random.Random(1000 + seed)
    order = rng.randint(1, 15)
    stochasticity = rng.choice([0, 1])
    kind = rng.choice(["rkultra", "dynasau", "moire"])
    steps = rng.randint(2, 9)
    schedule_r = r_sched.Karras(r_sched.Scaled()) if rng.random() < 0.5 else r_sched.FlowShift(r_sched.Linear())
    schedule_m = m_sched.Karras(m_sched.Scaled()) if isinstance(schedule_r, r_sched.Karras) else m_sched.FlowShift(m_sched.Linear())
    model_r, model_m = r_models.VelocityModel(), m_models.VelocityModel()

    match kind:
        case "rkultra":
            r_s = r_func.RKUltra(order=order, stochasticity=stochasticity)
            m_s = m_func.RKUltra(order=order, stochasticity=stochasticity)
        case "dynasau":
            order = max(2, min(order, 4))
            r_s = r_func.DynasauRK(order=order, stochasticity=stochasticity)
            m_s = m_func.DynasauRK(order=order, stochasticity=stochasticity)
        case "moire":
            order = max(2, order)
            r_s = r_func.RKMoire(order=order)
            m_s = m_func.RKMoire(order=order)

    # functional samplers drive themselves; no adapter
    samples_r: list[float] = []
    samples_m: list[float] = []
    random.seed(seed)
    r_s.generate_model(
        lambda x, t, s, a: x - math.sin(t) * 0.7,
        model_r, schedule_r, lambda _: random.random(), steps,
        callback=lambda x, i, d: samples_r.append(x),
    )
    random.seed(seed)
    m_s.generate_model(
        lambda x, t, s, a: x - math.sin(t) * 0.7,
        model_m, schedule_m, lambda _: random.random(), steps,
        callback=lambda x, i, d: samples_m.append(x),
    )
    np.testing.assert_allclose(samples_m, samples_r, rtol=1e-9, atol=1e-12, err_msg=f"{kind} o{order} s{stochasticity}")


@pytest.mark.parametrize("case", range(100))
def test_schedule_tables_bit_exact_fuzz(case: int) -> None:
    """Randomized schedule stacks (random curve parameters included) must
    produce BIT-identical (timestep, sigma, alpha) tables to the live
    reference — the rewritten scheduling layer keeps exact arithmetic."""
    rng = random.Random(7_000 + case)

    base_kind = rng.choice(["linear", "linear_vp", "scaled", "zsnr"])
    base_kwargs = {}
    if base_kind in ("scaled", "zsnr"):
        base_kwargs = {
            "beta_start": rng.uniform(1e-4, 5e-3),
            "beta_end": rng.uniform(6e-3, 3e-2),
            "beta_scale": rng.choice([1, 2, 2, 3]),
        }
    elif base_kind == "linear_vp":
        base_kwargs = {"sigma_start": rng.uniform(1.5, 30.0)}

    def make(sched_mod):
        base = {
            "linear": sched_mod.Linear,
            "linear_vp": sched_mod.Linear,
            "scaled": sched_mod.Scaled,
            "zsnr": sched_mod.ZSNR,
        }[base_kind](**base_kwargs)

        sub = rng.choice([None, "karras", "exponential", "beta", "probit"])
        if sub == "karras":
            base = sched_mod.Karras(base, rho=rng.uniform(3, 10), steps=rng.randint(5, 40))
        elif sub == "exponential":
            base = sched_mod.Exponential(base, rho=rng.uniform(0.5, 3), steps=rng.randint(5, 40))
        elif sub == "beta":
            base = sched_mod.Beta(base, alpha=rng.uniform(0.3, 2), beta=rng.uniform(0.3, 2))
        elif sub == "probit":
            base = sched_mod.Probit(base, scale=rng.uniform(0.5, 5))

        for _ in range(rng.randint(0, 2)):
            mod = rng.choice(["flowshift", "hyper", "sinner"])
            if mod == "flowshift":
                base = sched_mod.FlowShift(base, shift=rng.uniform(0.5, 6))
            elif mod == "hyper":
                base = sched_mod.Hyper(base, scale=rng.uniform(-4, 4), tail=rng.random() < 0.5)
            else:
                base = sched_mod.Sinner(base, count=rng.uniform(-4, 4), scale=rng.uniform(-4, 4))
        return base

    state = rng.getstate()
    theirs = make(r_sched)
    rng.setstate(state)  # identical random draws for both builds
    mine = make(m_sched)

    steps = rng.randint(1, 23)
    ref_table = theirs.schedule_np(steps)
    my_table = mine.schedule_np(steps)
    # equal_nan: extreme random params can push the closed forms to an
    # identical NaN on both sides (error-for-error parity)
    assert np.array_equal(my_table, ref_table, equal_nan=True), f"{base_kind} stack table diverged"

    grid = [rng.random() for _ in range(7)]
    assert np.array_equal(mine.points_np(grid), theirs.points_np(grid), equal_nan=True)
    assert np.array_equal(mine.ipoints_np(grid), theirs.ipoints_np(grid), equal_nan=True)
