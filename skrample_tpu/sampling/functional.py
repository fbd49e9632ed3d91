"""Functional (closure-driven) samplers: the solver owns the denoise loop and
calls the model itself.

This is the natural fit for JAX: with a traced model closure and jnp sample,
:func:`step_tableau` unrolls its stages at trace time (stage counts and all
coefficients are static Python floats), so a whole RK step compiles into one
XLA computation.  :mod:`skrample_tpu.ops.loop` wraps these into ``lax.scan``
denoise loops.

Reference parity: Beinsezii/skrample ``skrample/sampling/functional.py``:
  step_tableau (:55), RKUltra (:212), DynasauRK (:266), RKMoire (:347).
"""

from __future__ import annotations

import dataclasses
import math
from abc import ABC, abstractmethod
from collections.abc import Callable, Mapping
from types import MappingProxyType
from typing import Any

from .. import common, scheduling
from ..common import RNG, DeltaPoint, Sample, Step, sumprod
from . import models, tableaux, traits

type SampleCallback[T: Sample] = Callable[[T, int, DeltaPoint], Any]
"Per-step observer hook; return value ignored."

type SampleableModel[T: Sample] = Callable[[T, float, float, float], T]
"(sample, timestep, sigma, alpha) -> prediction"


DEFAULT_PROVIDERS: Mapping[int, tableaux.TableauProvider[tableaux.TableauType]] = {
    1: tableaux.RK1.Euler,
    2: tableaux.RK2.Mid,
    3: tableaux.RK2.EES5_MIN,
    4: tableaux.RK2.EES7_MIN,
    5: tableaux.SSP.RK4_5,
    6: tableaux.RKE5.CashKarp,
    7: tableaux.RKZ.Butcher6,
    8: tableaux.SSP.RK3_8,
    10: tableaux.SSP.RK5_10,
    11: tableaux.RKZ.CV8,
    15: tableaux.RKZ.Stepanov10,
}
"""Default providers, selected by quality-vs-NFE search on latent diffusion
models.  Keys are STAGE counts, not mathematical order."""

STABLE_PROVIDERS: Mapping[int, tableaux.TableauProvider[tableaux.TableauType]] = {
    2: tableaux.RKE2.Heun,
    3: tableaux.SSP.RK3_3,
    4: tableaux.RKE3.SSPRK3_4,
    5: tableaux.SSP.RK3_5,
    6: tableaux.SSP.RK3_6,
    7: tableaux.SSP.RK3_7,
}
"SSP family: prioritizes stability. Keys are stage counts."

DEFAULT_EMBEDDED_PROVIDERS: Mapping[int, tableaux.TableauProvider[tableaux.EmbeddedTableau]] = {
    2: tableaux.RKE2.Heun,
    4: tableaux.RKE3.BogackiShampine,
    6: tableaux.RKE5.Fehlberg,
}
"Default embedded providers for adaptive stepping. Keys are stage counts."


def step_tableau[T: Sample](
    tableau: tableaux.Tableau | tableaux.EmbeddedTableau,
    sample: T,
    model: SampleableModel[T],
    model_transform: models.DiffusionModel,
    schedule: scheduling.SkrampleSchedule,
    step: Step,
    derivative_transform: models.DiffusionModel | None = None,
    noise: T | None = None,
    stochasticity: float = 0,
    epsilon: float = 1e-8,
) -> tuple[T, ...]:
    """One explicit Runge-Kutta step driven by an arbitrary Butcher tableau.

    All stage points are pulled from the schedule in ONE batched ``ipoints``
    call; intermediate samples are synthesized through ``forward`` with the
    weighted derivative mean; the model call is *skipped* at t=0 / sigma=0
    stages, back-computing the derivative via ``backward`` instead.

    Returns one result per weight row (2 for embedded tableaux)."""
    nodes, weights = tableau[0], tableau[1:]

    if derivative_transform:
        model = models.ModelConvert(model_transform, derivative_transform).wrap_model_call(model)
        model_transform = derivative_transform

    derivatives: list[T] = []
    S0, S1, *stage_points = schedule.ipoints([*step, *(step[0] + stage.c * (step[1] - step[0]) for stage in nodes)])
    delta = common.DeltaPoint(S0, S1)

    for point, icoeffs in zip(stage_points, (stage.a for stage in nodes), strict=True):
        if icoeffs:
            X: T = model_transform.forward(
                sample,
                sumprod(derivatives, icoeffs) / math.fsum(icoeffs),
                common.DeltaPoint(delta.point_from, point),
            )
        else:
            X = sample

        if abs(point.timestep) < epsilon or abs(point.sigma) < epsilon:
            # Calling the model at the clean endpoint is invalid; recover the
            # implied derivative from the transition instead.
            derivatives.append(model_transform.backward(sample, X, delta))
        else:
            derivatives.append(model(X, *point))

    return tuple(
        model_transform.forward(
            sample,
            sumprod(derivatives, w),
            delta,
            noise,
            stochasticity,
        )
        for w in weights
    )


@dataclasses.dataclass(frozen=True)
class FunctionalSampler(ABC, traits.SamplingCommon):
    @abstractmethod
    def sample_model[T: Sample](
        self,
        sample: T,
        model: SampleableModel[T],
        model_transform: models.DiffusionModel,
        schedule: scheduling.SkrampleSchedule,
        steps: int,
        include: slice = slice(None),
        rng: RNG[T] | None = None,
        callback: SampleCallback | None = None,
    ) -> T:
        """Run the (already noised) sample through the model over the chosen
        ``include`` range of ``steps``. Calls ``callback`` per step."""

    def generate_model[T: Sample](
        self,
        model: SampleableModel[T],
        model_transform: models.DiffusionModel,
        schedule: scheduling.SkrampleSchedule,
        rng: RNG[T],
        steps: int,
        include: slice = slice(None),
        initial: T | None = None,
        callback: SampleCallback | None = None,
    ) -> T:
        "Like :meth:`sample_model` but seeds/mixes the initial noise itself (txt2img & img2img)."
        if initial is None and include.start is None:
            sample: T = rng(None)
        else:
            # Noise the initial value to the include-start point, rescaled by
            # the terminal sigma to absorb Scaled-schedule quirks.
            sample = self.add_noise(
                0 if initial is None else initial,
                rng(None),
                schedule.ipoint((include.start or 0) / steps),
            ) / self.add_noise(0.0, 1.0, schedule.point_1)

        return self.sample_model(sample, model, model_transform, schedule, steps, include, rng, callback)


@dataclasses.dataclass(frozen=True)
class FunctionalHigher(traits.HigherOrder, FunctionalSampler):
    def adjust_steps(self, steps: int) -> int:
        "Rescale a step budget to approximately equal model-call (NFE) cost."
        return round(steps / self.order)


@dataclasses.dataclass(frozen=True)
class FunctionalUnified(traits.UnifiedModelling, FunctionalHigher): ...


@dataclasses.dataclass(frozen=True)
class FunctionalSinglestep(FunctionalSampler):
    "Uniform-step loop driver around an abstract per-step update."

    @abstractmethod
    def step[T: Sample](
        self,
        sample: T,
        model: SampleableModel[T],
        model_transform: models.DiffusionModel,
        schedule: scheduling.SkrampleSchedule,
        step: Step,
        rng: RNG[T] | None = None,
    ) -> T: ...

    def sample_model[T: Sample](
        self,
        sample: T,
        model: SampleableModel[T],
        model_transform: models.DiffusionModel,
        schedule: scheduling.SkrampleSchedule,
        steps: int,
        include: slice = slice(None),
        rng: RNG[T] | None = None,
        callback: SampleCallback | None = None,
    ) -> T:
        for n in list(range(steps))[include]:
            step = Step.from_int(n, steps)
            sample = self.step(sample, model, model_transform, schedule, step, rng)
            if callback:
                callback(sample, n, schedule.istep(step))
        return sample


@dataclasses.dataclass(frozen=True)
class FunctionalAdaptive(FunctionalSampler):
    "Error-controlled samplers (data-dependent step sizes)."

    type Evaluator[T: Sample] = Callable[[T, T], float]

    @staticmethod
    def mse[T: Sample](a: T, b: T) -> float:
        error: T = abs(a - b) ** 2
        return common.mean(error)

    evaluator: Evaluator = mse
    threshold: float = 1e-2
    "Target error per evaluation."


@dataclasses.dataclass(frozen=True)
class RKUltra(FunctionalUnified, FunctionalSinglestep):
    """Arbitrary explicit Runge-Kutta, order 1-15: picks the largest provider
    at or below the requested order and drives :func:`step_tableau`."""

    providers: Mapping[int, tableaux.TableauProvider[tableaux.Tableau | tableaux.EmbeddedTableau]] = MappingProxyType(
        DEFAULT_PROVIDERS
    )

    @staticmethod
    def max_order() -> int:
        return 99

    def tableau(self, order: int | None = None) -> tableaux.Tableau:
        if order is None:
            order = self.order
        if order >= min(self.providers.keys()):
            picked = self.providers[max(o for o in self.providers.keys() if o <= order)].tableau()
            return tableaux.Tableau(picked.stages, picked.weights)  # drop any embedded row
        return tableaux.RK1.Euler.value

    def adjust_steps(self, steps: int) -> int:
        stages = self.tableau()[0]
        calls = len(stages)
        # Stages at c=1 are skipped on the final step; credit them back
        adjusted = steps / calls + sum(abs(1 - stage.c) < 1e-8 for stage in stages) / calls
        return max(round(adjusted), 1)

    def step[T: Sample](
        self,
        sample: T,
        model: SampleableModel[T],
        model_transform: models.DiffusionModel,
        schedule: scheduling.SkrampleSchedule,
        step: Step,
        rng: RNG[T] | None = None,
    ) -> T:
        return step_tableau(
            self.tableau(),
            sample,
            model,
            model_transform,
            schedule,
            step,
            self.derivative_transform,
            rng(step) if rng else None,
            self.stochasticity,
        )[0]


@dataclasses.dataclass(frozen=True)
class DynasauRK(FunctionalUnified, FunctionalSinglestep):
    """Procedural RK order 2-4 generating its tableau *per step* from the
    parametric families, decaying from a high-stability anchor towards a
    high-convergence anchor as ``e^(-s*t - S*T)`` over NFEs.

    Since the per-step tableaux depend only on the step index, the full
    coefficient sequence precomputes host-side for `lax.scan` loops."""

    per_step_decay: float = math.log(0.5) / -2  # halves every 2 NFEs
    total_step_decay: float = math.log(0.5) / -20
    invert: bool = False
    "Invert the stability->convergence gradient."

    @staticmethod
    def min_order() -> int:
        return 2

    @staticmethod
    def max_order() -> int:
        return 4

    def adjust_steps(self, steps: int) -> int:
        return max(round(steps / self.order), 1)

    def gradient(self, step: Step, stages: int) -> float:
        "1.0 = most stable anchor, 0.0 = most convergent anchor."
        step = step.normal().clamp()
        decay = math.exp((-self.total_step_decay * step.amount() - self.per_step_decay * step.position()) * stages)
        return abs(self.invert - min(max(decay, 0), 1))

    def tableau(self, step: Step) -> tableaux.Tableau:
        "Assumes uniform step sizes (a plain for-loop)."
        if self.order >= 4:
            high = 1 / 4 * (2 - math.sqrt(2))  # EES7_SYM
            low = 1 / 14 * (5 - 3 * math.sqrt(2))  # EES7_MIN
            family = tableaux.generators.ees27_tableau
        elif self.order >= 3:
            high = 0.25  # EES5_SYM
            low = 0.1  # EES5_MIN
            family = tableaux.generators.ees25_tableau
        else:
            high = 1.0  # Heun
            low = 0.5  # Mid
            family = tableaux.generators.rk2_tableau

        gradient = self.gradient(step, len(family((high + low) / 2).stages))
        return family(gradient * high + (1 - gradient) * low)

    def step[T: Sample](
        self,
        sample: T,
        model: SampleableModel[T],
        model_transform: models.DiffusionModel,
        schedule: scheduling.SkrampleSchedule,
        step: Step,
        rng: RNG[T] | None = None,
    ) -> T:
        return step_tableau(
            self.tableau(step),
            sample,
            model,
            model_transform,
            schedule,
            step,
            self.derivative_transform,
            rng(step) if rng else None,
            self.stochasticity,
        )[0]


@dataclasses.dataclass(frozen=True)
class RKMoire(traits.DerivativeTransform, FunctionalAdaptive, FunctionalHigher):
    """Adaptive-step embedded RK.  The step-size controller is data-dependent,
    so the loop runs host-side around (jittable) embedded stage evaluations —
    the only data-dependent control flow in the library."""

    providers: Mapping[int, tableaux.TableauProvider[tableaux.EmbeddedTableau]] = MappingProxyType(
        DEFAULT_EMBEDDED_PROVIDERS
    )

    threshold: float = 1e-4
    initial: float = 1 / 50
    "Fraction of the schedule for the first step."
    maximum: float = 1 / 4
    "Fraction of the schedule allowed per step."
    adaption: float = 0.3
    "Step-size reaction speed relative to error."
    discard: float = float("inf")
    "Discard+retry the step when the downward adjustment exceeds this factor."
    rescale_init: bool = True
    "Scale ``initial`` by the tableau's model evals (Heun = 1x)."
    rescale_max: bool = False

    @staticmethod
    def min_order() -> int:
        return 2

    @staticmethod
    def max_order() -> int:
        return 99

    def adjust_steps(self, steps: int) -> int:
        return steps

    def tableau(self, order: int | None = None) -> tableaux.EmbeddedTableau:
        if order is None:
            order = self.order
        if order >= min(self.providers.keys()):
            return self.providers[max(o for o in self.providers.keys() if o <= order)].tableau()
        return tableaux.RKE2.Heun.tableau()

    def sample_model[T: Sample](
        self,
        sample: T,
        model: SampleableModel[T],
        model_transform: models.DiffusionModel,
        schedule: scheduling.SkrampleSchedule,
        steps: int,
        include: slice = slice(None),
        rng: RNG[T] | None = None,
        callback: SampleCallback | None = None,
    ) -> T:
        tab = self.tableau()

        initial = self.initial
        maximum = self.maximum
        if self.rescale_init:
            initial *= len(tab[0]) / 2  # relative to Heun's 2 stages
        if self.rescale_max:
            maximum *= len(tab[0]) / 2

        step_size: int = max(round(steps * initial), 1)
        epsilon: float = 1e-16

        indices: list[int] = list(range(steps))[include]
        step: int = indices[0]

        while step <= indices[-1]:
            step_next = min(step + step_size, indices[-1] + 1)

            if step_next < steps:
                sample_high, sample_low = step_tableau(
                    tab,
                    sample,
                    model,
                    model_transform,
                    schedule,
                    Step(step / steps, step_next / steps),
                    self.derivative_transform,
                )

                sigma0, sigma1, sigma2 = schedule.ipoints_np(
                    [step / steps, step_next / steps, (step_next + step_size) / steps]
                )[:, 1].tolist()

                # Non-linearity correction: if the upcoming dt already grows,
                # grow the requested step proportionally less.
                slope = abs(sigma0 - sigma1) / abs(sigma1 - sigma2)

                error = self.evaluator(sample_low, sample_high) / max(self.evaluator(0, sample_high), epsilon)
                adjustment: float = (self.threshold / max(error, epsilon)) ** self.adaption / slope
                step_size = max(round(min(step_size * adjustment, steps * maximum)), 1)

                # Retry only when it will actually shrink the step
                if step_next - step > step_size and 1 / max(adjustment, epsilon) > self.discard:
                    continue

            else:  # final step: skip the unused error row's extra evaluation
                sample_high = step_tableau(
                    tab.unembed(),
                    sample,
                    model,
                    model_transform,
                    schedule,
                    Step(step / steps, 1),
                    self.derivative_transform,
                )[0]

            sample = sample_high

            if callback:
                callback(sample, step_next - 1, schedule.istep(Step.from_int(step, steps)))

            step = step_next

        return sample
