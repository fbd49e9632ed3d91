"""Structured (stateless, history-passing) ODE/SDE solvers.

These samplers are the *specification* layer: plain polymorphic math over any
``Sample`` type (float, numpy, jax.Array, torch.Tensor).  Crucially, every
sampler here is **linear in its tensor inputs** (sample / prediction /
history / noise) with scalar coefficients derived only from the schedule and
step index.  That property is what the TPU engine exploits: the same code is
executed once with symbolic linear-combination inputs to compile per-step
coefficient tables, turning each denoise step into a single fused FMA kernel
(see :mod:`skrample_tpu.ops.compiler`).

Scalar coefficient math stays in Python float64 on purpose — error should not
accumulate in low-precision tensor scalars.

Reference parity: Beinsezii/skrample ``skrample/sampling/structured.py``:
  Euler (:163), DPM 1-3 (:183, arXiv:2211.01095), Adams/IPNDM (:286),
  UniP/UniPC (:333, arXiv:2302.04867), SPC (:500).
"""

from __future__ import annotations

import abc
import dataclasses
import math
from collections.abc import Sequence
from dataclasses import dataclass, replace

import numpy as np

from .. import common
from ..common import DeltaPoint, Point, Sample, Step, divf, ln, softmax, spowf, sumprod
from ..scheduling import SkrampleSchedule
from . import models, traits


@dataclass(frozen=True)
class SampleInput[T: Sample]:
    "One step's inputs, packed. Accumulate the outputs in a list for multistep."

    sample: T
    "Model input latent."
    prediction: T
    "Model output."
    step: Step
    noise: T | None
    "Extra stochastic noise, when the sampler requires it."

    def delta_point(self, schedule: SkrampleSchedule) -> DeltaPoint:
        return DeltaPoint(*schedule.ipoints(self.step))


@dataclass(frozen=True)
class SKSamples[T: Sample](SampleInput[T]):
    final: T
    "The updated sample — what you want."


@dataclass(frozen=True)
class StructuredSampler(abc.ABC, traits.SamplingCommon):
    "Stateless sampler contract."

    @property
    def require_noise(self) -> bool:
        "Whether ``noise`` must be passed."
        return False

    @property
    def require_previous(self) -> int:
        "How many history entries must be retained and passed."
        return 0

    @abc.abstractmethod
    def sample_packed[T: Sample](
        self,
        packed: SampleInput[T],
        model_transform: models.DiffusionModel,
        schedule: SkrampleSchedule,
        previous: Sequence[SKSamples[T]] = (),
    ) -> SKSamples[T]: ...

    def sample[T: Sample](
        self,
        sample: T,
        prediction: T,
        step: Step | tuple[float, float],
        model_transform: models.DiffusionModel,
        schedule: SkrampleSchedule,
        noise: T | None = None,
        previous: Sequence[SKSamples[T]] = (),
    ) -> SKSamples[T]:
        "Unpacked convenience form of :meth:`sample_packed`."
        return self.sample_packed(
            SampleInput(sample=sample, prediction=prediction, step=Step(*step), noise=noise),
            model_transform=model_transform,
            schedule=schedule,
            previous=previous,
        )

    def scale_input[T: Sample](self, sample: T, point: Point) -> T:
        "Historically sampler-specific; a no-op for every current sampler."
        return sample


@dataclass(frozen=True)
class StatedSampler(StructuredSampler):
    "Adapter: subclasses produce only the final value, packing is handled here."

    @abc.abstractmethod
    def _sample_packed[T: Sample](
        self,
        packed: SampleInput[T],
        model_transform: models.DiffusionModel,
        schedule: SkrampleSchedule,
        previous: Sequence[SKSamples[T]],
    ) -> T:
        "Must not modify or shadow ``packed``."

    def sample_packed[T: Sample](
        self,
        packed: SampleInput[T],
        model_transform: models.DiffusionModel,
        schedule: SkrampleSchedule,
        previous: Sequence[SKSamples[T]] = (),
    ) -> SKSamples[T]:
        final = self._sample_packed(packed, model_transform=model_transform, schedule=schedule, previous=previous)
        return SKSamples(
            sample=packed.sample,
            prediction=packed.prediction,
            step=packed.step,
            noise=packed.noise,
            final=final,
        )


@dataclass(frozen=True)
class StructuredMultistep(traits.HigherOrder, StructuredSampler):
    "Order > 1 support via retained history."

    @property
    def require_previous(self) -> int:
        return max(min(self.order, self.max_order()), self.min_order()) - 1

    def effective_order(self, step: Step, previous: Sequence[SKSamples]) -> int:
        """Order actually used: ramps up with available history / position and
        ramps down approaching the final step."""
        position = step.position()
        return max(
            1,
            min(
                self.max_order(),
                round(position + 1),
                self.order,
                len(previous) + 1,
                round(step.amount() - position),  # lower order on the final steps
            ),
        )


@dataclass(frozen=True)
class StructuredStochastic(traits.Stochastic, StructuredSampler):
    @property
    def require_noise(self) -> bool:
        return abs(self.stochasticity) > 1e-8


@dataclass(frozen=True)
class StructuredUnified(traits.UnifiedModelling, StructuredStochastic, StructuredMultistep): ...


def convert_history[T: Sample](
    packed: SampleInput[T],
    model_transform: models.DiffusionModel,
    derivative_transform: models.DiffusionModel | None,
    schedule: SkrampleSchedule,
    previous: Sequence[SKSamples[T]],
    effective_order: int,
    delta: DeltaPoint,
) -> tuple[list[T], models.DiffusionModel]:
    """Shared derivative-space conversion: returns ``[current, prev, prev2...]``
    predictions (newest first) in the derivative space, plus the transform the
    final :meth:`DiffusionModel.forward` should use."""
    window = previous[len(previous) - effective_order + 1 :] if effective_order > 1 else ()
    if derivative_transform:
        convert = models.ModelConvert(model_transform, derivative_transform)
        predictions = [
            convert.output_to(packed.sample, packed.prediction, delta.point_from),
            *(convert.output_to(p.sample, p.prediction, p.delta_point(schedule).point_from) for p in reversed(window)),
        ]
        return predictions, convert.transform_to
    return [packed.prediction, *(p.prediction for p in reversed(window))], model_transform


def _log_snr(point: Point) -> float:
    "lambda = ln(alpha / sigma) in the schedule's normalized space."
    return ln(divf(point.alpha, point.sigma))


@dataclass(frozen=True)
class Euler(StructuredStochastic, StatedSampler):
    'First-order solver — the "safe" baseline. Stochasticity > 0 gives Euler-Maruyama.'

    def _sample_packed[T: Sample](
        self,
        packed: SampleInput[T],
        model_transform: models.DiffusionModel,
        schedule: SkrampleSchedule,
        previous: Sequence[SKSamples[T]],
    ) -> T:
        return model_transform.forward(
            packed.sample,
            packed.prediction,
            packed.delta_point(schedule),
            packed.noise,
            self.stochasticity,
        )


@dataclass(frozen=True)
class DPM(StructuredUnified, StatedSampler):
    """DPM-Solver++ multistep, order 1-3 (arXiv:2211.01095; Algo 2 for order
    2, section 5 for the SDE form).  Higher-order corrections are absorbed
    into the prediction so the update remains a single ``forward``."""

    @staticmethod
    def max_order() -> int:
        return 3

    def _sample_packed[T: Sample](
        self,
        packed: SampleInput[T],
        model_transform: models.DiffusionModel,
        schedule: SkrampleSchedule,
        previous: Sequence[SKSamples[T]],
    ) -> T:
        delta = packed.delta_point(schedule)
        effective_order = self.effective_order(packed.step, previous)

        predictions, model_transform = convert_history(
            packed, model_transform, self.derivative_transform, schedule, previous, effective_order, delta
        )
        prediction = predictions[0]

        if effective_order >= 2:
            lambda_ = _log_snr(delta.point_from)
            lambda_next = _log_snr(delta.point_to)
            h = abs(lambda_next - lambda_)

            lambda_prev = _log_snr(schedule.ipoint(previous[-1].step.time_from))
            r = (lambda_ - lambda_prev) / h

            D1_0 = (1.0 / r) * (prediction - predictions[1])

            if effective_order >= 3:
                lambda_prev2 = _log_snr(schedule.ipoint(previous[-2].step.time_from))
                r_prev2 = (lambda_prev - lambda_prev2) / h

                D1_1 = (1.0 / r_prev2) * (predictions[1] - predictions[2])
                D1 = D1_0 + (r / (r + r_prev2)) * (D1_0 - D1_1)
                D2 = (1.0 / (r + r_prev2)) * (D1_0 - D1_1)

                # Correction weights, derived from the expm1 form and folded
                # into the prediction so forward() stays the only tensor op:
                #   final -= sigma_next * [exp2*pred + (exp2/hh - 1)*D1
                #                          + ((exp2-hh)/hh^2 - 1/2)*D2]
                hh = -h
                exp2 = math.expm1(hh)
                c1 = (exp2 / hh - 1.0) / exp2 if exp2 != 0 else 0
                c2 = ((exp2 - hh) / hh**2 - 0.5) / exp2 if exp2 != 0 else 0
                prediction = prediction + c1 * D1 + c2 * D2
            else:
                prediction = prediction + 0.5 * D1_0

        return model_transform.forward(
            packed.sample,
            prediction,
            delta,
            packed.noise,
            eta=self.stochasticity,
        )


@dataclass(frozen=True)
class Adams(StructuredUnified, StatedSampler):
    """Adams-Bashforth linear multistep over the model prediction, order 1-9.
    Order 4 is equivalent to IPNDM."""

    @staticmethod
    def max_order() -> int:
        return 9

    def _sample_packed[T: Sample](
        self,
        packed: SampleInput[T],
        model_transform: models.DiffusionModel,
        schedule: SkrampleSchedule,
        previous: Sequence[SKSamples[T]],
    ) -> T:
        effective_order = self.effective_order(packed.step, previous)
        delta = packed.delta_point(schedule)

        predictions, model_transform = convert_history(
            packed, model_transform, self.derivative_transform, schedule, previous, effective_order, delta
        )

        weighted: T = sumprod(predictions[:effective_order], common.bashforth(effective_order))

        return model_transform.forward(
            packed.sample,
            weighted,
            delta,
            packed.noise,
            self.stochasticity,
        )


@dataclass(frozen=True)
class UniP(StructuredUnified, StatedSampler):
    "The UniPC predictor stage alone, order 1-9 (arXiv:2302.04867)."

    fast_solve: bool = False
    "Skip the matrix solve for UniP-2 / UniC-1 (the paper's shortcut)."

    @staticmethod
    def max_order() -> int:
        return 9

    def unisolve[T: Sample](
        self,
        packed: SampleInput[T],
        model_transform: models.DiffusionModel,
        schedule: SkrampleSchedule,
        previous: Sequence[SKSamples[T]],
        prediction_next: Sample | None = None,
    ) -> T:
        "Unified solver: pass ``prediction_next`` for UniC behavior, omit for UniP."
        delta = packed.delta_point(schedule)
        effective_order = self.effective_order(packed.step, previous)

        if prediction_next is not None and self.derivative_transform:
            # Convert against the *incoming* transform before it is swapped
            prediction_next = models.ModelConvert(model_transform, self.derivative_transform).output_to(
                packed.sample, prediction_next, delta.point_from
            )
        predictions, model_transform = convert_history(
            packed, model_transform, self.derivative_transform, schedule, previous, effective_order, delta
        )
        prediction = predictions[0]

        lambda_ = _log_snr(delta.point_from)
        lambda_next = _log_snr(delta.point_to)
        h = abs(lambda_next - lambda_)

        hh = -h
        h_phi_1 = math.expm1(hh)
        B_h = h_phi_1

        rks: list[float] = []
        D1s: list[Sample] = []
        for n in range(1, effective_order):
            lambda_pN = _log_snr(previous[-n].delta_point(schedule).point_from)
            rk = (lambda_pN - lambda_) / h
            rks.append(rk if math.isfinite(rk) else 0)
            D1s.append((predictions[n] - prediction) / rk)

        if prediction_next is not None:
            rks.append(1.0)
            order_check = 1
            D1s.append(prediction_next - prediction)
        else:
            order_check = 2

        if not rks or (effective_order == order_check and self.fast_solve):
            rhos: list[float] = [0.5]
        else:
            h_phi_k = h_phi_1 / hh - 1
            R: list[list[float]] = []
            b: list[float] = []
            for n in range(1, len(rks) + 1):
                R.append([math.pow(v, n - 1) for v in rks])
                b.append(h_phi_k * math.factorial(n) / B_h)
                h_phi_k = h_phi_k / hh - 1 / math.factorial(n + 1)
            rhos = np.linalg.solve(R, b).tolist()

        prediction = prediction + sumprod(D1s, rhos[: len(D1s)])

        return model_transform.forward(
            packed.sample,
            prediction,
            delta,
            packed.noise,
            eta=self.stochasticity,
        )

    def _sample_packed[T: Sample](
        self,
        packed: SampleInput[T],
        model_transform: models.DiffusionModel,
        schedule: SkrampleSchedule,
        previous: Sequence[SKSamples[T]],
    ) -> T:
        return self.unisolve(packed, model_transform, schedule, previous)


@dataclass(frozen=True)
class UniPC(UniP):
    """Correct-then-predict: applies UniC to the *previous* step using the
    current prediction, then runs the predictor (its own UniP by default, or
    any structured sampler).  Effectively +1 order over the setting."""

    predictor: StructuredSampler | None = None
    "Defaults to the built-in UniP at the same order."

    @staticmethod
    def max_order() -> int:
        return 9

    @property
    def require_noise(self) -> bool:
        return super().require_noise or (self.predictor.require_noise if self.predictor else False)

    @property
    def require_previous(self) -> int:
        return max(super().require_previous + 1, self.predictor.require_previous if self.predictor else 0)

    def sample_packed[T: Sample](
        self,
        packed: SampleInput[T],
        model_transform: models.DiffusionModel,
        schedule: SkrampleSchedule,
        previous: Sequence[SKSamples[T]] = (),
    ) -> SKSamples[T]:
        delta = packed.delta_point(schedule)

        if self.derivative_transform:
            convert = models.ModelConvert(model_transform, self.derivative_transform)
            packed = replace(
                packed,
                prediction=convert.output_to(packed.sample, packed.prediction, delta.point_from),
            )
            model_transform = convert.transform_to

        if previous:
            corrected = self.unisolve(
                previous[-1],
                model_transform,
                schedule,
                previous[:-1],
                prediction_next=packed.prediction,
            )
            packed = replace(packed, sample=corrected)

        return (self.predictor or super()).sample_packed(packed, model_transform, schedule, previous)


@dataclass(frozen=True)
class SPC(traits.DerivativeTransform, StructuredSampler):
    """Simple predictor-corrector: re-run a corrector over offset history and
    softmax-blend the corrected sample with the current one."""

    predictor: StructuredSampler = Euler()
    corrector: StructuredSampler = Adams(order=4)

    bias: float = 0
    "Lower favors prediction, higher favors correction."
    power: float = 1
    "Optional signed-power blend of the two samples."
    adaptive: bool = True
    "Weight the blend by the schedule's (sigma, alpha) at the current point."
    invert: bool = False

    @property
    def require_noise(self) -> bool:
        return self.predictor.require_noise or self.corrector.require_noise

    @property
    def require_previous(self) -> int:
        return max(self.predictor.require_previous, self.corrector.require_previous + 1)

    def sample_packed[T: Sample](
        self,
        packed: SampleInput[T],
        model_transform: models.DiffusionModel,
        schedule: SkrampleSchedule,
        previous: Sequence[SKSamples[T]] = (),
    ) -> SKSamples[T]:
        delta = packed.delta_point(schedule)

        if self.derivative_transform:
            convert = models.ModelConvert(model_transform, self.derivative_transform)
            packed = replace(
                packed,
                prediction=convert.output_to(packed.sample, packed.prediction, delta.point_from),
            )
            model_transform = convert.transform_to

        if previous:
            # Shift predictions one step forward so each history entry pairs
            # with the *next* prediction; the corrector then re-solves the
            # most recent step with better information.
            shifted_predictions = (*(p.prediction for p in previous[1:]), packed.prediction)
            offset_previous: list[SKSamples[T]] = [
                replace(p, prediction=pred) for p, pred in zip(previous, shifted_predictions, strict=True)
            ]

            corrected = self.corrector.sample_packed(
                offset_previous.pop(),
                model_transform,
                schedule,
                offset_previous,
            ).final

            if self.adaptive:
                _t, p, c = delta.point_from
            else:
                p, c = 0, 0

            p, c = softmax((p - self.bias, c + self.bias))

            if self.invert:
                p, c = c, p

            if abs(self.power - 1) > 1e-8:  # spowf is expensive; short circuit
                sample = spowf(
                    spowf(packed.sample, self.power) * p + spowf(corrected, self.power) * c,
                    1 / self.power,
                )
            else:
                sample = packed.sample * p + corrected * c

            packed = replace(packed, sample=sample)

        return self.predictor.sample_packed(packed, model_transform, schedule, previous)
