"""Unified predictor-model algebra.

Every diffusion predictor family (x0 / epsilon / flow / velocity) is described
by the same affine structure: a sampler update is always

    ``result = Gamma * sample + Delta * output + zeta * noise``

with ``Gamma``/``Delta``/``zeta`` *scalar* functions of the schedule points
involved.  Keeping the coefficients scalar (host float64) and the data-path a
pure FMA is exactly what makes the TPU compilation story work: the whole
update fuses into one elementwise kernel, and every sampler bottoms out in
:meth:`DiffusionModel.forward` (see ``skrample_tpu.ops``).

Reference parity: Beinsezii/skrample ``skrample/sampling/models.py``.
"""

from __future__ import annotations

import abc
import math
from collections.abc import Callable
from dataclasses import dataclass
from functools import wraps

from ..common import DeltaPoint, Point, Sample, sumprod


@dataclass(frozen=True)
class DiffusionModel(abc.ABC):
    """One predictor family.

    ``to_x``/``from_x`` convert model output to/from the clean-data estimate
    X̂ at a point; ``gamma``/``delta``/``zeta`` give the scalar update
    coefficients for a transition."""

    @abc.abstractmethod
    def to_x[T: Sample](self, sample: T, output: T, point: Point) -> T:
        "model output -> X̂"

    @abc.abstractmethod
    def from_x[T: Sample](self, sample: T, x: T, point: Point) -> T:
        "X̂ -> model output"

    @abc.abstractmethod
    def gamma(self, delta_point: DeltaPoint, eta: float = 0) -> float:
        "Sample carry-through coefficient."

    @abc.abstractmethod
    def delta(self, delta_point: DeltaPoint, eta: float = 0) -> float:
        "Model-output coefficient."

    def zeta_ts(self, delta: DeltaPoint, eta: float = 1.0, epsilon: float = 1e-8) -> float:
        """Conditional-variance SDE noise coefficient.

        Universal across predictor families; collapses to 0 for a pure ODE
        (``eta == 0``) or a zero target sigma."""
        if abs(eta) < epsilon or abs(delta.point_to.sigma) < epsilon:
            return 0

        ratio = (delta.point_from.alpha * delta.point_to.sigma) / (delta.point_to.alpha * delta.point_from.sigma)
        variance = (delta.point_to.sigma**2) * (1.0 - ratio**2)
        return eta * math.sqrt(max(0.0, variance))

    def zeta(self, delta_point: DeltaPoint, eta: float = 1.0) -> float:
        "Noise coefficient for a transition."
        return self.zeta_ts(delta_point, eta)

    def eta_transform(self, delta_point: DeltaPoint, eta: float = 0) -> DeltaPoint:
        "Shrink the target sigma by the injected-noise variance so totals stay consistent."
        point_from, point_to = delta_point
        if (zeta := self.zeta_ts(delta_point, eta)) != 0:
            point_to = Point(
                point_to.timestep,
                math.sqrt(max(0.0, point_to.sigma**2 - zeta**2)),
                point_to.alpha,
            )
        return DeltaPoint(point_from, point_to)

    def forward[T: Sample](
        self,
        sample: T,
        output: T,
        delta_point: DeltaPoint,
        noise: T | None = None,
        eta: float = 0,
    ) -> T:
        "``sample * Gamma + output * Delta (+ noise * zeta)`` — THE hot elementwise op."
        gamma = self.gamma(delta_point, eta)
        delta = self.delta(delta_point, eta)
        if noise is not None and (zeta := self.zeta(delta_point, eta)) != 0:
            return sumprod((sample, output, noise), (gamma, delta, zeta))
        return sumprod((sample, output), (gamma, delta))

    def backward[T: Sample](
        self,
        sample: T,
        result: T,
        delta_point: DeltaPoint,
        noise: T | None = None,
        eta: float = 0,
    ) -> T:
        "Exact inverse of :meth:`forward`, recovering the model output."
        gamma = self.gamma(delta_point, eta)
        delta = self.delta(delta_point, eta)
        if noise is not None and (zeta := self.zeta(delta_point, eta)) != 0:
            return (result - sample * gamma - noise * zeta) / delta
        return (result - sample * gamma) / delta


@dataclass(frozen=True)
class DataModel(DiffusionModel):
    "X-prediction: the model outputs the clean image directly."

    def to_x[T: Sample](self, sample: T, output: T, point: Point) -> T:
        return output

    def from_x[T: Sample](self, sample: T, x: T, point: Point) -> T:
        return x

    def gamma(self, delta_point: DeltaPoint, eta: float = 0) -> float:
        ts = self.eta_transform(delta_point, eta)
        return ts.point_to.sigma / ts.point_from.sigma

    def delta(self, delta_point: DeltaPoint, eta: float = 0) -> float:
        ts = self.eta_transform(delta_point, eta)
        return ts.point_to.alpha - ts.point_from.alpha * ts.point_to.sigma / ts.point_from.sigma


@dataclass(frozen=True)
class NoiseModel(DiffusionModel):
    "Epsilon-prediction: the model outputs the added noise (the usual default)."

    def to_x[T: Sample](self, sample: T, output: T, point: Point) -> T:
        _t, sigma, alpha = point
        return (sample - sigma * output) / alpha

    def from_x[T: Sample](self, sample: T, x: T, point: Point) -> T:
        _t, sigma, alpha = point
        return (sample - alpha * x) / sigma

    def gamma(self, delta_point: DeltaPoint, eta: float = 0) -> float:
        # eta-invariant: injected noise folds straight into the epsilon term
        return delta_point.point_to.alpha / delta_point.point_from.alpha

    def delta(self, delta_point: DeltaPoint, eta: float = 0) -> float:
        ts = self.eta_transform(delta_point, eta)
        return ts.point_to.sigma - (ts.point_to.alpha * ts.point_from.sigma) / ts.point_from.alpha


@dataclass(frozen=True)
class FlowModel(DiffusionModel):
    "U-prediction (flow matching): FLUX.1, SD3."

    def to_x[T: Sample](self, sample: T, output: T, point: Point) -> T:
        _t, sigma, alpha = point
        return (sample - sigma * output) / (alpha + sigma)

    def from_x[T: Sample](self, sample: T, x: T, point: Point) -> T:
        _t, sigma, alpha = point
        return (sample - (alpha + sigma) * x) / sigma

    def gamma(self, delta_point: DeltaPoint, eta: float = 0) -> float:
        ts = self.eta_transform(delta_point, eta)
        return (ts.point_to.sigma + ts.point_to.alpha) / (ts.point_from.sigma + ts.point_from.alpha)

    def delta(self, delta_point: DeltaPoint, eta: float = 0) -> float:
        ts = self.eta_transform(delta_point, eta)
        return (ts.point_from.alpha * ts.point_to.sigma - ts.point_to.alpha * ts.point_from.sigma) / (
            ts.point_from.alpha + ts.point_from.sigma
        )


@dataclass(frozen=True)
class VelocityModel(DiffusionModel):
    "V-prediction: used by zero-terminal-SNR models."

    def to_x[T: Sample](self, sample: T, output: T, point: Point) -> T:
        _t, sigma, alpha = point
        return alpha * sample - sigma * output

    def from_x[T: Sample](self, sample: T, x: T, point: Point) -> T:
        _t, sigma, alpha = point
        return (alpha * sample - x) / sigma

    def gamma(self, delta_point: DeltaPoint, eta: float = 0) -> float:
        ts = self.eta_transform(delta_point, eta)
        return (ts.point_to.sigma / ts.point_from.sigma) * (
            1 - ts.point_from.alpha * ts.point_from.alpha
        ) + ts.point_to.alpha * ts.point_from.alpha

    def delta(self, delta_point: DeltaPoint, eta: float = 0) -> float:
        ts = self.eta_transform(delta_point, eta)
        return ts.point_from.alpha * ts.point_to.sigma - ts.point_to.alpha * ts.point_from.sigma


@dataclass(frozen=True)
class FakeModel(DiffusionModel):
    "Marker base for transforms that only exist as alternative sampling spaces."


@dataclass(frozen=True)
class ScaleX(FakeModel):
    "X-prediction biased towards data (positive bias) or noise (negative)."

    bias: float = 3

    def x_scale(self, point: Point) -> float:
        # e^(-log10(|bias|+1) * coordinate); negative power since coords < 1
        return math.exp(-math.log10(abs(self.bias) + 1) * (point.sigma if self.bias < 0 else point.alpha))

    def to_x[T: Sample](self, sample: T, output: T, point: Point) -> T:
        return output * self.x_scale(point)

    def from_x[T: Sample](self, sample: T, x: T, point: Point) -> T:
        return x / self.x_scale(point)

    def gamma(self, delta_point: DeltaPoint, eta: float = 0) -> float:
        ts = self.eta_transform(delta_point, eta)
        return ts.point_to.sigma / ts.point_from.sigma

    def delta(self, delta_point: DeltaPoint, eta: float = 0) -> float:
        ts = self.eta_transform(delta_point, eta)
        return (ts.point_to.alpha - ts.point_from.alpha * ts.point_to.sigma / ts.point_from.sigma) * self.x_scale(
            ts.point_from
        )


@dataclass(frozen=True)
class ModelConvert:
    "Converts model output between predictor spaces by routing through X̂."

    transform_from: DiffusionModel
    transform_to: DiffusionModel

    def output_to[T: Sample](self, sample: T, output_from: T, point: Point) -> T:
        if self.transform_to is self.transform_from:
            return output_from
        return self.transform_to.from_x(sample, self.transform_from.to_x(sample, output_from, point), point)

    def output_from[T: Sample](self, sample: T, output_to: T, point: Point) -> T:
        if self.transform_from is self.transform_to:
            return output_to
        return self.transform_from.from_x(sample, self.transform_to.to_x(sample, output_to, point), point)

    def wrap_model_call[T: Sample](
        self, model: Callable[[T, float, float, float], T]
    ) -> Callable[[T, float, float, float], T]:
        "Wrap a model closure so its outputs arrive pre-converted."

        @wraps(model)
        def converted(x: T, t: float, s: float, a: float) -> T:
            return self.output_to(x, model(x, t, s, a), Point(t, s, a))

        return converted
