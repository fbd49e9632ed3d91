"""Composable sampler traits (mixin dataclasses).

Reference parity: Beinsezii/skrample ``skrample/sampling/traits.py``.
"""

from __future__ import annotations

import abc
from dataclasses import dataclass

from ..common import Point, Sample
from . import models


@dataclass(frozen=True)
class SamplingCommon:
    "Baseline noise add/remove hooks — today always an alias to Point."

    def add_noise[T: Sample](self, sample: T, noise: T, point: Point) -> T:
        return point.add_noise(sample, noise)

    def remove_noise[T: Sample](self, sample: T, noise: T, point: Point) -> T:
        return point.remove_noise(sample, noise)


@dataclass(frozen=True)
class HigherOrder(abc.ABC):
    order: int = 2
    """Solver order. Higher orders use more model evaluations (or more
    history) per update; the effective order may be lower near boundaries.
    Order 1 is almost always plain Euler."""

    @staticmethod
    def min_order() -> int:
        return 1

    @staticmethod
    @abc.abstractmethod
    def max_order() -> int: ...


@dataclass(frozen=True)
class Stochastic:
    stochasticity: float = 0
    "0 = deterministic ODE, 1 = fully stochastic SDE."


@dataclass(frozen=True)
class DerivativeTransform:
    "Samplers that can run their correction math in a different predictor space."

    derivative_transform: models.DiffusionModel | None = models.DataModel()  # noqa: RUF009 — immutable
    "Space the model output is converted into before derivative math."


@dataclass(frozen=True)
class UnifiedModelling(DerivativeTransform, Stochastic, HigherOrder):
    "Joint trait bundle with a fixed MRO, used by most higher-order samplers."
