"""Core value types and scalar math shared by every layer of skrample-tpu.

This layer is deliberately framework-free: everything here operates on plain
Python floats or on any array type supporting elementwise ``+ - * /`` with
float scalars (numpy arrays, ``jax.Array``, ``torch.Tensor``).  That
polymorphism is what lets the *same* sampler spec run as a float64 host oracle
and as traced JAX code under ``jit``.

Behavioral parity notes (reference: Beinsezii/skrample):
  * ``Point``/``DeltaPoint``/``Step`` mirror ``skrample/common.py:24-97``.
  * ``MergeStrategy`` mirrors ``skrample/common.py:100-130``.
  * scalar helpers mirror ``skrample/common.py:133-213``.
"""

from __future__ import annotations

import enum
import math
from collections.abc import Callable, Sequence
from functools import lru_cache
from typing import TYPE_CHECKING, Any, NamedTuple

import numpy as np
from numpy.typing import NDArray

if TYPE_CHECKING:
    import jax
    import torch

    type Sample = float | NDArray[np.floating] | jax.Array | torch.Tensor
else:
    # Runtime alias: anything supporting float-scalar arithmetic qualifies.
    type Sample = Any

type RNG[T: Sample] = Callable[["Step | None"], T]
"""Noise source: called with the current Step (or None for initial noise).
The distribution should match what the model was trained on (usually normal)."""


class Point(NamedTuple):
    """One location on a noise schedule: ``(timestep, sigma, alpha)``.

    ``sigma`` is the noise fraction, ``alpha`` the clean-data fraction, both
    in the schedule's normalized sigma space.
    """

    timestep: float
    sigma: float
    alpha: float

    def add_noise[T: Sample](self, sample: T, noise: T) -> T:
        "Mix noise into a clean sample at this point: ``sample*alpha + noise*sigma``."
        return sample * self.alpha + noise * self.sigma

    def remove_noise[T: Sample](self, sample: T, noise: T) -> T:
        "Inverse of :meth:`add_noise`. At ``alpha == 0`` the noise term is returned."
        scaled = noise * self.sigma
        try:
            return (sample - scaled) / self.alpha
        except ZeroDivisionError:
            return scaled


class DeltaPoint(NamedTuple):
    "A pair of schedule points describing one transition (from -> to)."

    point_from: Point
    point_to: Point

    def difference(self) -> Point:
        return Point(
            self.point_to.timestep - self.point_from.timestep,
            self.point_to.sigma - self.point_from.sigma,
            self.point_to.alpha - self.point_from.alpha,
        )


class Step(NamedTuple):
    """A normalized time interval ``0.0..=1.0`` representing one sampling step.

    Provides adapters to/from integer loops (``for n in range(steps)``),
    matching the reference semantics at ``skrample/common.py:55-97``.
    """

    time_from: float
    time_to: float

    @staticmethod
    def from_int(position: int, amount: int) -> Step:
        "Build the step covering integer slot ``position`` of ``amount`` total."
        return Step(position / amount, (position + 1) / amount)

    def distance(self) -> float:
        return self.time_to - self.time_from

    def offset(self, steps: int | float) -> Step:
        "Shift the step by a (possibly fractional) number of step-widths."
        shift = self.distance() * steps
        return Step(self.time_from + shift, self.time_to + shift)

    def clamp(self) -> Step:
        "Keep the interval inside 0..1 while preserving its width."
        return Step(
            clamp(self.time_from, high=1 - self.distance()),
            clamp(self.time_to, low=self.distance()),
        )

    def position(self) -> float:
        "Denormalized index; inverse of :meth:`from_int` (roughly)."
        return self.time_from / self.distance()

    def amount(self) -> float:
        "Denormalized total step count; inverse of :meth:`from_int` (roughly)."
        return 1 / self.distance()

    def normal(self) -> Step:
        "Force time to flow forwards (``time_from <= time_to``)."
        return Step(min(self), max(self))


@enum.unique
class MergeStrategy(enum.StrEnum):
    "How to merge two lists (used for stacking schedule modifiers)."

    Ours = enum.auto()
    Theirs = enum.auto()
    After = enum.auto()
    "Theirs appended after ours."
    Before = enum.auto()
    "Theirs prepended before ours."
    UniqueAfter = enum.auto()
    "After, dropping theirs-items already present in ours."
    UniqueBefore = enum.auto()
    "Before, dropping ours-items already present in theirs."

    def merge[T](
        self,
        ours: list[T],
        theirs: list[T],
        cmp: Callable[[T, T], bool] = lambda a, b: a == b,
    ) -> list[T]:
        match self:
            case MergeStrategy.Ours:
                return ours
            case MergeStrategy.Theirs:
                return theirs
            case MergeStrategy.After:
                return ours + theirs
            case MergeStrategy.Before:
                return theirs + ours
            case MergeStrategy.UniqueAfter:
                return ours + [t for t in theirs if not any(cmp(o, t) for o in ours)]
            case MergeStrategy.UniqueBefore:
                return theirs + [o for o in ours if not any(cmp(t, o) for t in theirs)]


# --- scalar math -----------------------------------------------------------


def divf(lhs: float, rhs: float) -> float:
    "Division returning signed infinity for a zero denominator (0/0 raises)."
    if rhs != 0:
        return lhs / rhs
    if lhs == 0:
        raise ZeroDivisionError
    return math.copysign(math.inf, lhs)


def ln(x: float) -> float:
    "Natural log extended with ``ln(0) == -inf`` (negative input raises)."
    if x > 0:
        return math.log(x)
    if x < 0:
        raise ValueError
    return -math.inf


def normalize[T: Sample](regular: T, start: float, end: float = 0) -> T:
    "Rescale ``start..end`` down to ``1..0``."
    return (regular - end) / (start - end)


def regularize[T: Sample](normal: T, start: float, end: float = 0) -> T:
    "Rescale ``1..0`` back up to ``start..end``."
    return normal * (start - end) + end


def rescale_positive(x: float) -> float:
    "Map ``-inf..inf`` onto ``0..inf`` with 0 -> 1."
    return (abs(x) + 1) ** math.copysign(1, x)


def rescale_subnormal(x: float) -> float:
    "Map ``-inf..inf`` onto ``-1..1``."
    return math.copysign(1 - (abs(x) + 1) ** -1, x)


def exp[T: Sample](x: T) -> T:
    return math.e**x


def sigmoid[T: Sample](array: T) -> T:
    e: T = exp(array)
    return e / (1 + e)


def softmax[T: tuple[Sample, ...]](elems: T) -> T:
    total = sum(map(exp, elems))
    return tuple(exp(e) / total for e in elems)  # type: ignore[return-value]


def spowf[T: Sample](x: T, f: float) -> T:
    """Signed power: ``|x|**f`` with the sign of ``x`` re-applied.

    Stabilizes chaotic inputs at the cost of extra ops; the boolean trick
    keeps it polymorphic across float/ndarray/Tensor.
    """
    return abs(x) ** f * (-1 * (x < 0) | 1)


def mean(x: Sample) -> float:
    "Array -> ``mean().item()``; float -> itself."
    if isinstance(x, float | int):
        return x
    return x.mean().item()


def clamp(x: float, low: float = 0, high: float = 1) -> float:
    return max(low, min(high, x))


def sumprod[T: Sample](values: Sequence[T], weights: Sequence[float]) -> T:
    """Weighted sum ``sum(v * w)``.

    Delegates to ``math.sumprod`` which uses extended precision for float
    inputs and falls back to object arithmetic for arrays/tensors — the same
    accumulation the reference relies on (``skrample/sampling/models.py:65``).
    """
    return math.sumprod(values, weights)  # type: ignore[arg-type,return-value]


@lru_cache
def bashforth(order: int) -> tuple[float, ...]:
    """Adams-Bashforth weights for the given order.

    Solved from the Vandermonde moment system
    ``sum_j w_j * (-j)**k == 1/(k+1)`` for ``k < order``.
    """
    moments = [[(-j) ** k for j in range(order)] for k in range(order)]
    rhs = [1 / (k + 1) for k in range(order)]
    return tuple(np.linalg.solve(moments, rhs).tolist())
