"""Continuous noise schedules, computed host-side in float64 numpy.

Design stance (TPU-first): schedules are *tiny* ``(N, 3)`` tables evaluated
once per ``(schedule, steps)`` pair and cached.  They are kept in host numpy
float64 so sigma/timestep tables bit-match the reference implementation
(Beinsezii/skrample ``skrample/scheduling.py``); device code consumes them as
baked-in fp32 constants (see :mod:`skrample_tpu.ops`).

Every schedule is a frozen, hashable dataclass, which makes the global LRU
caching sound and lets configs compose by construction.

Reference parity map:
  * ``SigmaSpace``/``VariancePreserving``/``FlowMatching`` — scheduling.py:22-48
  * ``SkrampleSchedule`` continuous API — scheduling.py:65-135
  * ``Scaled``/``ZSNR``/``Linear``/``FixedSchedule`` — scheduling.py:155-286
  * ``SubSchedule``/``SubSigmas`` + Karras/Exponential/Beta/Probit — :289-549
  * ``ScheduleModifier`` + FlowShift/Hyper/Sinner + stack machinery — :352-630
"""

from __future__ import annotations

import abc
import functools
import math
from collections.abc import Sequence
from dataclasses import dataclass, replace
from typing import Literal, Self

import numpy as np

from .common import DeltaPoint, Point, Step, normalize, regularize, rescale_positive, sigmoid

type NPPoints = np.ndarray[tuple[int, Literal[3]], np.dtype[np.float64]]
"Rows of [timestep, sigma, alpha]."

type NPSequence = np.ndarray[tuple[int], np.dtype[np.float64]]

type Sigma = NPSequence | float


# --- sigma spaces ----------------------------------------------------------


@dataclass(frozen=True)
class SigmaSpace(abc.ABC):
    """Conversion between "regular" sigma values and the normalized
    ``(sigma, alpha)`` pair a schedule exposes."""

    @abc.abstractmethod
    def normalize(self, regular_sigmas: Sigma) -> tuple[NPSequence, NPSequence]:
        "regular sigma -> (sigma, alpha)"

    @abc.abstractmethod
    def regularize(self, normal_sigmas: Sigma) -> NPSequence:
        "normalized sigma -> regular sigma"


@dataclass(frozen=True)
class VariancePreserving(SigmaSpace):
    "Polar / variance-preserving space: ``sigma^2 + alpha^2 == 1``."

    def normalize(self, regular_sigmas: Sigma) -> tuple[NPSequence, NPSequence]:
        theta = np.atan(regular_sigmas)
        return np.sin(theta), np.cos(theta)

    def regularize(self, normal_sigmas: Sigma) -> NPSequence:
        return np.tan(np.asin(normal_sigmas))


@dataclass(frozen=True)
class FlowMatching(SigmaSpace):
    "Complement space used by flow-matching models: ``alpha == 1 - sigma``."

    def normalize(self, regular_sigmas: Sigma) -> tuple[NPSequence, NPSequence]:
        regular_sigmas = np.asarray(regular_sigmas)
        return regular_sigmas, 1 - regular_sigmas

    def regularize(self, normal_sigmas: Sigma) -> NPSequence:
        return np.asarray(normal_sigmas)


# --- global schedule caches ------------------------------------------------


@functools.lru_cache
def np_schedule_lru(schedule: SkrampleSchedule, steps: int) -> NPPoints:
    """Globally cached ``schedule.schedule_np(steps)``.

    Sound because schedules are frozen/hashable.  This is the 95% wrapper
    overhead reduction the reference claims for complex schedule stacks.
    """
    return schedule.schedule_np(steps)


@functools.lru_cache
def schedule_lru(schedule: SkrampleSchedule, steps: int) -> Sequence[Point]:
    "Tuple-of-Point view of :func:`np_schedule_lru`."
    return tuple(Point(*row) for row in np_schedule_lru(schedule, steps).tolist())


_POINT_CACHE: dict[tuple[SkrampleSchedule, float, bool], Point] = {}
_POINT_CACHE_MAX = 1 << 20


def point_lru(schedule: SkrampleSchedule, t: float, inverse: bool) -> Point:
    """Per-point evaluation cache behind the Point-returning schedule APIs.

    Samplers query the same handful of grid points over and over (the
    reference re-evaluates the whole modifier stack each time — its dominant
    per-step cost).  Batch-vs-single bit-equality is an invariant of every
    schedule (tested), so caching single evaluations is sound, and keying
    globally is sound because schedules are frozen/hashable."""
    key = (schedule, t, inverse)
    hit = _POINT_CACHE.get(key)
    if hit is None:
        if len(_POINT_CACHE) >= _POINT_CACHE_MAX:
            _POINT_CACHE.clear()
        rows = schedule.ipoints_np([t]) if inverse else schedule.points_np([t])
        hit = Point(*rows[0].tolist())
        _POINT_CACHE[key] = hit
    return hit


def warm_point_cache(schedule: SkrampleSchedule, ts: Sequence[float], inverse: bool = True) -> None:
    "Batch-evaluate a grid once and seed the point cache (scipy-heavy stacks)."
    rows = (schedule.ipoints_np(ts) if inverse else schedule.points_np(ts)).tolist()
    for t, row in zip(ts, rows, strict=True):
        _POINT_CACHE.setdefault((schedule, float(t), inverse), Point(*row))


# --- schedule base classes -------------------------------------------------


@dataclass(frozen=True)
class SkrampleSchedule(abc.ABC):
    """A continuously-variable noise schedule.

    The single abstract hook is ``_points(t)`` where ``t`` runs 0 (clean) to
    1 (pure noise); everything else — inverse/inference views, single-point
    sugar, full tables — derives from it.
    """

    @property
    @abc.abstractmethod
    def space(self) -> SigmaSpace:
        "Sigma space the schedule's (sigma, alpha) columns live in."

    @abc.abstractmethod
    def _points(self, t: NPSequence) -> NPPoints:
        "Core mapping. ``t=0`` is no noise, ``t=1`` is all noise."

    # forward views (0 = clean, 1 = noise)

    def points_np(self, t: Sequence[float] | NPSequence) -> NPPoints:
        return self._points(np.asarray(t, dtype=np.float64).clip(0, 1))

    def points(self, t: Sequence[float] | NPSequence) -> Sequence[Point]:
        return [point_lru(self, float(x), False) for x in t]

    def point(self, t: float) -> Point:
        return point_lru(self, float(t), False)

    # inverse / "inference" views (0 = noise, 1 = clean)

    def ipoints_np(self, t: Sequence[float] | NPSequence) -> NPPoints:
        return self._points(1 - np.asarray(t, dtype=np.float64).clip(0, 1))

    def ipoints(self, t: Sequence[float] | NPSequence) -> Sequence[Point]:
        return [point_lru(self, float(x), True) for x in t]

    def ipoint(self, t: float) -> Point:
        return point_lru(self, float(t), True)

    @functools.cached_property
    def point_0(self) -> Point:
        "The clean endpoint."
        return self.point(0)

    @functools.cached_property
    def point_1(self) -> Point:
        "The all-noise endpoint."
        return self.point(1)

    def step(self, step: Step) -> DeltaPoint:
        return DeltaPoint(*self.points(step))

    def istep(self, step: Step) -> DeltaPoint:
        return DeltaPoint(*self.ipoints(step))

    def schedule_np(self, steps: int) -> NPPoints:
        "Full inference table, excluding the trailing zero point."
        return self._points(np.linspace(1, 0, steps, endpoint=False))

    def schedule(self, steps: int) -> Sequence[Point]:
        return tuple(Point(*row) for row in self.schedule_np(steps).tolist())


@dataclass(frozen=True)
class ScheduleCommon(SkrampleSchedule):
    "Base schedules trained over a discrete timestep range."

    base_timesteps: int = 1000
    "Timestep count the model was trained on."

    @functools.cached_property
    def all_points(self) -> NPPoints:
        "Dense table over ``base_timesteps`` (cached per instance)."
        return self.points_np(np.linspace(0, 1, self.base_timesteps))

    @abc.abstractmethod
    def _sigmas_to_points(self, sigmas: NPSequence, alphas: NPSequence) -> NPPoints:
        "Inverse map sigma -> full point, used by sub-schedules."


@dataclass(frozen=True)
class FixedSchedule(SkrampleSchedule):
    """Wraps an arbitrary imported ``(t, sigma, alpha)`` table (e.g. a
    diffusers scheduler's timesteps/sigmas) behind the continuous API via
    linear interpolation, with the terminal ``[0, 0, 1]`` point appended."""

    fixed_schedule: Sequence[Point] | NPPoints
    sigma_space: SigmaSpace

    @classmethod
    def from_regular(cls, timesteps: NPSequence, regular_sigmas: NPSequence, sigma_space: SigmaSpace) -> Self:
        return cls(np.stack([timesteps, *sigma_space.normalize(regular_sigmas)], axis=1), sigma_space)

    def _points(self, t: NPSequence) -> NPPoints:
        from scipy.interpolate import make_interp_spline

        table = np.concatenate([np.asarray(self.fixed_schedule, dtype=np.float64), [[0, 0, 1]]])
        return make_interp_spline(np.linspace(0, 1, len(table)), table, k=1, axis=0)(1 - t)

    @property
    def space(self) -> SigmaSpace:
        return self.sigma_space

    def __hash__(self) -> int:  # ndarray field is not hashable by default
        return hash((type(self), np.asarray(self.fixed_schedule, dtype=np.float64).tobytes(), self.sigma_space))

    def __eq__(self, other: object) -> bool:
        return (
            type(other) is type(self)
            and np.array_equal(np.asarray(self.fixed_schedule), np.asarray(other.fixed_schedule))  # type: ignore[attr-defined]
            and self.sigma_space == other.sigma_space  # type: ignore[attr-defined]
        )


# --- base schedules --------------------------------------------------------


@dataclass(frozen=True)
class Scaled(ScheduleCommon):
    """The SD1.5/SDXL "scaled linear" beta schedule, made continuous.

    Instead of the discrete ``cumprod(1 - betas)`` the cumulative product is
    expressed in closed form as ``exp(-T * (∫beta + ∫beta²/2))`` so the
    schedule can be sampled at any real ``t``.
    """

    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_scale: float = 2

    @property
    def space(self) -> SigmaSpace:
        return VariancePreserving()

    def continuous_alphas_cumprod(self, t: NPSequence) -> NPSequence:
        k = self.beta_scale
        T = self.base_timesteps
        root_start = self.beta_start ** (1 / k)
        root_end = self.beta_end ** (1 / k)
        slope = root_end - root_start

        if abs(slope) < 1e-8:
            beta_val = root_start**k
            integral_beta = beta_val * t
            integral_beta2 = (beta_val**2) * t
        else:
            # ∫0..t (root_start + slope*u)^k du and the squared version
            integral_beta = ((root_start + slope * t) ** (k + 1) - root_start ** (k + 1)) / (slope * (k + 1))
            integral_beta2 = ((root_start + slope * t) ** (2 * k + 1) - root_start ** (2 * k + 1)) / (
                slope * (2 * k + 1)
            )

        return np.exp(-(T * (integral_beta + integral_beta2 / 2)))

    def _points(self, t: NPSequence) -> NPPoints:
        alphas_cumprod = self.continuous_alphas_cumprod(t)
        sigmas = np.sqrt((1 - alphas_cumprod) / alphas_cumprod)
        return np.stack([t * self.base_timesteps, *self.space.normalize(sigmas)], 1)

    def _sigmas_to_points(self, sigmas: NPSequence, alphas: NPSequence) -> NPPoints:
        timesteps = np.interp(sigmas, self.all_points[:, 1], self.all_points[:, 0])
        return np.stack([timesteps, sigmas, alphas], axis=1)


@dataclass(frozen=True)
class ZSNR(Scaled):
    """Zero-terminal-SNR rescale of :class:`Scaled` per arXiv:2305.08891
    Algorithm 1 — shift+scale ``sqrt(alphas_cumprod)`` so the final step is
    exactly zero SNR."""

    def continuous_alphas_cumprod(self, t: NPSequence) -> NPSequence:
        roots = np.sqrt(super().continuous_alphas_cumprod(np.concatenate([[0], t, [1]])))

        first = roots[0].item()
        last = roots[-1].item()
        roots = roots[1:-1]

        roots -= last  # terminal step hits exactly zero
        roots *= first / (first - last)  # first step restored

        return roots**2


@dataclass(frozen=True)
class Linear(ScheduleCommon):
    "Linear sigma ramp ``sigma(t) = t * sigma_start`` (flow-matching default)."

    sigma_start: float = 1
    custom_space: SigmaSpace | None = None
    """Explicit sigma space override.  When unset: FlowMatching for
    ``sigma_start <= 1``, VariancePreserving otherwise."""

    @property
    def space(self) -> SigmaSpace:
        if self.custom_space is not None:
            return self.custom_space
        return FlowMatching() if self.sigma_start <= 1 else VariancePreserving()

    def _points(self, t: NPSequence) -> NPPoints:
        return np.stack([t * self.base_timesteps, *self.space.normalize(t * self.sigma_start)], axis=1)

    def _sigmas_to_points(self, sigmas: NPSequence, alphas: NPSequence) -> NPPoints:
        return np.stack([sigmas * (self.base_timesteps / self.sigma_start), sigmas, alphas], axis=1)


# --- composition machinery -------------------------------------------------


@dataclass(frozen=True)
class _PartialSchedule[T: SkrampleSchedule](SkrampleSchedule):
    "Shared base for schedules that wrap another schedule."

    base: T

    @property
    @abc.abstractmethod
    def lowest(self) -> T:
        "The bottom-most schedule of the stack."

    @property
    @abc.abstractmethod
    def all(self) -> Sequence[SkrampleSchedule]:
        "Every stack component recursively, self included."

    @property
    def space(self) -> SigmaSpace:
        return self.base.space


@dataclass(frozen=True)
class SubSchedule(_PartialSchedule[ScheduleCommon]):
    """Replaces the base schedule's curve entirely while borrowing its
    sigma range and inverse map. Not standalone."""

    base: ScheduleCommon

    @property
    def all(self) -> tuple[SubSchedule, ScheduleCommon]:
        return (self, self.base)

    @property
    def lowest(self) -> ScheduleCommon:
        return self.base

    @property
    def base_timesteps(self) -> int:
        return self.base.base_timesteps


class SubSigmas(SubSchedule):
    "Sub-schedule defined by a replacement regular-sigma curve."

    @functools.cached_property
    def _base_regular_0(self) -> float:
        return self.base.space.regularize(self.base.point_0.sigma).item()

    @functools.cached_property
    def _base_regular_1(self) -> float:
        return self.base.space.regularize(self.base.point_1.sigma).item()

    @abc.abstractmethod
    def _sub_sigmas(self, t: NPSequence) -> NPSequence:
        "Regular-space sigma curve over t (0 = clean, 1 = noise)."

    def _points(self, t: NPSequence) -> NPPoints:
        return self.base._sigmas_to_points(*self.space.normalize(self._sub_sigmas(t)))


@dataclass(frozen=True)
class ScheduleModifier(_PartialSchedule[SkrampleSchedule]):
    "Time-warping wrapper: ``_points(t) == base._points(warp(t))``."

    base: SkrampleSchedule

    @abc.abstractmethod
    def _modify(self, t: NPSequence) -> NPSequence:
        pass

    def _points(self, t: NPSequence) -> NPPoints:
        return self.base._points(self._modify(t))

    @property
    def all_split(self) -> tuple[list[ScheduleModifier], SubSchedule | None, SkrampleSchedule]:
        "Decompose the stack into (modifiers, sub-schedule, base) for type-safe surgery."
        mods: list[ScheduleModifier] = [self]
        cursor: SkrampleSchedule = self.base
        while isinstance(cursor, ScheduleModifier):
            mods.append(cursor)
            cursor = cursor.base

        sub: SubSchedule | None = None
        if isinstance(cursor, SubSchedule):
            sub, cursor = cursor, cursor.base

        return (mods, sub, cursor)

    @property
    def all(self) -> list[SkrampleSchedule]:
        mods, sub, base = self.all_split
        return [*mods, *((sub,) if sub is not None else ()), base]

    @property
    def lowest(self) -> SkrampleSchedule:
        return self.all_split[2]

    @staticmethod
    def stack(
        modifiers: list[ScheduleModifier],
        sub: SubSchedule | None,
        base: ScheduleCommon | SkrampleSchedule,
    ) -> ScheduleModifier | SubSchedule | SkrampleSchedule:
        """Rebuild a stack from its :attr:`all_split` parts, re-pointing every
        ``base`` field.  ``base`` must be a ScheduleCommon when ``sub`` is set."""
        cursor: SkrampleSchedule = base
        if sub is not None:
            assert isinstance(base, ScheduleCommon)
            cursor = replace(sub, base=cursor)
        for mod in reversed(modifiers):
            cursor = replace(mod, base=cursor)
        return cursor

    def find[T: ScheduleModifier](self, schedule_type: type[T], exact: bool = False) -> T | None:
        "First modifier of the given type in the stack (subclasses match unless ``exact``)."
        for mod in self.all_split[0]:
            if type(mod) is schedule_type or (not exact and isinstance(mod, schedule_type)):
                return mod  # type: ignore[return-value]
        return None

    def find_split[T: ScheduleModifier](
        self,
        schedule_type: type[T],
        exact: bool = False,
    ) -> tuple[list[ScheduleModifier], T, list[ScheduleModifier], SubSchedule | None, SkrampleSchedule] | None:
        "Like :meth:`find`, additionally splitting the stack around the match."
        mods, sub, base = self.all_split
        found: T | None = None
        before: list[ScheduleModifier] = []
        after: list[ScheduleModifier] = []

        for mod in mods:
            if found is None and (type(mod) is schedule_type or (not exact and isinstance(mod, schedule_type))):
                found = mod  # type: ignore[assignment]
            elif found is None:
                before.append(mod)
            else:
                after.append(mod)

        if found is not None:
            return (before, found, after, sub, base)
        return None


@dataclass(frozen=True)
class NoSub(SubSchedule):
    "Identity sub-schedule for generic programming."

    def _points(self, t: NPSequence) -> NPPoints:
        return self.base._points(t)


@dataclass(frozen=True)
class NoMod(ScheduleModifier):
    "Identity modifier for generic programming."

    def _modify(self, t: NPSequence) -> NPSequence:
        return t


# --- sub-sigma curves ------------------------------------------------------


@dataclass(frozen=True)
class Karras(SubSigmas):
    "Karras rho-ramp (arXiv:2206.00364), intended for SD1.x models."

    rho: float = 7.0
    steps: float = 20
    "Step count used to pick the minimum sigma anchor."

    @functools.cached_property
    def _base_regular_s(self) -> float:
        return self.base.space.regularize(self.base.point(1 / self.steps).sigma).item()

    def _sub_sigmas(self, t: NPSequence) -> NPSequence:
        sigma_min, sigma_max = self._base_regular_s, self._base_regular_1
        t = np.concatenate([[1, 0], t])
        sigmas = ((sigma_min ** (1.0 / self.rho)) * (1 - t) + (sigma_max ** (1.0 / self.rho)) * t) ** self.rho
        return normalize(sigmas[2:], sigmas[0], sigmas[1]) * sigma_max


@dataclass(frozen=True)
class Exponential(SubSigmas):
    'Log-space sigma ramp; "polyexponential" when ``rho != 1``.'

    rho: float = 1.0
    steps: float = 20

    @functools.cached_property
    def _base_regular_s(self) -> float:
        return self.base.space.regularize(self.base.point(1 / self.steps).sigma).item()

    def _sub_sigmas(self, t: NPSequence) -> NPSequence:
        sigma_min, sigma_max = self._base_regular_s, self._base_regular_1
        t = np.concatenate([[1, 0], t]) ** self.rho
        sigmas = np.exp(np.log(sigma_min) * (1 - t) + np.log(sigma_max) * t)
        return normalize(sigmas[2:], sigmas[0], sigmas[1]) * sigma_max


@dataclass(frozen=True)
class Beta(SubSigmas):
    "Beta-distribution ppf S-curve (arXiv:2407.12173)."

    alpha: float = 0.6
    beta: float = 0.6

    def _sub_sigmas(self, t: NPSequence) -> NPSequence:
        from scipy.stats import beta

        sigma_max = self._base_regular_1
        probabilities = np.concatenate([[1], t])  # keep 1.0 for post-ppf normalize
        sigmas = beta.ppf(probabilities, self.alpha, self.beta)
        sigmas = normalize(sigmas, sigmas[0])[1:]
        return sigmas * sigma_max


@dataclass(frozen=True)
class Probit(SubSigmas):
    """``sigmoid(norm.ppf(t))`` S-curve — the continuous analog of the
    ``sort(randn(steps))`` schedules used by some trainers."""

    scale: float = 3
    "Curve sharpness, >= 0."

    def _sub_sigmas(self, t: NPSequence) -> NPSequence:
        from scipy.stats import norm

        t = np.concatenate([[1, 0], t])  # endcaps for post-sigmoid normalize
        probabilities = regularize(t, 1 - 1e-8, 0)  # exactly 1.0 is invalid
        sigmas = sigmoid(norm.ppf(probabilities, scale=self.scale))
        sigmas = normalize(sigmas[2:], *sigmas[:2])
        return sigmas * self._base_regular_1


# --- time-warp modifiers ---------------------------------------------------


@dataclass(frozen=True)
class FlowShift(ScheduleModifier):
    "The Flux/SD3 resolution shift: ``t -> shift / (shift + 1/t - 1)``."

    shift: float = 3.0

    def _modify(self, t: NPSequence) -> NPSequence:
        return self.shift / (self.shift + (1 / t - 1))


@dataclass(frozen=True)
class Hyper(ScheduleModifier):
    "Hyperbolic warp: tanh for positive scale, sinh for negative."

    scale: float = 2
    tail: bool = True
    "Include the trailing half to form an S-curve."

    def _modify(self, t: NPSequence) -> NPSequence:
        if abs(self.scale) <= 1e-8:
            return t
        points = regularize(np.concatenate([[1], t]), self.scale, -self.scale * self.tail)
        # sqrt(2) factor keeps tanh's active region aligned with the input range
        points = np.sinh(points) if self.scale < 0 else np.tanh(points / math.sqrt(2))
        return normalize(points[1:], points[0], -points[0] * self.tail)


@dataclass(frozen=True)
class Sinner(ScheduleModifier):
    "Sine-wave warp ``y = sin(x) + x*scale`` with configurable node count."

    count: float = -2
    """Wave node count centered on 2 (half cycle).  Negative values approach a
    single crest (quarter cycle); positive values add whole cycles per count."""

    scale: float = 2
    """Steepness; negative mirrors the waveform.  The multi-head constraint
    (no trough below a neighboring crest) bounds achievable sharpness."""

    def _modify(self, t: NPSequence) -> NPSequence:
        if abs(self.scale) <= 1e-8 or self.count == math.inf:
            return t

        # count: -inf..inf -> 1..inf, doubling for positive inputs
        count = rescale_positive(self.count * 2 ** math.copysign(1, self.count)) + 1

        t = np.concatenate([[0, 1], 1 - t])  # inverted period: first wave at T=1 is monotone
        period = t * (math.pi * count)

        if self.scale >= 0:  # 180 degree phase flip mirrors the wave
            period += math.pi

        # |0..inf| -> inf..1; flat offset, so larger scale = smaller waves post-normalize
        scale = abs(self.scale) ** -1 + 1

        points = np.sin(period) + period * scale  # monotone for scale >= 1
        return normalize(points[2:], *points[:2])
