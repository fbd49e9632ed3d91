"""Noise generators on ``jax.random``.

Unlike the reference's stateful torch generators (``skrample/pytorch/
noise.py``), every generator here is a frozen config whose
``generate(index, step)`` is a *pure function* of ``(seed key, call index,
step)`` — counter-based randomness instead of sequential streams.  That
makes them jit/vmap/scan-compatible and gives batch determinism via
``fold_in`` rather than per-item generator objects.

Family parity:
  Random  -> i.i.d. normal                       (noise.py:58)
  Offset  -> mean-shift along chosen dims        (noise.py:77)
  Pyramid -> multi-resolution noise              (noise.py:116)
  Brownian-> virtual Brownian tree               (noise.py:210, sans torchsde)
  Colored -> power-law spectrum via rfftn        (noise.py:255)
  BatchNoise -> per-item key fan-out             (noise.py:438)
"""

from __future__ import annotations

import abc
import math
from dataclasses import dataclass, field
from typing import Any, Self

import jax
import jax.numpy as jnp
import numpy as np

from ..common import Step, divf, rescale_positive
from .brownian import brownian_at, brownian_increment

__all__ = [
    "BatchNoise",
    "Brownian",
    "BrownianProps",
    "Colored",
    "ColoredProps",
    "JaxNoise",
    "NoiseCommon",
    "NoiseProps",
    "Offset",
    "OffsetProps",
    "Pyramid",
    "PyramidProps",
    "Random",
    "brownian_at",
    "brownian_increment",
    "stack_noise",
]


@dataclass(frozen=True)
class NoiseProps:
    "Configurable generator properties; reuse the props, not a generator state."


class JaxNoise(abc.ABC):
    @abc.abstractmethod
    def generate(self, index: int, step: Step | None) -> jax.Array:
        """Noise for sampling step ``index`` (the call counter) covering
        ``step``.  Pure: same (seed, index, step) -> same tensor."""
        raise NotImplementedError


_STATIC_SALT = 0x5EED_57A7
"fold_in salt reserving a key stream for static (step-invariant) components."


def _as_key(seed: int | jax.Array) -> jax.Array:
    if isinstance(seed, int):
        return jax.random.PRNGKey(seed)
    return seed


@dataclass(frozen=True)
class NoiseCommon[T: NoiseProps | None](JaxNoise):
    "Common fields + helpers for the base generators."

    shape: tuple[int, ...]
    seed: jax.Array = field(compare=False)
    "PRNG key (or pass an int to ``from_inputs``)."
    dtype: Any = jnp.float32
    props: T = None

    def _key(self, index: int, salt: int = 0) -> jax.Array:
        key = jax.random.fold_in(self.seed, index)
        return jax.random.fold_in(key, salt) if salt else key

    def _randn(self, key: jax.Array, shape: tuple[int, ...] | None = None) -> jax.Array:
        return jax.random.normal(key, self.shape if shape is None else shape, self.dtype)

    @classmethod
    def from_inputs(
        cls,
        shape: tuple[int, ...],
        seed: int | jax.Array,
        props: T = None,
        dtype: Any = jnp.float32,
    ) -> Self:
        "Uniform constructor over inputs typically available at inference time."
        return cls(shape, _as_key(seed), dtype, props)


@dataclass(frozen=True)
class Random(NoiseCommon[None]):
    "Pure i.i.d. normal noise."

    def generate(self, index: int, step: Step | None) -> jax.Array:
        return self._randn(self._key(index))


@dataclass(frozen=True)
class OffsetProps(NoiseProps):
    dims: tuple[int, ...] = (0,)
    strength: float = 0.2  # low enough not to detonate most models
    static: bool = False
    "Keep the same offset for every step."


@dataclass(frozen=True)
class Offset(NoiseCommon[OffsetProps]):
    "Random mean offset along the chosen dims, added to white noise."

    def _offset(self, key: jax.Array) -> jax.Array:
        props = self.props or OffsetProps()
        shape = tuple(d if n in props.dims else 1 for n, d in enumerate(self.shape))
        return self._randn(key, shape) * props.strength**2

    def generate(self, index: int, step: Step | None) -> jax.Array:
        props = self.props or OffsetProps()
        offset_key = jax.random.fold_in(self.seed, _STATIC_SALT) if props.static else self._key(index, salt=1)
        return self._randn(self._key(index)) + self._offset(offset_key)


@dataclass(frozen=True)
class PyramidProps(OffsetProps):
    dims: tuple[int, ...] = (-1, -2)
    strength: float = 0.3
    depth: int = 99
    "Maximum pyramid levels, counted from the top."


@dataclass(frozen=True)
class Pyramid(NoiseCommon[PyramidProps]):
    """Multi-resolution noise: progressively downscaled normal noise is
    upsampled back and summed with geometric weights (the wandb multires
    recipe).  Per-level scale factors draw 2x-4x from the key stream."""

    def _pyramid(self, key: jax.Array) -> jax.Array:
        props = self.props or PyramidProps()
        ndim = len(self.shape)
        dims = [ndim + d if d < 0 else d for d in props.dims]
        mask = [n in dims for n in range(ndim)]

        levels: list[jax.Array] = []
        running = list(self.shape)
        for i in range(99):
            r_key, n_key, key = jax.random.split(jax.random.fold_in(key, i), 3)
            # 2x-4x shrink per level, randomized to decorrelate the grids
            r = float(jax.random.uniform(r_key)) * 2 + 2
            running = [max(1, int(s / (r**i))) if m else s for m, s in zip(mask, running)]

            level = jax.random.normal(n_key, tuple(running), self.dtype)
            level = jax.image.resize(level, self.shape, method="bilinear")
            levels.append(level * props.strength**i)

            if any(s <= 1 for m, s in zip(mask, running) if m):
                break

        steps = len(levels) - 1
        skip = min(steps, max(0, steps - props.depth))
        return sum(levels[skip:])

    def generate(self, index: int, step: Step | None) -> jax.Array:
        props = self.props or PyramidProps()
        pyr_key = jax.random.fold_in(self.seed, _STATIC_SALT) if props.static else self._key(index, salt=1)
        noise = self._randn(self._key(index)) + self._pyramid(pyr_key)
        return noise / noise.std()  # back to roughly unit variance


@dataclass(frozen=True)
class BrownianProps(NoiseProps):
    max_steps: int = 10_000
    """Target tree resolution; the dyadic depth is
    ``ceil(log2(max_steps * 10))``.  Intervals below one grid cell are
    widened to a cell."""


@dataclass(frozen=True)
class Brownian(NoiseCommon[BrownianProps]):
    """Deterministic-over-time noise from the virtual Brownian tree:
    ``generate`` depends on the *interval*, not the call order, so SDE
    trajectories reproduce across differing step counts and resumes."""

    @property
    def depth(self) -> int:
        props = self.props or BrownianProps()
        return max(1, math.ceil(math.log2(props.max_steps * 10)))

    def generate(self, index: int, step: Step | None) -> jax.Array:
        if not step:
            return self._randn(self._key(index))
        step = step.normal().clamp()
        return brownian_increment(self.seed, step.time_from, step.time_to, self.depth, self.shape, self.dtype)


@dataclass(frozen=True)
class ColoredProps(NoiseProps):
    energy: float | None = None
    "Target output std; None renormalizes back to the input deviation."
    color_start: float = 1 / 4
    "Power-law exponent at step None / t=0 (higher = redder)."
    color_end: float = -2
    "Power-law exponent at t=1."
    color_curve: float = 2
    "FlowShift-style curvature of the exponent ramp."


def _radial_freq_grid(shape: tuple[int, ...]) -> np.ndarray:
    """Normalized radial frequency magnitudes matching ``rfftn`` output
    layout: full fftfreq on leading axes, the non-redundant half on the last.
    Host-side numpy — it is a compile-time constant."""
    ndim = len(shape)
    axes: list[np.ndarray] = []
    for i, dim in enumerate(shape):
        if i == ndim - 1:
            axes.append(np.arange(dim // 2 + 1) / dim)  # [0, 0.5]
        else:
            axes.append(np.abs(np.fft.fftfreq(dim)))
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    radius = np.linalg.norm(grid, axis=-1)
    r_max = radius.max()
    return radius / r_max if r_max > 0 else radius


@dataclass(frozen=True)
class Colored(NoiseCommon[ColoredProps]):
    """Power-law colored noise: white noise shaped in the Fourier domain so
    PSD ~ f^-exponent, with the exponent interpolated over the schedule."""

    @staticmethod
    def _accurate_std(x: jax.Array) -> jax.Array:
        """Bessel-corrected std (torch semantics — the reference normalized
        with unbiased stds), ALWAYS reduced in float64.

        One semantic on both paths: a local x64 scope makes the traced
        reduction f64 too, so the same generator produces the same values
        whether it runs eagerly or under jit (tested to f64 reduce-order
        tolerance)."""
        with jax.enable_x64():
            return jnp.std(x.astype(jnp.float64), ddof=1)

    @staticmethod
    def _f64_ratio(num: jax.Array | float, den: jax.Array | float, out_dtype: Any) -> jax.Array:
        "Divide in float64, hand back a scalar in the array-math dtype."
        with jax.enable_x64():
            ratio = jnp.float64(num) / jnp.float64(den)
        return ratio.astype(out_dtype)

    @staticmethod
    def colorize(white: jax.Array, exponent: float = 0.0, energy: float | None = None) -> jax.Array:
        "Shape existing white noise to the power-law spectrum; std-preserving."
        wstd = Colored._accurate_std(white)

        if exponent == 0.0:  # fast path, but keep the energy target
            if energy is None:
                return white
            boost = Colored._f64_ratio(energy, wstd, white.dtype)
            return jnp.where(wstd.astype(white.dtype) < 1e-8, white, white * boost)

        w = white.squeeze()
        work_dtype = w.dtype if w.dtype in (jnp.float32, jnp.float64) else jnp.float32
        w = w.astype(work_dtype)

        spectrum = jnp.fft.rfftn(w)
        freq = _radial_freq_grid(w.shape)

        # amplitude ~ f^(-exp/2); clamp DC at half a bin spacing
        n_eff = sum(w.shape) / len(w.shape) if w.shape else 1.0
        eps_clip = 0.5 / max(n_eff, 4.0)
        weights = jnp.asarray(np.clip(freq, eps_clip, None), work_dtype) ** (-exponent / 2.0)

        colored = jnp.fft.irfftn(spectrum * weights, s=w.shape)

        cstd = Colored._accurate_std(colored)
        target = wstd if energy is None else energy
        scale = Colored._f64_ratio(target, cstd, work_dtype)
        colored = jnp.where(cstd.astype(work_dtype) > 1e-8, colored * scale, colored)
        return colored.reshape(white.shape).astype(white.dtype)

    def exponent_at(self, step: Step | None) -> float:
        props = self.props or ColoredProps()
        if step is None:
            return props.color_start
        if props.color_curve == math.inf:
            return props.color_end
        step = step.normal().clamp()
        t = step.time_to
        # negative curve to mirror FlowShift: step ascends like alpha, not sigma
        shift = rescale_positive(-props.color_curve)
        t = shift / (shift + (divf(1, t) - 1))
        return (1 - t) * props.color_start + t * props.color_end

    def generate(self, index: int, step: Step | None) -> jax.Array:
        props = self.props or ColoredProps()
        return self.colorize(self._randn(self._key(index)), self.exponent_at(step), props.energy)


@dataclass(frozen=True)
class BatchNoise[T: NoiseProps | None](JaxNoise):
    """Per-batch-item seed fan-out: item ``i`` uses ``fold_in(seed, i)`` so
    its noise stream is invariant to the batch size — the counter-based
    replacement for the reference's list-of-generators."""

    generators: tuple[NoiseCommon[T], ...]

    def generate(self, index: int, step: Step | None) -> jax.Array:
        return jnp.stack([g.generate(index, step) for g in self.generators])

    @classmethod
    def from_batch_inputs(
        cls,
        subclass: type[NoiseCommon[T]],
        unit_shape: tuple[int, ...],
        seeds: list[int | jax.Array],
        props: T | None = None,
        dtype: Any = jnp.float32,
    ) -> "BatchNoise[T]":
        "Result shape is ``[len(seeds), *unit_shape]``."
        return cls(
            tuple(
                subclass.from_inputs(unit_shape, seed, props, dtype)
                if props is not None
                else subclass.from_inputs(unit_shape, seed, dtype=dtype)
                for seed in seeds
            )
        )


def stack_noise(generator: JaxNoise, steps: int) -> jax.Array:
    "Precompute per-step noise ``(steps, *shape)`` for ``lax.scan`` loops."
    return jnp.stack([generator.generate(n, Step.from_int(n, steps)) for n in range(steps)])
