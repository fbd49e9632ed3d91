"""Torch-facing adapters over the jax.random noise generators.

For code that consumed the reference's ``skrample.pytorch.noise`` generators
directly (rather than through the scheduler wrapper): same surface —
``from_inputs(shape, generator, props, dtype)`` + ``generate(step)`` —
backed by the counter-based jax generators, so Brownian keeps its
interval-purity and batch streams stay size-invariant.

Reference parity: ``skrample/pytorch/noise.py`` (class-for-class).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Self

import torch

from . import noise as jaxnoise
from .common import Step
from .noise import BrownianProps, ColoredProps, NoiseProps, OffsetProps, PyramidProps

__all__ = [
    "BatchTensorNoise",
    "Brownian",
    "BrownianProps",
    "Colored",
    "ColoredProps",
    "Offset",
    "OffsetProps",
    "Pyramid",
    "PyramidProps",
    "Random",
    "SkrampleTensorNoise",
    "TensorNoiseCommon",
    "TensorNoiseProps",
]

TensorNoiseProps = NoiseProps


def _torch_dtype_to_jax(dtype: torch.dtype):
    import jax.numpy as jnp

    return {
        torch.float32: jnp.float32,
        torch.float64: jnp.float64,
        torch.bfloat16: jnp.bfloat16,
        torch.float16: jnp.float16,
    }.get(dtype, jnp.float32)


@dataclass
class SkrampleTensorNoise:
    "ABC surface: stateful-looking counter over the pure jax generators."

    def generate(self, step: Step | None) -> torch.Tensor:
        raise NotImplementedError


@dataclass
class TensorNoiseCommon[T: NoiseProps | None](SkrampleTensorNoise):
    shape: tuple[int, ...]
    seed: torch.Generator
    dtype: torch.dtype
    props: T

    _impl_type: type[jaxnoise.NoiseCommon] = field(init=False, default=jaxnoise.Random)
    _counter: int = field(init=False, default=0)

    def __post_init__(self) -> None:
        self._impl = self._impl_type.from_inputs(
            self.shape,
            self.seed.initial_seed(),
            self.props,
            _torch_dtype_to_jax(self.dtype),
        )

    @classmethod
    def from_inputs(
        cls,
        shape: tuple[int, ...],
        seed: torch.Generator,
        props: T = None,
        dtype: torch.dtype = torch.float32,
    ) -> Self:
        return cls(shape, seed, dtype, props)

    def generate(self, step: Step | None) -> torch.Tensor:
        import numpy as np

        out = self._impl.generate(self._counter, step)
        self._counter += 1
        return torch.from_numpy(np.array(out.astype("float32") if out.dtype.itemsize < 4 else out)).to(
            dtype=self.dtype
        )


@dataclass
class Random(TensorNoiseCommon[None]):
    _impl_type = jaxnoise.Random


@dataclass
class Offset(TensorNoiseCommon[OffsetProps]):
    _impl_type = jaxnoise.Offset


@dataclass
class Pyramid(TensorNoiseCommon[PyramidProps]):
    _impl_type = jaxnoise.Pyramid


@dataclass
class Brownian(TensorNoiseCommon[BrownianProps]):
    _impl_type = jaxnoise.Brownian


@dataclass
class Colored(TensorNoiseCommon[ColoredProps]):
    _impl_type = jaxnoise.Colored


@dataclass
class BatchTensorNoise[T: NoiseProps | None](SkrampleTensorNoise):
    "Per-batch-item generators stacked, seeds preserved across batch sizes."

    generators: list[TensorNoiseCommon[T]]

    def generate(self, step: Step | None) -> torch.Tensor:
        return torch.stack([g.generate(step) for g in self.generators])

    @classmethod
    def from_batch_inputs(
        cls,
        subclass: type[TensorNoiseCommon[T]],
        unit_shape: tuple[int, ...],
        seeds: list[torch.Generator],
        props: T | None = None,
        dtype: torch.dtype = torch.float32,
    ) -> "BatchTensorNoise[T]":
        return cls(
            [
                subclass.from_inputs(unit_shape, seed, props, dtype)
                if props is not None
                else subclass.from_inputs(unit_shape, seed, dtype=dtype)
                for seed in seeds
            ]
        )
