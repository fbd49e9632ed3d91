"""A production-shaped generation pipeline: model + sampler + noise + mesh in
one jitted, donated, shard-annotated callable.

This is the deployment surface for jax-native serving: construct once
(compiles the sampler tables, places params), then call ``generate`` with
keys/conditioning.  Everything after construction is device-resident — one
dispatch per request, no host work in the loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp

from . import scheduling
from .common import Step
from .noise import JaxNoise
from .ops.compiler import compile_sampler
from .ops.loop import CompiledDenoiser, DeviceModel
from .parallel import latent_sharding, make_mesh
from .sampling import models, structured


@dataclass
class GenerationPipeline:
    """End-to-end latent generation.

    ``model_fn`` is any ``(x, t, sigma, alpha) -> prediction`` closure (params
    already bound / sharded by the caller).  ``noise_generator`` (optional)
    precomputes structured per-step noise (Brownian/Colored/...); otherwise
    stochastic samplers draw i.i.d. normal in-loop from the request key."""

    model_fn: DeviceModel
    sampler: structured.StructuredSampler
    schedule: scheduling.SkrampleSchedule
    model_transform: models.DiffusionModel
    steps: int
    latent_shape: tuple[int, ...]
    dtype: Any = jnp.float32
    noise_generator: JaxNoise | None = None
    mesh: jax.sharding.Mesh | None = None
    donate: bool = True

    _denoiser: CompiledDenoiser = field(init=False)
    _generate: Callable = field(init=False)

    def __post_init__(self) -> None:
        compiled = compile_sampler(self.sampler, self.schedule, self.model_transform, self.steps)
        self._denoiser = CompiledDenoiser.build(compiled, dtype=self.dtype)

        noises = self.step_noises()

        def _generate(x0: jax.Array, key: jax.Array) -> jax.Array:
            if self.mesh is not None:
                x0 = jax.lax.with_sharding_constraint(
                    x0, latent_sharding(self.mesh, 0, ndim=len(self.latent_shape))
                )
            return self._denoiser.run(self.model_fn, x0, key=key, noises=noises)

        self._generate = jax.jit(_generate, donate_argnums=(0,) if self.donate else ())

    @property
    def nfe(self) -> int:
        "Model evaluations per request."
        return self.steps

    def initial_noise(self, key: jax.Array) -> jax.Array:
        return jax.random.normal(key, self.latent_shape, self.dtype)

    def step_noises(self) -> jax.Array | None:
        "Precompute structured per-step noise when a generator is configured."
        if self.noise_generator is None:
            return None
        return jnp.stack(
            [self.noise_generator.generate(n, Step.from_int(n, self.steps)) for n in range(self.steps)]
        )

    def generate(self, key: jax.Array, initial: jax.Array | None = None) -> jax.Array:
        "One request: seed noise (or take ``initial``), run the fused loop."
        k_init, k_steps = jax.random.split(key)
        x0 = self.initial_noise(k_init) if initial is None else initial
        return self._generate(x0, k_steps)


def build_pipeline(
    model_fn: DeviceModel,
    latent_shape: tuple[int, ...],
    steps: int = 25,
    flow: bool = True,
    stochasticity: float = 0.0,
    mesh_axes: dict[str, int] | None = None,
) -> GenerationPipeline:
    "Opinionated defaults: DPM++(2M) over FlowShift(Linear) (flow) or Karras(Scaled)."
    mesh = make_mesh(extra_axes=mesh_axes) if mesh_axes else None
    return GenerationPipeline(
        model_fn=model_fn,
        sampler=structured.DPM(order=2, stochasticity=stochasticity),
        schedule=(
            scheduling.FlowShift(scheduling.Linear()) if flow else scheduling.Karras(scheduling.Scaled())
        ),
        model_transform=models.FlowModel() if flow else models.NoiseModel(),
        steps=steps,
        latent_shape=latent_shape,
        mesh=mesh,
    )
