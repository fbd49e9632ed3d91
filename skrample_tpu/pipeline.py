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
from .sampling import models, rk_solvers, structured


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
    uncond_model_fn: DeviceModel | None = None
    guidance_scale: float = 1.0
    "With ``uncond_model_fn`` set and scale != 1, runs classifier-free guidance."

    _executables: dict[int, Callable] = field(init=False, default_factory=dict)

    def __post_init__(self) -> None:
        if self.uncond_model_fn is not None and self.guidance_scale != 1.0:
            from .utils.guidance import classifier_free

            self.model_fn = classifier_free(self.model_fn, self.uncond_model_fn, self.guidance_scale)
        self._executable(0)  # compile the txt2img path eagerly

    def _executable(self, start: int) -> Callable:
        """The jitted loop entering at step ``start`` (img2img).

        Compiled tables embed the history ramp, so each distinct entry point
        is its own executable; they are cached per start index."""
        cached = self._executables.get(start)
        if cached is not None:
            return cached

        compiled = compile_sampler(self.sampler, self.schedule, self.model_transform, self.steps, start=start)
        denoiser = CompiledDenoiser.build(compiled, dtype=self.dtype)
        noises = self.step_noises()

        def _generate(x0: jax.Array, key: jax.Array) -> jax.Array:
            if self.mesh is not None:
                x0 = jax.lax.with_sharding_constraint(
                    x0, latent_sharding(self.mesh, 0, ndim=len(self.latent_shape))
                )
            return denoiser.run(self.model_fn, x0, key=key, noises=noises, start=start)

        fn = jax.jit(_generate, donate_argnums=(0,) if self.donate else ())
        self._executables[start] = fn
        return fn

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

    def generate(
        self,
        key: jax.Array,
        initial: jax.Array | None = None,
        strength: float = 1.0,
    ) -> jax.Array:
        """One request.

        txt2img: seed from the key and run all steps.  img2img: pass
        ``initial`` plus ``strength`` in (0, 1] — the trajectory enters at
        ``round(steps * (1 - strength))`` with ``initial`` noised to that
        point (and renormalized by the schedule's full-noise magnitude, the
        same recipe as ``FunctionalSampler.generate_model``)."""
        k_init, k_steps = jax.random.split(key)
        start = 0 if initial is None else min(round(self.steps * (1 - strength)), self.steps - 1)

        if initial is None:
            x0 = self.initial_noise(k_init)
        else:
            entry = self.schedule.ipoint(start / self.steps)
            seed = self.initial_noise(k_init)
            full = self.schedule.point_1
            x0 = entry.add_noise(initial.astype(self.dtype), seed) / full.add_noise(0.0, 1.0)

        return self._executable(start)(x0, k_steps)


@dataclass
class AdaptivePipeline:
    """Adaptive-step generation: RKMoire as one device-resident executable.

    The error-controlled trajectory (step count chosen on device, zero host
    syncs) compiles once; each request is a single dispatch."""

    model_fn: DeviceModel
    sampler: "rk_solvers.RKMoire"
    schedule: scheduling.SkrampleSchedule
    model_transform: models.DiffusionModel
    steps: int
    latent_shape: tuple[int, ...]
    dtype: Any = jnp.float32

    _generate: Callable = field(init=False)

    def __post_init__(self) -> None:
        from .ops.adaptive import rkmoire_device_loop

        def _generate(x0: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
            return rkmoire_device_loop(
                self.sampler,
                self.schedule,
                self.model_transform,
                self.steps,
                self.model_fn,
                x0,
                return_counters=True,
            )

        self._generate = jax.jit(_generate)

    def generate(self, key: jax.Array) -> tuple[jax.Array, int, int]:
        "One request; returns (sample, accepted steps, trial steps)."
        x0 = jax.random.normal(key, self.latent_shape, self.dtype)
        sample, accepted, trials = self._generate(x0)
        return sample, int(accepted), int(trials)


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
