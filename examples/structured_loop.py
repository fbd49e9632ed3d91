#!/usr/bin/env python
"""Raw structured sampling loop — the lowest-level API.

Mirrors the reference's examples/structured.py shape, but model-agnostic:
plug any (x, t, sigma, alpha) -> prediction callable."""

import jax
import jax.numpy as jnp

from skrample_tpu import scheduling
from skrample_tpu.common import Step
from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.noise import Random
from skrample_tpu.sampling import models, structured

steps = 12
schedule = scheduling.FlowShift(scheduling.Linear())
sampler = structured.DPM(order=2)
transform = models.FlowModel()

dit = DiT(DiTConfig(dim=128, depth=2, heads=4))
params = dit.init(jax.random.PRNGKey(0))
model = dit.as_sampleable(params)

rng = Random.from_inputs((1, 4, 32, 32), seed=42)
sample = rng.generate(0, None)

previous: list[structured.SKSamples] = []
for n, point in enumerate(schedule.schedule(steps)):
    prediction = model(sample, *point)
    result = sampler.sample(
        sample,
        prediction,
        Step.from_int(n, steps),
        transform,
        schedule,
        previous=previous,
    )
    previous = [*previous, result][-sampler.require_previous or 1 :]
    sample = result.final

print("sample stats:", float(sample.mean()), float(sample.std()))
