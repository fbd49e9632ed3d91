#!/usr/bin/env python
"""The TPU-native path: compile the sampler to coefficient tables and run the
whole denoise loop as one fused lax.scan — this is the deployment shape."""

import jax
import jax.numpy as jnp

from skrample_tpu import scheduling
from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.noise import Brownian, stack_noise
from skrample_tpu.ops import CompiledDenoiser, compile_sampler
from skrample_tpu.sampling import models, structured

steps = 25
sampler = structured.DPM(order=2, stochasticity=0.5)  # SDE sampling
schedule = scheduling.FlowShift(scheduling.Linear())
transform = models.FlowModel()

# Host-side, once: all solver scalars -> per-step tables (float64)
compiled = compile_sampler(sampler, schedule, transform, steps)
denoiser = CompiledDenoiser.build(compiled, dtype=jnp.float32)

dit = DiT(DiTConfig())
params = dit.init(jax.random.PRNGKey(0))

# Brownian noise: pure function of the time interval -> step-count invariant
noises = stack_noise(Brownian.from_inputs((1, 4, 64, 64), seed=7), steps)

@jax.jit
def generate(x0, noises):
    return denoiser.run(dit.as_sampleable(params), x0, noises=noises)

x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 64, 64), jnp.float32)
image_latent = generate(x0, noises)
print("latent stats:", float(image_latent.mean()), float(image_latent.std()))
