#!/usr/bin/env python
"""Functional RK sampling with CFG, via the closure API + scan loop."""

import jax
import jax.numpy as jnp

from skrample_tpu import scheduling
from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.ops import rk_sample_loop
from skrample_tpu.sampling import functional, models

cfg_scale = 3.0
steps = functional.RKUltra(order=4).adjust_steps(25)  # equal NFE budget

dit = DiT(DiTConfig())
params = dit.init(jax.random.PRNGKey(0))
uncond_params = dit.init(jax.random.PRNGKey(99))  # stand-in for a second context


def cfg_model(x, t, s, a):
    cond = dit.apply(params, x, t)
    uncond = dit.apply(uncond_params, x, t)
    return uncond + cfg_scale * (cond - uncond)


sampler = functional.RKUltra(order=4)
schedule = scheduling.Karras(scheduling.Scaled())
x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 64, 64), jnp.float32)

latent = jax.jit(
    lambda x: rk_sample_loop(sampler, schedule, models.NoiseModel(), steps, cfg_model, x)
)(x0)
print("latent stats:", float(latent.mean()), float(latent.std()))
