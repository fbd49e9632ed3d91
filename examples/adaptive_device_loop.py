#!/usr/bin/env python
"""Adaptive sampling with ZERO host syncs: RKMoire as one lax.while_loop.

The host-controller version (``sampler.sample_model`` or
``ops.rkmoire_sample_loop``) syncs the error scalar back per trial step;
``ops.adaptive.rkmoire_device_loop`` precomputes coefficient tables over the
controller's integer (cursor, size) state space and runs the whole adaptive
trajectory on device.
"""

import jax
import jax.numpy as jnp

from skrample_tpu import scheduling
from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.ops.adaptive import rkmoire_device_loop
from skrample_tpu.sampling import models
from skrample_tpu.sampling.rk_solvers import RKMoire

dit = DiT(DiTConfig(dim=128, depth=2, heads=4, compute_dtype=jnp.float32))
params = dit.init(jax.random.PRNGKey(0))
model_fn = lambda x, t, s, a: dit.apply(params, x, t)  # noqa: E731

sampler = RKMoire(order=2, threshold=1e-4)
schedule = scheduling.FlowShift(scheduling.Linear())
x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32, 32), jnp.float32)

sample, accepted, trials = rkmoire_device_loop(
    sampler,
    schedule,
    models.FlowModel(),
    steps=50,
    model_fn=model_fn,
    sample=x0,
    return_counters=True,
)
print(f"adaptive run: {int(accepted)} accepted steps over {int(trials)} trials")
print(f"output mean/std: {float(sample.mean()):+.4f} / {float(sample.std()):.4f}")

# the host controller produces the identical trajectory (same tables, same
# controller arithmetic) — at one device<->host sync per trial step
host = sampler.sample_model(x0, model_fn, models.FlowModel(), schedule, 50)
print(f"max |device - host|: {float(jnp.abs(sample - host).max()):.2e}")
