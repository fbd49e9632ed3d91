#!/usr/bin/env python
"""Progressive previews via the step-streaming API.

``stream_structured`` yields each completed step as it lands, so serving
frontends can ship intermediate latents (preview thumbnails, early-abort
heuristics) without callbacks or wrapper state.
"""

import math

import jax
import jax.numpy as jnp

from skrample_tpu import scheduling
from skrample_tpu.sampling import models, structured
from skrample_tpu.sampling.interface import stream_structured

schedule = scheduling.FlowShift(scheduling.Linear())
solver = structured.DPM(order=2)
x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16), jnp.float32)


def model(x, t, s, a):
    return x * 0.93 + math.sin(t / 400.0) * 0.05


final = x0
for index, crossed, outcome in stream_structured(
    solver, x0, model, models.FlowModel(), schedule, steps=12
):
    final = outcome.final
    sigma_next = crossed.point_to.sigma
    print(f"step {index:2d}: sigma -> {sigma_next:.4f}   latent std {float(final.std()):.4f}")
    if index == 5:
        print("  (a frontend could ship a preview decode here)")

print(f"done: mean {float(final.mean()):+.4f}")
