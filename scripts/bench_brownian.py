#!/usr/bin/env python
"""Brownian noise generation cost across dtype/shape/steps — the reference's
scripts/brownian.py harness on the virtual Brownian tree."""

from time import perf_counter_ns

import jax
import jax.numpy as jnp

from skrample_tpu.common import Step
from skrample_tpu.noise import Brownian

print("backend\tdtype\tshape\tsteps\tmedian_ms")
for dtype in (jnp.bfloat16, jnp.float32):
    for shape in ((1, 4, 512 // 8, 512 // 8), (2, 16, 1280 // 8, 720 // 8)):
        for steps in (10, 50, 200):
            rng = Brownian.from_inputs(shape, 42, dtype=dtype)

            clocks: list[int] = []
            for n in range(steps):
                step = Step.from_int(n, steps)
                t0 = perf_counter_ns()
                rng.generate(n, step).block_until_ready()
                clocks.append(perf_counter_ns() - t0)

            median = sorted(clocks)[len(clocks) // 2] / 1e6
            print(f"{jax.default_backend()}\t{dtype.__name__}\t{shape}\t{steps}\t{median:.2f}")
