#!/usr/bin/env python
"""One-shot TPU sweep: scan unroll factors, dtypes, shapes, and the Brownian
generator — batches all compiles into a single session."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from skrample_tpu import scheduling
from skrample_tpu.common import Step
from skrample_tpu.noise import Brownian
from skrample_tpu.ops import CompiledDenoiser, compile_sampler
from skrample_tpu.sampling import models, structured


def marginal_us(make_run, n1=500, n2=4000) -> float:
    t = {}
    for n in (n1, n2):
        run = make_run(n)
        run().block_until_ready()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            run().block_until_ready()
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[n2] - t[n1]) / (n2 - n1) * 1e6


def scan_bench(shape, dtype, unroll) -> float:
    sampler = structured.DPM(order=2)
    schedule = scheduling.FlowShift(scheduling.Linear())
    transform = models.FlowModel()
    x = jnp.ones(shape, dtype)

    def make_run(steps):
        compiled = compile_sampler(sampler, schedule, transform, steps)
        denoiser = CompiledDenoiser.build(compiled, dtype=dtype)
        fn = jax.jit(
            lambda x: denoiser.run(lambda x, t, s, a: x * jnp.asarray(0.999, dtype), x, unroll=unroll)
        )
        return lambda: fn(x)

    return marginal_us(make_run)


def main() -> None:
    for shape, dtype in (
        ((1, 4, 128, 128), jnp.float32),
        ((1, 4, 128, 128), jnp.bfloat16),
        ((8, 4, 128, 128), jnp.float32),
    ):
        for unroll in (1, 4):
            us = scan_bench(shape, dtype, unroll)
            print(f"scan {shape} {dtype.__name__} unroll={unroll}: {us:.3f} us/step", flush=True)

    # Brownian generation (jit the increment for a fixed interval family)
    for shape in ((1, 4, 64, 64), (2, 16, 160, 90)):
        gen = Brownian.from_inputs(shape, 42)
        steps = 50

        t0 = time.perf_counter()
        outs = [gen.generate(n, Step.from_int(n, steps)) for n in range(steps)]
        jax.block_until_ready(outs)
        total = time.perf_counter() - t0
        print(f"brownian {shape}: {total / steps * 1e3:.2f} ms/step ({steps} steps)", flush=True)


if __name__ == "__main__":
    main()
