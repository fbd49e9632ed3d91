#!/usr/bin/env python
"""Adaptive RKMoire: host controller vs the device-resident lax.while_loop.

The host controller syncs the error scalar back once per trial step; the
device loop runs the whole trajectory in one dispatch.  On a local chip the
sync costs ~50 us; through the dev tunnel it is ~ms — either way the device
loop removes it entirely."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from skrample_tpu import scheduling
from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.ops import rkmoire_sample_loop
from skrample_tpu.ops.adaptive import rkmoire_device_loop
from skrample_tpu.sampling import models
from skrample_tpu.sampling.rk_solvers import RKMoire
from skrample_tpu.utils import enable_compilation_cache


def main(steps: int = 50) -> None:
    enable_compilation_cache("/tmp/skrample_tpu_xla_cache")
    dit = DiT(DiTConfig(dim=256, depth=2, heads=8, compute_dtype=jnp.bfloat16))
    params = dit.init(jax.random.PRNGKey(0))
    model_fn = lambda x, t, s, a: dit.apply(params, x, t)  # noqa: E731

    sampler = RKMoire(order=2, threshold=1e-4)
    schedule = scheduling.FlowShift(scheduling.Linear())
    transform = models.FlowModel()
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 64, 64), jnp.float32)

    # warm both paths (compiles)
    device = jax.jit(
        lambda x: rkmoire_device_loop(sampler, schedule, transform, steps, model_fn, x)
    )
    device(x0).block_until_ready()
    rkmoire_sample_loop(sampler, schedule, transform, steps, model_fn, x0).block_until_ready()

    def timed(fn, reps=5):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    t_dev = timed(lambda: device(x0))
    t_host = timed(lambda: rkmoire_sample_loop(sampler, schedule, transform, steps, model_fn, x0))

    out_d = device(x0)
    out_h = rkmoire_sample_loop(sampler, schedule, transform, steps, model_fn, x0)
    diff = float(jnp.max(jnp.abs(out_d - out_h)))

    print(f"device lax.while_loop: {t_dev * 1e3:.2f} ms/request")
    print(f"host controller:       {t_host * 1e3:.2f} ms/request")
    print(f"speedup: {t_host / t_dev:.2f}x   max|diff|: {diff:.2e}")


if __name__ == "__main__":
    main()
