#!/usr/bin/env python
"""Detailed fused-step timing: marginal us/step via two scan lengths (cancels
dispatch/tunnel constants), plus the Pallas kernel variant and a bf16 run."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from skrample_tpu import scheduling
from skrample_tpu.ops import CompiledDenoiser, compile_sampler, fused_step_pallas
from skrample_tpu.sampling import models, structured


def timed(fn, *args, reps=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench(shape=(1, 4, 128, 128), dtype=jnp.float32, n1=500, n2=4000) -> None:
    sampler = structured.DPM(order=2)
    schedule = scheduling.FlowShift(scheduling.Linear())
    transform = models.FlowModel()

    x = jnp.ones(shape, dtype)

    runs = {}
    for steps in (n1, n2):
        compiled = compile_sampler(sampler, schedule, transform, steps)
        denoiser = CompiledDenoiser.build(compiled, dtype=dtype)
        run = jax.jit(lambda x, d=denoiser: d.run(lambda x, t, s, a: x * jnp.asarray(0.999, dtype), x))
        runs[steps] = timed(run, x)

    marginal = (runs[n2] - runs[n1]) / (n2 - n1) * 1e6
    print(f"shape={shape} dtype={dtype.__name__}")
    print(f"  total {n1} steps: {runs[n1]*1e3:.2f} ms | total {n2} steps: {runs[n2]*1e3:.2f} ms")
    print(f"  marginal fused step: {marginal:.3f} us/step")

    # Pallas kernel point benchmark (single application, large batch of reps via scan)
    compiled = compile_sampler(sampler, schedule, transform, 8)
    denoiser = CompiledDenoiser.build(compiled, dtype=dtype)
    K = denoiser.weights.shape[2]
    stack = jnp.ones((K, *shape), dtype)
    w = denoiser.weights[4][:1]

    def pallas_many(stack, w, n=2000):
        def body(s, _):
            out = fused_step_pallas(w, s)
            return s.at[0].set(out[0]), None

        return jax.lax.scan(body, stack, None, length=n)[0]

    def xla_many(stack, w, n=2000):
        from skrample_tpu.ops.fused import fused_step

        def body(s, _):
            out = fused_step(w, s)
            return s.at[0].set(out[0]), None

        return jax.lax.scan(body, stack, None, length=n)[0]

    try:
        t_pallas = timed(jax.jit(pallas_many), stack, w) / 2000 * 1e6
        print(f"  pallas fused apply: {t_pallas:.3f} us")
    except Exception as err:  # noqa: BLE001 — pallas may be unavailable off-TPU
        print(f"  pallas unavailable: {type(err).__name__}")
    t_xla = timed(jax.jit(xla_many), stack, w) / 2000 * 1e6
    print(f"  xla fused apply:    {t_xla:.3f} us")



def bench_dispatch(shape=(1, 4, 128, 128), dtype=jnp.float32, steps=256) -> None:
    "Single-step dispatch path A/B: XLA chain vs Pallas kernel, donated buffers."
    sampler = structured.DPM(order=2)
    schedule = scheduling.FlowShift(scheduling.Linear())
    transform = models.FlowModel()
    compiled = compile_sampler(sampler, schedule, transform, steps)

    for kernel in ("xla", "pallas"):
        denoiser = CompiledDenoiser.build(compiled, dtype=dtype, kernel=kernel)
        jstep = denoiser.jitted_step()
        weights = [denoiser.weights[n] for n in range(steps)]

        def run_once():
            x = jnp.ones(shape, dtype)
            ring = denoiser.init_ring(x)
            for n in range(steps):
                o = x * jnp.asarray(0.999, dtype)
                x, ring = jstep(weights[n], x, o, ring)
            return x.block_until_ready()

        run_once()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run_once()
            best = min(best, time.perf_counter() - t0)
        print(f"  single-step dispatch [{kernel}]: {best / steps * 1e6:.2f} us/step")


if __name__ == "__main__":
    bench()
    bench_dispatch()
