#!/usr/bin/env python
"""Headline benchmark: fused sampler step latency at SDXL latent shape.

Times the table-compiled DPM-Solver++(2M) update — the per-step sampler work
excluding the model — inside a device-resident ``lax.scan`` at SDXL
``1x4x128x128`` float32 latents, plus correctness guards: sigma tables vs the
committed reference goldens (max |dSigma|) and the compiled device trajectory
vs the float64 host oracle (latent MSE).

Prints ONE JSON line:
  {"metric": ..., "value": <us/step>, "unit": "us", "vs_baseline": <5us / value>, ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:  # warm restarts: persist compiled executables across bench runs
        from skrample_tpu.utils import enable_compilation_cache

        enable_compilation_cache("/tmp/skrample_tpu_xla_cache")
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass

    from skrample_tpu import scheduling
    from skrample_tpu.ops import CompiledDenoiser, compile_sampler
    from skrample_tpu.sampling import interface, models, structured

    sampler = structured.DPM(order=2)
    schedule = scheduling.FlowShift(scheduling.Linear())
    transform = models.FlowModel()

    shape = (1, 4, 128, 128)
    x = jnp.ones(shape, jnp.float32)

    def model_fn(x, t, s, a):
        # minimal elementwise stand-in: isolates sampler-update cost
        return x * jnp.float32(0.999)

    def timed_loop(steps: int) -> float:
        compiled = compile_sampler(sampler, schedule, transform, steps)
        denoiser = CompiledDenoiser.build(compiled, dtype=jnp.float32)
        run = jax.jit(lambda x: denoiser.run(model_fn, x))
        run(x).block_until_ready()  # compile
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            run(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    # Marginal us/step between two scan lengths cancels the constant
    # dispatch/transfer cost — the true device-resident per-step latency.
    n1, n2 = 500, 4000
    t1, t2 = timed_loop(n1), timed_loop(n2)
    step_us = (t2 - t1) / (n2 - n1) * 1e6
    total_us_1000 = (t1 + (t2 - t1) * (1000 - n1) / (n2 - n1)) / 1000 * 1e6

    # Single-step dispatch path: what a foreign-model (torch pipeline) driver
    # pays per step when it can't scan.  Buffers are donated, so the update
    # runs in place; this timing includes one dispatch per step.
    def timed_dispatch(steps: int = 256) -> float:
        compiled = compile_sampler(sampler, schedule, transform, steps)
        denoiser = CompiledDenoiser.build(compiled, dtype=jnp.float32)
        jstep = denoiser.jitted_step()
        weights = [denoiser.weights[n] for n in range(steps)]

        def run_once() -> None:
            xx = jnp.ones(shape, jnp.float32)
            ring = denoiser.init_ring(xx)
            for n in range(steps):
                o = xx * jnp.float32(0.999)
                xx, ring = jstep(weights[n], xx, o, ring)  # noqa: PLW2901
            xx.block_until_ready()

        run_once()  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run_once()
            best = min(best, time.perf_counter() - t0)
        return best / steps * 1e6

    dispatch_us = timed_dispatch()

    # Null-dispatch floor measured the same way the dispatch loop runs:
    # dispatches pipeline asynchronously, one blocking sync at the end.  The
    # sampler's own dispatch overhead is the difference over two dispatches
    # per step (model + update).
    null = jax.jit(lambda v: v + jnp.float32(0))

    def null_chain(n: int = 512) -> float:
        v = jnp.ones(shape, jnp.float32)
        null(v).block_until_ready()  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            vv = v
            for _ in range(n):
                vv = null(vv)
            vv.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    null_us = null_chain() * 1e6
    dispatch_overhead_us = dispatch_us - 2 * null_us

    # --- correctness guards -------------------------------------------------
    # 1. sigma tables bit-match the committed reference goldens
    import pathlib

    golden_path = pathlib.Path(__file__).parent / "tests" / "fixtures" / "schedules.json"
    max_dsigma = float("nan")
    if golden_path.exists():
        golden = json.loads(golden_path.read_text())
        deltas = []
        from tests.fixture_common import SCHEDULE_STACKS  # noqa: PLC0415

        for name, tables in golden.items():
            mine = SCHEDULE_STACKS[name].points_np(np.linspace(1, 0, 7))
            deltas.append(np.abs(mine[:, 1] - np.asarray(tables["points7"])[:, 1]).max())
        max_dsigma = float(max(deltas))

    # 2. compiled device trajectory vs float64 host oracle
    oracle_steps = 25
    small = (1, 4, 16, 16)
    x64 = np.random.default_rng(0).normal(size=small)
    compiled_small = compile_sampler(sampler, schedule, transform, oracle_steps)
    denoiser_small = CompiledDenoiser.build(compiled_small, dtype=jnp.float32)

    def np_model(x, t, s, a):
        return x * 0.9 + np.sin(np.float64(t) / 500) * 0.05

    def jx_model(x, t, s, a):
        return x * jnp.float32(0.9) + jnp.sin(t / 500) * jnp.float32(0.05)

    oracle = interface.StructuredFunctionalAdapter(sampler).sample_model(
        x64, np_model, transform, schedule, oracle_steps
    )
    device = np.asarray(denoiser_small.run(jx_model, jnp.asarray(x64, jnp.float32)))
    latent_mse = float(np.mean((device - oracle) ** 2))

    baseline_us = 5.0
    print(
        json.dumps(
            {
                "metric": "fused sampler step (DPM++2M, FlowShift(Linear), SDXL 1x4x128x128 f32, marginal in scan)",
                "value": round(step_us, 4),
                "unit": "us",
                "vs_baseline": round(baseline_us / step_us, 3),
                "us_per_step_incl_dispatch_1000": round(total_us_1000, 3),
                "us_single_step_dispatch_path": round(dispatch_us, 3),
                "us_null_dispatch": round(null_us, 3),
                "us_single_step_overhead_vs_null": round(dispatch_overhead_us, 3),
                "max_dsigma_vs_reference": max_dsigma,
                "latent_mse_vs_f64_oracle": latent_mse,
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
