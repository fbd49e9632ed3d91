#!/usr/bin/env python
"""Continuous (iteration-level) batching vs whole-trajectory batching under
staggered load.

The batch engine's worst case is a steady trickle: a request that lands one
step after a batch dispatched waits that batch's ENTIRE denoise before its
own starts, and partially-filled buckets waste model FLOPs on padding.  The
continuous engine admits at step boundaries, so the slot pool stays full.

Workload: M requests arriving at a fixed gap chosen relative to the
trajectory time T — ``gap = T / slots`` is the regime where the pool stays
exactly full (arrival rate == service rate).  Reported per engine:

* wall-clock drain time for the M requests (throughput)
* mean / p95 per-request latency (arrival -> result materialized)
* occupancy (continuous) / padding fraction (batch)

Dev-tunnel note (BASELINE.md): every continuous tick pays one dispatch
round-trip and one (slots,) readback; ``--ticks N`` amortizes it by
scanning N steps per dispatch (admission granularity coarsens to N).  On
the tunnel the dispatch constant dominates small models — the structural
comparison (occupancy, padding) transfers to production dispatch costs.

Usage: python scripts/bench_continuous.py [requests=24] [steps=25] [--ticks N]
"""

from __future__ import annotations

import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu.continuous import ContinuousServingEngine
from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.serving import ServingEngine

ITEM = (4, 64, 64)
SLOTS = 8


def build():
    config = DiTConfig(dim=512, depth=8, heads=4, compute_dtype=jnp.bfloat16, attention="flash")
    dit = DiT(config)
    params = dit.init(jax.random.PRNGKey(0))
    return dit.as_sampleable(params)


def run_load(submit, requests: int, gap_s: float) -> tuple[float, list[float]]:
    """Drive `submit(i) -> Future` with fixed-gap arrivals; returns
    (total wall seconds, per-request latencies)."""
    latencies = [0.0] * requests
    done = threading.Semaphore(0)

    def finisher(i, fut, t_arrive):
        np.asarray(fut.result())
        latencies[i] = time.perf_counter() - t_arrive
        done.release()

    t0 = time.perf_counter()
    for i in range(requests):
        target = t0 + i * gap_s
        now = time.perf_counter()
        if target > now:
            time.sleep(target - now)
        t_arrive = time.perf_counter()
        fut = submit(i)
        threading.Thread(target=finisher, args=(i, fut, t_arrive), daemon=True).start()
    for _ in range(requests):
        done.acquire()
    return time.perf_counter() - t0, latencies


def main(requests: int = 24, steps: int = 25, ticks: int = 1) -> None:
    model_fn = build()

    # calibrate one trajectory on the batch engine (bucket SLOTS, full)
    with ServingEngine(model_fn, ITEM, steps=steps, buckets=(SLOTS,), max_delay_ms=1.0) as e:
        futs = [e.submit(i) for i in range(SLOTS)]
        [np.asarray(f.result()) for f in futs]  # compile
        t0 = time.perf_counter()
        futs = [e.submit(i) for i in range(SLOTS)]
        [np.asarray(f.result()) for f in futs]
        T = time.perf_counter() - t0
    gap = T / SLOTS
    print(f"trajectory time T = {T * 1e3:.1f} ms (batch {SLOTS}); arrival gap = {gap * 1e3:.1f} ms")

    for label, make in (
        (
            "batch     ",
            lambda: ServingEngine(model_fn, ITEM, steps=steps, buckets=(1, 2, 4, SLOTS), max_delay_ms=2.0),
        ),
        (
            "continuous",
            lambda: ContinuousServingEngine(
                model_fn, ITEM, steps=steps, slots=SLOTS, ticks_per_dispatch=ticks
            ),
        ),
    ):
        with make() as engine:
            # warm every executable the load will touch
            warm = [engine.submit(1000 + i) for i in range(SLOTS)]
            [np.asarray(f.result()) for f in warm]
            wall, lat = run_load(engine.submit, requests, gap)
            stats = engine.stats
        extra = (
            f"occupancy {stats.occupancy * 100:5.1f}%"
            if hasattr(stats, "occupancy")
            else f"padding {stats.padding_fraction * 100:5.1f}%"
        )
        print(
            f"{label}: {wall:6.2f} s wall ({requests / wall:5.2f} req/s) | "
            f"latency mean {np.mean(lat) * 1e3:7.1f} ms  p95 {np.percentile(lat, 95) * 1e3:7.1f} ms | {extra}"
        )


if __name__ == "__main__":
    argv = sys.argv[1:]
    ticks = 1
    if "--ticks" in argv:
        i = argv.index("--ticks")
        ticks = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    main(*(int(a) for a in argv[:2]), ticks=ticks)
