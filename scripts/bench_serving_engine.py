#!/usr/bin/env python
"""ServingEngine under load vs the raw batched loop: does the runtime keep
the chip's steady-state marginal?

Measures, on the serving DiT (512/8, heads=4, 1024 tokens, bf16, 25 steps):

1. the raw loop's per-image time — one jitted batch dispatched back to back
   (the bench.py steady-state-marginal discipline, our floor);
2. `ServingEngine` draining N queued requests (the worker packs buckets and
   resolves async slices — its Python overhead per batch is the question);
3. the same with a trickling arrival pattern (one submit per result), the
   worst case for batching.

Timing note (BASELINE.md): single-run numbers jitter through the dev
tunnel; each section times the MARGINAL of a doubled workload (2N vs N) so
per-session constants cancel, and repeats interleaved.

Usage: python scripts/bench_serving_engine.py [requests=64] [steps=25]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.serving import ServingEngine

ITEM = (4, 64, 64)
BUCKET = 8


def build():
    config = DiTConfig(dim=512, depth=8, heads=4, compute_dtype=jnp.bfloat16, attention="flash")
    dit = DiT(config)
    params = dit.init(jax.random.PRNGKey(0))
    return dit.as_sampleable(params)


def drain(engine: ServingEngine, n: int, trickle: bool) -> float:
    "Wall seconds to complete n requests (queued up front, or one-in-one-out)."
    t0 = time.perf_counter()
    if trickle:
        pending = [engine.submit(i) for i in range(min(BUCKET, n))]
        for i in range(len(pending), n):
            np.asarray(pending.pop(0).result())
            pending.append(engine.submit(i))
        for f in pending:
            np.asarray(f.result())
    else:
        futs = [engine.submit(i) for i in range(n)]
        for f in futs:
            np.asarray(f.result())
    return time.perf_counter() - t0


def main(requests: int = 64, steps: int = 25) -> None:
    model_fn = build()

    def engine():
        return ServingEngine(
            model_fn=model_fn, item_shape=ITEM, steps=steps, buckets=(1, 2, 4, BUCKET), max_delay_ms=2.0
        )

    # raw floor: the same executable the engine uses, dispatched back to back
    with engine() as e:
        fn = e._executable(0, BUCKET)
        x0 = jax.random.normal(jax.random.PRNGKey(1), (BUCKET, *ITEM), jnp.float32)
        np.asarray(fn(x0, None))  # compile + force transfer (tunnel discipline)

        def raw(n_batches: int) -> float:
            t0 = time.perf_counter()
            outs = [fn(jax.random.normal(jax.random.PRNGKey(i), (BUCKET, *ITEM), jnp.float32), None)
                    for i in range(n_batches)]
            for o in outs:
                np.asarray(o)
            return time.perf_counter() - t0

        n = requests // BUCKET
        raw_marg = min(raw(2 * n) - raw(n) for _ in range(3)) / (n * BUCKET)

    results: dict[str, float] = {}
    for tag, trickle in (("queued", False), ("trickle", True)):
        marg = float("inf")
        for _ in range(3):
            with engine() as e:
                drain(e, BUCKET, trickle)  # compile all buckets touched
                t1 = drain(e, requests, trickle)
                t2 = drain(e, 2 * requests, trickle)
            marg = min(marg, (t2 - t1) / requests)
        results[tag] = marg

    print(f"raw loop floor:      {raw_marg * 1e3:8.2f} ms/image marginal ({1 / raw_marg:6.1f} img/s)")
    for tag, marg in results.items():
        overhead = (marg / raw_marg - 1) * 100
        print(f"engine {tag:8s}:    {marg * 1e3:8.2f} ms/image marginal ({1 / marg:6.1f} img/s, {overhead:+.1f}% vs floor)")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
