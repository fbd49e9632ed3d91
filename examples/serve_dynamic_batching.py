"""Dynamic-batching serving: many concurrent requests, few executables.

`ServingEngine` packs arriving seeds into padded bucket batches (each
bucket compiles once), dispatches the fused denoise scan, and resolves each
request with its async slice of the batch output — the worker never waits
on the device, so the dispatch queue stays full.  A request's latent does
not depend on which strangers it was packed with (initial latent and
stochastic step noise come from its own key): bit-identical within one
bucket executable, and identical up to matmul reduction order across
bucket sizes (XLA tiles each batch shape differently — last-ulp f32, as
with any compiler).  Both asserted below.

Run: python examples/serve_dynamic_batching.py  (CPU: seconds; chip: add dims)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.serving import ServingEngine

dit = DiT(DiTConfig(dim=128, depth=2, heads=2, compute_dtype=jnp.float32))
params = dit.init(jax.random.PRNGKey(0))
params = jax.tree.map(
    lambda w: w + 0.02 * jax.random.normal(jax.random.PRNGKey(7), w.shape, w.dtype), params
)

with ServingEngine(
    model_fn=dit.as_sampleable(params),
    item_shape=(4, 16, 16),
    steps=12,
    buckets=(1, 2, 4, 8),
    max_delay_ms=50.0,  # generous sweep so the example's bursts pack deterministically
) as engine:
    # a reference request, alone
    alone = np.asarray(engine.generate(3))

    # a burst of 17 requests: the worker packs them into bucket batches
    t0 = time.perf_counter()
    futures = [engine.submit(seed) for seed in range(17)]
    latents = [np.asarray(f.result()) for f in futures]
    dt = time.perf_counter() - t0

    # different neighbors, same bucket executable -> bit-identical
    futures = [engine.submit(seed) for seed in (3, 100, 101, 102, 103, 104, 105, 106)]
    repacked = np.asarray(futures[0].result())
    [f.result() for f in futures]
    np.testing.assert_array_equal(latents[3], repacked)

    # across bucket sizes: identical up to matmul reduction order
    np.testing.assert_allclose(latents[3], alone, rtol=2e-5, atol=2e-6)

    # img2img rides the same queue: grouped by entry point, per-request seeds
    edit = engine.generate(7, initial=latents[5], strength=0.4)
    rel = float(np.linalg.norm(np.asarray(edit) - latents[5]) / np.linalg.norm(latents[5]))
    print(f"img2img (strength 0.4) relative change vs its initial: {rel:.3f}")

    s = engine.stats
    print(f"17 requests in {dt:.2f}s across {s.batches} batches (buckets {s.bucket_counts})")
    print(f"padding waste {s.padding_fraction:.1%}; all latents finite: {all(np.isfinite(x).all() for x in latents)}")
    print(f"seed-3 latent: bit-equal across packings, max dev vs alone {np.abs(latents[3] - alone).max():.2e}")
