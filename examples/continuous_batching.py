"""Continuous (iteration-level) batching: requests join a live slot pool at
denoise-step boundaries instead of waiting for whole-trajectory batches.

The batch engine's worst case is a steady trickle — a request landing one
step after a batch dispatched waits that batch's entire denoise.  The
continuous pool admits it at the next step boundary, keeping occupancy
near 100% under staggered load, and the per-request key discipline makes
the result independent of WHEN it was admitted (asserted below against
the batch engine).

Run: python examples/continuous_batching.py  (CPU: ~a minute)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu.continuous import ContinuousServingEngine
from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.serving import ServingEngine

dit = DiT(DiTConfig(dim=128, depth=2, heads=2, compute_dtype=jnp.float32))
model_fn = dit.as_sampleable(dit.init(jax.random.PRNGKey(0)))
ITEM, STEPS = (4, 16, 16), 12

# reference: each request alone through the batch engine
with ServingEngine(model_fn, ITEM, steps=STEPS, buckets=(1,)) as solo:
    want = {seed: np.asarray(solo.generate(seed)) for seed in range(6)}

# the pool: 4 slots, requests trickling in while earlier ones are mid-flight
with ContinuousServingEngine(model_fn, ITEM, steps=STEPS, slots=4) as pool:
    futs = {}
    for seed in range(6):
        futs[seed] = pool.submit(seed)
        time.sleep(0.02)  # staggered arrivals: admissions land mid-flight
    got = {seed: np.asarray(f.result()) for seed, f in futs.items()}
    stats = pool.stats

for seed in want:
    np.testing.assert_allclose(want[seed], got[seed], rtol=1e-5, atol=1e-5)
print("6 staggered requests == solo runs (fusion tolerance)")
print(
    f"pool: {stats.completed} completed over {stats.ticks} dispatches, "
    f"occupancy {stats.occupancy * 100:.0f}% "
    f"(admissions at step boundaries, not trajectory boundaries)"
)
