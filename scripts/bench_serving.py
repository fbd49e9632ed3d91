#!/usr/bin/env python
"""End-to-end serving throughput: DiT + compiled DPM++(2M) through
GenerationPipeline — ms per image and img/s over a batch-size sweep, for
the flash and full attention paths.

Usage: python scripts/bench_serving.py [steps=25] [attention=flash]
                                       [batch batch ...=1 4 16]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from skrample_tpu import scheduling
from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.pipeline import GenerationPipeline
from skrample_tpu.sampling import models, structured


def run(batch: int, steps: int, attention: str) -> None:
    config = DiTConfig(dim=512, depth=8, heads=8, compute_dtype=jnp.bfloat16, attention=attention)
    dit = DiT(config)
    params = dit.init(jax.random.PRNGKey(0))

    pipe = GenerationPipeline(
        model_fn=dit.as_sampleable(params),
        sampler=structured.DPM(order=2),
        schedule=scheduling.FlowShift(scheduling.Linear()),
        model_transform=models.FlowModel(),
        steps=steps,
        latent_shape=(batch, 4, 64, 64),
        donate=False,  # re-time the same request
    )

    key = jax.random.PRNGKey(1)
    pipe.generate(key).block_until_ready()  # compile

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pipe.generate(key).block_until_ready()
        best = min(best, time.perf_counter() - t0)

    tokens = (64 // config.patch) ** 2
    print(
        f"DiT(dim={config.dim}, depth={config.depth}, {tokens} tokens, {attention}) "
        f"batch={batch} steps={steps}: "
        f"{best * 1e3:.1f} ms/request, {best / batch * 1e3:.1f} ms/image, "
        f"{batch / best:.2f} img/s on {jax.devices()[0]}"
    )


def main(steps: int = 25, attention: str = "flash", batches: tuple[int, ...] = (1, 4, 16)) -> None:
    for batch in batches:
        run(batch, steps, attention)


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    attention = sys.argv[2] if len(sys.argv) > 2 else "flash"
    batches = tuple(int(a) for a in sys.argv[3:]) or (1, 4, 16)
    main(steps, attention, batches)
