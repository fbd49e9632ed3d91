#!/usr/bin/env python
"""End-to-end serving throughput: DiT + compiled DPM++(2M) through
GenerationPipeline — seconds per batch and per image on the local device."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from skrample_tpu import scheduling
from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.pipeline import GenerationPipeline
from skrample_tpu.sampling import models, structured


def main(batch: int = 4, steps: int = 25) -> None:
    config = DiTConfig(dim=512, depth=8, heads=8, compute_dtype=jnp.bfloat16)
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
        f"DiT(dim={config.dim}, depth={config.depth}, {tokens} tokens) batch={batch} steps={steps}: "
        f"{best * 1e3:.1f} ms/request, {best / batch * 1e3:.1f} ms/image, "
        f"{batch / best:.2f} img/s on {jax.devices()[0]}"
    )


if __name__ == "__main__":
    main()
