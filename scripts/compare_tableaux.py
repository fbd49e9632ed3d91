#!/usr/bin/env python
"""Quality-vs-NFE search over the tableau catalog.

Scores every builtin tableau by trajectory error against a high-step Euler
reference on the bundled DiT (random weights) — the structural equivalent of
the reference's SSIM/CLIP search, runnable without model weights.  Emits
JSON rows sorted by (NFEs, error).

Usage: python scripts/compare_tableaux.py [steps=24]
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu import scheduling
from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.ops import rk_sample_loop, sample_loop
from skrample_tpu.sampling import functional, models, structured, tableaux


def main(nfe_budget: int = 24) -> None:
    dit = DiT(DiTConfig(dim=128, depth=3, heads=4, compute_dtype=jnp.float32))
    params = dit.init(jax.random.PRNGKey(0))
    model_fn = jax.jit(lambda x, t, s, a: dit.apply(params, x, t))

    schedule = scheduling.FlowShift(scheduling.Linear())
    transform = models.FlowModel()
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32, 32), jnp.float32)

    reference = sample_loop(structured.Euler(), schedule, transform, 200, model_fn, x0)
    reference.block_until_ready()

    rows = []
    for provider in tableaux.BUILTIN_TABLEAUX:
        tab = provider.tableau()
        stages = len(tab.stages)
        sampler = functional.RKUltra(order=99, providers={stages: provider})
        steps = sampler.adjust_steps(nfe_budget)
        if steps < 1:
            continue
        try:
            out = rk_sample_loop(sampler, schedule, transform, steps, model_fn, x0)
            err = float(jnp.mean((out - reference) ** 2))
            if not np.isfinite(err):
                err = float("inf")
        except Exception:  # noqa: BLE001 — blown-up methods score worst
            err = float("inf")
        rows.append({"tableau": str(provider), "stages": stages, "steps": steps, "mse_vs_ref": err})

    rows.sort(key=lambda r: (r["stages"], r["mse_vs_ref"]))
    for row in rows:
        print(json.dumps(row))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24)
