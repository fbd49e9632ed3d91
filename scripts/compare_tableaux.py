#!/usr/bin/env python
"""Quality-vs-NFE search over the tableau catalog, scored by SSIM.

Protocol (mirrors the reference's search, which ran SSIM+CLIP on SD1.5):
for each builtin tableau, generate images at a fixed model-call budget from
K seeds and score SSIM against a 200-step Euler reference trajectory of the
same seed.  The model is the committed *trained* flow-matching surrogate
(``scripts/train_surrogate.py`` — a real learned vector field on structured
synthetic images), so solver quality differences are perceptual rather than
random-field artifacts.

Limitations: the surrogate is 1.2M params at 32x32; rankings calibrate
relative solver quality and confirmed the stage-count winners used by
``DEFAULT_PROVIDERS``, but absolute margins on SD-class models may differ.

Falls back to a random-weight DiT + latent MSE when the checkpoint is
missing (still proves execution, as in round 1).

Two surrogate families so rankings are not single-model artifacts:
``flow`` (DiT, u-prediction, linear flow schedule — the round-2 surrogate)
and ``eps`` (UNet, epsilon-prediction, VP Scaled schedule — the SD regime
in miniature; see scripts/train_surrogate.py).

Usage: python scripts/compare_tableaux.py [nfe_budget=24] [seeds=4] [flow|eps]
"""

from __future__ import annotations

import json
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu import scheduling
from skrample_tpu.models import DiT, DiTConfig, load_params
from skrample_tpu.ops import rk_sample_loop, sample_loop
from skrample_tpu.sampling import models, structured, tableaux
from skrample_tpu.sampling.rk_solvers import RKUltra
from skrample_tpu.utils.quality import ssim

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "skrample_tpu" / "models" / "assets"
SURROGATE = ASSETS / "surrogate_flow_32.npz"
EPS_SURROGATE = ASSETS / "surrogate_eps_unet_32.npz"


def build_model(family: str = "flow") -> tuple:
    "(model_fn, shape, trained, schedule, transform) for the chosen family."
    if family == "eps" and EPS_SURROGATE.exists():
        from skrample_tpu.models import UNet, UNetConfig

        net = UNet(UNetConfig(channels=1, base=32, levels=3, groups=8, compute_dtype=jnp.float32))
        params = jax.tree.map(jnp.asarray, load_params(EPS_SURROGATE))
        shape = (1, 1, 32, 32)
        trained = True
        schedule, transform = scheduling.Scaled(), models.NoiseModel()
    elif family == "flow" and SURROGATE.exists():
        config = DiTConfig(patch=2, channels=1, dim=128, depth=3, heads=4, compute_dtype=jnp.float32)
        net = DiT(config)
        params = jax.tree.map(jnp.asarray, load_params(SURROGATE))
        shape = (1, 1, 32, 32)
        trained = True
        schedule, transform = scheduling.Linear(), models.FlowModel()
    else:
        print("# surrogate checkpoint missing - falling back to random weights + MSE", file=sys.stderr)
        config = DiTConfig(dim=128, depth=3, heads=4, compute_dtype=jnp.float32)
        net = DiT(config)
        params = net.init(jax.random.PRNGKey(0))
        shape = (1, 4, 32, 32)
        trained = False
        schedule, transform = scheduling.Linear(), models.FlowModel()
    model_fn = jax.jit(lambda x, t, s, a: net.apply(params, x, t))
    return model_fn, shape, trained, schedule, transform


def main(nfe_budget: int = 24, seeds: int = 4, family: str = "flow") -> None:
    model_fn, shape, trained, schedule, transform = build_model(family)

    noises = [jax.random.normal(jax.random.PRNGKey(100 + k), shape, jnp.float32) for k in range(seeds)]
    references = [
        np.asarray(sample_loop(structured.Euler(), schedule, transform, 200, model_fn, x0)) for x0 in noises
    ]

    rows = []
    catalog = [*tableaux.BUILTIN_TABLEAUX, *tableaux.BUILTIN_EMBEDDED_TABLEAU]
    for provider in catalog:
        tab = provider.tableau()
        if isinstance(tab, tableaux.EmbeddedTableau):
            tab = tab.unembed()  # generation uses the high-order row
        stages = len(tab.stages)
        sampler = RKUltra(order=99, providers={stages: provider})
        steps = sampler.adjust_steps(nfe_budget)
        if steps < 1:
            continue

        scores, errors = [], []
        try:
            for x0, ref in zip(noises, references, strict=True):
                out = np.asarray(rk_sample_loop(sampler, schedule, transform, steps, model_fn, x0))
                if not np.isfinite(out).all():
                    raise FloatingPointError
                scores.append(ssim(out, ref) if trained else float("nan"))
                errors.append(float(np.mean((out - ref) ** 2)))
            mean_ssim = float(np.mean(scores))
            mean_mse = float(np.mean(errors))
        except Exception:  # noqa: BLE001 — blown-up methods rank last
            mean_ssim, mean_mse = float("-inf"), float("inf")

        rows.append(
            {
                "tableau": str(provider),
                "stages": stages,
                "steps": steps,
                "nfes": steps * stages,
                "ssim_vs_euler200": round(mean_ssim, 5) if np.isfinite(mean_ssim) else mean_ssim,
                "mse_vs_euler200": mean_mse,
            }
        )

    key = (lambda r: (r["stages"], -r["ssim_vs_euler200"])) if trained else (lambda r: (r["stages"], r["mse_vs_euler200"]))
    rows.sort(key=key)
    for row in rows:
        print(json.dumps(row))

    # Per-stage-count winners vs the shipped DEFAULT_PROVIDERS choices
    from skrample_tpu.sampling.functional import DEFAULT_PROVIDERS

    print("\n# stage-class winners (by SSIM)" if trained else "\n# stage-class winners (by MSE)")
    by_stage: dict[int, list[dict]] = {}
    for row in rows:
        by_stage.setdefault(row["stages"], []).append(row)
    for stages, group in sorted(by_stage.items()):
        best = group[0]
        shipped = str(DEFAULT_PROVIDERS.get(stages, ""))
        mark = "  <- DEFAULT_PROVIDERS pick" if shipped and shipped == best["tableau"] else (
            f"  (shipped: {shipped})" if shipped else ""
        )
        print(f"# {stages:2d} stages: {best['tableau']} ssim={best['ssim_vs_euler200']}{mark}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args, family=sys.argv[3] if len(sys.argv) > 3 else "flow")
