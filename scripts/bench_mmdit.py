#!/usr/bin/env python
"""Text-conditioned serving characterization: MMDiT with classifier-free
guidance on the chip.

Reports the steady-state marginal model-step time (slope over two scan
lengths — dispatch and transfer constants cancel; waits force a host
transfer per the timing discipline in docs/ROUND3.md), the implied img/s at
a given step budget, and model-forward MFU from the analytic FLOPs count
(``mmdit_forward_flops``, itself checked against a traced count in
tests/test_mmdit.py).  CFG doubles the model batch (cond + uncond in one
forward), so the guided rows carry 2x the FLOPs of the uncond rows.

Usage: python scripts/bench_mmdit.py [steps=25]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu.utils import enable_compilation_cache

enable_compilation_cache("/tmp/skrample_tpu_xla_cache")

from skrample_tpu.models import MMDiT, MMDiTConfig
from skrample_tpu.models.mmdit import mmdit_forward_flops

BATCH, HW = 4, 64
LENGTHS = (2, 10)
PEAK_BF16 = 197e12


def slope_time(fn, x) -> float:
    def loop_body(y, n):
        def body(carry, i):
            return fn(carry, i.astype(jnp.float32) * 40.0), None

        out, _ = jax.lax.scan(body, y, jnp.arange(n))
        return jnp.float32(out.astype(jnp.float32).sum())

    jl = {n: jax.jit(lambda y, n=n: loop_body(y, n)) for n in LENGTHS}
    for n in LENGTHS:
        np.asarray(jl[n](x))
    best = {n: float("inf") for n in LENGTHS}
    for _ in range(3):
        for n in LENGTHS:
            t0 = time.perf_counter()
            np.asarray(jl[n](x))
            best[n] = min(best[n], time.perf_counter() - t0)
    lo, hi = LENGTHS
    return (best[hi] - best[lo]) / (hi - lo)


def main(steps: int = 25) -> None:
    config = MMDiTConfig(dim=512, depth=8, heads=4, context_dim=512, context_tokens=128, compute_dtype=jnp.bfloat16)
    model = MMDiT(config)
    params = model.init(jax.random.PRNGKey(0))
    # adaLN-zero starts at exactly zero output; add signal so nothing folds away
    params = jax.tree.map(
        lambda leaf: leaf + 0.02 * jax.random.normal(jax.random.PRNGKey(7), leaf.shape, leaf.dtype), params
    )
    ctx = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 77, config.context_dim), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 4, HW, HW), jnp.float32)

    n_img = (HW // config.patch) ** 2
    fwd_flops = mmdit_forward_flops(config, BATCH, HW, HW)
    print(
        f"MMDiT dim={config.dim} depth={config.depth} heads={config.heads} "
        f"({n_img} img + {config.context_tokens} txt tokens, joint {n_img + config.context_tokens}) "
        f"batch {BATCH} bf16; analytic {fwd_flops / 1e9:.1f} GFLOP/fwd",
        flush=True,
    )

    for label, fn, flops in (
        ("uncond forward", model.as_sampleable(params, None), fwd_flops),
        ("CFG forward (cond+uncond batched)", model.as_sampleable(params, ctx, guidance_scale=3.0), 2 * fwd_flops),
    ):
        sec = slope_time(lambda y, t, f=fn: y - 0.02 * f(y, t, 1.0, 0.0), x)
        print(
            f"{label:36s} {sec * 1e6:8.1f} us/step   eff {flops / sec / 1e12:6.1f} TF/s  "
            f"mfu {flops / sec / PEAK_BF16:.3f}   "
            f"{BATCH / (sec * steps):6.1f} img/s marginal @ {steps} steps",
            flush=True,
        )

    # conditioned flow-matching train step (loss + grads + adamw), the
    # training-path counterpart: joint attention runs the Pallas backward
    # (score tiles recomputed from logsumexp — joint (N, N) never in HBM)
    import optax

    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    def loss_fn(p, x0, noise, sigma, context):
        s = sigma[:, None, None, None]
        xt = (1 - s) * x0 + s * noise
        pred = model.apply(p, xt, sigma * 1000.0, context)
        return jnp.mean((pred - (noise - x0)) ** 2)

    def train_step(carry, key):
        p, o = carry
        kd, kn, kt, kc = jax.random.split(key, 4)
        x0 = jax.random.normal(kd, (BATCH, 4, HW, HW), jnp.float32)
        noise = jax.random.normal(kn, (BATCH, 4, HW, HW), jnp.float32)
        sigma = jax.random.uniform(kt, (BATCH,), minval=1e-3, maxval=1.0)
        context = jax.random.normal(kc, (BATCH, config.context_tokens, config.context_dim), jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(p, x0, noise, sigma, context)
        updates, o = opt.update(grads, o, p)
        return (optax.apply_updates(p, updates), o), loss

    lengths = (2, 12)
    runners = {}
    for n in lengths:
        runners[n] = jax.jit(
            lambda p, o, n=n: jax.lax.scan(train_step, (p, o), jax.random.split(jax.random.PRNGKey(1), n))
        )
        np.asarray(runners[n](params, opt_state)[1])
    best = {n: float("inf") for n in lengths}
    for _ in range(3):
        for n in lengths:
            t0 = time.perf_counter()
            np.asarray(runners[n](params, opt_state)[1])
            best[n] = min(best[n], time.perf_counter() - t0)
    lo, hi = lengths
    sec = (best[hi] - best[lo]) / (hi - lo)
    print(
        f"{'train step (flow matching + adamw)':36s} {sec * 1e6:8.1f} us/step   "
        f"{1 / sec:5.1f} steps/s   mfu {3 * fwd_flops / sec / PEAK_BF16:.3f} (3x-fwd convention)",
        flush=True,
    )

    # int8 serving tree, guided
    qparams = model.quantize_params(params)
    qfn = model.as_sampleable(qparams, ctx, guidance_scale=3.0)
    sec = slope_time(lambda y, t: y - 0.02 * qfn(y, t, 1.0, 0.0), x)
    print(
        f"{'CFG forward int8 (W8A8 blocks)':36s} {sec * 1e6:8.1f} us/step   "
        f"eff {2 * fwd_flops / sec / 1e12:6.1f} TF/s (bf16-equiv)   "
        f"{BATCH / (sec * steps):6.1f} img/s marginal @ {steps} steps",
        flush=True,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 25)
