#!/usr/bin/env python
"""Video serving characterization: VideoDiT (factorized spatio-temporal
attention) over 5-D latents on the chip.

Reports the steady-state marginal model-step time (slope over two scan
lengths — dispatch and transfer constants cancel; waits force a host
transfer per the timing discipline in docs/ROUND3.md), videos/s at a given
step budget, and model-forward MFU from the analytic FLOPs count
(``video_dit_forward_flops``, checked against a traced count in
tests/test_video_dit.py).  The default shape is a Wan/LTX-class clip:
16-channel 16-frame 64x64 latents -> 16 x 1024 = 16,384 image tokens per
clip, factorized as 16 spatial attentions of 1024 tokens + 1024 temporal
attentions of 16 frames per block.

Usage: python scripts/bench_video.py [steps=25]
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

from skrample_tpu.models import VideoDiT, VideoDiTConfig
from skrample_tpu.models.video_dit import video_dit_forward_flops

BATCH, FRAMES, HW = 1, 16, 64
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
    config = VideoDiTConfig(dim=512, depth=8, heads=4, channels=16, compute_dtype=jnp.bfloat16)
    model = VideoDiT(config)
    params = model.init(jax.random.PRNGKey(0))
    # adaLN-zero starts at exactly zero output; add signal so nothing folds away
    params = jax.tree.map(
        lambda leaf: leaf + 0.02 * jax.random.normal(jax.random.PRNGKey(7), leaf.shape, leaf.dtype), params
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 16, FRAMES, HW, HW), jnp.float32)

    n_spatial = (HW // config.patch) ** 2
    fwd_flops = video_dit_forward_flops(config, BATCH, FRAMES, HW, HW)
    print(
        f"VideoDiT dim={config.dim} depth={config.depth} heads={config.heads} "
        f"({FRAMES} frames x {n_spatial} tokens = {FRAMES * n_spatial} total) "
        f"batch {BATCH} bf16; analytic {fwd_flops / 1e9:.1f} GFLOP/fwd",
        flush=True,
    )

    for label, fn, flops in (
        ("forward (factorized attention)", model.as_sampleable(params), fwd_flops),
    ):
        sec = slope_time(lambda y, t, f=fn: y - 0.02 * f(y, t, 1.0, 0.0), x)
        print(
            f"{label:36s} {sec * 1e6:8.1f} us/step   eff {flops / sec / 1e12:6.1f} TF/s  "
            f"mfu {flops / sec / PEAK_BF16:.3f}   "
            f"{BATCH / (sec * steps):6.2f} videos/s marginal @ {steps} steps",
            flush=True,
        )

    # int8 serving tree
    qparams = model.quantize_params(params)
    qfn = model.as_sampleable(qparams)
    sec = slope_time(lambda y, t: y - 0.02 * qfn(y, t, 1.0, 0.0), x)
    print(
        f"{'forward int8 (W8A8 blocks)':36s} {sec * 1e6:8.1f} us/step   "
        f"eff {fwd_flops / sec / 1e12:6.1f} TF/s (bf16-equiv)   "
        f"{BATCH / (sec * steps):6.2f} videos/s marginal @ {steps} steps",
        flush=True,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 25)
