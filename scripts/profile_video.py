#!/usr/bin/env python
"""Attribute the VideoDiT forward-pass time on the chip by ablation.

The serving characterization (scripts/bench_video.py) puts the factorized
model at ~65% model MFU vs the single-stream DiT's ~77-87% at the same
width — this script knocks out the spatial attention, the temporal
attention, and the temporal branch entirely to find where the gap lives.
Slope-timed with host-transfer waits (docs/ROUND3.md timing discipline).
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

# batch settable from argv: `profile_video.py 2` attributes the measured
# batch-2 MFU drop (0.646 -> 0.522 at B=2; kernel-independent)
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1
FRAMES, HW = 16, 64
LENGTHS = (2, 10)
PEAK_BF16 = 197e12


def slope_time(fn, x) -> float:
    def loop_body(y, n):
        out, _ = jax.lax.scan(lambda c, _: (fn(c), None), y, None, length=n)
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


def main() -> None:
    config = VideoDiTConfig(dim=512, depth=8, heads=4, channels=16, compute_dtype=jnp.bfloat16)
    model = VideoDiT(config)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda leaf: leaf + 0.02 * jax.random.normal(jax.random.PRNGKey(7), leaf.shape, leaf.dtype), params
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 16, FRAMES, HW, HW), jnp.float32)
    t = jnp.full((BATCH,), 500.0, jnp.float32)
    flops = video_dit_forward_flops(config, BATCH, FRAMES, HW, HW)

    print(
        f"VideoDiT dim=512 depth=8 heads=4 {FRAMES}x{(HW // 2) ** 2} tokens batch {BATCH} bf16; "
        f"{flops / 1e9:.1f} GFLOP/fwd"
    )

    real_attend = VideoDiT._attend
    real_temporal = VideoDiT._temporal_attend

    def run(label, attend=None, temporal=None):
        VideoDiT._attend = attend or real_attend
        VideoDiT._temporal_attend = temporal or real_temporal
        try:
            sec = slope_time(lambda y: y - 0.02 * model.apply(params, y, t), x)
        finally:
            VideoDiT._attend = real_attend
            VideoDiT._temporal_attend = real_temporal
        print(
            f"{label:46s} {sec * 1e6:8.1f} us/fwd   eff {flops / sec / 1e12:6.1f} TF/s  "
            f"mfu {flops / sec / PEAK_BF16:.3f}",
            flush=True,
        )
        return sec

    def identity_attend(self, qkv):
        return qkv[..., : self.config.dim]

    def identity_temporal(self, qkv):
        return qkv[..., : self.config.dim]

    full = run("full (flash spatial + in-place temporal)")
    no_spatial = run("spatial attention -> identity", attend=identity_attend)
    no_temporal = run("temporal attention -> identity", temporal=identity_temporal)
    neither = run("both attentions -> identity", attend=identity_attend, temporal=identity_temporal)

    print()
    print(f"spatial attention share:    {(full - no_spatial) * 1e6:8.1f} us/fwd")
    print(f"temporal attention share:   {(full - no_temporal) * 1e6:8.1f} us/fwd")
    print(f"matmul/adaLN/rest:          {neither * 1e6:8.1f} us/fwd")


if __name__ == "__main__":
    main()
