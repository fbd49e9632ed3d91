#!/usr/bin/env python
"""A/B the d=64 head-pair flash kernel against the zero-padded packed path
and the einsum reference at the SDXL Transformer2D shapes.

Shapes from scripts/bench_sdxl.py's stage inventory: the attention-bearing
levels run (B=2 CFG, N=4096, heads=10, d=64) and (B=2, N=1024, heads=20).
Slope-timed in a scan per docs/ROUND3.md's timing discipline (host-transfer
waits; interleaved variants so tunnel drift hits all arms equally).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu.utils import enable_compilation_cache

enable_compilation_cache("/tmp/skrample_tpu_xla_cache")

from skrample_tpu.ops.flash_attention import (
    _packed_reference,
    flash_attention_packed,
    flash_attention_pairs,
)

LENGTHS = (4, 32)


def padded_path(q, k, v, heads):
    "The pre-round-5 path: zero-pad each head to 128 lanes around the kernel."
    B, N, D = q.shape
    d = D // heads

    def pad_heads(x, scale=1.0):
        h = x.reshape(B, N, heads, d)
        if scale != 1.0:
            h = h * jnp.asarray(scale, h.dtype)
        h = jnp.pad(h, ((0, 0), (0, 0), (0, 0), (0, 128 - d)))
        return h.reshape(B, N, heads * 128)

    out = flash_attention_packed(pad_heads(q, math.sqrt(128 / d)), pad_heads(k), pad_heads(v), heads)
    return out.reshape(B, N, heads, 128)[..., :d].reshape(B, N, D)


def slope_time(fn, q, k, v, reps=5):
    def loop(n):
        def body(carry, i):
            out = fn(carry, k, v)
            return (carry + 1e-6 * out).astype(carry.dtype), None

        def run(x):
            y, _ = jax.lax.scan(body, x, jnp.arange(n))
            return jnp.float32(y.astype(jnp.float32).sum())

        return jax.jit(run)

    jl = {n: loop(n) for n in LENGTHS}
    for n in LENGTHS:
        np.asarray(jl[n](q))
    best = {n: float("inf") for n in LENGTHS}
    for _ in range(reps):
        for n in LENGTHS:
            t0 = time.perf_counter()
            np.asarray(jl[n](q))
            best[n] = min(best[n], time.perf_counter() - t0)
    lo, hi = LENGTHS
    return (best[hi] - best[lo]) / (hi - lo)


def main() -> None:
    for B, N, heads in [(2, 4096, 10), (2, 1024, 20)]:
        D = heads * 64
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, N, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), (B, N, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), (B, N, D), jnp.bfloat16)

        arms = {
            "pairs": lambda q, k, v: flash_attention_pairs(q, k, v, heads),
            "padded": lambda q, k, v: padded_path(q, k, v, heads),
            "einsum": lambda q, k, v: _packed_reference(q, k, v, heads),
        }
        if N > 2048:
            arms.pop("einsum")  # 640 MB score tensor; not worth the compile

        # numerics first
        outs = {name: np.asarray(fn(q, k, v), np.float32) for name, fn in arms.items()}
        ref = outs.get("einsum", outs["padded"])
        for name, o in outs.items():
            print(f"  {name:8s} max|d| vs ref = {np.abs(o - ref).max():.2e}")

        times = {name: slope_time(fn, q, k, v) for name, fn in arms.items()}
        base = times["padded"]
        for name, t in sorted(times.items(), key=lambda kv: kv[1]):
            print(f"(B={B}, N={N}, h={heads}, d=64)  {name:8s} {t * 1e6:9.1f} us  {base / t:5.2f}x vs padded", flush=True)


if __name__ == "__main__":
    main()
