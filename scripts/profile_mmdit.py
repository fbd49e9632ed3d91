#!/usr/bin/env python
"""Attribute the MMDiT forward-pass time on the chip by ablation.

The serving characterization (scripts/bench_mmdit.py) puts the dual-stream
model at ~52% model MFU vs the single-stream DiT's 87% at the same width —
this script knocks out the joint attention, the text stream's MLP/mods, and
the q/k/v concat to find where the gap lives.  Slope-timed with host-
transfer waits (docs/ROUND3.md timing discipline).
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
    config = MMDiTConfig(dim=512, depth=8, heads=4, context_dim=512, context_tokens=128, compute_dtype=jnp.bfloat16)
    model = MMDiT(config)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda leaf: leaf + 0.02 * jax.random.normal(jax.random.PRNGKey(7), leaf.shape, leaf.dtype), params
    )
    ctx = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 77, config.context_dim), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 4, HW, HW), jnp.float32)
    t = jnp.full((BATCH,), 500.0, jnp.float32)
    flops = mmdit_forward_flops(config, BATCH, HW, HW)

    print(f"MMDiT dim=512 depth=8 heads=4 joint={1024 + 128} batch {BATCH} bf16; {flops / 1e9:.1f} GFLOP/fwd")

    real_joint = MMDiT._joint_attention

    def run(label, joint=None):
        MMDiT._joint_attention = joint or real_joint
        try:
            sec = slope_time(lambda y: y - 0.02 * model.apply(params, y, t, ctx), x)
        finally:
            MMDiT._joint_attention = real_joint
        print(
            f"{label:46s} {sec * 1e6:8.1f} us/fwd   eff {flops / sec / 1e12:6.1f} TF/s  "
            f"mfu {flops / sec / PEAK_BF16:.3f}",
            flush=True,
        )
        return sec

    def identity_joint(self, qkv_img, qkv_txt):
        D = self.config.dim
        return qkv_img[..., :D], qkv_txt[..., :D]

    def concat_only_joint(self, qkv_img, qkv_txt):
        "Pays the concat/split HBM copies but skips the attention math."
        D = self.config.dim
        N = qkv_img.shape[1]
        q = jnp.concatenate([qkv_img[..., :D], qkv_txt[..., :D]], axis=1)
        k = jnp.concatenate([qkv_img[..., D : 2 * D], qkv_txt[..., D : 2 * D]], axis=1)
        v = jnp.concatenate([qkv_img[..., 2 * D :], qkv_txt[..., 2 * D :]], axis=1)
        out = q + k * 0.001 + v * 0.001  # touch all three, elementwise only
        return out[:, :N], out[:, N:]

    full = run("full (packed flash joint attention)")
    no_attn = run("joint attention -> identity (no concat)", joint=identity_joint)
    concat_only = run("concat/split only (attention math removed)", joint=concat_only_joint)

    print()
    print(f"joint attention total:      {(full - no_attn) * 1e6:8.1f} us/fwd")
    print(f"  concat/split share:       {(concat_only - no_attn) * 1e6:8.1f} us/fwd")
    print(f"  kernel share:             {(full - concat_only) * 1e6:8.1f} us/fwd")
    print(f"dual-stream everything-else:{no_attn * 1e6:8.1f} us/fwd")


if __name__ == "__main__":
    main()
