#!/usr/bin/env python
"""Attribute the Flux-scale forward time on the chip by ablation.

bench_flux.py puts the full-width block architecture (dim 3072, 4608 joint
tokens) at ~69% model MFU vs the DiT-512/8's 87% — this script knocks out
the fused qk-norm+RoPE pass and the joint attention independently to find
where the gap lives.  Slope-timed with host-transfer waits and params as
jit arguments (docs/ROUND3.md timing discipline).

Usage: python scripts/profile_flux.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from skrample_tpu.utils import enable_compilation_cache

enable_compilation_cache("/tmp/skrample_tpu_xla_cache")

from _bench_common import slope_time  # noqa: E402
from skrample_tpu.models import Flux, FluxConfig
from skrample_tpu.models.flux import flux_forward_flops

BATCH, HW, TXT = 1, 128, 512
PEAK_BF16 = 197e12


def main() -> None:
    config = FluxConfig(
        dim=3072,
        depth=2,
        single_depth=4,
        heads=24,
        context_dim=4096,
        pooled_dim=768,
        compute_dtype=jnp.bfloat16,
    )
    model = Flux(config)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda w: w.astype(jnp.bfloat16), params)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (BATCH, TXT, config.context_dim), jnp.float32)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (BATCH, config.pooled_dim), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 16, HW, HW), jnp.float32)
    fwd = flux_forward_flops(config, BATCH, HW, HW, TXT)
    n_img = (HW // config.patch) ** 2
    print(
        f"Flux dim={config.dim} {config.depth}+{config.single_depth} blocks heads={config.heads} — "
        f"{n_img + TXT} joint tokens, batch {BATCH} bf16; analytic {fwd / 1e9:.1f} GFLOP/fwd",
        flush=True,
    )

    real_prep, real_attn = Flux._prep_qkv, Flux._attention

    def run(label: str, prep=None, attn=None) -> float:
        Flux._prep_qkv = prep or real_prep
        Flux._attention = attn or real_attn
        try:
            sec = slope_time(
                lambda y, t, p: y - 0.02 * model.apply(p, y, t, ctx, pooled, guidance=3.5),
                x,
                args=(params,),
            )
        finally:
            Flux._prep_qkv, Flux._attention = real_prep, real_attn
        print(
            f"{label:44s} {sec * 1e6:9.1f} us/fwd   eff {fwd / sec / 1e12:6.1f} TF/s  "
            f"mfu {fwd / sec / PEAK_BF16:.3f}",
            flush=True,
        )
        return sec

    def identity_prep(self, qkv, p, cos, sin):
        return qkv

    def identity_attn(self, qkv):
        return qkv[..., : self.config.dim]

    full = run("full forward")
    no_prep = run("qk-norm+RoPE pass -> identity", prep=identity_prep)
    no_attn = run("joint attention -> identity", attn=identity_attn)
    neither = run("both -> identity (matmul chain + adaLN)", prep=identity_prep, attn=identity_attn)

    print()
    print(f"qk-norm+RoPE share:    {(full - no_prep) * 1e6:9.1f} us/fwd")
    print(f"attention share:       {(full - no_attn) * 1e6:9.1f} us/fwd")
    attn_flops = 4.0 * BATCH * (config.depth + config.single_depth) * (n_img + TXT) ** 2 * config.dim
    attn_sec = full - no_attn
    if attn_sec > 0:
        print(
            f"  (attention analytic {attn_flops / 1e9:.1f} GFLOP -> kernel eff "
            f"{attn_flops / attn_sec / 1e12:.1f} TF/s, {attn_flops / attn_sec / PEAK_BF16:.2f} of peak)"
        )
    mm_flops = fwd - attn_flops
    print(
        f"matmul-chain residual: {neither * 1e6:9.1f} us/fwd "
        f"(analytic {mm_flops / 1e9:.1f} GFLOP -> {mm_flops / neither / PEAK_BF16:.2f} of peak)"
    )


if __name__ == "__main__":
    main()
