#!/usr/bin/env python
"""Attribute the SDXL CondUNet forward time on the chip by ablation.

bench_sdxl.py puts the real SDXL base shape at ~55% MFU — this script
knocks out the attention math, the whole Transformer2D stages, and the
GroupNorms independently to find where the gap lives.  Slope-timed with
host-transfer waits and params as jit arguments (docs/ROUND3.md timing
discipline).

Usage: python scripts/profile_sdxl.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from skrample_tpu.utils import enable_compilation_cache

enable_compilation_cache("/tmp/skrample_tpu_xla_cache")

from _bench_common import cast_bf16, slope_time  # noqa: E402
from skrample_tpu.models import CondUNet, CondUNetConfig

BATCH, HW, TXT = 1, 128, 77
PEAK_BF16 = 197e12


def main() -> None:
    config = CondUNetConfig(compute_dtype=jnp.bfloat16)  # the SDXL base shape
    model = CondUNet(config)
    params = cast_bf16(model.init(jax.random.PRNGKey(0)))

    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 4, HW, HW), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (BATCH, TXT, config.context_dim), jnp.float32)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (BATCH, config.pooled_dim), jnp.float32)
    tids = jnp.tile(jnp.asarray([[1024.0, 1024.0, 0.0, 0.0, 1024.0, 1024.0]], jnp.float32), (BATCH, 1))

    # the traced-FLOPs count from bench_sdxl (stable for this fixed shape)
    FWD = 6761.2e9
    print(
        f"SDXL UNet {config.widths} tl={config.transformer_layers} heads={config.heads} — "
        f"latent {HW}x{HW}, batch {BATCH} bf16; traced {FWD / 1e9:.1f} GFLOP/fwd",
        flush=True,
    )

    real_mha, real_tr, real_gn = CondUNet._mha, CondUNet._transformer, CondUNet._gn

    def run(label: str, mha=None, tr=None, gn=None) -> float:
        CondUNet._mha = mha or real_mha
        CondUNet._transformer = tr or real_tr
        CondUNet._gn = gn or real_gn
        try:
            sec = slope_time(
                lambda y, t, p: y - 0.02 * model.as_sampleable(p, ctx, pooled, tids)(y, t, 1.0, 0.0),
                x,
                args=(params,),
            )
        finally:
            CondUNet._mha, CondUNet._transformer, CondUNet._gn = real_mha, real_tr, real_gn
        print(
            f"{label:44s} {sec * 1e6:9.1f} us/fwd   eff {FWD / sec / 1e12:6.1f} TF/s  "
            f"mfu {FWD / sec / PEAK_BF16:.3f}",
            flush=True,
        )
        return sec

    def identity_mha(self, q, k, v, heads):
        return q

    def identity_transformer(self, p, x, context, heads, dtype, cl):
        return x

    def passthrough_gn(self, x, p, cl, silu=False):
        return jax.nn.silu(x) if silu else x

    full = run("full forward")
    no_attn = run("attention (self+cross) -> identity", mha=identity_mha)
    no_tr = run("Transformer2D stages -> identity", tr=identity_transformer)
    no_gn = run("GroupNorm -> passthrough", gn=passthrough_gn)

    print()
    print(f"attention math share:        {(full - no_attn) * 1e6:9.1f} us/fwd")
    print(f"transformer stages total:    {(full - no_tr) * 1e6:9.1f} us/fwd")
    print(f"  (dense/LN/proj residue:    {(no_attn - no_tr) * 1e6:9.1f} us/fwd)")
    print(f"groupnorm share:             {(full - no_gn) * 1e6:9.1f} us/fwd")
    print(f"conv backbone residual:      {no_tr * 1e6:9.1f} us/fwd")


if __name__ == "__main__":
    main()
