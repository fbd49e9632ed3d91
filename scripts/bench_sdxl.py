#!/usr/bin/env python
"""SDXL-scale CondUNet characterization on the chip.

The REAL SDXL base shape — widths (320, 640, 1280), transformer depths
(0, 2, 10), heads (5, 10, 20), context 2048 — at a 1024px-image latent
(128x128), batch 1, CFG off and on.  Params are cast to bf16 after init
(~2.6B params, 5.2 GB) so the full model fits one v5e.  FLOPs are counted
by tracing the actual forward with counting wrappers (the bench_unet.py
recipe); slope-timed over two scan lengths with forced host transfers.

Usage: python scripts/bench_sdxl.py [steps=25]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu.utils import enable_compilation_cache

enable_compilation_cache("/tmp/skrample_tpu_xla_cache")

from skrample_tpu.models import CondUNet, CondUNetConfig
from skrample_tpu.models import unet_cond as unet_mod

BATCH, HW, TXT = 1, 128, 77
from _bench_common import cast_bf16, slope_time  # noqa: E402 — (2, 6) default lengths

PEAK_BF16 = 197e12


def count_flops(model: CondUNet, params, x, t, ctx, pooled, tids) -> float:
    "Matmul-equivalent FLOPs of one forward, traced with counting wrappers."
    total = 0.0
    orig_conv, orig_dense, orig_mha = unet_mod._conv, unet_mod._dense, CondUNet._mha

    def conv(p, xx, dtype, stride=1, cl=False, pad="SAME"):
        nonlocal total
        out = orig_conv(p, xx, dtype, stride, cl, pad)
        co, ci, k, _ = p["w"].shape
        spatial = out.size // (out.shape[0] * co)
        total += 2.0 * k * k * ci * co * spatial * xx.shape[0]
        return out

    def dense(p, xx, dtype):
        nonlocal total
        total += 2.0 * p["w"].shape[0] * p["w"].shape[1] * (xx.size // xx.shape[-1])
        return orig_dense(p, xx, dtype)

    def mha(self, q, k, v, heads):
        nonlocal total
        total += 2.0 * q.shape[0] * q.shape[1] * k.shape[1] * q.shape[2] * 2  # scores + combine
        return orig_mha(self, q, k, v, heads)

    unet_mod._conv, unet_mod._dense, CondUNet._mha = conv, dense, mha
    try:
        jax.eval_shape(lambda: model.apply(params, x, t, ctx, pooled, tids))
    finally:
        unet_mod._conv, unet_mod._dense, CondUNet._mha = orig_conv, orig_dense, orig_mha
    return total


def main(steps: int = 25) -> None:
    config = CondUNetConfig(compute_dtype=jnp.bfloat16)  # the SDXL base shape
    model = CondUNet(config)
    params = model.init(jax.random.PRNGKey(0))
    params = cast_bf16(params)  # leaf-by-leaf: f32 + bf16 trees together would OOM the v5e
    n_params = sum(leaf.size for leaf in jax.tree.leaves(params))

    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 4, HW, HW), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (BATCH, TXT, config.context_dim), jnp.float32)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (BATCH, config.pooled_dim), jnp.float32)
    tids = jnp.tile(jnp.asarray([[1024.0, 1024.0, 0.0, 0.0, 1024.0, 1024.0]], jnp.float32), (BATCH, 1))

    fwd = count_flops(model, params, x, jnp.full((BATCH,), 500.0), ctx, pooled, tids)
    print(
        f"SDXL UNet {config.widths} tl={config.transformer_layers} heads={config.heads} "
        f"({n_params / 1e9:.2f}B params bf16, layout {config.resolved_layout}) — latent {HW}x{HW}, "
        f"ctx {TXT}x{config.context_dim}, batch {BATCH}; traced {fwd / 1e9:.1f} GFLOP/fwd",
        flush=True,
    )

    # Params ride through jit as ARGUMENTS (slope_time args=): closed over,
    # 5.2 GB of bf16 weights would lower as captured constants.
    def uncond(y, t, p):
        return y - 0.02 * model.as_sampleable(p, ctx, pooled, tids)(y, t, 1.0, 0.0)

    def cfg(y, t, p):
        f = model.as_sampleable(
            p,
            ctx,
            pooled,
            tids,
            guidance_scale=5.0,
            uncond_context=jnp.zeros_like(ctx),
            uncond_pooled=jnp.zeros_like(pooled),
        )
        return y - 0.02 * f(y, t, 1.0, 0.0)

    for label, fn, flops in (("forward", uncond, fwd), ("CFG forward (doubled batch)", cfg, 2 * fwd)):
        sec = slope_time(fn, x, args=(params,))
        print(
            f"{label:28s} {sec * 1e6:9.1f} us/step   eff {flops / sec / 1e12:6.1f} TF/s  "
            f"mfu {flops / sec / PEAK_BF16:.3f}   {BATCH / (sec * steps):5.2f} img/s marginal @ {steps} steps",
            flush=True,
        )

    # Int8 serving trees, scope A/B (see CondUNet.quantize_params):
    #   deep — only the >=4-block Transformer2D stages (the default; keeps
    #          the conv-interleaved width-320/640 stages in bf16 fusion)
    #   all  — the round-3 every-dense tree (measured slower than bf16:
    #          fusion/layout loss around ~450 conv-interleaved int8 dots)
    for scope in ("deep", "all"):
        donate = (0,) if scope == "all" else ()  # last user frees the bf16 tree
        qparams = jax.jit(lambda p, s=scope: model.quantize_params(p, scope=s), donate_argnums=donate)(params)
        if donate:
            del params
        for label, fn, flops in (
            (f"int8[{scope}] forward", uncond, fwd),
            (f"int8[{scope}] CFG (doubled batch)", cfg, 2 * fwd),
        ):
            sec = slope_time(fn, x, args=(qparams,))
            print(
                f"{label:28s} {sec * 1e6:9.1f} us/step   bf16-equiv {flops / sec / 1e12:6.1f} TF/s  "
                f"({flops / sec / PEAK_BF16:.2f}x bf16 peak)   {BATCH / (sec * steps):5.2f} img/s marginal @ {steps} steps",
                flush=True,
            )
        del qparams


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 25)
