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

    # text-conditioned CFG serving (cross-attention + learned-null uncond,
    # both branches in one doubled-batch forward) — the text2video workload
    ctx_tokens = 64
    ccfg = VideoDiTConfig(
        dim=512, depth=8, heads=4, channels=16, context_dim=512, compute_dtype=jnp.bfloat16
    )
    cmodel = VideoDiT(ccfg)
    cparams = jax.tree.map(
        lambda leaf: leaf + 0.02 * jax.random.normal(jax.random.PRNGKey(7), leaf.shape, leaf.dtype),
        cmodel.init(jax.random.PRNGKey(0)),
    )
    ctx = jax.random.normal(jax.random.PRNGKey(2), (BATCH, ctx_tokens, 512), jnp.float32)
    cfg_flops = 2.0 * video_dit_forward_flops(ccfg, BATCH, FRAMES, HW, HW, txt_tokens=ctx_tokens)
    # sequential (the family default) vs doubled-batch A/B: the factorized
    # temporal attention is MXU-granularity-bound, so batch doubling is
    # superlinearly slower here — see VideoDiT.as_sampleable
    for label, batched in (("CFG cross-attn (sequential)", False), ("CFG cross-attn (doubled batch)", True)):
        cfg_fn = cmodel.as_sampleable(cparams, ctx, guidance_scale=3.0, cfg_batched=batched)
        sec = slope_time(lambda y, t, f=cfg_fn: y - 0.02 * f(y, t, 1.0, 0.0), x)
        print(
            f"{label:36s} {sec * 1e6:8.1f} us/step   "
            f"eff {cfg_flops / sec / 1e12:6.1f} TF/s  mfu {cfg_flops / sec / PEAK_BF16:.3f}   "
            f"{BATCH / (sec * steps):6.2f} videos/s marginal @ {steps} steps",
            flush=True,
        )


def count_vae_flops(vae, params, z) -> float:
    "Matmul-equivalent FLOPs of one VideoVAE decode, traced with counting wrappers."
    import dataclasses

    from skrample_tpu.models import video_vae as vv_mod

    # count on the REFERENCE composition: the fused-decode path routes its
    # convs through ops/fused_conv.py, which these wrappers don't see — the
    # two paths compute identical math, so the count transfers
    if vae._use_fused_decode():
        vae = vv_mod.VideoVAE(dataclasses.replace(vae.config, fused_decode=False))

    total = 0.0
    orig_conv, orig_dense, orig_tconv = vv_mod._conv, vv_mod._dense, vv_mod._tconv

    def conv(p, xx, dtype, stride=1, cl=False, pad="SAME"):
        nonlocal total
        out = orig_conv(p, xx, dtype, stride, cl, pad)
        co, ci, k, _ = p["w"].shape
        total += 2.0 * k * k * ci * co * (out.size // co)
        return out

    def dense(p, xx, dtype):
        nonlocal total
        total += 2.0 * p["w"].shape[0] * p["w"].shape[1] * (xx.size // xx.shape[-1])
        return orig_dense(p, xx, dtype)

    def tconv(p, xx, dtype, stride=1):
        nonlocal total
        out = orig_tconv(p, xx, dtype, stride)
        k, ci, co = p["w"].shape
        total += 2.0 * k * ci * co * (out.size // co)
        return out

    vv_mod._conv, vv_mod._dense, vv_mod._tconv = conv, dense, tconv
    try:
        jax.eval_shape(lambda: vae.decode(params, z))
    finally:
        vv_mod._conv, vv_mod._dense, vv_mod._tconv = orig_conv, orig_dense, orig_tconv
    return total


def main_vae(base: int = 64) -> None:
    """The causal VideoVAE pixel bridge at a Wan-class shape: decode a
    16-frame 512x512 clip from (16, 4, 64, 64) latents (8x spatial, 4x
    temporal compression).  ``--base128`` runs the lane-filling width for
    attribution: base=64 puts 64 channels on the 128-wide lane axis at the
    finest (most expensive) level, so half the vector tile idles there."""
    from skrample_tpu.models import VideoVAE, VideoVAEConfig

    config = VideoVAEConfig(base=base, levels=4, temporal_levels=2, blocks_per_level=2, groups=16)
    vae = VideoVAE(config)
    params = vae.init(jax.random.PRNGKey(0))  # weights cast to bf16 at use
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 4, 64, 64), jnp.bfloat16)
    flops = count_vae_flops(vae, params, z)
    out_shape = (1, 3, 4 * config.temporal_factor, 64 * config.downsample_factor, 64 * config.downsample_factor)
    print(
        f"VideoVAE base={config.base} levels={config.levels} tlevels={config.temporal_levels}: "
        f"decode {tuple(z.shape)} -> {out_shape}; traced {flops / 1e9:.1f} GFLOP/decode",
        flush=True,
    )

    def step(y, t):
        px = vae.decode(params, y * (1 + 1e-6 * t).astype(y.dtype))
        # fold pixels back into the carry so the scan carry stays small
        return (y + 1e-12 * px.astype(jnp.float32).mean()).astype(y.dtype)

    sec = slope_time(step, z)
    frames = out_shape[2]
    print(
        f"{'causal decode':36s} {sec * 1e6:8.1f} us/clip   eff {flops / sec / 1e12:6.1f} TF/s  "
        f"mfu {flops / sec / PEAK_BF16:.3f}   {frames / sec:6.1f} pixel-frames/s",
        flush=True,
    )


if __name__ == "__main__":
    if "--vae" in sys.argv:
        main_vae(base=128 if "--base128" in sys.argv else 64)
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 25)
