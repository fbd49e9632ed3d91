#!/usr/bin/env python
"""Attribute the UNet forward-pass time on the chip by ablation.

The UNet characterization (scripts/bench_unet.py) puts base=128/2-block at
~39% MFU with the channels-last interior vs the DiT's 87% — this script
finds where the non-conv microseconds go so optimization effort lands where
it matters.  Pieces knocked out one at a time: GroupNorm -> identity,
mid-block attention -> identity, the temb dense adds -> skipped, and a
bare conv chain at the model's own shapes as the MXU ceiling.

Each variant is slope-timed (2 scan lengths, best-of-3, interleaved), and
waits force a host transfer (np.asarray) — through the axon tunnel a
block_until_ready-only wait can return while scanned work is in flight
(see docs/ROUND3.md timing discipline).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu.utils import enable_compilation_cache

enable_compilation_cache("/tmp/skrample_tpu_xla_cache")

from skrample_tpu.models import UNet, UNetConfig
from skrample_tpu.models import unet as unet_mod

BATCH = int(os.environ.get("BATCH", "4"))
HW = int(os.environ.get("HW", "64"))
LENGTHS = tuple(int(n) for n in os.environ.get("LENGTHS", "2,10").split(","))
PEAK_BF16 = 197e12


def slope_time(fn, x, t) -> float:
    def loop_body(y, n):
        def body(carry, _):
            return fn(carry, t), None

        out, _ = jax.lax.scan(body, y, None, length=n)
        # scalar-reduce so the timed transfer is O(1) and cancels in the slope
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
    base_w = int(os.environ.get("BASE", "128"))
    blocks = int(os.environ.get("BLOCKS", "2"))
    config = UNetConfig(base=base_w, levels=3, blocks_per_level=blocks, compute_dtype=jnp.bfloat16)
    model = UNet(config)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 4, HW, HW), jnp.float32)
    t = jnp.full((BATCH,), 500.0, jnp.float32)

    from bench_unet import count_flops  # sibling script

    flops = count_flops(model, params, x, t)
    print(
        f"UNet base={base_w} blocks={blocks} layout={config.resolved_layout} "
        f"batch {BATCH} {HW}x{HW} bf16; traced {flops / 1e9:.1f} GFLOP/fwd",
        flush=True,
    )

    real_gn = unet_mod._groupnorm
    real_attn = UNet._attention
    real_dense = unet_mod._dense

    def run(label, gn=None, attn=None, dense=None):
        unet_mod._groupnorm = gn or real_gn
        UNet._attention = attn or real_attn
        unet_mod._dense = dense or real_dense
        try:
            sec = slope_time(lambda y, tt: model.apply(params, y, tt), x, t)
        finally:
            unet_mod._groupnorm = real_gn
            UNet._attention = real_attn
            unet_mod._dense = real_dense
        print(
            f"{label:44s} {sec * 1e6:9.1f} us/fwd   eff {flops / sec / 1e12:6.1f} TF/s"
            f"  mfu {flops / sec / PEAK_BF16:.3f}",
            flush=True,
        )
        return sec

    def gn_identity(z, groups, cl=False, silu=False):
        return jax.nn.silu(z) if silu else z  # keep the activation; ablate only the norm

    full = run("full")
    no_gn = run("groupnorm -> identity", gn=gn_identity)
    no_attn = run("mid attention -> identity", attn=lambda self, p, z, dtype, cl=False: z)
    none = run(
        "groupnorm+attn -> identity",
        gn=gn_identity,
        attn=lambda self, p, z, dtype, cl=False: z,
    )

    # bare conv chain at the model's own per-level shapes (the MXU ceiling):
    # replay every conv the forward makes, with zero weights, no norms/adds.
    cl = config.resolved_layout == "nhwc"
    convs = []  # (c_in, c_out, k, h, w, stride)
    orig_conv = unet_mod._conv

    def record_conv(p, z, dtype, stride=1, cl=False):
        out = orig_conv(p, z, dtype, stride, cl)
        co, ci, k, _ = p["w"].shape
        h, w = (out.shape[1:3] if cl else out.shape[-2:])
        convs.append((ci, co, k, h, w, stride))
        return out

    unet_mod._conv = record_conv
    try:
        jax.eval_shape(lambda: model.apply(params, x, t))
    finally:
        unet_mod._conv = orig_conv

    weights = [
        (jnp.zeros((k, k, ci, co) if cl else (co, ci, k, k), jnp.bfloat16), stride, h, w)
        for ci, co, k, h, w, stride in convs
    ]
    conv_flops = sum(2.0 * k * k * ci * co * h * w * BATCH for ci, co, k, h, w, _ in convs)

    def conv_chain(y, tt):
        h = y  # carry stays NCHW; convs chain through scalar means
        for wgt, stride, oh, ow in weights:
            if cl:
                ci = wgt.shape[2]
                ih = oh * stride
                src = h.astype(jnp.bfloat16)
                z = jnp.zeros((BATCH, ih, ih, ci), jnp.bfloat16) + src.mean()
                h = jax.lax.conv_general_dilated(
                    z, wgt, (stride, stride), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
            else:
                ci = wgt.shape[1]
                ih = oh * stride
                src = h.astype(jnp.bfloat16)
                z = jnp.zeros((BATCH, ci, ih, ih), jnp.bfloat16) + src.mean()
                h = jax.lax.conv_general_dilated(
                    z, wgt, (stride, stride), "SAME",
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
        return y + h.mean().astype(y.dtype)

    sec = slope_time(conv_chain, x.astype(jnp.bfloat16), t)
    print(
        f"{'bare conv chain (same shapes)':44s} {sec * 1e6:9.1f} us/fwd   "
        f"eff {conv_flops / sec / 1e12:6.1f} TF/s  mfu {conv_flops / sec / PEAK_BF16:.3f}",
        flush=True,
    )

    print()
    print(f"groupnorm total:        {(full - no_gn) * 1e6:8.1f} us/fwd")
    print(f"mid attention total:    {(full - no_attn) * 1e6:8.1f} us/fwd")
    print(f"residual vs bare convs: {(none - sec) * 1e6:8.1f} us/fwd (temb/resize/concat/silu/bias)")


if __name__ == "__main__":
    main()
