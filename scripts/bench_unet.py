#!/usr/bin/env python
"""Characterize the second model family: the SD-style conv UNet.

Slope-times the jitted forward (the repo's standard tunnel discipline:
forced host transfers, interleaved scan lengths) and reports effective
TFLOP/s + MFU against the v5e bf16 peak.  FLOPs are counted by tracing the
*actual* forward with counting wrappers around ``_conv``/``_dense`` and the
attention einsums (``jax.eval_shape`` — no device work), so the number
tracks the real architecture instead of a hand-derived formula.

Conv MFU context: XLA lowers convs to implicit-GEMM on the MXU; small
channel counts at full resolution (base width 64-128 over 64x64) leave MXU
lanes idle, so conv MFU lands well under the DiT's 87% — this script
reports where on that curve the bundled config sits.
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

from skrample_tpu.models import UNet, UNetConfig
from skrample_tpu.models import unet as unet_mod

BATCH, HW = 4, 64
LENGTHS = (2, 12)
PEAK_BF16 = 197e12


def count_flops(model: UNet, params, x, t) -> float:
    "Matmul-equivalent FLOPs of one forward, by tracing with counting wrappers."
    total = 0.0
    orig_conv, orig_dense, orig_attn = unet_mod._conv, unet_mod._dense, UNet._attention

    def conv(p, xx, dtype, stride=1, cl=False):
        nonlocal total
        out = orig_conv(p, xx, dtype, stride, cl)
        co, ci, k, _ = p["w"].shape
        spatial = out.size // (out.shape[0] * co)  # H*W in either layout
        total += 2.0 * k * k * ci * co * spatial * xx.shape[0]
        return out

    def dense(p, xx, dtype):
        nonlocal total
        total += 2.0 * p["w"].shape[0] * p["w"].shape[1] * (xx.size // xx.shape[-1])
        return orig_dense(p, xx, dtype)

    def attention(self, p, xx, dtype, cl=False):
        nonlocal total
        B = xx.shape[0]
        C = p["qkv"]["w"].shape[0]
        tokens = xx.size // (B * C)
        total += 4.0 * B * tokens**2 * C  # scores + combine
        return orig_attn(self, p, xx, dtype, cl)

    unet_mod._conv, unet_mod._dense, UNet._attention = conv, dense, attention
    try:
        jax.eval_shape(model.apply, params, x, t)
    finally:
        unet_mod._conv, unet_mod._dense, UNet._attention = orig_conv, orig_dense, orig_attn
    return total


def slope_forward(model, params, x) -> float:
    def body(c, _):
        xx, t = c
        return (model.apply(params, xx, t), t + 1.0), None

    runners = {}
    for n in LENGTHS:
        runners[n] = jax.jit(lambda a, n=n: jax.lax.scan(body, a, None, length=n)[0][0])
        np.asarray(runners[n]((x, jnp.zeros((x.shape[0],)))))
    best = {n: float("inf") for n in LENGTHS}
    for _ in range(4):
        for n in LENGTHS:
            t0 = time.perf_counter()
            np.asarray(runners[n]((x, jnp.zeros((x.shape[0],)))))
            best[n] = min(best[n], time.perf_counter() - t0)
    lo, hi = LENGTHS
    return (best[hi] - best[lo]) / (hi - lo)


def main() -> None:
    for base, blocks in ((64, 1), (128, 2)):
        for layout in ("nchw", "nhwc"):
            config = UNetConfig(base=base, levels=3, blocks_per_level=blocks, compute_dtype=jnp.bfloat16, layout=layout)
            model = UNet(config)
            params = model.init(jax.random.PRNGKey(0))
            x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 4, HW, HW), jnp.float32)
            flops = count_flops(model, params, x, jnp.zeros((BATCH,)))
            sec = slope_forward(model, params, x)
            n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
            print(
                f"UNet base={base} levels=3 blocks={blocks} {layout} ({n_params / 1e6:.1f}M params, "
                f"{flops / 1e9:.1f} GFLOP/fwd, batch {BATCH}, {HW}x{HW}): "
                f"{sec * 1e6:7.1f} us/fwd  eff {flops / sec / 1e12:6.1f} TF/s  mfu {flops / sec / PEAK_BF16:.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
