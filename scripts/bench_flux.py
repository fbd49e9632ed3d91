#!/usr/bin/env python
"""Flux-scale hot-path characterization on the chip.

Full FLUX.1 (19 double + 38 single blocks at dim 3072) exceeds one v5e's
HBM in bf16, so this benches the block architecture at full WIDTH and
token count with a reduced depth (2 double + 4 single, the published 1:2
ratio): per-block MFU transfers to the full model since every block is
identical.  Shapes: 4096 image tokens (a 1024px image through the 8x VAE
and 2x2 packing) + 512 T5 tokens = 4608 joint (36 x 128 tiles), head_dim
128 -> the fused Pallas flash path.  Slope-timed over two scan lengths
(dispatch/transfer constants cancel; np.asarray waits per the timing
discipline in docs/ROUND3.md).

Usage: python scripts/bench_flux.py [steps=25]
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

from skrample_tpu.models import Flux, FluxConfig
from skrample_tpu.models.flux import flux_forward_flops

BATCH, HW, TXT = 1, 128, 512
from _bench_common import cast_bf16, slope_time  # noqa: E402 — (2, 6) default lengths

PEAK_BF16 = 197e12


def main(steps: int = 25) -> None:
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
    params = jax.tree.map(
        lambda leaf: leaf + 0.02 * jax.random.normal(jax.random.PRNGKey(7), leaf.shape, leaf.dtype), params
    )
    params = cast_bf16(params)  # serving storage; leaf-by-leaf, the f32 tree would OOM alongside
    ctx = jax.random.normal(jax.random.PRNGKey(2), (BATCH, TXT, config.context_dim), jnp.float32)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (BATCH, config.pooled_dim), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 16, HW, HW), jnp.float32)

    n_img = (HW // config.patch) ** 2
    fwd = flux_forward_flops(config, BATCH, HW, HW, TXT)
    n_params = sum(leaf.size for leaf in jax.tree.leaves(params))
    print(
        f"Flux dim={config.dim} {config.depth} double + {config.single_depth} single, heads={config.heads} "
        f"(head_dim {config.head_dim}, flash) — {n_img} img + {TXT} txt = {n_img + TXT} joint tokens, "
        f"batch {BATCH} bf16, {n_params / 1e9:.2f}B params; analytic {fwd / 1e9:.1f} GFLOP/fwd",
        flush=True,
    )

    # Params ride through jit as ARGUMENTS (slope_time args=): closed over,
    # 2.6 GB of bf16 weights would lower as captured constants.
    def step(y, t, p):
        return y - 0.02 * model.as_sampleable(p, ctx, pooled, guidance=3.5)(y, t, 1.0, 0.0)

    sec = slope_time(step, x, args=(params,))
    print(
        f"{'guidance-embedded forward':32s} {sec * 1e6:9.1f} us/step   eff {fwd / sec / 1e12:6.1f} TF/s  "
        f"mfu {fwd / sec / PEAK_BF16:.3f}   {BATCH / (sec * steps):5.2f} img/s marginal @ {steps} steps",
        flush=True,
    )

    sec = slope_time(step, x, args=(model.quantize_params(params),))
    print(
        f"{'forward int8 (W8A8 blocks)':32s} {sec * 1e6:9.1f} us/step   "
        f"eff {fwd / sec / 1e12:6.1f} TF/s (bf16-equiv)   "
        f"{BATCH / (sec * steps):5.2f} img/s marginal @ {steps} steps",
        flush=True,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 25)
