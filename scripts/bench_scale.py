#!/usr/bin/env python
"""Forward-MFU scaling study: does the model hot path hold its efficiency
as the flagship DiT grows?

Slope-times the jitted forward (per-step-varying timesteps, so nothing is
loop-invariant) at three sizes with the TPU-native head shape (d=128) and
reports model-forward MFU against the v5e bf16 peak.

Measured 2026-08-17 (v5e, bf16, batch 4, 1024 tokens):

    dim512/d8/h4:     1.86 ms/fwd  mfu 0.752
    dim768/d12/h6:    5.04 ms/fwd  mfu 0.858
    dim1024/d16/h8:  11.26 ms/fwd  mfu 0.868   (batch 8: 22.63 ms, 0.864)

Bigger models run CLOSER to peak: the fixed per-layer overheads (adaLN,
gates, patch IO) amortize against D^2 matmul work.

NOTE dev-tunnel gotcha: params must be jit ARGUMENTS.  A closure embeds
them as HLO constants and the remote-compile request body blows the
tunnel's size limit (HTTP 413 / broken pipe) for models over ~70M params.
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

from bench import dit_forward_flops
from skrample_tpu.models import DiT, DiTConfig


def row(dim: int, depth: int, heads: int, batch: int) -> None:
    cfg = DiTConfig(dim=dim, depth=depth, heads=heads, compute_dtype=jnp.bfloat16, attention="flash")
    m = DiT(cfg)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 4, 64, 64), jnp.float32)
    t0v = jnp.full((batch,), 500.0, jnp.float32)

    def loop(p, y, n):
        r, _ = jax.lax.scan(lambda c, i: (m.apply(p, c, t0v + i.astype(jnp.float32)), None), y, jnp.arange(n))
        return jnp.sum(r.astype(jnp.float32))

    jl = {n: jax.jit(lambda p, y, n=n: loop(p, y, n)) for n in (2, 8)}
    for n in (2, 8):
        np.asarray(jl[n](params, x))
    best = {n: float("inf") for n in (2, 8)}
    for _ in range(4):
        for n in (2, 8):
            t0 = time.perf_counter()
            np.asarray(jl[n](params, x))
            best[n] = min(best[n], time.perf_counter() - t0)
    sec = (best[8] - best[2]) / 6
    fl = dit_forward_flops(cfg, batch, 64, 64)
    print(f"dim{dim}/d{depth}/h{heads} b{batch} (dh {dim // heads}): {sec * 1e3:7.2f} ms/fwd  mfu {fl / sec / 197e12:.3f}", flush=True)


if __name__ == "__main__":
    row(512, 8, 4, 4)
    row(768, 12, 6, 4)
    row(1024, 16, 8, 4)
    row(1024, 16, 8, 8)
