#!/usr/bin/env python
"""A/B the int8 serving path (ops/quant.py) against bf16 on the chip.

Two tiers:
  1. bare matmul at serving shapes — does XLA's int8 dot actually run the
     MXU at its 2x int8 rate once the dynamic-quant epilogue is included?
  2. the flagship DiT forward, bf16 params vs DiT.quantize_params — the
     end-to-end win with attention/adaLN still bf16.

Slope-timed over two scan lengths (the repo's standard tunnel discipline:
forced host transfers, interleaved lengths).
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
from skrample_tpu.ops.quant import dense_int8, quantize_weight

BATCH, HW, DIM, DEPTH, HEADS = 4, 64, 512, 8, 4
M, K, N = 4096, 512, 2048
LENGTHS = (4, 40)


def slope(fn, args, lengths=LENGTHS, reps=4) -> float:
    "Seconds per iteration: scan-length slope with interleaved timing."
    runners = {}
    for n in lengths:
        runners[n] = jax.jit(
            lambda a, n=n: jax.lax.scan(lambda c, _: (fn(c), None), a, None, length=n)[0]
        )
        np.asarray(jax.tree.leaves(runners[n](args))[0])
    best = {n: float("inf") for n in lengths}
    for _ in range(reps):
        for n in lengths:
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(runners[n](args))[0])
            best[n] = min(best[n], time.perf_counter() - t0)
    lo, hi = lengths
    return (best[hi] - best[lo]) / (hi - lo)


def tier1() -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
    b = jnp.zeros((N,), jnp.float32)
    wq = {"w_q": quantize_weight(w), "b": b}
    flops = 2 * M * K * N

    def bf16_mm(c):
        (xx,) = c
        y = jnp.dot(xx.astype(jnp.bfloat16), w.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        # fold the output back to the input shape so the scan carries it
        # 0.03 ~ 1/sqrt(K): keeps the carry O(1) so 40 iterations don't overflow
        return ((0.03 * (y[:, :K] + y[:, K : 2 * K])).astype(jnp.float32),)

    def int8_mm(c):
        (xx,) = c
        y = dense_int8(wq, xx, jnp.float32)
        return (0.03 * (y[:, :K] + y[:, K : 2 * K]),)

    # a single ~50 us matmul needs a much wider length spread than the DiT
    # forward to put signal over the tunnel jitter
    t_bf16 = slope(bf16_mm, (x,), lengths=(8, 400))
    t_int8 = slope(int8_mm, (x,), lengths=(8, 400))
    print(f"bare matmul {M}x{K}x{N}:")
    print(f"  bf16 (incl. fold):        {t_bf16 * 1e6:8.1f} us  {flops / t_bf16 / 1e12:6.1f} TF/s")
    print(f"  int8 dynamic (incl. fold):{t_int8 * 1e6:8.1f} us  {flops / t_int8 / 1e12:6.1f} TOP/s  ({t_bf16 / t_int8:.2f}x)")


def tier2() -> None:
    config = DiTConfig(dim=DIM, depth=DEPTH, heads=HEADS, compute_dtype=jnp.bfloat16, attention="flash")
    model = DiT(config)
    params = model.init(jax.random.PRNGKey(0))
    qparams = model.quantize_params(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 4, HW, HW), jnp.float32)
    flops = dit_forward_flops(config, BATCH, HW, HW)

    def fwd(p):
        def f(c):
            xx, t = c
            return model.apply(p, xx, t), t + 1.0
        return f

    t_bf16 = slope(fwd(params), (x, jnp.zeros((BATCH,))))
    t_int8 = slope(fwd(qparams), (x, jnp.zeros((BATCH,))))
    print(f"DiT-{DIM}/{DEPTH} h{HEADS} forward, batch {BATCH} ({flops / 1e9:.1f} GFLOP):")
    print(f"  bf16: {t_bf16 * 1e6:8.1f} us/fwd  mfu {flops / t_bf16 / 197e12:.3f}")
    print(f"  int8: {t_int8 * 1e6:8.1f} us/fwd  'mfu' {flops / t_int8 / 197e12:.3f} vs bf16 peak  ({t_bf16 / t_int8:.2f}x)")

    ref = np.asarray(model.apply(params, x, jnp.full((BATCH,), 500.0)), np.float64).ravel()
    got = np.asarray(model.apply(qparams, x, jnp.full((BATCH,), 500.0)), np.float64).ravel()
    denom = float(np.linalg.norm(ref) * np.linalg.norm(got))
    if denom > 0:
        print(f"  cosine(bf16, int8) = {float(ref @ got) / denom:.5f}")


if __name__ == "__main__":
    tier1()
    tier2()
