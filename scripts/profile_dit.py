#!/usr/bin/env python
"""Attribute the DiT forward-pass time on the chip by ablation.

Default config is the serving flagship (heads=4, head_dim 128: fused-qkv
kernel + fused adaLN); set HEADS=8 to profile the transpose path.

The serving benchmark reports ~36% model-forward MFU (bf16, batch 4,
dim 512, depth 8, 1024 tokens).  This script times the jitted forward with
pieces knocked out — attention replaced by identity, layer norms replaced by
identity, head split/merge transposes isolated, a bare matmul chain as the
ceiling — so optimization effort goes where the microseconds are.

Each variant is slope-timed (2 sweep lengths, best-of-3, interleaved) to
subtract dispatch overhead, like bench.py's headline estimator.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.utils import enable_compilation_cache

enable_compilation_cache("/tmp/skrample_tpu_xla_cache")
from skrample_tpu.models import dit as dit_mod

BATCH, HW, DIM, DEPTH, HEADS = 4, 64, 512, 8, 4
LENGTHS = (2, 10)


def slope_time(fn, x, t) -> float:
    "Marginal per-call seconds via 2-length slope, best of 3 interleaved reps."

    def loop(n):
        y = x
        for i in range(n):
            y = fn(y, t)
        return y

    jl = {n: jax.jit(lambda y, n=n: loop_body(y, n)) for n in LENGTHS}

    def loop_body(y, n):
        def body(carry, _):
            return fn(carry, t), None

        out, _ = jax.lax.scan(body, y, None, length=n)
        return out

    for n in LENGTHS:
        jl[n](x).block_until_ready()
    best = {n: float("inf") for n in LENGTHS}
    for _ in range(3):
        for n in LENGTHS:
            t0 = time.perf_counter()
            jl[n](x).block_until_ready()
            best[n] = min(best[n], time.perf_counter() - t0)
    lo, hi = LENGTHS
    return (best[hi] - best[lo]) / (hi - lo)


def main() -> None:
    config = DiTConfig(dim=DIM, depth=DEPTH, heads=HEADS, compute_dtype=jnp.bfloat16, attention="flash")
    dit = DiT(config)
    params = dit.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 4, HW, HW), jnp.float32)
    t = jnp.full((BATCH,), 500.0, jnp.float32)

    N = (HW // config.patch) ** 2
    from bench import dit_forward_flops

    flops = dit_forward_flops(config, BATCH, HW, HW)
    peak = 197e12

    real_adaln = dit_mod._adaln
    import importlib

    fa_mod = importlib.import_module("skrample_tpu.ops.flash_attention")

    real_flash = fa_mod.flash_attention
    real_flash_qkv = fa_mod.flash_attention_qkv

    def run(label, attention=None, layernorm=None, flash=None):
        cfgs = {"full": config} if attention is None else {attention: DiTConfig(
            dim=DIM, depth=DEPTH, heads=HEADS, compute_dtype=jnp.bfloat16, attention=attention)}
        dit_mod._adaln = layernorm or real_adaln
        fa_mod.flash_attention = flash or real_flash
        fa_mod.flash_attention_qkv = (
            (lambda qkv, heads: qkv[..., : qkv.shape[-1] // 3]) if flash else real_flash_qkv
        )
        try:
            for _, cfg in cfgs.items():
                m = DiT(cfg)
                sec = slope_time(lambda y, tt: m.apply(params, y, tt), x, t)
                us = sec * 1e6
                print(f"{label:44s} {us:9.1f} us/fwd   eff {flops / sec / 1e12:6.1f} TF/s  mfu {flops / sec / peak:.3f}", flush=True)
                return sec
        finally:
            dit_mod._adaln = real_adaln
            fa_mod.flash_attention = real_flash
            fa_mod.flash_attention_qkv = real_flash_qkv

    print(f"DiT dim={DIM} depth={DEPTH} heads={HEADS} N={N} batch={BATCH} bf16; analytic {flops / 1e9:.1f} GFLOP/fwd")
    base = run("full (flash attention)")
    no_attn = run("attention -> identity (keeps transposes)", flash=lambda q, k, v: q)
    no_ln = run("adaln -> identity", layernorm=lambda z, sh, sc: z)
    both = run("attention+adaln -> identity",
               flash=lambda q, k, v: q, layernorm=lambda z, sh, sc: z)

    # matmul-only ceiling at the same shapes: qkv, proj, mlp_in, mlp_out per block
    w_qkv = jnp.zeros((DIM, 3 * DIM), jnp.bfloat16)
    w_proj = jnp.zeros((DIM, DIM), jnp.bfloat16)
    w_in = jnp.zeros((DIM, 4 * DIM), jnp.bfloat16)
    w_out = jnp.zeros((4 * DIM, DIM), jnp.bfloat16)

    def mm_chain(y, tt):
        h = y
        for _ in range(DEPTH):
            a = jnp.dot(h, w_qkv, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            h = h + jnp.dot(a[..., :DIM], w_proj, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            b = jnp.dot(h, w_in, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            h = h + jnp.dot(b, w_out, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return h

    tok = jnp.zeros((BATCH, N, DIM), jnp.bfloat16)
    mm_sec = slope_time(mm_chain, tok, t)
    mm_flops = BATCH * DEPTH * N * DIM * DIM * (6 + 2 + 8 + 8)
    print(f"{'bare matmul chain (same shapes)':44s} {mm_sec * 1e6:9.1f} us/fwd   "
          f"eff {mm_flops / mm_sec / 1e12:6.1f} TF/s  mfu {mm_flops / mm_sec / peak:.3f}", flush=True)

    print()
    print(f"attention total (incl. transposes): {(base - no_attn) * 1e6:8.1f} us/fwd")
    print(f"adaln total:                        {(base - no_ln) * 1e6:8.1f} us/fwd")
    print(f"everything-else residual:           {(both - mm_sec) * 1e6:8.1f} us/fwd vs bare matmuls")


if __name__ == "__main__":
    main()
