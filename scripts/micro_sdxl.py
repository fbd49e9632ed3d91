#!/usr/bin/env python
"""Microbench the SDXL transformer-stage constituents at their exact shapes.

profile_sdxl.py attributed the 62 ms SDXL forward as: 31.5 ms dense/LN/proj
residue, 17.2 ms attention math, 13.4 ms conv backbone, 3.1 ms GroupNorm.
This script times the isolated pieces at the real shapes to see which runs
furthest from peak:

* a basic-block dense chain (qkv/out/q/kv/out/GEGLU) at (4096, 640) and
  (1024, 1280)
* the packed flash kernel at B=1 x heads=10 x N=4096 x d=64->128 and
  B=1 x heads=20 x N=1024 x d=64->128
* bare square-ish matmuls at the same M/K/N as a sanity ceiling

Usage: python scripts/micro_sdxl.py
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from skrample_tpu.utils import enable_compilation_cache

enable_compilation_cache("/tmp/skrample_tpu_xla_cache")

from _bench_common import slope_time  # noqa: E402

PEAK = 197e12
CTX_N, CTX_D = 77, 2048
LENGTHS = (32, 160)  # sub-ms kernels need long scans to beat tunnel jitter


def tick(h, t):
    "Cheap dtype-preserving perturbation so the scan carry stays live."
    return h * (1 + 1e-6 * t).astype(h.dtype)


def report(label: str, sec: float, flops: float) -> None:
    print(f"{label:58s} {sec * 1e6:9.1f} us   {flops / sec / 1e12:6.1f} TF/s  mfu {flops / sec / PEAK:.3f}", flush=True)


def bench_dense_chain(N: int, C: int, variant: str = "base") -> None:
    """One Transformer2D basic block with attention math replaced by identity.

    ``variant`` isolates the elementwise interludes (the --chain-ablation
    mode): "noln" removes every LayerNorm, "pallas_ln" routes LN through
    the fused adaLN kernel, "f32gelu" applies the GEGLU in the matmul's
    f32 accumulator before the cast.  Measured (v5e, 2026-08-20):

        N=4096 C=640   base 0.654   pallas_ln 0.623  noln 0.620  f32gelu 0.680
        N=1024 C=1280  base 0.755   pallas_ln 0.762  noln 0.790  f32gelu 0.760

    Removing ALL norms recovers at most ~3 MFU points (and is NEGATIVE at
    C=640), so the ~20-25%% gap to the bare-matmul ceiling is NOT fusable
    elementwise work — it is matmul-boundary structure (pipeline drains +
    casts + residual adds between six dependent kernels at modest shapes).
    Recorded in BASELINE.md as the structural attribution for the SDXL
    dense/LN residue."""
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    dt = jnp.bfloat16
    p = {
        "qkv": jax.random.normal(ks[0], (C, 3 * C), dt) * 0.02,
        "out1": jax.random.normal(ks[1], (C, C), dt) * 0.02,
        "q2": jax.random.normal(ks[2], (C, C), dt) * 0.02,
        "kv2": jax.random.normal(ks[3], (CTX_D, 2 * C), dt) * 0.02,
        "out2": jax.random.normal(ks[4], (C, C), dt) * 0.02,
        "ffi": jax.random.normal(ks[5], (C, 8 * C), dt) * 0.02,
        "ffo": jax.random.normal(ks[6], (4 * C, C), dt) * 0.02,
        "g": jnp.ones((C,), jnp.float32),
        "b": jnp.zeros((C,), jnp.float32),
    }
    ctx = jax.random.normal(ks[7], (1, CTX_N, CTX_D), dt)

    def ln_f32(x):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]).astype(x.dtype)

    def ln_pallas(x):
        from skrample_tpu.ops.adaln import adaln_modulate

        scale = jnp.broadcast_to(p["g"][None] - 1.0, (x.shape[0], C))
        shift = jnp.broadcast_to(p["b"][None], (x.shape[0], C))
        return adaln_modulate(x, shift, scale)

    ln = {"base": ln_f32, "pallas_ln": ln_pallas, "noln": lambda x: x, "f32gelu": ln_f32}[variant]

    def mm(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)

    def step(h, t):
        qkv = mm(ln(h), p["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        h = h + mm(q, p["out1"])
        q = mm(ln(h), p["q2"])
        kv = mm(ctx, p["kv2"])
        h = h + mm(q, p["out2"]) + kv.sum(1).mean() * 0
        if variant == "f32gelu":
            ff32 = jnp.dot(ln(h), p["ffi"], preferred_element_type=jnp.float32)
            gate, act = jnp.split(ff32, 2, axis=-1)
            h = h + mm((gate * jax.nn.gelu(act, approximate=False)).astype(h.dtype), p["ffo"])
        else:
            ff = mm(ln(h), p["ffi"])
            gate, act = jnp.split(ff, 2, axis=-1)
            h = h + mm(gate * jax.nn.gelu(act, approximate=False), p["ffo"])
        return tick(h, t)

    x = jax.random.normal(key, (1, N, C), dt)
    sec = slope_time(step, x, lengths=LENGTHS)
    flops = 2 * N * C * C * 18 + 2 * CTX_N * CTX_D * 2 * C
    report(f"dense chain N={N} C={C} [{variant}]", sec, flops)


def bench_flash(N: int, heads: int, d: int = 64) -> None:
    from skrample_tpu.ops.flash_attention import flash_attention_packed

    key = jax.random.PRNGKey(1)
    dt = jnp.bfloat16
    D = heads * 128
    qkv = [jax.random.normal(k, (1, N, D), dt) for k in jax.random.split(key, 3)]

    def step(q, t):
        return flash_attention_packed(tick(q, t), qkv[1], qkv[2], heads)

    sec = slope_time(step, qkv[0], lengths=LENGTHS)
    useful = 2 * 2 * N * N * heads * d  # unpadded
    padded = 2 * 2 * N * N * heads * 128
    print(
        f"{'flash packed N=%d h=%d dpad=128' % (N, heads):58s} {sec * 1e6:9.1f} us   "
        f"useful {useful / sec / 1e12:6.1f} TF/s  padded-cycles {padded / sec / 1e12:6.1f} TF/s "
        f"(mfu_pad {padded / sec / PEAK:.3f})",
        flush=True,
    )


def bench_einsum_attn(N: int, heads: int, d: int = 64) -> None:
    """The pre-flash einsum path at the same shape (scores land in HBM)."""
    key = jax.random.PRNGKey(2)
    dt = jnp.bfloat16
    qkv = [jax.random.normal(k, (1, heads, N, d), dt) for k in jax.random.split(key, 3)]

    def step(q, t):
        a = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", tick(q, t), qkv[1], preferred_element_type=jnp.float32)
            / math.sqrt(d),
            axis=-1,
        ).astype(dt)
        return jnp.einsum("bhqk,bhkd->bhqd", a, qkv[2], preferred_element_type=jnp.float32).astype(dt)

    sec = slope_time(step, qkv[0], lengths=LENGTHS)
    useful = 2 * 2 * N * N * heads * d
    report(f"einsum attn N={N} h={heads} d={d}", sec, useful)


def bench_matmul(M: int, K: int, N: int) -> None:
    key = jax.random.PRNGKey(3)
    dt = jnp.bfloat16
    w = jax.random.normal(key, (K, N), dt)
    x = jax.random.normal(key, (M, K), dt)

    def step(h, t):
        y = jnp.dot(tick(h, t), w, preferred_element_type=jnp.float32).astype(dt)
        return y[:, :K] if N >= K else jnp.pad(y, ((0, 0), (0, K - N)))

    sec = slope_time(step, x, lengths=LENGTHS)
    report(f"bare matmul {M}x{K}x{N}", sec, 2 * M * K * N)


def bench_int8_matmul(M: int, K: int, N: int) -> None:
    """dense_int8 (incl. its dynamic-quant epilogue) vs the bf16 dense at a
    stage shape.  In isolation int8 wins most SDXL shapes 1.2-1.8x; in model
    context it LOSES (78.2 vs 60.3 ms/fwd) — the epilogue runs ~450 times
    per forward (~7 ms, see bench_quantizer) and the conv-interleaved NHWC
    graph loses fusion around every quantize boundary.  The negative result
    is recorded in BASELINE.md; SDXL serving default stays bf16."""
    from skrample_tpu.ops.quant import quantize_weight, dense_int8

    key = jax.random.PRNGKey(3)
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
    b = jnp.zeros((N,), jnp.float32)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    wq = {"w_q": quantize_weight(w), "b": b}
    wb = {"w": w.astype(jnp.bfloat16), "b": b}
    fl = 2.0 * M * K * N

    def crop(y):
        return y[:, :K] if N >= K else jnp.pad(y, ((0, 0), (0, K - N)))

    def bf16_step(h, t):
        return crop((jnp.dot(tick(h, t), wb["w"], preferred_element_type=jnp.float32) + wb["b"]).astype(jnp.bfloat16))

    def int8_step(h, t):
        return crop(dense_int8(wq, tick(h, t), jnp.bfloat16))

    s_bf = slope_time(bf16_step, x, lengths=LENGTHS)
    s_i8 = slope_time(int8_step, x, lengths=LENGTHS)
    print(
        f"{'%dx%dx%d' % (M, K, N):58s} bf16 {s_bf * 1e6:7.1f}us ({fl / s_bf / PEAK:.2f} mfu) | "
        f"int8 {s_i8 * 1e6:7.1f}us ({fl / s_i8 / (2 * PEAK):.2f} of int8 peak) | ratio {s_bf / s_i8:.2f}x",
        flush=True,
    )


def bench_quantizer(R: int, D: int) -> None:
    "The per-matmul dynamic-quant epilogue cost, both paths."
    from skrample_tpu.ops.quant import quantize_activation, quantize_rows

    x = jax.random.normal(jax.random.PRNGKey(4), (R, D), jnp.bfloat16)

    def consume(h, q, s):
        return h + q.astype(jnp.bfloat16) * 1e-6 + s.astype(jnp.bfloat16) * 1e-6

    def pallas_step(h, t):
        return consume(h, *quantize_rows(tick(h, t)))

    def eager_step(h, t):
        return consume(h, *quantize_activation(tick(h, t)))

    # 10-20us kernels need much longer scans than the matmuls before the
    # slope rises above tunnel jitter (short scans read negative)
    lengths = (64, 1024)
    sp = slope_time(pallas_step, x, lengths=lengths) if R % 8 == 0 else float("nan")
    se = slope_time(eager_step, x, lengths=lengths)
    print(f"{'quantize (%d, %d)' % (R, D):58s} pallas {sp * 1e6:7.2f}us  eager {se * 1e6:7.2f}us", flush=True)


def main_int8() -> None:
    print("=== int8 vs bf16 dense at the stage shapes (epilogue included) ===", flush=True)
    bench_int8_matmul(4096, 640, 1920)
    bench_int8_matmul(4096, 640, 5120)
    bench_int8_matmul(4096, 2560, 640)
    bench_int8_matmul(1024, 1280, 3840)
    bench_int8_matmul(1024, 1280, 10240)
    bench_int8_matmul(1024, 5120, 1280)
    print("=== dynamic-quant epilogue cost at the activation shapes ===", flush=True)
    bench_quantizer(77, 2048)
    bench_quantizer(1024, 1280)
    bench_quantizer(4096, 640)


def main() -> None:
    print("=== bare matmul ceilings ===", flush=True)
    bench_matmul(4096, 640, 1920)
    bench_matmul(1024, 1280, 3840)
    bench_matmul(4096, 640, 5120)
    bench_matmul(1024, 1280, 10240)
    print("=== dense chains (attention -> identity) ===", flush=True)
    bench_dense_chain(4096, 640)
    bench_dense_chain(1024, 1280)
    print("=== attention at SDXL shapes ===", flush=True)
    bench_flash(4096, 10)
    bench_flash(1024, 20)
    bench_einsum_attn(4096, 10)
    bench_einsum_attn(1024, 20)


def main_chain_ablation() -> None:
    print("=== dense-chain elementwise-interlude ablation (see bench_dense_chain doc) ===", flush=True)
    for N, C in ((4096, 640), (1024, 1280)):
        for variant in ("base", "pallas_ln", "noln", "f32gelu"):
            bench_dense_chain(N, C, variant)


if __name__ == "__main__":
    if "--int8" in sys.argv:
        main_int8()
    elif "--chain-ablation" in sys.argv:
        main_chain_ablation()
    else:
        main()
