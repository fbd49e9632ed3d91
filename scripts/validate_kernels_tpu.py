#!/usr/bin/env python
"""On-chip validation + honest timing of the model-path Pallas kernels.

CPU tests exercise the kernels in interpret mode; this script re-checks
numerics on the real TPU (Mosaic lowering can differ from interpret) and
slope-times each op with the discipline that survived this environment:

* scan two lengths, subtract — dispatch and transfer constants cancel;
* reduce the scanned carry to a SCALAR before fetching — a 12 MB result
  transfer through the dev tunnel costs ~350 ms with ~±15 ms jitter, which
  swamps any slope; a scalar's transfer is noise-free;
* every wait is a host transfer (np.asarray), never block_until_ready —
  see bench.py's timing-discipline note.

Run: python scripts/validate_kernels_tpu.py   (takes ~10-15 min cold)
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

from skrample_tpu.ops.adaln import adaln_backward, adaln_forward, adaln_reference
from skrample_tpu.ops.flash_attention import (
    _qkv_reference,
    flash_attention_qkv_backward,
    flash_attention_qkv_forward,
    flash_attention_qkv_forward_lse,
)

B, N, H, d = 4, 1024, 4, 128
D = H * d


def slope(label: str, body, init, lengths=(20, 120)) -> float:
    def loop(a, n):
        r, _ = jax.lax.scan(lambda c, _: (body(c), None), a, None, length=n)
        return jnp.sum(jax.tree.reduce(lambda s, leaf: s + jnp.sum(leaf.astype(jnp.float32)), r, jnp.float32(0)))

    jl = {n: jax.jit(lambda a, n=n: loop(a, n)) for n in lengths}
    for n in lengths:
        np.asarray(jl[n](init))
    best = {n: float("inf") for n in lengths}
    for _ in range(4):
        for n in lengths:
            t0 = time.perf_counter()
            np.asarray(jl[n](init))
            best[n] = min(best[n], time.perf_counter() - t0)
    lo, hi = lengths
    us = (best[hi] - best[lo]) / (hi - lo) * 1e6
    print(f"{label:44s} {us:8.1f} us/iter", flush=True)
    return us


def main() -> None:
    assert jax.default_backend() == "tpu", "this script validates the real-TPU lowering"
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    qkv = jax.random.normal(keys[0], (B, N, 3 * D), jnp.bfloat16)
    g = jax.random.normal(keys[1], (B, N, D), jnp.bfloat16)

    # --- numerics on chip ---
    o, lse = flash_attention_qkv_forward_lse(qkv, H)
    ref_o, vjp = jax.vjp(lambda a: _qkv_reference(a, H), qkv)
    dq = flash_attention_qkv_backward(qkv, o, lse, g, H)
    fwd_err = float(jnp.abs(o.astype(jnp.float32) - ref_o.astype(jnp.float32)).max())
    bwd_err = float(jnp.abs(dq.astype(jnp.float32) - vjp(g)[0].astype(jnp.float32)).max())
    print(f"flash qkv fwd max|diff| vs einsum: {fwd_err:.2e}  (bf16 budget ~1e-2)", flush=True)
    print(f"flash qkv bwd max|diff| vs vjp:    {bwd_err:.2e}  (bf16 budget ~5e-2)", flush=True)
    assert fwd_err < 3e-2 and bwd_err < 1e-1

    x = (jax.random.normal(keys[2], (B, N, 2 * D)) * 2).astype(jnp.bfloat16)
    sh = jax.random.normal(keys[3], (B, 2 * D)).astype(jnp.bfloat16)
    sc = sh * jnp.bfloat16(0.5)
    fused = adaln_forward(x, sh, sc)
    ada_err = float(jnp.abs(fused.astype(jnp.float32) - adaln_reference(x, sh, sc).astype(jnp.float32)).max())
    _, avjp = jax.vjp(adaln_reference, x, sh, sc)
    rdx, rdsh, rdsc = avjp(x)
    dx, dsh, dsc = adaln_backward(x, x, sc)
    ada_bwd_err = float(jnp.abs(dx.astype(jnp.float32) - rdx.astype(jnp.float32)).max())
    print(f"adaln fwd max|diff|: {ada_err:.2e}   bwd dx max|diff|: {ada_bwd_err:.2e}", flush=True)
    assert ada_err < 1e-1 and ada_bwd_err < 1e-1

    # int8 one-pass quantizer vs the XLA two-pass formula, on real Mosaic
    from skrample_tpu.ops.quant import quantize_activation, quantize_rows

    x2 = (jax.random.normal(jax.random.fold_in(keys[2], 1), (1024, 512)) * 3).astype(jnp.float32)
    q, s = quantize_rows(x2)
    qe, se = quantize_activation(x2)
    q_err = int(jnp.abs(q.astype(jnp.int32) - qe.astype(jnp.int32)).max())
    s_err = float(jnp.abs(s.ravel() / se.ravel() - 1.0).max())
    print(f"quantize_rows max|dq|: {q_err} lsb   max scale rel dev: {s_err:.2e}", flush=True)
    assert q_err <= 1 and s_err < 1e-6  # divide may lower as reciprocal-multiply

    # grouped norm (+SiLU) whole-slice kernel vs eager, on real Mosaic
    from skrample_tpu.ops.groupnorm import groupnorm_forward, groupnorm_reference

    xg = (jax.random.normal(jax.random.fold_in(keys[3], 2), (B, 4096, 128)) * 2).astype(jnp.bfloat16)
    gn_err = float(
        jnp.abs(
            groupnorm_forward(xg, 16, True).astype(jnp.float32)
            - groupnorm_reference(xg, 16, True).astype(jnp.float32)
        ).max()
    )
    print(f"groupnorm(+silu) fwd max|diff|: {gn_err:.2e}", flush=True)
    assert gn_err < 1e-1

    # --- timings ---
    eps = jnp.asarray(1e-3, jnp.bfloat16)
    slope("attention fwd kernel", lambda c: jnp.concatenate([flash_attention_qkv_forward(c, H)] * 3, -1) * eps + c, qkv)
    slope("attention fwd einsum", lambda c: jnp.concatenate([_qkv_reference(c, H)] * 3, -1) * eps + c, qkv)
    slope("attention bwd kernel", lambda c: flash_attention_qkv_backward(c, o, lse, g, H) * eps + c, qkv)

    def einsum_vjp(c):
        out, vv = jax.vjp(lambda a: _qkv_reference(a, H), c)
        return vv(out * eps)[0] * eps + c

    slope("attention fwd+bwd einsum vjp", einsum_vjp, qkv)
    slope("adaln fwd kernel", lambda c: adaln_forward(c, sh, sc) * eps + c, x)
    # ~2.5 us/iter ops: need a much wider length spread than the attention
    # rows to put signal over the tunnel jitter
    slope(
        "quantize_rows kernel (1024x512)",
        lambda c: quantize_rows(c)[0].astype(jnp.float32) * jnp.float32(1e-3) + c,
        x2,
        lengths=(100, 4000),
    )
    slope(
        "quantize two-pass XLA (1024x512)",
        lambda c: quantize_activation(c)[0].astype(jnp.float32) * jnp.float32(1e-3) + c,
        x2,
        lengths=(100, 4000),
    )
    slope(
        "adaln bwd kernel",
        lambda c: adaln_backward(c, c, sc)[0] * eps + c,
        x,
    )
    slope("groupnorm+silu kernel (4x4096x128 g16)", lambda c: groupnorm_forward(c, 16, True) * eps + c, xg)
    slope("groupnorm+silu eager  (4x4096x128 g16)", lambda c: groupnorm_reference(c, 16, True) * eps + c, xg)
    print("kernel validation OK", flush=True)


if __name__ == "__main__":
    main()
