#!/usr/bin/env python
"""Flux-scale single-chip fine-tune step: bf16 params + stochastic rounding
+ int8 Adam moments (`skrample_tpu.optim`).

The memory story this demonstrates (1.31B-param tree: full Flux width,
2 double + 4 single blocks — per-block cost transfers to depth):

    f32 params + f32 Adam        5.25 + 5.25 (grads) + 10.5 = 21.0 GB  OOM on 16 GB
    bf16 params + SR + adamw8bit 2.62 + 2.62 (grads) +  2.7 =  7.9 GB  fits

so the quantized-state path is not a speed trade, it is the difference
between the fine-tune running on one v5e at all or not.  The update is
`adamw8bit(cast_updates=False)` feeding `apply_updates_sr` so sub-ULP
late-training updates still integrate (tests/test_optim8.py pins the
numerics).

Measured (v5e, 2026-08, identical last-loss 2.0197 across all three):

    remat=False   277.1 ms/step   84.9 TF/s   43.1% MFU
    remat='dots'  295.6 ms/step   79.6 TF/s   40.4% MFU
    remat=True    326.2 ms/step   72.1 TF/s   36.6% MFU

`--lora N` runs the rank-N adapter fine-tune instead (models.lora): only
9.1M of the 1.31B params train at rank 16, so f32 Adam costs 69 MiB and
the whole optimizer pass over the base tree disappears.  Measured:

    --lora 16     182.4 ms/step  129.0 TF/s   65.5% MFU   (1.52x the full
                  fine-tune per step; the per-step lora_merge — one full
                  bf16 tree materialization — is cheaper than the full
                  fine-tune's grad-tree + 8-bit moment sweep it replaces)

The freed HBM means remat isn't even needed at this depth — ~2 GiB of
activations fit alongside the 7.4 GiB of state.  Full-depth FLUX.1 (12B)
needs remat + model parallelism regardless; the ladder above is the
single-chip trade.

Flow-matching objective at the real serving shape: 4096 image + 512 text
joint tokens, velocity target.  Slope-timed over two scan lengths per the
timing discipline in docs/ROUND3.md (dispatch constants cancel, np.asarray
forces the wait).  Train MFU uses the standard fwd+bwd ~= 3x fwd FLOPs.

Usage: python scripts/bench_flux_train.py
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

from _bench_common import cast_bf16  # noqa: E402

from skrample_tpu import optim  # noqa: E402
from skrample_tpu.models import Flux, FluxConfig  # noqa: E402
from skrample_tpu.models.flux import flux_forward_flops  # noqa: E402

BATCH, HW, TXT = 1, 128, 512
PEAK_BF16 = 197e12


def run(remat: bool | str) -> None:
    config = FluxConfig(
        dim=3072,
        depth=2,
        single_depth=4,
        heads=24,
        context_dim=4096,
        pooled_dim=768,
        compute_dtype=jnp.bfloat16,
        remat=remat,
    )
    model = Flux(config)
    params = cast_bf16(model.init(jax.random.PRNGKey(0)))
    n_params = sum(leaf.size for leaf in jax.tree.leaves(params))

    tx = optim.adamw8bit(1e-5, cast_updates=False)
    opt_state = jax.jit(tx.init)(params)

    param_b = optim.optimizer_state_bytes(params)
    opt_b = optim.optimizer_state_bytes(opt_state)
    fwd = flux_forward_flops(config, BATCH, HW, HW, TXT)
    train_flops = 3 * fwd
    print(
        f"Flux-scale fine-tune: {n_params / 1e9:.2f}B params bf16 ({param_b / 2**30:.2f} GiB) "
        f"+ int8 moments ({opt_b / 2**30:.2f} GiB = {opt_b / n_params:.2f} B/param); "
        f"f32 Adam state alone would be {12 * n_params / 2**30:.1f} GiB (params+grads+moments). "
        f"Analytic {train_flops / 1e9:.0f} GFLOP/train step (3x fwd).  remat={remat!r}",
        flush=True,
    )

    ctx = jax.random.normal(jax.random.PRNGKey(2), (BATCH, TXT, config.context_dim), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (BATCH, config.pooled_dim), jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 16, HW, HW), jnp.float32)

    def loss_fn(p, x0, noise, sigma):
        s = sigma[:, None, None, None]
        xt = ((1.0 - s) * x0 + s * noise).astype(jnp.bfloat16)
        pred = model.apply(p, xt, sigma * 1000.0, ctx, pooled, guidance=1.0)
        return jnp.mean((pred.astype(jnp.float32) - (noise - x0)) ** 2)

    def one_step(carry, i, x0):
        p, s = carry
        key = jax.random.fold_in(jax.random.PRNGKey(42), i.astype(jnp.int32))
        kn, kt, kr = jax.random.split(key, 3)
        noise = jax.random.normal(kn, x0.shape, jnp.float32)
        sigma = jax.random.uniform(kt, (BATCH,), minval=1e-3, maxval=1.0)
        loss, grads = jax.value_and_grad(loss_fn)(p, x0, noise, sigma)
        updates, s = tx.update(grads, s, p)
        return (optim.apply_updates_sr(p, updates, kr), s), loss

    def loop(p, s, x0, n):
        (p, s), losses = jax.lax.scan(lambda c, i: one_step(c, i, x0), (p, s), jnp.arange(n))
        return p, s, losses

    lengths = (2, 6)
    jl = {
        n: jax.jit(lambda p, s, x0, n=n: loop(p, s, x0, n), donate_argnums=(0, 1)) for n in lengths
    }

    best = {n: float("inf") for n in lengths}
    losses = None
    for rep in range(4):  # rep 0 is the compile+warm-up pass
        for n in lengths:
            t0 = time.perf_counter()
            params, opt_state, losses = jl[n](params, opt_state, x0)
            first = float(np.asarray(losses[0]))  # forced transfer = real wait
            dt = time.perf_counter() - t0
            if rep:
                best[n] = min(best[n], dt)
            assert np.isfinite(first), "loss diverged"
    lo, hi = lengths
    sec = (best[hi] - best[lo]) / (hi - lo)
    print(
        f"{f'train step (8-bit + SR, remat={remat!r})':44s} {sec * 1e3:9.2f} ms/step   "
        f"eff {train_flops / sec / 1e12:6.1f} TF/s   mfu {train_flops / sec / PEAK_BF16:.3f}   "
        f"last-loss {float(np.asarray(losses)[-1]):.4f}",
        flush=True,
    )


def run_lora(rank: int) -> None:
    """Rank-r LoRA fine-tune at the same Flux shape: only the adapter tree
    trains (f32 Adam is affordable again), the bf16 base is frozen and rides
    through jit as an argument.  The per-step cost of the merge-based design
    is one full-tree materialization (W + (s/r)A@B): ~2.6 GB of extra HBM
    traffic — measured here against the full fine-tune's step time."""
    import optax

    from skrample_tpu.models import lora_init, lora_merge

    config = FluxConfig(
        dim=3072, depth=2, single_depth=4, heads=24,
        context_dim=4096, pooled_dim=768, compute_dtype=jnp.bfloat16,
    )
    model = Flux(config)
    base = cast_bf16(model.init(jax.random.PRNGKey(0)))
    adapters = lora_init(jax.random.PRNGKey(7), base, rank=rank)
    n_base = sum(leaf.size for leaf in jax.tree.leaves(base))
    n_ad = sum(leaf.size for leaf in jax.tree.leaves(adapters))

    tx = optax.adamw(1e-4)
    opt_state = jax.jit(tx.init)(adapters)
    opt_b = optim.optimizer_state_bytes(opt_state)
    ad_b = optim.optimizer_state_bytes(adapters)
    fwd = flux_forward_flops(config, BATCH, HW, HW, TXT)
    train_flops = 3 * fwd
    print(
        f"Flux-scale LoRA rank {rank}: {n_ad / 1e6:.1f}M of {n_base / 1e9:.2f}B params train "
        f"({n_ad / n_base:.3%}); adapters {ad_b / 2**20:.0f} MiB + f32 Adam {opt_b / 2**20:.0f} MiB "
        f"(full fine-tune: 5.3 GiB of 8-bit state)",
        flush=True,
    )

    ctx = jax.random.normal(jax.random.PRNGKey(2), (BATCH, TXT, config.context_dim), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (BATCH, config.pooled_dim), jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 16, HW, HW), jnp.float32)

    def loss_fn(ad, frozen, x0, noise, sigma):
        merged = lora_merge(frozen, ad)
        s = sigma[:, None, None, None]
        xt = ((1.0 - s) * x0 + s * noise).astype(jnp.bfloat16)
        pred = model.apply(merged, xt, sigma * 1000.0, ctx, pooled, guidance=1.0)
        return jnp.mean((pred.astype(jnp.float32) - (noise - x0)) ** 2)

    def one_step(carry, i, frozen, x0):
        ad, s = carry
        key = jax.random.fold_in(jax.random.PRNGKey(42), i.astype(jnp.int32))
        kn, kt = jax.random.split(key)
        noise = jax.random.normal(kn, x0.shape, jnp.float32)
        sigma = jax.random.uniform(kt, (BATCH,), minval=1e-3, maxval=1.0)
        loss, grads = jax.value_and_grad(loss_fn)(ad, frozen, x0, noise, sigma)
        updates, s = tx.update(grads, s, ad)
        return (optax.apply_updates(ad, updates), s), loss

    def loop(frozen, ad, s, x0, n):
        (ad, s), losses = jax.lax.scan(lambda c, i: one_step(c, i, frozen, x0), (ad, s), jnp.arange(n))
        return ad, s, losses

    lengths = (2, 6)
    jl = {n: jax.jit(lambda f, a, s, x0, n=n: loop(f, a, s, x0, n), donate_argnums=(1, 2)) for n in lengths}

    best = {n: float("inf") for n in lengths}
    losses = None
    for rep in range(4):
        for n in lengths:
            t0 = time.perf_counter()
            adapters, opt_state, losses = jl[n](base, adapters, opt_state, x0)
            first = float(np.asarray(losses[0]))
            dt = time.perf_counter() - t0
            if rep:
                best[n] = min(best[n], dt)
            assert np.isfinite(first), "loss diverged"
    lo, hi = lengths
    sec = (best[hi] - best[lo]) / (hi - lo)
    print(
        f"{f'LoRA train step (rank {rank}, frozen bf16 base)':44s} {sec * 1e3:9.2f} ms/step   "
        f"eff {train_flops / sec / 1e12:6.1f} TF/s   mfu {train_flops / sec / PEAK_BF16:.3f}   "
        f"last-loss {float(np.asarray(losses)[-1]):.4f}",
        flush=True,
    )


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--lora":
        run_lora(int(sys.argv[2]))
    elif len(sys.argv) < 2:
        for mode in (False, "dots", True):
            run(mode)
    else:
        run({"True": True, "False": False}.get(sys.argv[1], sys.argv[1]))
