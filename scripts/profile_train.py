#!/usr/bin/env python
"""Attribute the DiT train-step time on the chip by ablation.

bench.py's training_section reports ~8 ms / 52% MFU for the flow-matching
train step (DiT-512/8 h4 bf16, batch 4).  This script slope-times the step
with pieces knocked out — optimizer update skipped, attention replaced by
identity, fused adaLN replaced by identity — so the next optimization goes
where the milliseconds are.

All waits are forced host transfers (np.asarray), never block_until_ready:
see bench.py's timing-discipline note (the tunnel can report ready while
scanned work is in flight).
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

import optax

from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.models import dit as dit_mod

BATCH, HW, DIM, DEPTH, HEADS = 4, 64, 512, 8, 4
LENGTHS = (2, 12)


def slope_train(model, params, with_opt=True) -> float:
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    def loss_fn(p, x0, noise, sigma):
        s = sigma[:, None, None, None]
        xt = (1 - s) * x0 + s * noise
        pred = model.apply(p, xt, sigma * 1000.0)
        return jnp.mean((pred - (noise - x0)) ** 2)

    def train_step(carry, key):
        p, o = carry
        kd, kn, kt = jax.random.split(key, 3)
        x0 = jax.random.normal(kd, (BATCH, 4, HW, HW), jnp.float32)
        noise = jax.random.normal(kn, (BATCH, 4, HW, HW), jnp.float32)
        sigma = jax.random.uniform(kt, (BATCH,), minval=1e-3, maxval=1.0)
        loss, grads = jax.value_and_grad(loss_fn)(p, x0, noise, sigma)
        if with_opt:
            updates, o = opt.update(grads, o, p)
            p = optax.apply_updates(p, updates)
        else:
            # keep grads live without the optimizer's memory traffic
            loss = loss + sum(jnp.sum(gl) * 0.0 for gl in jax.tree.leaves(grads))
        return (p, o), loss

    runners = {}
    for n in LENGTHS:
        runners[n] = jax.jit(
            lambda p, o, n=n: jax.lax.scan(train_step, (p, o), jax.random.split(jax.random.PRNGKey(1), n))
        )
        np.asarray(runners[n](params, opt_state)[1])

    best = {n: float("inf") for n in LENGTHS}
    for _ in range(4):
        for n in LENGTHS:
            t0 = time.perf_counter()
            np.asarray(runners[n](params, opt_state)[1])
            best[n] = min(best[n], time.perf_counter() - t0)
    lo, hi = LENGTHS
    return (best[hi] - best[lo]) / (hi - lo)


def main() -> None:
    import importlib

    from bench import dit_forward_flops

    fa_mod = importlib.import_module("skrample_tpu.ops.flash_attention")
    real_qkv = fa_mod.flash_attention_qkv
    real_adaln = dit_mod._adaln

    config = DiTConfig(dim=DIM, depth=DEPTH, heads=HEADS, compute_dtype=jnp.bfloat16, attention="flash")
    model = DiT(config)
    params = model.init(jax.random.PRNGKey(0))
    flops = 3.0 * dit_forward_flops(config, BATCH, HW, HW)

    def run(label, *, attention_identity=False, adaln_identity=False, with_opt=True):
        fa_mod.flash_attention_qkv = (
            (lambda qkv, heads: qkv[..., : qkv.shape[-1] // 3]) if attention_identity else real_qkv
        )
        dit_mod._adaln = (lambda z, sh, sc: z) if adaln_identity else real_adaln
        try:
            sec = slope_train(model, params, with_opt=with_opt)
        finally:
            fa_mod.flash_attention_qkv = real_qkv
            dit_mod._adaln = real_adaln
        print(f"{label:40s} {sec * 1e3:7.2f} ms/step   mfu {flops / sec / 197e12:.3f}", flush=True)
        return sec

    print(f"train-step ablation: DiT-{DIM}/{DEPTH} h{HEADS} bf16, batch {BATCH}, {HW}x{HW} latents", flush=True)
    base = run("full train step")
    no_opt = run("grads only (no adamw update)", with_opt=False)
    no_attn = run("attention -> identity", attention_identity=True)
    no_ada = run("adaln -> identity", adaln_identity=True)

    print(flush=True)
    print(f"optimizer update:        {(base - no_opt) * 1e3:7.2f} ms/step", flush=True)
    print(f"attention fwd+bwd total: {(base - no_attn) * 1e3:7.2f} ms/step", flush=True)
    print(f"adaln fwd+bwd total:     {(base - no_ada) * 1e3:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
