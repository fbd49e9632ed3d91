#!/usr/bin/env python
"""Dense vs capacity MoE dispatch: wall-time crossover on the virtual mesh.

Dense top-1 dispatch computes every expert on every token (E x FFN FLOPs,
zero dispatch machinery); Switch-style capacity dispatch computes only
``capacity ~ 1.25*T/E`` slots per expert but pays two (T,E,C,D) einsums for
dispatch/combine.  This script times both, jitted over an 8-virtual-device
``ep`` mesh, across token counts and expert counts, and prints the analytic
FLOPs beside the measured times — the table in docs/SCALING.md comes from
this.

Run hermetically on the host: python scripts/bench_moe.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding

from skrample_tpu.parallel import expert_capacity, init_moe_ffn, moe_ffn, moe_ffn_capacity, moe_ffn_spec


def flops_dense(T: int, E: int, D: int, H: int) -> float:
    return T * E * 4 * D * H  # every expert, in+out matmuls


def flops_onehot(T: int, E: int, D: int, H: int, C: int) -> float:
    return E * C * 4 * D * H + 2 * (2 * T * E * C * D)  # expert matmuls + dispatch/combine einsums


def flops_gather(T: int, E: int, D: int, H: int, C: int) -> float:
    return E * C * 4 * D * H  # expert matmuls; scatter/gather moves O(T*D) bytes, ~0 FLOPs


def timed(fn, *args, reps: int = 5) -> float:
    fn(*args).block_until_ready()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ep = min(8, len(jax.devices()))
    mesh = Mesh(np.asarray(jax.devices()[:ep]), ("ep",))
    D, H = 256, 1024
    print(f"ep={ep} virtual devices, dim={D}, hidden={H}, capacity_factor=1.25")
    header = (
        f"{'tokens':>7} {'experts':>7} {'cap':>5} | {'dense ms':>9} {'onehot ms':>10} {'gather ms':>10} |"
        f" {'dense GF':>9} {'onehot GF':>10} {'gather GF':>10}"
    )
    print(header)

    for E in (8, 16, 32):
        params = init_moe_ffn(jax.random.PRNGKey(0), dim=D, hidden=H, experts=E)
        sharded = jax.tree.map(
            lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)), params, moe_ffn_spec()
        )
        for T in (512, 2048, 8192):
            toks = jax.random.normal(jax.random.PRNGKey(1), (1, T, D), jnp.float32)
            C = expert_capacity(T, E)
            with mesh:
                t_dense = timed(jax.jit(moe_ffn), sharded, toks)
                t_onehot = (
                    timed(jax.jit(lambda p, t: moe_ffn_capacity(p, t, capacity=C, method="onehot")), sharded, toks)
                    if T <= 2048  # the (T,E,C) einsum is quadratic in T; skip where it's hopeless
                    else float("nan")
                )
                t_gather = timed(jax.jit(lambda p, t: moe_ffn_capacity(p, t, capacity=C, method="gather")), sharded, toks)
            print(
                f"{T:>7} {E:>7} {C:>5} | {t_dense * 1e3:>9.2f} {t_onehot * 1e3:>10.2f} {t_gather * 1e3:>10.2f} |"
                f" {flops_dense(T, E, D, H) / 1e9:>9.2f} {flops_onehot(T, E, D, H, C) / 1e9:>10.2f}"
                f" {flops_gather(T, E, D, H, C) / 1e9:>10.2f}"
            )


if __name__ == "__main__":
    main()
