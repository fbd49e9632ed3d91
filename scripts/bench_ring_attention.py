#!/usr/bin/env python
"""Ring vs full attention at long token counts on the virtual sp mesh:
per-chip attention working-set memory (from XLA's own memory analysis) and
wall latency.

Full attention materializes the (B, H, N, N) score tensor per chip and needs
every chip to hold all K/V (GSPMD all-gathers a sharded einsum operand); ring
attention holds 1/S of K/V and only an (B, H, N/S, N/S) score block per hop,
with the hops riding ICI.  The table in docs/SCALING.md comes from this.

Run hermetically on the host: python scripts/bench_ring_attention.py
"""

from __future__ import annotations

import math
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skrample_tpu.parallel import ring_attention


def full_attention(q, k, v):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores / math.sqrt(q.shape[-1]), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v, preferred_element_type=jnp.float32).astype(q.dtype)


def peak_bytes(fn, *args) -> int | None:
    "XLA's estimate of temporary-buffer peak for the compiled executable."
    try:
        analysis = jax.jit(fn).lower(*args).compile().memory_analysis()
        return int(analysis.temp_size_in_bytes)
    except Exception:  # noqa: BLE001 — memory analysis is backend-dependent
        return None


def timed(fn, *args, reps: int = 5) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sp = min(8, len(jax.devices()))
    mesh = Mesh(np.asarray(jax.devices()[:sp]), ("sp",))
    B, H, D = 1, 8, 64
    spec = NamedSharding(mesh, P(None, None, "sp", None))

    print(f"sp={sp} virtual devices, batch={B}, heads={H}, head_dim={D}")
    print(
        f"{'tokens':>8} | {'full ms':>9} {'ring ms':>9} | {'full temp MiB':>14} {'ring temp MiB':>14}"
        f" | {'scores/chip full':>17} {'ring':>9}"
    )

    for N in (2048, 4096, 8192, 16384):
        key = jax.random.PRNGKey(N)
        q = jax.device_put(jax.random.normal(key, (B, H, N, D), jnp.float32), spec)
        k = jax.device_put(jax.random.normal(jax.random.fold_in(key, 1), (B, H, N, D), jnp.float32), spec)
        v = jax.device_put(jax.random.normal(jax.random.fold_in(key, 2), (B, H, N, D), jnp.float32), spec)

        ring_fn = lambda q, k, v: ring_attention(q, k, v, mesh)  # noqa: E731
        with mesh:
            mem_full = peak_bytes(full_attention, q, k, v)
            mem_ring = peak_bytes(ring_fn, q, k, v)
            t_full = timed(jax.jit(full_attention), q, k, v)
            t_ring = timed(jax.jit(ring_fn), q, k, v)
            # sanity: both paths agree
            np.testing.assert_allclose(
                np.asarray(jax.jit(ring_fn)(q, k, v)),
                np.asarray(jax.jit(full_attention)(q, k, v)),
                rtol=3e-5,
                atol=3e-6,
            )

        # analytic per-chip score-block footprint, f32
        full_scores = B * H * (N // sp) * N * 4  # sharded q rows x ALL keys after the gather
        ring_scores = B * H * (N // sp) * (N // sp) * 4
        fmt_mem = lambda b: f"{b / 2**20:>13.1f}" if b is not None else f"{'n/a':>13}"  # noqa: E731
        print(
            f"{N:>8} | {t_full * 1e3:>9.2f} {t_ring * 1e3:>9.2f} | {fmt_mem(mem_full)} {fmt_mem(mem_ring)}"
            f" | {full_scores / 2**20:>15.1f}M {ring_scores / 2**20:>8.1f}M"
        )


if __name__ == "__main__":
    main()
