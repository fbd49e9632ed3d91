"""Shared slope-timing helper for the bench/profile scripts.

The repo's tunnel timing discipline in one place: jit one scan per length,
warm BOTH with a forced host transfer (block_until_ready alone can return
while scanned work is still in flight through the dev tunnel — see
docs/ROUND3.md), take best-of-3 per length, and report the marginal
seconds/step as the slope between the two lengths so dispatch and transfer
constants cancel.

New scripts should import from here; the older scripts carry historical
inline copies of the same function (kept verbatim so their committed
numbers stay reproducible)."""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def cast_bf16(params):
    """Cast a params pytree to bf16 leaf-by-leaf, deleting each f32 buffer as
    its bf16 copy lands.

    ``jax.tree.map(lambda w: w.astype(bf16), params)`` holds the full f32 tree
    alive until the whole map finishes, so a 2.5B-param model peaks at
    f32 + bf16 = ~15.4 GB and OOMs the 16 GB v5e; incremental deletion keeps
    the peak at f32 + one leaf."""
    leaves, treedef = jax.tree.flatten(params)
    for i, leaf in enumerate(leaves):
        new = leaf.astype(jnp.bfloat16)
        new.block_until_ready()
        leaf.delete()
        leaves[i] = new
    return jax.tree.unflatten(treedef, leaves)


def slope_time(fn: Callable, x, lengths: tuple[int, int] = (2, 6), repeats: int = 3, args: tuple = ()) -> float:
    """Marginal seconds per ``fn(carry, t, *args)`` step, slope-timed over two
    scan lengths.

    ``args`` (e.g. a multi-GB params pytree) are threaded through ``jax.jit``
    as ARGUMENTS so they stay device buffers — closing over them instead would
    lower them as captured constants, which bloats the executable by the full
    tree size and makes billion-parameter benches uncompilable in practice."""

    def loop_body(y, n, *a):
        def body(carry, i):
            return fn(carry, i.astype(jnp.float32) * 40.0, *a), None

        out, _ = jax.lax.scan(body, y, jnp.arange(n))
        return jnp.float32(out.astype(jnp.float32).sum())

    jl = {n: jax.jit(lambda y, *a, n=n: loop_body(y, n, *a)) for n in lengths}
    args = jax.device_put(args)
    for n in lengths:
        np.asarray(jl[n](x, *args))  # compile + forced-transfer warm-up
    best = {n: float("inf") for n in lengths}
    for _ in range(repeats):
        for n in lengths:
            t0 = time.perf_counter()
            np.asarray(jl[n](x, *args))
            best[n] = min(best[n], time.perf_counter() - t0)
    lo, hi = lengths
    return (best[hi] - best[lo]) / (hi - lo)
