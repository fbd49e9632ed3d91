"""Counter-based virtual Brownian tree.

Replaces torchsde's ``BrownianInterval`` (a stateful C++/Python hybrid) with
a *pure function* of ``(key, time)``: ``W(t)`` is defined by Levy-bridge
bisection over a dyadic grid, with every bridge draw keyed by its tree node
via ``jax.random.fold_in``.  Consequences:

* noise over an interval depends only on the interval — resume and
  step-count changes cannot reorder the stream (the property SDE sampling
  needs for reproducibility across schedules);
* increments are exactly additive: ``W(b)-W(a) == (W(m)-W(a)) + (W(b)-W(m))``;
* no state, no cache tuning, trivially jit/vmap-compatible.

Reference behavior being replaced: Beinsezii/skrample
``skrample/pytorch/noise.py:210-252`` (tol/pool/cache constants become a
single ``depth`` — the dyadic resolution).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp


def _node_key(key: jax.Array, level: int, index: int) -> jax.Array:
    return jax.random.fold_in(jax.random.fold_in(key, level), index)


def _bridge(
    key: jax.Array,
    depth: int,
    lo: int,
    hi: int,
    w_lo: jax.Array,
    w_hi: jax.Array,
    shape: tuple[int, ...],
    dtype: Any,
) -> jax.Array:
    "Levy-bridge midpoint sample of the dyadic interval [lo, hi]."
    span = hi - lo
    level = depth - (span.bit_length() - 1) + 1
    mid = (lo + hi) // 2
    half_width = span / (2 * (1 << depth))
    return (w_lo + w_hi) / 2 + jax.random.normal(_node_key(key, level, mid), shape, dtype) * math.sqrt(
        half_width / 2
    )


def _descend(
    key: jax.Array,
    grid: int,
    depth: int,
    lo: int,
    hi: int,
    w_lo: jax.Array,
    w_hi: jax.Array,
    shape: tuple[int, ...],
    dtype: Any,
) -> jax.Array:
    "W(grid) by bisection inside [lo, hi] with known endpoint values."
    while True:
        if grid == lo:
            return w_lo
        if grid == hi:
            return w_hi
        mid = (lo + hi) // 2
        bridge = _bridge(key, depth, lo, hi, w_lo, w_hi, shape, dtype)
        if grid == mid:
            return bridge
        if grid < mid:
            hi, w_hi = mid, bridge
        else:
            lo, w_lo = mid, bridge


def brownian_at(
    key: jax.Array,
    t: float,
    depth: int,
    shape: tuple[int, ...],
    dtype: Any = jnp.float32,
) -> jax.Array:
    """``W(t)`` for ``t`` on the dyadic grid ``k / 2**depth`` (t is rounded).

    Unrolls up to ``depth`` bridge bisections — each one normal draw —
    walking the tree toward ``t``.  Keys are pure functions of the node."""
    t = min(max(t, 0.0), 1.0)
    grid = round(t * (1 << depth))

    w_zero = jnp.zeros(shape, dtype)
    if grid == 0:
        return w_zero
    w_one = jax.random.normal(_node_key(key, 0, 0), shape, dtype)  # W(1)
    return _descend(key, grid, depth, 0, 1 << depth, w_zero, w_one, shape, dtype)


def brownian_increment(
    key: jax.Array,
    t0: float,
    t1: float,
    depth: int,
    shape: tuple[int, ...],
    dtype: Any = jnp.float32,
) -> jax.Array:
    """Unit-variance increment ``(W(t1) - W(t0)) / sqrt(dt_grid)``.

    Times are snapped to the dyadic grid; intervals narrower than one cell
    are widened to a single cell so generation never degenerates."""
    scale = 1 << depth
    g0 = round(min(max(t0, 0.0), 1.0) * scale)
    g1 = round(min(max(t1, 0.0), 1.0) * scale)
    if g1 <= g0:  # enforce at least one grid cell
        if g1 < scale:
            g1 = g0 + 1
        else:
            g0 = g1 - 1

    # Shared-prefix descent: walk the common-ancestor path once, split into
    # the two endpoint descents only below it (halves the draws of the naive
    # two-descent form while producing bit-identical values).
    lo, hi = 0, scale
    w_lo = jnp.zeros(shape, dtype)
    w_hi = jax.random.normal(_node_key(key, 0, 0), shape, dtype)
    while not (g0 == lo and g1 == hi):
        mid = (lo + hi) // 2
        bridge = _bridge(key, depth, lo, hi, w_lo, w_hi, shape, dtype)
        if g1 <= mid:
            hi, w_hi = mid, bridge
        elif g0 >= mid:
            lo, w_lo = mid, bridge
        else:  # g0 < mid < g1: the paths diverge here
            w0 = _descend(key, g0, depth, lo, mid, w_lo, bridge, shape, dtype)
            w1 = _descend(key, g1, depth, mid, hi, bridge, w_hi, shape, dtype)
            return (w1 - w0) / math.sqrt((g1 - g0) / scale)

    return (w_hi - w_lo) / math.sqrt((g1 - g0) / scale)
