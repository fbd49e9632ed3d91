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


def brownian_at(
    key: jax.Array,
    t: float,
    depth: int,
    shape: tuple[int, ...],
    dtype: Any = jnp.float32,
) -> jax.Array:
    """``W(t)`` for ``t`` on the dyadic grid ``k / 2**depth`` (t is rounded).

    Unrolls ``depth`` bridge bisections — each one normal draw — walking the
    tree toward ``t``.  All keys are pure functions of the node position."""
    t = min(max(t, 0.0), 1.0)
    grid = round(t * (1 << depth))

    if grid == 0:
        return jnp.zeros(shape, dtype)

    w_left = jnp.zeros(shape, dtype)
    w_right = jax.random.normal(_node_key(key, 0, 0), shape, dtype)  # W(1)
    if grid == 1 << depth:
        return w_right

    lo, hi = 0, 1 << depth
    for level in range(1, depth + 1):
        mid = (lo + hi) // 2
        half_width = (hi - lo) / (2 * (1 << depth))
        bridge = (w_left + w_right) / 2 + jax.random.normal(
            _node_key(key, level, mid), shape, dtype
        ) * math.sqrt(half_width / 2)
        if grid == mid:
            return bridge
        if grid < mid:
            hi, w_right = mid, bridge
        else:
            lo, w_left = mid, bridge

    return w_left  # unreachable for on-grid t


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

    w0 = brownian_at(key, g0 / scale, depth, shape, dtype)
    w1 = brownian_at(key, g1 / scale, depth, shape, dtype)
    return (w1 - w0) / math.sqrt((g1 - g0) / scale)
