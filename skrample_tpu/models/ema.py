"""Exponential moving average of model parameters.

Diffusion models are *sampled* from EMA weights in production (the raw
trajectory is too noisy — every reference-era training recipe keeps a
decay-0.999..0.9999 shadow tree and ships that).  The reference library has
no training story at all (SURVEY.md §2.0); this is the TPU-native one: the
update is a pure tree-map lerp that lives inside the jitted train step, so
the shadow tree inherits the parameters' shardings and the update fuses
into the optimizer's elementwise chain (no extra HBM round-trips beyond
reading/writing the shadow itself).

Usage inside a scanned train step::

    ema = ema_init(params)
    ...
    params = optax.apply_updates(params, updates)
    ema = ema_update(ema, params, decay=0.9999, step=step)   # step: warmup
    ...
    sample_fn = model.as_sampleable(ema)                     # serve the EMA
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(params: Any) -> Any:
    "Start the shadow tree as a copy of the current parameters."
    return jax.tree.map(jnp.asarray, params)


def ema_decay_schedule(step: jax.Array | int, decay: float = 0.9999, warmup: float = 10.0) -> jax.Array:
    """Karras/ADM-style warmup: ``min(decay, (1 + step) / (warmup + step))``.

    Early on the shadow tracks the fast-moving parameters almost directly
    (a fixed 0.9999 would pin it to the random init for thousands of
    steps); it eases into the asymptotic ``decay`` as training settles."""
    step = jnp.asarray(step, jnp.float32)
    return jnp.minimum(jnp.asarray(decay, jnp.float32), (1.0 + step) / (warmup + step))


def ema_update(
    ema: Any,
    params: Any,
    decay: float | jax.Array = 0.9999,
    step: jax.Array | int | None = None,
) -> Any:
    """One EMA step: ``ema <- d * ema + (1 - d) * params`` over the tree.

    With ``step`` given, ``decay`` is the asymptote of
    :func:`ema_decay_schedule`; without it, ``decay`` is used as-is.  The
    lerp runs in each leaf's own dtype — for bf16 training keep the master
    params (and therefore the shadow) in f32, the usual mixed-precision
    layout, or the (1 - d) increments vanish below bf16's 8-bit mantissa."""
    d = ema_decay_schedule(step, float(decay)) if step is not None else decay
    return jax.tree.map(lambda e, p: e * jnp.asarray(d, e.dtype) + p * jnp.asarray(1.0 - d, e.dtype), ema, params)
