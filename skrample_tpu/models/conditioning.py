"""Shared conditioning mechanics for the sampling closures.

Every conditioned family's closure does the same three things: broadcast
single-prompt conditioning rows to the latent batch, double the timestep
vector for a two-branch (classifier-free / true-CFG) forward, and mix the
two branches.  One implementation here instead of a copy per closure
(flux, mmdit, unet_cond, and the three stack assemblies all use these)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def per_item(a: jax.Array, batch: int, item_rank: int) -> jax.Array:
    """Broadcast conditioning with ``item_rank`` per-item dims to a full
    batch: accepts an unbatched row, a batch-1 array, or an already-batched
    array (shapes must then agree)."""
    return jnp.broadcast_to(a, (batch, *a.shape[-item_rank:]))


def doubled_t(t: jax.Array | float, batch: int) -> jax.Array:
    "Timesteps for a two-branch forward over a doubled batch."
    if jnp.ndim(t) == 0:
        return jnp.broadcast_to(t, (2 * batch,))
    t = jnp.broadcast_to(t, (batch,))
    return jnp.concatenate([t, t])


def guided_mix(primary: jax.Array, secondary: jax.Array, scale: float) -> jax.Array:
    "``secondary + scale * (primary - secondary)`` — CFG / true-CFG mixing."
    return secondary + scale * (primary - secondary)
