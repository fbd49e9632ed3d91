"""Ring attention over a sequence-parallel (``sp``) mesh axis.

Queries stay put; key/value blocks rotate around the ring with
``lax.ppermute`` while an online-softmax accumulator (running max,
denominator, weighted sum) folds each block in exactly — the result is
bit-for-bit softmax attention, at 1/S of the K/V memory per chip and with
the block hops riding ICI.

This is the model-side companion to the sampler's ``sp`` latent sharding:
attention over video/long-sequence token axes no longer needs the full K/V
on any single chip (GSPMD's default for a sharded einsum is an all-gather).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "sp",
) -> jax.Array:
    """Exact softmax attention with sequence-sharded K/V.

    ``q/k/v``: (batch, heads, tokens, head_dim) with ``tokens`` sharded over
    ``axis``.  Non-causal (diffusion transformers are bidirectional)."""
    ring = mesh.shape[axis]
    scale = 1.0 / math.sqrt(q.shape[-1])

    def per_device(q_loc, k_loc, v_loc):
        hops = [(i, (i + 1) % ring) for i in range(ring)]

        state = (
            jnp.full(q_loc.shape[:-1], -jnp.inf, jnp.float32),  # running max
            jnp.zeros(q_loc.shape[:-1], jnp.float32),  # denominator
            jnp.zeros(q_loc.shape, jnp.float32),  # weighted values
            k_loc,
            v_loc,
        )

        for _ in range(ring):
            peak, total, acc, k_blk, v_blk = state
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q_loc, k_blk, preferred_element_type=jnp.float32
            ) * scale
            block_peak = jnp.maximum(peak, scores.max(-1))
            rescale = jnp.exp(peak - block_peak)
            probs = jnp.exp(scores - block_peak[..., None])
            total = total * rescale + probs.sum(-1)
            acc = acc * rescale[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", probs, v_blk.astype(jnp.float32)
            )
            k_blk = jax.lax.ppermute(k_blk, axis, hops)
            v_blk = jax.lax.ppermute(v_blk, axis, hops)
            state = (block_peak, total, acc, k_blk, v_blk)

        peak, total, acc, _, _ = state
        return (acc / total[..., None]).astype(q_loc.dtype)

    spec = P(None, None, axis, None)
    return jax.shard_map(
        per_device, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)
