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
    block_op: str = "flash",
) -> jax.Array:
    """Exact softmax attention with sequence-sharded K/V.

    ``q/k/v``: (batch, heads, tokens, head_dim) with ``tokens`` sharded over
    ``axis``.  Non-causal (diffusion transformers are bidirectional).

    ``block_op`` picks the per-hop attention kernel: ``"flash"`` (default)
    attends each arriving K/V block with the Pallas stats kernel
    (:func:`~skrample_tpu.ops.flash_attention.flash_attention_block_stats` —
    the (Nq_local, Nkv_local) score tile never reaches HBM) and folds blocks
    with the exact online-softmax merge; ``"einsum"`` is the plain-XLA
    reference the flash path is equivalence-tested against."""
    if block_op not in ("flash", "einsum"):
        raise ValueError(f"unknown block_op {block_op!r}")
    ring = mesh.shape[axis]

    def per_device(q_loc, k_loc, v_loc):
        return ring_attention_local(q_loc, k_loc, v_loc, axis, ring, block_op)

    from . import batch_axis_of

    spec = P(batch_axis_of(mesh), None, axis, None)  # dp on batch when composed
    # check_vma=False: pallas_call does not declare varying-mesh-axes
    # metadata, so the flash block kernel would trip the vma validator
    return jax.shard_map(
        per_device, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
    )(q, k, v)


def ring_attention_local(
    q_loc: jax.Array,
    k_loc: jax.Array,
    v_loc: jax.Array,
    axis: str,
    ring: int,
    block_op: str = "flash",
) -> jax.Array:
    """The per-device ring body, callable from inside any ``shard_map`` whose
    mesh carries ``axis`` (``ring`` = that axis's size).  ``q/k/v_loc`` are
    this device's local (B, H, n_local, d) blocks; K/V rotate with
    ``ppermute`` while an online-softmax accumulator folds each arriving
    block exactly.  The global key order is the device order of the local
    blocks — any consistent permutation of the sequence yields bit-exact
    softmax attention (the normalizer is a sum over all keys), which is what
    lets callers pack several streams into one local block (see
    ``joint_sp.py``)."""
    from ..ops.flash_attention import flash_attention_block_stats, softmax_merge

    scale = 1.0 / math.sqrt(q_loc.shape[-1])
    hops = [(i, (i + 1) % ring) for i in range(ring)]
    interpret = jax.default_backend() != "tpu"

    state = (
        jnp.full(q_loc.shape[:-1], -jnp.inf, jnp.float32),  # running max
        jnp.zeros(q_loc.shape[:-1], jnp.float32),  # denominator
        jnp.zeros(q_loc.shape, jnp.float32),  # weighted values
        k_loc,
        v_loc,
    )

    for _ in range(ring):
        peak, total, acc, k_blk, v_blk = state
        if block_op == "flash":
            block = flash_attention_block_stats(q_loc, k_blk, v_blk, interpret=interpret)
            acc, peak, total = softmax_merge((acc, peak, total), block)
        else:
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
            peak = block_peak
        k_blk = jax.lax.ppermute(k_blk, axis, hops)
        v_blk = jax.lax.ppermute(v_blk, axis, hops)
        state = (peak, total, acc, k_blk, v_blk)

    peak, total, acc, _, _ = state
    return (acc / total[..., None]).astype(q_loc.dtype)
