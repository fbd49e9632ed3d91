"""Ulysses-style sequence parallelism for full (non-factorized) attention.

DeepSpeed-Ulysses (arXiv 2309.14509) re-buckets a token-sharded sequence to
a HEAD-sharded one for the attention proper: an all-to-all scatters heads
and gathers tokens, each chip runs exact full attention over the complete
sequence for its ``H/S`` head shard, and an inverse all-to-all restores the
token sharding.  Comm volume is two all-to-alls of the activations —
independent of sequence length per hop count (contrast
``ring_attention``'s S-1 K/V rotations), but every chip must hold one
head's full (N, N) score tile, so ring remains the scheme for sequences
whose per-head scores outgrow a chip.  The factorized-video variant of
the same idea (resharding between attention *axes* instead of heads)
lives in ``models/video_dit.py``.

TPU-native: explicit ``lax.all_to_all`` inside ``shard_map`` (riding ICI),
with the single-chip Pallas flash kernel doing the per-shard attention.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "sp",
    heads_op: str = "flash",
) -> jax.Array:
    """Exact softmax attention with token-sharded inputs and outputs.

    ``q/k/v``: (batch, heads, tokens, head_dim) with ``tokens`` sharded over
    ``axis``; ``heads`` must divide by the axis size.  Non-causal (diffusion
    transformers are bidirectional).

    ``heads_op`` picks the per-shard attention: ``"flash"`` (default) runs
    the Pallas online-softmax kernel on each chip's head shard; ``"einsum"``
    is the plain-XLA reference the flash path is equivalence-tested
    against."""
    if heads_op not in ("flash", "einsum"):
        raise ValueError(f"unknown heads_op {heads_op!r}")
    size = mesh.shape[axis]
    if q.shape[1] % size:
        raise ValueError(f"heads ({q.shape[1]}) must divide the {axis!r} axis size ({size})")

    def per_device(q_loc, k_loc, v_loc):
        from ..ops.flash_attention import attention_reference, flash_attention

        def to_heads(x):  # (B, H, N/S, d) -> (B, H/S, N, d)
            return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2, tiled=True)

        q_h, k_h, v_h = to_heads(q_loc), to_heads(k_loc), to_heads(v_loc)
        if heads_op == "flash":
            out = flash_attention(q_h, k_h, v_h)
        else:
            out = attention_reference(q_h, k_h, v_h)
        # inverse: scatter tokens, gather heads -> (B, H, N/S, d)
        return jax.lax.all_to_all(out, axis, split_axis=2, concat_axis=1, tiled=True)

    from . import batch_axis_of

    spec = P(batch_axis_of(mesh), None, axis, None)  # dp on batch when composed
    # check_vma=False: pallas_call does not declare varying-mesh-axes metadata
    return jax.shard_map(
        per_device, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
    )(q, k, v)
