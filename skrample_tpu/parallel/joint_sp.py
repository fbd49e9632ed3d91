"""Sequence parallelism for JOINT (multi-stream) attention.

The MMDiT family concatenates image and text token streams into one joint
attention per block (reference drives exactly this architecture through
its Flux/SD3 wrappers: /root/reference/tests/diffusers_pipes.py).  Both
streams arrive here in the packed per-token ``[q | k | v]`` layout straight
off each stream's fused qkv matmul, with each stream's token axis sharded
over the mesh's ``sp`` axis.  Sharding the *joint* axis instead would make
the stream boundary cut through shard boundaries, forcing resharding
collectives around every concat/split; keeping the streams separately
sharded and building the joint sequence per device inside ``shard_map``
makes the stream split/join free.

Two exact schemes, mirroring the single-stream ones:

* ``"ulysses"`` — all-to-alls scatter heads / gather tokens per stream,
  each chip concatenates the two full streams and runs the flash kernel
  over the complete joint sequence for its H/S head shard, inverse
  all-to-alls restore token sharding.  Comm is two all-to-alls of the
  activations per direction, independent of sequence length.
* ``"ring"`` — each device's local joint block is (img_shard ++ txt_shard)
  and K/V blocks rotate with ``ppermute``.  The effective global key order
  is img_0, txt_0, img_1, txt_1, ... — a permutation of the joint
  sequence, which is exact: softmax attention's normalizer sums over ALL
  keys, so any consistent key permutation gives bit-identical outputs, and
  each query's output stays at its own (local) position.  1/S of K/V and
  scores per chip; the scheme for joint sequences whose per-head scores
  outgrow a chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .ring_attention import ring_attention_local


def joint_sp_attention(
    qkv_a: jax.Array,
    qkv_b: jax.Array,
    heads: int,
    mesh: Mesh,
    axis: str = "sp",
    scheme: str = "ulysses",
) -> tuple[jax.Array, jax.Array]:
    """Exact joint softmax attention over two token-sharded packed streams.

    ``qkv_a/qkv_b``: (batch, tokens, 3*dim) per-token packed projections,
    token axes sharded over ``axis``; each stream's token count must divide
    by the axis size (``ulysses`` additionally needs ``heads`` to).  Returns
    the two streams' attention outputs as (batch, tokens, dim), same
    shardings.  Non-causal (diffusion transformers are bidirectional)."""
    if scheme not in ("ulysses", "ring"):
        raise ValueError(f"unknown scheme {scheme!r}")
    size = mesh.shape[axis]
    dim = qkv_a.shape[-1] // 3
    if dim % heads:
        raise ValueError(f"dim ({dim}) must divide by heads ({heads})")
    head_dim = dim // heads
    for name, qkv in (("a", qkv_a), ("b", qkv_b)):
        if qkv.shape[1] % size:
            raise ValueError(
                f"stream {name} tokens ({qkv.shape[1]}) must divide the {axis!r} axis size ({size})"
            )
    if scheme == "ulysses" and heads % size:
        raise ValueError(f"heads ({heads}) must divide the {axis!r} axis size ({size}) for ulysses")

    def split_heads(qkv_loc):  # (B, n, 3*dim) -> three (B, H, n, d)
        q, k, v = jnp.split(qkv_loc, 3, axis=-1)

        def r(x):
            B, n = x.shape[:2]
            return x.reshape(B, n, heads, head_dim).transpose(0, 2, 1, 3)

        return r(q), r(k), r(v)

    def merge_heads(o):  # (B, H, n, d) -> (B, n, dim)
        B, H, n, d = o.shape
        return o.transpose(0, 2, 1, 3).reshape(B, n, H * d)

    def per_device(qkv_a_loc, qkv_b_loc):
        from ..ops.flash_attention import flash_attention

        qa, ka, va = split_heads(qkv_a_loc)
        qb, kb, vb = split_heads(qkv_b_loc)

        if scheme == "ulysses":

            def to_heads(x):  # (B, H, n/S, d) -> (B, H/S, n, d)
                return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2, tiled=True)

            qa, ka, va = to_heads(qa), to_heads(ka), to_heads(va)
            qb, kb, vb = to_heads(qb), to_heads(kb), to_heads(vb)
            n_a = qa.shape[2]
            out = flash_attention(
                jnp.concatenate([qa, qb], axis=2),
                jnp.concatenate([ka, kb], axis=2),
                jnp.concatenate([va, vb], axis=2),
            )
            oa, ob = out[:, :, :n_a], out[:, :, n_a:]

            def back(x):  # inverse: scatter tokens, gather heads
                return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)

            oa, ob = back(oa), back(ob)
        else:  # ring over local joint blocks (img_shard ++ txt_shard)
            n_a = qa.shape[2]
            out = ring_attention_local(
                jnp.concatenate([qa, qb], axis=2),
                jnp.concatenate([ka, kb], axis=2),
                jnp.concatenate([va, vb], axis=2),
                axis,
                size,
            )
            oa, ob = out[:, :, :n_a], out[:, :, n_a:]

        return merge_heads(oa), merge_heads(ob)

    from . import batch_axis_of

    spec = P(batch_axis_of(mesh), axis, None)  # dp on batch when composed
    # check_vma=False: pallas_call does not declare varying-mesh-axes metadata
    return jax.shard_map(
        per_device, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec), check_vma=False
    )(qkv_a, qkv_b)
