"""ZeRO-3-style fully-sharded data parallelism (FSDP) over the ``dp`` axis.

The reference ships no trainer and no distributed runtime (SURVEY §2.1 —
its only multi-lane concept is batch RNG fan-out); this module exists
because the TPU build ships training, and replicated parameters + optimizer
moments cap trainable model size at one chip's HBM.  FSDP removes that cap:
every chip holds ``1/dp`` of each large parameter and of its Adam moments,
and the full weight exists only transiently inside the step.

On TPU, FSDP is a *layout*, not a wrapper class.  Parameters and optimizer
state are placed with shardings that split one dimension of each large leaf
over the data axis; XLA's SPMD partitioner then derives the collectives
from the shardings alone:

  * forward/backward — weights are all-gathered on use (riding ICI, fused
    into the surrounding computation where possible),
  * gradients — constrained back to the parameter layout, which turns the
    data-parallel gradient all-reduce into a reduce-scatter (each chip only
    materializes the shard it will apply),
  * optimizer update — purely local: moments live in the same layout, so
    the Adam math is elementwise on 1/dp of the state per chip.

This composes with tensor parallelism: pass the model's megatron
``param_spec()`` tree as ``base_specs`` and FSDP picks a dimension tp has
not already claimed.  It also shards the int8 block-quantized moments of
:func:`skrample_tpu.optim.adamw8bit` (their ``(blocks, block)`` packing is
split over the blocks axis), so the two memory levers stack.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "constrain",
    "fsdp_leaf_spec",
    "fsdp_param_specs",
    "opt_state_specs",
    "per_device_bytes",
    "shard_tree",
]


def _norm_spec(spec: P | None, ndim: int) -> tuple:
    "PartitionSpec -> tuple of length ndim (padded with None)."
    entries = tuple(spec) if spec is not None else ()
    return entries + (None,) * (ndim - len(entries))


def fsdp_leaf_spec(
    shape: tuple[int, ...],
    axis_size: int,
    axis: str = "dp",
    base: P | None = None,
    min_size: int = 2**15,
) -> P:
    """Spec for one leaf: ``axis`` added on the largest free divisible dim.

    A dim is *free* when ``base`` (e.g. the tp layout) leaves it None, and
    eligible when divisible by ``axis_size``.  Leaves smaller than
    ``min_size`` elements keep ``base`` unchanged — gathering tiny vectors
    costs more collective latency than the bytes saved (biases, layernorm
    scales, modulation heads)."""
    entries = _norm_spec(base, len(shape))
    if axis_size > 1 and int(np.prod(shape, initial=1)) >= min_size:
        candidates = [i for i, (d, s) in enumerate(zip(shape, entries)) if s is None and d % axis_size == 0]
        if candidates:
            pick = max(candidates, key=lambda i: shape[i])
            new = list(entries)
            new[pick] = axis
            entries = tuple(new)
    while entries and entries[-1] is None:  # P(None) != P(); trim to canonical
        entries = entries[:-1]
    return P(*entries)


def fsdp_param_specs(
    params: Any,
    axis_size: int,
    axis: str = "dp",
    base_specs: Any = None,
    min_size: int = 2**15,
) -> Any:
    """Spec tree for a parameter pytree (composing with ``base_specs``).

    ``base_specs`` is an existing spec tree of the same structure (a model's
    tensor-parallel ``param_spec()``); pass None for pure FSDP."""

    if base_specs is None:
        return jax.tree.map(
            lambda p: fsdp_leaf_spec(tuple(getattr(p, "shape", ())), axis_size, axis, None, min_size),
            params,
        )
    # tree.map flattens the rest trees "up to" the first tree's leaves, so a
    # whole PartitionSpec (a tuple subclass) arrives intact per param leaf
    return jax.tree.map(
        lambda p, base: fsdp_leaf_spec(tuple(getattr(p, "shape", ())), axis_size, axis, base, min_size),
        params,
        base_specs,
    )


def opt_state_specs(
    opt_state: Any,
    params: Any,
    param_specs: Any,
    axis_size: int,
    axis: str = "dp",
    min_size: int = 2**15,
) -> Any:
    """Spec tree for an optimizer state, matched structurally to the params.

    Any subtree whose structure and leaf shapes equal the parameter tree
    (optax's Adam ``mu``/``nu``) inherits ``param_specs`` exactly — moments
    colocate with their parameter shard, keeping the update local.  Other
    array leaves (int8 block-quantized moments packed as ``(blocks, block)``,
    step counts) get the shape rule on their own: leading dim sharded when
    divisible, scalars replicated."""
    pdef = jax.tree.structure(params)
    pshapes = [tuple(getattr(p, "shape", ())) for p in jax.tree.leaves(params)]

    def matches(node: Any) -> bool:
        try:
            if jax.tree.structure(node) != pdef:
                return False
            return [tuple(getattr(x, "shape", ())) for x in jax.tree.leaves(node)] == pshapes
        except Exception:
            return False

    def rec(node: Any) -> Any:
        if matches(node):
            return param_specs
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, (tuple, list)) and not hasattr(node, "shape"):
            fields = getattr(node, "_fields", ())
            if set(fields) == {"mq", "ms", "vq", "vs"}:  # int8 block-packed moments
                # shard the BLOCKS axis of codes and scales together, so the
                # per-block dequant (codes * scales broadcast) stays local
                blocks = node.mq.shape[0]
                spec = (
                    P(axis)
                    if blocks % axis_size == 0 and node.mq.size >= min_size
                    else P()
                )
                return type(node)(spec, spec, spec, spec)
            mapped = [rec(c) for c in node]
            if hasattr(node, "_fields"):  # NamedTuple (optax states, incl. field-less EmptyState)
                return type(node)(*mapped)
            return type(node)(mapped)
        shape = tuple(getattr(node, "shape", ()))
        return fsdp_leaf_spec(shape, axis_size, axis, None, min_size)

    return rec(opt_state)


def shard_tree(tree: Any, mesh: Mesh, specs: Any) -> Any:
    "Place every leaf with its NamedSharding (device_put; host -> sharded)."
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        tree,
        specs,
    )


def constrain(tree: Any, mesh: Mesh, specs: Any) -> Any:
    """``with_sharding_constraint`` every leaf (traced values).

    Use on the gradient tree inside a jitted train step: constraining grads
    to the parameter layout is what turns the dp gradient all-reduce into a
    reduce-scatter."""
    return jax.tree.map(
        lambda leaf, spec: jax.lax.with_sharding_constraint(leaf, NamedSharding(mesh, spec)),
        tree,
        specs,
    )


def per_device_bytes(tree: Any) -> int:
    "Bytes of the tree resident on ONE device (the first addressable shard)."
    total = 0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            shard = leaf.addressable_shards[0]
            total += int(np.prod(shard.data.shape, initial=1)) * leaf.dtype.itemsize
        elif hasattr(leaf, "nbytes"):
            total += int(leaf.nbytes)
    return total
