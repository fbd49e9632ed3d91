"""GPipe-lite pipeline parallelism over a ``pp`` mesh axis.

Stage parameters live stacked on a leading axis sharded over ``pp`` (each
device holds exactly its stage).  Microbatches flow through the stages with
``lax.ppermute`` hops: every device runs the same ``M + S - 1`` tick loop,
processing microbatch ``t - s`` at tick ``t`` and passing its activation to
the next stage.  Activations ride ICI; there is no host involvement.

This is deliberately the minimal correct schedule (fill + drain, no
interleaving): the sampler framework itself never needs pp — this exists so
models too deep for one chip slot into the same mesh machinery, and the
multi-chip dryrun exercises it.

Intentional fill/drain cost: every device executes ``stage_fn`` on all
``M + S - 1`` ticks, so during fill/drain some devices compute garbage that
is never read (stage 0 re-feeds the last microbatch for ``t >= M``).  Under
SPMD this is not avoidable by masking — the program is uniform across
devices, so zeroing inputs saves no wall time; the S-1-tick bubble is the
textbook GPipe fill/drain overhead (amortize by raising M/S, or interleave
stages, which this minimal schedule deliberately does not).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _to_varying(x: Any, axis: str) -> Any:
    "Mark a replicated value device-varying over `axis` (vma type cast)."
    # jax >= 0.9 spells this jax.lax.pcast(..., to="varying"); jax.lax.pvary
    # is its deprecated alias (tests/test_hygiene.py fails on the warning)
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis, to="varying")
    return jax.lax.pvary(x, (axis,))


def pipeline_apply(
    stage_fn: Callable[[Any, Any], Any],
    stage_params: Any,
    microbatches: Any,
    mesh: Mesh,
    axis: str = "pp",
    batch_axis: str | None = None,
) -> Any:
    """Run ``microbatches`` through S pipeline stages.

    ``stage_params`` leaves must have a leading stage axis of size S (the
    ``pp`` mesh size), sharded over ``axis``.  ``microbatches`` is a pytree
    whose leaves are (M, mb, ...) — a bare array, or e.g. a
    ``(tokens, conditioning)`` pair when every stage needs the conditioning
    vector alongside the residual stream.  ``stage_fn(params, x)`` maps one
    microbatch pytree through one stage, structure- and shape-preserving.
    Returns the (M, mb, ...) outputs of the final stage.

    ``batch_axis`` composes pp with dp: when set (e.g. ``"dp"``), each
    microbatch's item dim is sharded over that mesh axis — every dp slice
    runs its own pipeline over the same stage weights, no cross-dp comm.
    The tick loop is a ``lax.scan`` (static trip count), so the whole thing
    is reverse-differentiable: ``ppermute``/``psum`` transpose to their
    inverses and a pp x dp *training* step works under ``jax.grad``."""
    stages = mesh.shape[axis]

    def per_device(params, mb_in):
        # inside shard_map: params leaves are (1, ...) local shards
        local = jax.tree.map(lambda leaf: leaf[0], params)
        stage = jax.lax.axis_index(axis)
        # the microbatch stream is replicated input; mark it device-varying so
        # the carry keeps one consistent vma type throughout the loop
        mb_in = jax.tree.map(lambda leaf: _to_varying(leaf, axis), mb_in)
        count = jax.tree.leaves(mb_in)[0].shape[0]
        ticks = count + stages - 1

        def tick(carry, t):
            active, outputs = carry
            # stage 0 ingests microbatch t (garbage when t >= count; masked later)
            feed = jax.tree.map(lambda leaf: leaf[jnp.minimum(t, count - 1)], mb_in)
            active = jax.tree.map(lambda f, a: jnp.where(stage == 0, f, a), feed, active)
            active = stage_fn(local, active)
            # collect on the last stage: tick t completed microbatch t - (S-1)
            slot = t - (stages - 1)
            outputs = jax.tree.map(
                lambda out, act: jnp.where(
                    (stage == stages - 1) & (slot >= 0),
                    jax.lax.dynamic_update_index_in_dim(out, act, jnp.maximum(slot, 0), 0),
                    out,
                ),
                outputs,
                active,
            )
            # hand activations to the next stage (ring; the wraparound value
            # reaching stage 0 is overwritten by the next feed)
            active = jax.tree.map(
                lambda act: jax.lax.ppermute(act, axis, [(i, (i + 1) % stages) for i in range(stages)]),
                active,
            )
            return (active, outputs), None

        active0 = jax.tree.map(lambda leaf: jnp.zeros_like(leaf[0]), mb_in)
        outputs0 = jax.tree.map(jnp.zeros_like, mb_in)
        # scan, not fori_loop: same lowering, but reverse-differentiable
        (_, outputs), _ = jax.lax.scan(tick, (active0, outputs0), jnp.arange(ticks))
        # only the last stage holds real outputs; psum broadcasts them
        outputs = jax.tree.map(
            lambda out: jnp.where(stage == stages - 1, out, jnp.zeros_like(out)), outputs
        )
        return jax.lax.psum(outputs, axis)

    spec_params = jax.tree.map(lambda _: P(axis), stage_params)
    mb_spec = P(None, batch_axis) if batch_axis is not None else P()
    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(spec_params, mb_spec),
        out_specs=mb_spec,
    )(stage_params, microbatches)


def stack_stages(block_params: list, stages: int) -> Any:
    """Stack a depth-list of per-block param trees into stage-major leaves.

    ``depth`` per-block trees become one tree whose leaves carry a leading
    ``(stages, depth // stages)`` pair of axes: stage s holds the consecutive
    blocks ``[s * depth/stages, (s+1) * depth/stages)``.  Shard the leading
    axis over ``pp`` (``pipeline_apply`` does) and each device materializes
    only its own stage's blocks."""
    depth = len(block_params)
    if depth % stages:
        raise ValueError(f"depth {depth} not divisible into {stages} pipeline stages")
    per = depth // stages
    stacked = jax.tree.map(lambda *leaves: jnp.stack(leaves), *block_params)
    return jax.tree.map(lambda leaf: leaf.reshape(stages, per, *leaf.shape[1:]), stacked)
