"""Sharding helpers: run sampling loops over a ``jax.sharding.Mesh``.

The sampler update is pointwise over the latent, so parallelism is pure
SPMD: annotate shardings, let XLA partition — no collectives are needed in
the sampler itself (they appear only inside the *model*, e.g. tensor-
parallel matmuls).  The reference's only multi-lane concept — per-batch-item
RNG fan-out (``BatchTensorNoise``) — maps to ``fold_in(key, batch_index)``
which is sharding-oblivious by construction.

Conventions:
  * axis "dp"  — data parallel over the batch dim
  * axis "sp"  — spatial/sequence parallel over a latent dim (long-video
    latents wider than one chip's HBM)
  * model-internal axes ("tp", ...) are owned by the model definition
"""

from __future__ import annotations

from contextlib import nullcontext
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .experts import expert_capacity, init_moe_ffn, moe_ffn, moe_ffn_capacity, moe_ffn_spec  # noqa: E402
from .fsdp import (  # noqa: E402
    constrain,
    fsdp_leaf_spec,
    fsdp_param_specs,
    opt_state_specs,
    per_device_bytes,
    shard_tree,
)
from .joint_sp import joint_sp_attention  # noqa: E402
from .pipeline_stages import pipeline_apply, stack_stages  # noqa: E402
from .ring_attention import ring_attention  # noqa: E402
from .ulysses import ulysses_attention  # noqa: E402

__all__ = [
    "batch_keys",
    "constrain",
    "expert_capacity",
    "fsdp_leaf_spec",
    "fsdp_param_specs",
    "init_moe_ffn",
    "joint_sp_attention",
    "latent_sharding",
    "make_mesh",
    "moe_ffn",
    "moe_ffn_capacity",
    "moe_ffn_spec",
    "opt_state_specs",
    "per_device_bytes",
    "pipeline_apply",
    "replicated",
    "ring_attention",
    "shard_batch",
    "shard_tree",
    "stack_stages",
    "ulysses_attention",
]


def make_mesh(
    dp: int | None = None,
    sp: int = 1,
    devices: list[jax.Device] | None = None,
    extra_axes: dict[str, int] | None = None,
) -> Mesh:
    """Build a ``(dp, sp, *extra)`` mesh over the available devices.

    ``dp=None`` absorbs whatever devices remain after the other axes."""
    devices = devices if devices is not None else jax.devices()
    extra_axes = extra_axes or {}
    denom = sp * int(np.prod(list(extra_axes.values()), initial=1))
    if dp is None:
        dp = len(devices) // denom
    count = dp * denom
    assert count <= len(devices), f"need {count} devices, have {len(devices)}"
    shape = (dp, sp, *extra_axes.values())
    names = ("dp", "sp", *extra_axes.keys())
    return Mesh(np.asarray(devices[:count]).reshape(shape), names)


def latent_sharding(mesh: Mesh, batch_axis: int = 0, spatial_axis: int | None = None, ndim: int = 4) -> NamedSharding:
    "Sharding for a latent: batch over 'dp', optionally one spatial dim over 'sp'."
    spec: list[Any] = [None] * ndim
    spec[batch_axis] = "dp"
    if spatial_axis is not None and "sp" in mesh.axis_names and mesh.shape["sp"] > 1:
        spec[spatial_axis] = "sp"
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    "Fully replicated sharding (scalar tables, weights)."
    return NamedSharding(mesh, PartitionSpec())


def batch_axis_of(mesh: Mesh, name: str = "dp") -> str | None:
    """The data-parallel axis name when present and nontrivial, else None.

    The sequence-parallel shard_maps / constraints put this on the leading
    (batch) dim of their specs so sp composes with dp on a multi-axis mesh —
    a spec of ``P(None, 'sp', ...)`` on a dp-sharded activation would force
    an all-gather of the batch at the shard_map boundary."""
    return name if name in mesh.axis_names and mesh.shape[name] > 1 else None


def shard_batch(mesh: Mesh, array: jax.Array, spatial_axis: int | None = None) -> jax.Array:
    "Place an array with the standard latent sharding."
    return jax.device_put(array, latent_sharding(mesh, 0, spatial_axis, array.ndim))


def batch_keys(key: jax.Array, batch: int) -> jax.Array:
    """Per-batch-item keys via fold_in: item streams are invariant to batch
    size and to how the batch is sharded (the counter-based replacement for
    per-item generator objects)."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(batch))


def maybe_mesh_context(mesh: Mesh | None):
    "``with maybe_mesh_context(mesh):`` — nullcontext when mesh is None."
    return mesh if mesh is not None else nullcontext()
