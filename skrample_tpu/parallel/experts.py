"""Expert parallelism: a mixture-of-experts FFN sharded over an ``ep`` axis.

Expert weights carry a leading expert axis sharded over ``ep``.  Two dispatch
strategies share the same parameters and (when nothing overflows) the same
output:

* :func:`moe_ffn` — dense top-1: every expert computes every token, the
  one-hot gate mask selects.  E× FLOPs, zero dispatch machinery; the right
  trade at small scale and the equivalence oracle for the capacity path.
* :func:`moe_ffn_capacity` — Switch-Transformer-style capacity dispatch
  (one-hot dispatch tensor built from a cumulative position within each
  expert's queue; cf. arXiv 2101.03961 §2.2 and the mesh-tensorflow einsum
  formulation).  Each expert computes only ``capacity`` token slots, so the
  FFN FLOPs drop from E× to ~capacity_factor×; tokens past an expert's
  capacity contribute zero (documented Switch behavior).  Static shapes
  throughout — jit/mesh friendly; GSPMD turns the dispatch/combine einsums
  into the ``ep`` scatter/gather.

Measured crossover between the two paths: ``docs/SCALING.md``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def init_moe_ffn(key: jax.Array, dim: int, hidden: int, experts: int) -> dict:
    "Parameter tree for a top-1 MoE FFN."
    kg, k1, k2 = jax.random.split(key, 3)
    return {
        "gate": jax.random.normal(kg, (dim, experts), jnp.float32) * (1 / math.sqrt(dim)),
        "w_in": jax.random.normal(k1, (experts, dim, hidden), jnp.float32) * (1 / math.sqrt(dim)),
        "w_out": jax.random.normal(k2, (experts, hidden, dim), jnp.float32) * (1 / math.sqrt(hidden)),
    }


def moe_ffn_spec() -> dict:
    "PartitionSpecs: experts sharded over 'ep', the gate replicated."
    return {
        "gate": P(),
        "w_in": P("ep"),
        "w_out": P("ep"),
    }


def moe_ffn(params: dict, tokens: jax.Array) -> jax.Array:
    """Top-1 routed FFN over ``tokens`` (..., N, dim).

    Every expert runs on every token (dense dispatch); the one-hot gate mask
    zeroes the non-selected contributions before the expert-axis sum, which
    is where the ``ep`` all-reduce lands."""
    logits = jnp.einsum("...nd,de->...ne", tokens, params["gate"])
    choice = jnp.argmax(logits, axis=-1)
    mask = jax.nn.one_hot(choice, params["w_in"].shape[0], dtype=tokens.dtype)

    hidden = jax.nn.gelu(jnp.einsum("...nd,edh->...neh", tokens, params["w_in"]))
    expert_out = jnp.einsum("...neh,ehd->...ned", hidden, params["w_out"])
    return jnp.einsum("...ned,...ne->...nd", expert_out, mask)


def expert_capacity(tokens: int, experts: int, capacity_factor: float = 1.25) -> int:
    "Per-expert slot count: ceil(factor * tokens / experts), at least 1."
    return max(1, math.ceil(capacity_factor * tokens / experts))


def moe_ffn_capacity(
    params: dict,
    tokens: jax.Array,
    capacity: int | None = None,
    capacity_factor: float = 1.25,
    method: str = "gather",
) -> jax.Array:
    """Top-1 routed FFN with per-expert capacity over ``tokens`` (..., N, dim).

    Routing order is token order (first come, first served within each
    expert's queue); a token beyond its expert's capacity is dropped — its
    output is zero, exactly like Switch.  With ``capacity >= N_total`` no
    token can overflow and the result equals :func:`moe_ffn` bit-for-bit up
    to summation order.

    Two dispatch implementations, identical results:

    * ``method="gather"`` (default) — scatter tokens into a flat ``(E*C, D)``
      slot buffer by computed slot id, gather back after the expert matmuls.
      O(T*D) dispatch cost; the scatter/gather lower to TPU dynamic-update
      ops.  Expert FLOPs: ``E*C*4*D*H``.
    * ``method="onehot"`` — the mesh-tensorflow/Switch einsum formulation:
      an explicit ``(T, E, C)`` one-hot dispatch tensor contracted on both
      sides.  Costs ``2*T*E*C*D`` per side — quadratic in T at fixed
      capacity factor — but is a pure pair of matmuls, which rides the MXU
      and gives GSPMD the cleanest sharding story.  Preferable only when T
      is modest; see docs/SCALING.md for the measured crossover."""
    *lead, N, D = tokens.shape
    T = N
    for n in lead:
        T *= n
    flat = tokens.reshape(T, D)
    E = params["w_in"].shape[0]
    C = capacity if capacity is not None else expert_capacity(T, E, capacity_factor)

    logits = flat @ params["gate"].astype(flat.dtype)
    choice = jnp.argmax(logits, axis=-1)  # (T,)
    onehot = jax.nn.one_hot(choice, E, dtype=flat.dtype)  # (T, E)
    # position of each token within its expert's queue, in token order
    position = jnp.cumsum(onehot, axis=0) - 1.0
    keep = onehot * (position < C)

    w_in = params["w_in"].astype(flat.dtype)
    w_out = params["w_out"].astype(flat.dtype)

    if method == "onehot":
        slot = jax.nn.one_hot(position.astype(jnp.int32), C, dtype=flat.dtype)  # (T, E, C)
        dispatch = slot * keep[..., None]  # (T, E, C) one-hot; zero row = dropped
        expert_in = jnp.einsum("tec,td->ecd", dispatch, flat)  # (E, C, D), ep-sharded
        hidden = jax.nn.gelu(jnp.einsum("ecd,edh->ech", expert_in, w_in))
        expert_out = jnp.einsum("ech,ehd->ecd", hidden, w_out)
        combined = jnp.einsum("tec,ecd->td", dispatch, expert_out)
    elif method == "gather":
        pos = jnp.sum(position * onehot, axis=-1).astype(jnp.int32)  # (T,) queue position
        kept = jnp.sum(keep, axis=-1) > 0  # (T,) survived capacity
        slot_id = jnp.where(kept, choice.astype(jnp.int32) * C + pos, E * C)  # overflow bin at the end
        slots = jnp.zeros((E * C + 1, D), flat.dtype).at[slot_id].set(flat)
        expert_in = slots[: E * C].reshape(E, C, D)
        hidden = jax.nn.gelu(jnp.einsum("ecd,edh->ech", expert_in, w_in))
        expert_out = jnp.einsum("ech,ehd->ecd", hidden, w_out).reshape(E * C, D)
        combined = jnp.where(kept[:, None], expert_out[jnp.minimum(slot_id, E * C - 1)], 0.0)
    else:
        raise ValueError(f"unknown dispatch method {method!r}")
    return combined.reshape(*lead, N, D)
