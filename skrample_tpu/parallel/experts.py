"""Expert parallelism: a mixture-of-experts FFN sharded over an ``ep`` axis.

Expert weights carry a leading expert axis sharded over ``ep``; routing is
dense top-1 (every expert computes every token, the gate mask selects) so
the whole layer is three einsums and GSPMD inserts the ``ep`` all-reduce at
the combine.  Dense dispatch costs E× FLOPs — the right trade below the
scale where capacity-based all-to-all dispatch pays off, and it keeps the
layer a pure function of shardings.
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
