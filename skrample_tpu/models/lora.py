"""LoRA fine-tuning: train low-rank adapters over a frozen base tree.

The import side already exists (`import_weights.merge_lora` folds published
PEFT/kohya adapter files into a raw state dict before import); this module
is the *training* side — the dominant fine-tune mode for these models.
Instead of 38M-13B trainable parameters, only rank-r factors train:

  W_eff = W + (scale / rank) * A @ B       A: (d_in, r) ~ N(0, 1/r),  B: (r, d_out) = 0

B = 0 makes the adapted model EXACTLY the base at init, so fine-tuning
starts from the pretrained behavior.  The TPU-shaped design decision is to
**materialize the merged weights inside the jitted step** (`lora_merge` is
one rank-r matmul per adapted weight — d_in*r*d_out FLOPs, noise next to
the d_in*N*d_out forward) rather than running separate adapter branches:
the model code stays untouched, every model family works unchanged
(anything with 2-D dense weights in its tree), and XLA sees ordinary dense
matmuls it already knows how to shard.  Gradients flow to A/B only because
the loss is differentiated with respect to the adapter tree — the base
tree is a closure constant; there is nothing to stop-gradient.

Memory math at Flux scale (1.31B): full fine-tune needs grads + moments
for every param (the 8-bit path in BASELINE.md exists to squeeze that into
16 GB); rank-16 LoRA on the attention/MLP denses trains ~0.5% of the
params, so grads + f32 Adam moments fit in ~100 MB and the frozen base
can stay bf16.

Adapters are a flat ``{path-string: {"a": ..., "b": ...}}`` dict — a plain
pytree, so it shards (`fsdp_param_specs`), checkpoints
(`TrainCheckpointer`), EMAs, and optimizes (`optax`/`adamw8bit`) with the
same machinery as full params.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
from jax.tree_util import keystr

__all__ = ["lora_init", "lora_merge", "lora_param_count"]


def _default_match(path: str, leaf: Any, rank: int) -> bool:
    # 2-D dense kernels named "w" with room for a rank-r factorization;
    # embeddings/tables/biases/conv kernels are not LoRA targets by default
    return path.endswith("['w']") and getattr(leaf, "ndim", 0) == 2 and min(leaf.shape) >= 2 * rank


def lora_init(
    key: jax.Array,
    params: Any,
    rank: int = 8,
    match: Callable[[str, Any], bool] | None = None,
    dtype: Any = jnp.float32,
) -> dict[str, dict[str, jax.Array]]:
    """Adapter tree for ``params``: ``{path: {"a", "b"}}`` per matched weight.

    ``match(path, leaf)`` selects targets (default: every 2-D ``w``); paths
    are ``jax.tree_util.keystr`` strings of the base tree, so the adapter
    dict re-attaches to any structurally equal tree (e.g. after a
    checkpoint restore).  ``a`` is N(0, 1/rank), ``b`` zeros — the merged
    model equals the base exactly at init."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    adapters: dict[str, dict[str, jax.Array]] = {}
    for path, leaf in flat:
        name = keystr(path)
        if (match or (lambda p, l: _default_match(p, l, rank)))(name, leaf):
            key, k_a = jax.random.split(key)
            d_in, d_out = leaf.shape
            adapters[name] = {
                "a": (jax.random.normal(k_a, (d_in, rank), dtype) / jnp.sqrt(rank)).astype(dtype),
                "b": jnp.zeros((rank, d_out), dtype),
            }
    if not adapters:
        raise ValueError(f"no LoRA targets matched (rank={rank}); pass match= to widen the selection")
    return adapters


def lora_merge(params: Any, adapters: Mapping[str, dict[str, jax.Array]], scale: float = 1.0) -> Any:
    """Base tree with ``W + (scale / rank) * A @ B`` at every adapted path.

    Traced: call INSIDE the jitted step so the rank-r matmuls fuse into the
    surrounding graph and gradients flow through A/B.  The delta is
    computed in the adapter dtype and cast into the weight dtype last, so a
    bf16 frozen base still accumulates its low-rank update in f32."""

    def fix(path, leaf):
        ab = adapters.get(keystr(path))
        if ab is None:
            return leaf
        rank = ab["a"].shape[1]
        delta = (ab["a"] @ ab["b"]) * (scale / rank)
        return (leaf.astype(delta.dtype) + delta).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(fix, params)


def lora_param_count(adapters: Mapping[str, dict[str, jax.Array]]) -> int:
    "Total trainable adapter parameters."
    return sum(int(leaf.size) for leaf in jax.tree.leaves(dict(adapters)))
