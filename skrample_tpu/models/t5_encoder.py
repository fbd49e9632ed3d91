"""T5-class bidirectional text encoder in pure JAX — the second prompt
tower of the SD3/Flux-class stacks.

Those pipelines condition on TWO text towers: a CLIP-class causal encoder
(pooled vector -> adaLN conditioning; :mod:`text_encoder`) and a T5-class
bidirectional encoder (sequence features -> the context tokens the joint
attention reads).  This is the latter: relative-position-bias attention
(no absolute positions), RMSNorm, bias-free linears, and a (optionally
gated) feed-forward — the T5 v1.1 recipe.

Checkpoint import (``models.import_weights.t5_encoder``) is verified
against ``transformers.T5EncoderModel`` on shared weights in
``tests/test_import_weights.py``.

TPU notes: everything is batched dense over (batch x tokens) with float32
accumulation; attention is a trace-time einsum (encoder contexts are
77-512 tokens — KB-scale scores, below the flash-kernel crossover).  The
relative bias is computed once from static shapes and added to every
layer's scores (T5 computes it in layer 0 and shares it, which is the
same thing done eagerly).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


@dataclass(frozen=True)
class T5EncoderConfig:
    vocab_size: int = 32128
    dim: int = 512
    "Model width (``d_model``)."
    head_dim: int = 64
    "Per-head width (``d_kv``); T5 decouples it from ``dim``."
    heads: int = 8
    ff_dim: int = 1024
    depth: int = 6
    gated: bool = True
    '``True`` = v1.1 gated-gelu FF (``wi_0``/``wi_1``); ``False`` = relu.'
    rel_buckets: int = 32
    rel_max_distance: int = 128
    ln_eps: float = 1e-6
    compute_dtype: Any = jnp.bfloat16

    @property
    def inner_dim(self) -> int:
        return self.heads * self.head_dim


def _relative_position_bucket(relative_position: np.ndarray, num_buckets: int, max_distance: int) -> np.ndarray:
    "T5's bidirectional log-bucketing of position deltas (host-side, static)."
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return ret + np.where(n < max_exact, n, large)


class T5Encoder:
    """Functional model: ``init`` -> params pytree, ``apply(params, ids)``
    -> (B, L, dim) bidirectional sequence features (final-RMSNorm'd, f32)."""

    def __init__(self, config: T5EncoderConfig = T5EncoderConfig()):
        self.config = config

    def init(self, key: jax.Array) -> dict:
        c = self.config
        keys = iter(jax.random.split(key, 3 + 8 * c.depth))

        def mat(d_in: int, d_out: int, scale: float) -> jax.Array:
            return jax.random.normal(next(keys), (d_in, d_out), jnp.float32) * scale

        blocks = []
        for _ in range(c.depth):
            ff = (
                {"wi_0": mat(c.dim, c.ff_dim, c.dim**-0.5), "wi_1": mat(c.dim, c.ff_dim, c.dim**-0.5)}
                if c.gated
                else {"wi": mat(c.dim, c.ff_dim, c.dim**-0.5)}
            )
            blocks.append(
                {
                    "q": mat(c.dim, c.inner_dim, (c.dim * c.head_dim) ** -0.5),
                    "k": mat(c.dim, c.inner_dim, c.dim**-0.5),
                    "v": mat(c.dim, c.inner_dim, c.dim**-0.5),
                    "o": mat(c.inner_dim, c.dim, c.inner_dim**-0.5),
                    "ln_attn": jnp.ones((c.dim,), jnp.float32),
                    "ln_ff": jnp.ones((c.dim,), jnp.float32),
                    **ff,
                    "wo": mat(c.ff_dim, c.dim, c.ff_dim**-0.5),
                }
            )
        return {
            "tok_embed": jax.random.normal(next(keys), (c.vocab_size, c.dim), jnp.float32),
            "rel_bias": jax.random.normal(next(keys), (c.rel_buckets, c.heads), jnp.float32) * 0.1,
            "blocks": blocks,
            "final_ln": jnp.ones((c.dim,), jnp.float32),
        }

    def param_spec(self) -> dict:
        "Tensor-parallel PartitionSpecs over mesh axis 'tp' (megatron col/row)."
        c = self.config
        ff_cols = {"wi_0": P(None, "tp"), "wi_1": P(None, "tp")} if c.gated else {"wi": P(None, "tp")}
        block = {
            "q": P(None, "tp"),
            "k": P(None, "tp"),
            "v": P(None, "tp"),
            "o": P("tp", None),
            "ln_attn": P(),
            "ln_ff": P(),
            **ff_cols,
            "wo": P("tp", None),
        }
        return {
            "tok_embed": P(),
            "rel_bias": P(),
            "blocks": [dict(block) for _ in range(c.depth)],
            "final_ln": P(),
        }

    def _rmsnorm(self, x: jax.Array, g: jax.Array) -> jax.Array:
        x32 = x.astype(jnp.float32)
        out = x32 * jax.lax.rsqrt(jnp.mean(x32**2, -1, keepdims=True) + self.config.ln_eps)
        return (out * g).astype(x.dtype)

    def _position_bias(self, params: dict, L: int) -> jax.Array:
        "(1, heads, L, L) additive score bias from the bucketed embedding."
        c = self.config
        pos = np.arange(L)
        buckets = _relative_position_bucket(pos[None, :] - pos[:, None], c.rel_buckets, c.rel_max_distance)
        return params["rel_bias"][jnp.asarray(buckets)].transpose(2, 0, 1)[None].astype(jnp.float32)

    def apply(self, params: dict, ids: jax.Array) -> jax.Array:
        "(B, L) int32 ids -> (B, L, dim) sequence features (f32)."
        c = self.config
        dtype = c.compute_dtype
        B, L = ids.shape
        bias = self._position_bias(params, L)

        h = params["tok_embed"][ids].astype(dtype)
        for block in params["blocks"]:
            # self-attention: T5 leaves scores unscaled (folded into q init)
            x = self._rmsnorm(h, block["ln_attn"])
            shape = (B, L, c.heads, c.head_dim)
            q = (x @ block["q"].astype(dtype)).reshape(shape)
            k = (x @ block["k"].astype(dtype)).reshape(shape)
            v = (x @ block["v"].astype(dtype)).reshape(shape)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) + bias
            attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32)
            h = h + (out.reshape(B, L, c.inner_dim).astype(dtype) @ block["o"].astype(dtype)).astype(dtype)

            # feed-forward (gated-gelu v1.1 or relu original)
            x = self._rmsnorm(h, block["ln_ff"])
            if c.gated:
                inner = jax.nn.gelu(x @ block["wi_0"].astype(dtype), approximate=True) * (
                    x @ block["wi_1"].astype(dtype)
                )
            else:
                inner = jax.nn.relu(x @ block["wi"].astype(dtype))
            h = h + (inner @ block["wo"].astype(dtype)).astype(dtype)

        return self._rmsnorm(h, params["final_ln"]).astype(jnp.float32)


def t5_encoder_forward_flops(config: T5EncoderConfig, batch: int, length: int) -> float:
    "Analytic matmul FLOPs of one forward."
    c = config
    qkvo = 2.0 * c.dim * c.inner_dim * 4
    ff = 2.0 * c.dim * c.ff_dim * (3 if c.gated else 2)
    attn = 4.0 * length * c.inner_dim
    return batch * length * c.depth * (qkvo + ff + attn)
