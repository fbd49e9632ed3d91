"""CLIP-class causal text encoder + byte tokenizer in pure JAX — the
prompt bridge for the text-conditioned stack.

The reference is a sampling library: conditioning features arrive from the
surrounding diffusers pipeline's text encoders (CLIP/T5 in the Flux / SD3
examples, `/root/reference/examples/diffusers/wrapper.py`).  A standalone
TPU framework has to ship that bridge itself, so this is the sixth model
family: a causal pre-LN transformer over byte-level tokens whose sequence
features drive :class:`MMDiT`'s ``context`` input and whose EOS-pooled
embedding is the CLIP-style global text vector.

Why byte-level tokens: a BPE vocabulary is a data artifact, not
architecture — shipping one would pin the framework to a specific
checkpoint's merges file.  Bytes (vocab 256 + BOS/EOS/PAD) make the
tokenizer a pure function with zero assets, cover all of UTF-8, and the
token count stays static (``max_tokens``) exactly as XLA wants.  A user
bringing pretrained BPE weights supplies their own ids; :meth:`TextEncoder
.apply` only sees int32 ids.

TPU design notes:

* Attention is a trace-time einsum with a causal mask: at 77-256 tokens
  the (L, L) score tensor is a few hundred KB — far below the flash
  kernel's crossover (same reasoning as the VideoDiT's (F, F) temporal
  scores).  Softmax statistics run in float32.
* All matmuls batched over (batch x tokens); compute in ``compute_dtype``
  (bfloat16 default) with float32 accumulation; layer norms in float32.
* ``param_spec`` is the megatron tp layout (qkv/mlp-in column-parallel,
  proj/mlp-out row-parallel; embeddings replicated) so the encoder shards
  on the same mesh as the MMDiT it feeds.
* Causality gives packing invariance for free: trailing PAD tokens cannot
  influence any earlier position, so the EOS-pooled vector is invariant to
  padding length (tested in ``tests/test_text_encoder.py``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .dit import _dense, _dense_init


class ByteTokenizer:
    """UTF-8 byte tokenizer: ids 0-255 are bytes, then BOS/EOS/PAD.

    ``encode`` emits the static layout ``[BOS, bytes..., EOS, PAD...]``
    truncated to ``length`` (EOS always present — truncation drops bytes,
    never the EOS the pooled embedding anchors on)."""

    BOS = 256
    EOS = 257
    PAD = 258
    vocab_size = 259

    def encode(self, text: str, length: int) -> np.ndarray:
        data = list(text.encode("utf-8"))[: length - 2]
        ids = [self.BOS, *data, self.EOS]
        ids += [self.PAD] * (length - len(ids))
        return np.asarray(ids, np.int32)

    def decode(self, ids: Any) -> str:
        data = bytes(int(i) for i in np.asarray(ids).ravel() if int(i) < 256)
        return data.decode("utf-8", errors="replace")

    def batch(self, texts: list[str], length: int) -> np.ndarray:
        return np.stack([self.encode(t, length) for t in texts])


@dataclass(frozen=True)
class TextEncoderConfig:
    vocab_size: int = ByteTokenizer.vocab_size
    dim: int = 512
    depth: int = 6
    heads: int = 8
    mlp_ratio: int = 4
    max_tokens: int = 128
    "Static sequence length; pair it with ``MMDiTConfig.context_tokens``."
    causal: bool = True
    compute_dtype: Any = jnp.bfloat16
    ln_affine: bool = False
    """Learnable LayerNorm scale/bias.  Off by default (adaLN-style plain
    norms); CLIP-family checkpoints need it on (``import_weights``)."""
    ln_eps: float = 1e-6
    act: str = "gelu_tanh"
    '``"gelu_tanh"`` (default), ``"gelu"`` (exact erf), or ``"quick_gelu"``.'
    eos_id: int | None = None
    "EOS token id for pooling; ``None`` uses :attr:`ByteTokenizer.EOS`."

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    @property
    def resolved_eos_id(self) -> int:
        return ByteTokenizer.EOS if self.eos_id is None else self.eos_id


_ACTIVATIONS = {
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
}


class TextEncoder:
    """Functional model: ``init`` -> params pytree, then
    ``apply(params, ids)`` -> (B, L, dim) sequence features for
    :class:`MMDiT`'s ``context``, or ``encode`` -> ``(features, pooled)``
    with the CLIP-style EOS-position pooled embedding."""

    def __init__(self, config: TextEncoderConfig = TextEncoderConfig()):
        self.config = config
        if config.dim % config.heads:
            raise ValueError("dim must divide by heads")
        if config.act not in _ACTIVATIONS:
            raise ValueError(f"unknown act {config.act!r}")

    def _ln_init(self) -> dict:
        c = self.config
        return {"g": jnp.ones((c.dim,), jnp.float32), "b": jnp.zeros((c.dim,), jnp.float32)}

    def init(self, key: jax.Array) -> dict:
        c = self.config
        keys = iter(jax.random.split(key, 4 + 4 * c.depth))
        params: dict = {
            "tok_embed": jax.random.normal(next(keys), (c.vocab_size, c.dim), jnp.float32) * 0.02,
            "pos_embed": jax.random.normal(next(keys), (c.max_tokens, c.dim), jnp.float32) * 0.01,
            "blocks": [
                {
                    "qkv": _dense_init(next(keys), c.dim, 3 * c.dim),
                    "proj": _dense_init(next(keys), c.dim, c.dim, scale=0.02 / math.sqrt(2 * c.depth)),
                    "mlp_in": _dense_init(next(keys), c.dim, c.mlp_ratio * c.dim),
                    "mlp_out": _dense_init(
                        next(keys), c.mlp_ratio * c.dim, c.dim, scale=0.02 / math.sqrt(2 * c.depth)
                    ),
                    **({"ln1": self._ln_init(), "ln2": self._ln_init()} if c.ln_affine else {}),
                }
                for _ in range(c.depth)
            ],
            "text_proj": _dense_init(next(keys), c.dim, c.dim),
        }
        if c.ln_affine:
            params["final_ln"] = self._ln_init()
        return params

    def _ln(self, x: jax.Array, p: dict | None) -> jax.Array:
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + self.config.ln_eps)
        if p is not None:
            out = out * p["g"] + p["b"]
        return out.astype(x.dtype)

    def param_spec(self, quantized: bool = False) -> dict:
        "Tensor-parallel PartitionSpecs over mesh axis 'tp'."
        col = {"w": P(None, "tp"), "b": P("tp")}
        row = {"w": P("tp", None), "b": P()}
        rep = {"w": P(), "b": P()}
        if quantized:
            col = {"w_q": {"q": P(None, "tp"), "s": P("tp")}, "b": P("tp")}
            row = {"w_q": {"q": P("tp", None), "s": P()}, "b": P()}
        ln = {"g": P(), "b": P()}
        affine = self.config.ln_affine
        spec: dict = {
            "tok_embed": P(),
            "pos_embed": P(),
            "blocks": [
                {
                    "qkv": dict(col),
                    "proj": dict(row),
                    "mlp_in": dict(col),
                    "mlp_out": dict(row),
                    **({"ln1": dict(ln), "ln2": dict(ln)} if affine else {}),
                }
                for _ in range(self.config.depth)
            ],
            "text_proj": rep,
        }
        if affine:
            spec["final_ln"] = dict(ln)
        return spec

    def _attention(self, qkv: jax.Array) -> jax.Array:
        c = self.config
        B, L, _ = qkv.shape
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = (B, L, c.heads, c.head_dim)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q.reshape(shape), k.reshape(shape), preferred_element_type=jnp.float32
        ) / math.sqrt(c.head_dim)
        if c.causal:
            mask = jnp.tril(jnp.ones((L, L), bool))
            scores = jnp.where(mask, scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1).astype(qkv.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v.reshape(shape), preferred_element_type=jnp.float32)
        return out.reshape(B, L, c.dim).astype(qkv.dtype)

    def _tower(self, params: dict, ids: jax.Array, capture_skip: int = 0):
        """One pass through the blocks.  Returns ``(final, captured)``:
        the final-LN'd states, plus (when ``capture_skip > 0``) the RAW
        hidden state ``capture_skip`` blocks early — transformers'
        ``hidden_states[-(capture_skip+1)]``."""
        c = self.config
        dtype = c.compute_dtype
        L = ids.shape[-1]
        if L > c.max_tokens:
            raise ValueError(f"sequence length {L} > max_tokens {c.max_tokens}")

        act = _ACTIVATIONS[c.act]
        blocks = params["blocks"]
        h = (params["tok_embed"][ids] + params["pos_embed"][:L]).astype(dtype)
        captured = None
        for i, block in enumerate(blocks):
            if capture_skip and i == len(blocks) - capture_skip:
                captured = h
            norm = self._ln(h, block.get("ln1"))
            h = h + _dense(block["proj"], self._attention(_dense(block["qkv"], norm, dtype)), dtype)
            norm = self._ln(h, block.get("ln2"))
            h = h + _dense(block["mlp_out"], act(_dense(block["mlp_in"], norm, dtype)), dtype)
        return self._ln(h, params.get("final_ln")).astype(jnp.float32), (
            None if captured is None else captured.astype(jnp.float32)
        )

    def apply(self, params: dict, ids: jax.Array, layer_skip: int = 0) -> jax.Array:
        """(B, L) int32 ids -> (B, L, dim) sequence features (final-LN'd, f32).

        ``layer_skip=k`` stops k blocks early and returns the RAW hidden
        state (no final LN) — transformers' ``hidden_states[-(k+1)]``.  SD3
        conditions on the penultimate CLIP states (``layer_skip=1``, the
        "clip skip" convention) while pooling from the full tower."""
        final, captured = self._tower(params, ids, capture_skip=layer_skip)
        return captured if layer_skip else final

    def encode(
        self, params: dict, ids: jax.Array, layer_skip: int = 0
    ) -> tuple[jax.Array, jax.Array]:
        """ids -> ``(features, pooled)``: the (B, L, dim) sequence features
        plus the (B, dim) text-projected feature at each row's EOS position
        (first occurrence; the CLIP pooling convention).  ``layer_skip=k``
        returns the RAW states k blocks early as the features while pooling
        from the FULL tower — the SD3/SDXL conditioning recipe, in ONE
        forward instead of two."""
        final, captured = self._tower(params, ids, capture_skip=layer_skip)
        eos_idx = jnp.argmax(ids == self.config.resolved_eos_id, axis=-1)
        at_eos = jnp.take_along_axis(final, eos_idx[:, None, None], axis=1)[:, 0]
        pooled = _dense(params["text_proj"], at_eos.astype(self.config.compute_dtype), self.config.compute_dtype)
        return (captured if layer_skip else final), pooled.astype(jnp.float32)

    def quantize_params(self, params: dict) -> dict:
        "Int8 serving tree, same recipe as :meth:`DiT.quantize_params`."
        from ..ops.quant import quantize_params

        return quantize_params(params, exclude=frozenset({"tok_embed", "pos_embed", "text_proj"}))


def text_encoder_forward_flops(config: TextEncoderConfig, batch: int, length: int) -> float:
    "Analytic matmul FLOPs of one forward."
    c = config
    d = c.dim
    per_token = c.depth * d * d * (6 + 2 + 4 * c.mlp_ratio)
    attn = 4.0 * c.depth * length * length * d
    return batch * (length * per_token + attn + 2.0 * d * d)
