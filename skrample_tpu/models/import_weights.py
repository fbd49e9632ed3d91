"""Pretrained-checkpoint import: map HuggingFace state dicts onto this
framework's parameter pytrees.

The reference library never touches weights — the surrounding diffusers
pipeline loads them (`/root/reference/examples/diffusers/wrapper.py` calls
``DiffusionPipeline.from_pretrained``).  A standalone framework has to let
users bring those checkpoints along, so this module translates the
published naming conventions into our layouts.  The CLIP text path is
verified end-to-end against ``transformers.CLIPTextModel`` in
``tests/test_import_weights.py`` (same random weights, features equal).

Layout rules:

* torch ``nn.Linear`` stores ``(out, in)``; our ``_dense`` computes
  ``x @ w`` with ``w`` as ``(in, out)`` — every weight transposes.
* our attention uses ONE fused qkv matmul; q/k/v projections concatenate
  along the output axis (matching the ``jnp.split(qkv, 3, -1)`` order).
* everything lands as float32 numpy -> jnp; cast/shard afterwards.

Only ``numpy`` is required here: tensors are pulled out of the state dict
with ``np.asarray`` (works for torch tensors without importing torch).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from .t5_encoder import T5Encoder, T5EncoderConfig
from .text_encoder import TextEncoder, TextEncoderConfig


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor, torch not imported here
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _linear(sd: Mapping[str, Any], prefix: str) -> dict:
    "torch nn.Linear -> our _dense params ((in, out) weight + bias)."
    return {"w": jnp.asarray(_np(sd[f"{prefix}.weight"]).T), "b": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _ln(sd: Mapping[str, Any], prefix: str) -> dict:
    return {"g": jnp.asarray(_np(sd[f"{prefix}.weight"])), "b": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def clip_text_config(hf_config: Any) -> TextEncoderConfig:
    "``transformers.CLIPTextConfig`` -> :class:`TextEncoderConfig`."
    dim = hf_config.hidden_size
    if hf_config.intermediate_size % dim:
        raise ValueError("intermediate_size must be a multiple of hidden_size")
    act = {"quick_gelu": "quick_gelu", "gelu": "gelu", "gelu_new": "gelu_tanh"}.get(hf_config.hidden_act)
    if act is None:
        raise ValueError(f"unsupported hidden_act {hf_config.hidden_act!r}")
    return TextEncoderConfig(
        vocab_size=hf_config.vocab_size,
        dim=dim,
        depth=hf_config.num_hidden_layers,
        heads=hf_config.num_attention_heads,
        mlp_ratio=hf_config.intermediate_size // dim,
        max_tokens=hf_config.max_position_embeddings,
        causal=True,
        compute_dtype=jnp.float32,
        ln_affine=True,
        ln_eps=float(getattr(hf_config, "layer_norm_eps", 1e-5)),
        act=act,
        eos_id=int(getattr(hf_config, "eos_token_id", 2)),
    )


def clip_text_encoder(source: Any) -> tuple[TextEncoder, dict]:
    """Import a CLIP text tower: ``transformers.CLIPTextModel`` /
    ``CLIPTextModelWithProjection`` (or any object with ``.config`` and
    ``.state_dict()``), or a ``(state_dict, hf_config)`` pair.

    Returns ``(TextEncoder, params)`` such that ``encoder.apply(params,
    ids)`` equals the HF model's ``last_hidden_state`` and the EOS-gathered
    feature equals ``pooler_output`` (float32, last-ulp).  With-projection
    checkpoints also fill ``text_proj`` so :meth:`TextEncoder.encode`'s
    pooled output matches ``text_embeds``."""
    if isinstance(source, tuple):
        sd, hf_config = source
    else:
        sd, hf_config = source.state_dict(), source.config
    config = clip_text_config(hf_config)
    enc = TextEncoder(config)

    pre = "text_model."
    params: dict = {
        "tok_embed": jnp.asarray(_np(sd[f"{pre}embeddings.token_embedding.weight"])),
        "pos_embed": jnp.asarray(_np(sd[f"{pre}embeddings.position_embedding.weight"])),
        "final_ln": _ln(sd, f"{pre}final_layer_norm"),
        "blocks": [],
    }
    for i in range(config.depth):
        layer = f"{pre}encoder.layers.{i}"
        q = _linear(sd, f"{layer}.self_attn.q_proj")
        k = _linear(sd, f"{layer}.self_attn.k_proj")
        v = _linear(sd, f"{layer}.self_attn.v_proj")
        params["blocks"].append(
            {
                "qkv": {
                    "w": jnp.concatenate([q["w"], k["w"], v["w"]], axis=1),
                    "b": jnp.concatenate([q["b"], k["b"], v["b"]]),
                },
                "proj": _linear(sd, f"{layer}.self_attn.out_proj"),
                "mlp_in": _linear(sd, f"{layer}.mlp.fc1"),
                "mlp_out": _linear(sd, f"{layer}.mlp.fc2"),
                "ln1": _ln(sd, f"{layer}.layer_norm1"),
                "ln2": _ln(sd, f"{layer}.layer_norm2"),
            }
        )

    if "text_projection.weight" in sd:  # CLIPTextModelWithProjection (no bias)
        w = jnp.asarray(_np(sd["text_projection.weight"]).T)
        params["text_proj"] = {"w": w, "b": jnp.zeros((w.shape[1],), jnp.float32)}
    else:  # pooled output is the bare EOS feature
        params["text_proj"] = {
            "w": jnp.eye(config.dim, dtype=jnp.float32),
            "b": jnp.zeros((config.dim,), jnp.float32),
        }
    return enc, params


def t5_config(hf_config: Any) -> T5EncoderConfig:
    "``transformers.T5Config`` -> :class:`T5EncoderConfig`."
    proj = hf_config.feed_forward_proj
    if proj not in ("relu", "gated-gelu"):
        raise ValueError(f"unsupported feed_forward_proj {proj!r}")
    return T5EncoderConfig(
        vocab_size=hf_config.vocab_size,
        dim=hf_config.d_model,
        head_dim=hf_config.d_kv,
        heads=hf_config.num_heads,
        ff_dim=hf_config.d_ff,
        depth=hf_config.num_layers,
        gated=proj == "gated-gelu",
        rel_buckets=hf_config.relative_attention_num_buckets,
        rel_max_distance=getattr(hf_config, "relative_attention_max_distance", 128),
        ln_eps=float(hf_config.layer_norm_epsilon),
        compute_dtype=jnp.float32,
    )


def t5_encoder(source: Any) -> tuple[T5Encoder, dict]:
    """Import a T5 encoder tower: ``transformers.T5EncoderModel`` (or any
    object with ``.config``/``.state_dict()``), or a ``(state_dict,
    hf_config)`` pair.  Returns ``(T5Encoder, params)`` such that
    ``apply(params, ids)`` equals the HF model's ``last_hidden_state``."""
    if isinstance(source, tuple):
        sd, hf_config = source
    else:
        sd, hf_config = source.state_dict(), source.config
    config = t5_config(hf_config)

    def w(key: str) -> jnp.ndarray:  # torch Linear (out, in) -> ours (in, out)
        return jnp.asarray(_np(sd[key]).T)

    blocks = []
    for i in range(config.depth):
        attn = f"encoder.block.{i}.layer.0"
        ff = f"encoder.block.{i}.layer.1"
        mlp_key = "DenseReluDense"
        gates = (
            {"wi_0": w(f"{ff}.{mlp_key}.wi_0.weight"), "wi_1": w(f"{ff}.{mlp_key}.wi_1.weight")}
            if config.gated
            else {"wi": w(f"{ff}.{mlp_key}.wi.weight")}
        )
        blocks.append(
            {
                "q": w(f"{attn}.SelfAttention.q.weight"),
                "k": w(f"{attn}.SelfAttention.k.weight"),
                "v": w(f"{attn}.SelfAttention.v.weight"),
                "o": w(f"{attn}.SelfAttention.o.weight"),
                "ln_attn": jnp.asarray(_np(sd[f"{attn}.layer_norm.weight"])),
                "ln_ff": jnp.asarray(_np(sd[f"{ff}.layer_norm.weight"])),
                **gates,
                "wo": w(f"{ff}.{mlp_key}.wo.weight"),
            }
        )
    params = {
        "tok_embed": jnp.asarray(_np(sd["shared.weight"])),
        # (buckets, heads): HF stores an nn.Embedding the same way
        "rel_bias": jnp.asarray(_np(sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"])),
        "blocks": blocks,
        "final_ln": jnp.asarray(_np(sd["encoder.final_layer_norm.weight"])),
    }
    return T5Encoder(config), params
