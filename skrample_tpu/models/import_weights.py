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

from .flux import Flux, FluxConfig
from .mmdit import MMDiT, MMDiTConfig
from .t5_encoder import T5Encoder, T5EncoderConfig
from .text_encoder import TextEncoder, TextEncoderConfig
from .unet_cond import CondUNet, CondUNetConfig
from .vae import VAE, VAEConfig


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor, torch not imported here
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _linear(sd: Mapping[str, Any], prefix: str) -> dict:
    "torch nn.Linear -> our _dense params ((in, out) weight + bias)."
    return {"w": jnp.asarray(_np(sd[f"{prefix}.weight"]).T), "b": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _ln(sd: Mapping[str, Any], prefix: str) -> dict:
    return {"g": jnp.asarray(_np(sd[f"{prefix}.weight"])), "b": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _getter(hf_config: Any):
    "Uniform key access over dict-like and attribute-style HF configs."
    if isinstance(hf_config, Mapping):
        return lambda k, d=None: hf_config.get(k, d)
    return lambda k, d=None: getattr(hf_config, k, d)


def _conv_params(sd: Mapping[str, Any], prefix: str) -> dict:
    "torch Conv2d -> our conv params (OIHW weight kept as-is)."
    return {"w": jnp.asarray(_np(sd[f"{prefix}.weight"])), "b": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _mat(sd: Mapping[str, Any], key: str) -> np.ndarray:
    "A matmul weight: Linear (out, in) or a legacy 1x1 conv (out, in, 1, 1)."
    w = _np(sd[key])
    return w.reshape(w.shape[0], w.shape[1]) if w.ndim == 4 else w


def _fused(sd: Mapping[str, Any], prefixes: tuple[str, ...]) -> dict:
    """Concatenate several torch projections into ONE of our dense matmuls
    (q/k/v -> qkv, k/v -> kv), transposing to (in, out).  Bias-free torch
    projections contribute zeros."""
    return {
        "w": jnp.asarray(np.concatenate([_mat(sd, f"{p}.weight").T for p in prefixes], axis=1)),
        "b": jnp.concatenate(
            [
                jnp.asarray(
                    _np(sd[f"{p}.bias"]) if f"{p}.bias" in sd else np.zeros(_mat(sd, f"{p}.weight").shape[0])
                )
                for p in prefixes
            ]
        ),
    }


def merge_lora(
    state_dict: Mapping[str, Any],
    lora_sd: Mapping[str, Any],
    scale: float = 1.0,
    prefix: str | None = None,
) -> dict[str, np.ndarray]:
    """Merge diffusers/PEFT-format LoRA weights into a base state dict
    BEFORE import: ``W' = W + scale * (alpha / r) * B @ A``.

    Working on the raw state dict makes this architecture-agnostic — the
    merged dict feeds any importer (``sd3_mmdit``, ``flux_transformer``,
    ``diffusers_unet``, ``diffusers_vae``, ...) unchanged, and the fused
    qkv/kv layouts never need LoRA-aware slicing.

    Conventions handled: ``{base}.lora_A.weight`` / ``{base}.lora_B.weight``
    (PEFT), ``{base}.lora.down.weight`` / ``{base}.lora.up.weight``
    (diffusers legacy), and kohya/civitai files — ``lora_down``/``lora_up``
    markers with UNDERSCORED module paths (``lora_unet_down_blocks_0_...``),
    resolved unambiguously by matching against the base dict's own keys;
    optional ``{base}.alpha`` scalars (defaults to the rank, i.e. a factor
    of 1); 1x1-conv adapters stored 4-D.  ``prefix`` strips a leading
    namespace (e.g. ``"transformer"``, ``"unet"``, or kohya's
    ``"lora_unet"``).  Unmatched LoRA pairs raise — a typo'd key silently
    doing nothing is how wrong images happen."""
    merged = {k: _np(v) for k, v in state_dict.items()}
    # kohya writes module paths with "_" where the checkpoint has "." —
    # exact-match the underscored form of every real key to invert it
    underscored = {
        k[: -len(".weight")].replace(".", "_"): k[: -len(".weight")]
        for k in merged
        if k.endswith(".weight")
    }
    pairs: dict[str, dict[str, np.ndarray]] = {}
    alphas: dict[str, float] = {}
    for key, value in lora_sd.items():
        name = key
        if prefix:
            for sep in (".", "_"):
                if name.startswith(prefix + sep):
                    name = name[len(prefix) + 1 :]
                    break
        if name.endswith(".alpha"):
            alphas[underscored.get(n := name[: -len(".alpha")], n)] = float(_np(value))
            continue
        for marker, role in (
            (".lora_A.weight", "down"),
            (".lora_B.weight", "up"),
            (".lora.down.weight", "down"),
            (".lora.up.weight", "up"),
            (".lora_down.weight", "down"),  # kohya
            (".lora_up.weight", "up"),
        ):
            if name.endswith(marker):
                base = name[: -len(marker)]
                pairs.setdefault(underscored.get(base, base), {})[role] = _np(value)
                break
        else:
            raise ValueError(f"unrecognized LoRA key {key!r}")

    for base, pair in pairs.items():
        if set(pair) != {"down", "up"}:
            raise ValueError(f"LoRA pair for {base!r} is incomplete ({sorted(pair)})")
        target = f"{base}.weight"
        if target not in merged:
            raise ValueError(f"LoRA targets {target!r}, which the base state dict doesn't have")
        down, up = pair["down"], pair["up"]
        conv = down.ndim == 4
        if conv:  # 1x1-conv adapters: (r, in, 1, 1) x (out, r, 1, 1)
            down = down.reshape(down.shape[0], down.shape[1])
            up = up.reshape(up.shape[0], up.shape[1])
        rank = down.shape[0]
        factor = scale * alphas.get(base, float(rank)) / rank
        delta = (up @ down) * factor
        w = merged[target]
        merged[target] = w + (delta.reshape(w.shape) if conv else delta.astype(w.dtype))
    return merged


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


def vae_config(hf_config: Any) -> VAEConfig:
    """``diffusers.AutoencoderKL`` config -> :class:`VAEConfig`.

    Our width ladder is ``base * min(2**level, 4)`` (the SD family's
    (128, 256, 512, 512) shape); arbitrary ``block_out_channels`` that
    don't fit it are rejected rather than silently mis-mapped."""
    get = _getter(hf_config)

    widths = tuple(get("block_out_channels"))
    base, levels = widths[0], len(widths)
    expected = tuple(base * min(2**level, 4) for level in range(levels))
    if widths != expected:
        raise ValueError(f"block_out_channels {widths} doesn't fit the base*min(2^l,4) ladder {expected}")
    if get("act_fn", "silu") != "silu":
        raise ValueError(f"unsupported act_fn {get('act_fn')!r}")
    if get("in_channels", 3) != get("out_channels", 3):
        raise ValueError("in_channels != out_channels")
    for bt, want in (("down_block_types", "DownEncoderBlock2D"), ("up_block_types", "UpDecoderBlock2D")):
        types = get(bt)
        if types is not None and any(t != want for t in types):
            raise ValueError(f"unsupported {bt} {tuple(types)}")
    return VAEConfig(
        channels=get("in_channels", 3),
        latent_channels=get("latent_channels", 4),
        base=base,
        levels=levels,
        blocks_per_level=get("layers_per_block", 2),
        groups=get("norm_num_groups", 32),
        scaling_factor=float(get("scaling_factor", 0.18215)),
        shift_factor=float(get("shift_factor") or 0.0),
        compute_dtype=jnp.float32,
        norm_affine=True,
        quant_convs=bool(get("use_quant_conv", True)),
    )


class _TrackedSD:
    "State-dict view that records consumed keys so leftovers surface as errors."

    def __init__(self, sd: Mapping[str, Any]):
        self.sd = dict(sd)
        self.used: set[str] = set()

    def __getitem__(self, key: str) -> Any:
        self.used.add(key)
        return self.sd[key]

    def __contains__(self, key: str) -> bool:
        return key in self.sd

    def leftovers(self) -> list[str]:
        return sorted(set(self.sd) - self.used)


def diffusers_vae(source: Any) -> tuple[VAE, dict]:
    """Import a ``diffusers.AutoencoderKL`` (or any object with ``.config``
    and ``.state_dict()``, or a ``(state_dict, config)`` pair) into
    ``(VAE, params)``.

    Verified against an independently written torch mirror of the published
    AutoencoderKL architecture in ``tests/test_import_weights.py`` (diffusers
    itself is not installable in-sandbox): posterior moments and decode match
    in float32.  Every state-dict tensor must be consumed — unmapped keys
    raise, so renamed/reshaped checkpoints fail loudly instead of silently
    dropping weights.  Supports both the modern attention naming
    (``to_q``/``to_out.0``) and the legacy one (``query``/``proj_attn``,
    possibly stored as 1x1 convs)."""
    if isinstance(source, tuple):
        raw_sd, hf_config = source
    else:
        raw_sd, hf_config = source.state_dict(), source.config
    config = vae_config(hf_config)
    sd = _TrackedSD(raw_sd)

    def conv(prefix: str) -> dict:
        return _conv_params(sd, prefix)

    def resblock(prefix: str) -> dict:
        return {
            "conv1": conv(f"{prefix}.conv1"),
            "conv2": conv(f"{prefix}.conv2"),
            "skip": conv(f"{prefix}.conv_shortcut") if f"{prefix}.conv_shortcut.weight" in sd else None,
            "norm1": _ln(sd, f"{prefix}.norm1"),
            "norm2": _ln(sd, f"{prefix}.norm2"),
        }

    def attention(prefix: str) -> dict:
        modern = f"{prefix}.to_q.weight" in sd
        q, k, v = (
            (f"{prefix}.to_q", f"{prefix}.to_k", f"{prefix}.to_v")
            if modern
            else (f"{prefix}.query", f"{prefix}.key", f"{prefix}.value")
        )
        out = f"{prefix}.to_out.0" if modern else f"{prefix}.proj_attn"
        return {
            "qkv": _fused(sd, (q, k, v)),
            "proj": _fused(sd, (out,)),
            "norm": _ln(sd, f"{prefix}.group_norm"),
        }

    def mid(prefix: str) -> dict:
        return {
            "mid1": resblock(f"{prefix}.resnets.0"),
            "mid_attn": attention(f"{prefix}.attentions.0"),
            "mid2": resblock(f"{prefix}.resnets.1"),
        }

    enc: dict = {"in_conv": conv("encoder.conv_in"), "down": [], **mid("encoder.mid_block")}
    for i in range(config.levels):
        block = f"encoder.down_blocks.{i}"
        down = f"{block}.downsamplers.0.conv"
        enc["down"].append(
            {
                "blocks": [resblock(f"{block}.resnets.{j}") for j in range(config.blocks_per_level)],
                "downsample": conv(down) if f"{down}.weight" in sd else None,
            }
        )
    enc["norm_out"] = _ln(sd, "encoder.conv_norm_out")
    enc["out_conv"] = conv("encoder.conv_out")

    dec: dict = {"in_conv": conv("decoder.conv_in"), "up": [], **mid("decoder.mid_block")}
    for i in range(config.levels):  # up_blocks[0] is the coarsest level, like our dec["up"][0]
        block = f"decoder.up_blocks.{i}"
        up = f"{block}.upsamplers.0.conv"
        dec["up"].append(
            {
                "blocks": [resblock(f"{block}.resnets.{j}") for j in range(config.blocks_per_level + 1)],
                "upsample": conv(up) if f"{up}.weight" in sd else None,
            }
        )
    dec["norm_out"] = _ln(sd, "decoder.conv_norm_out")
    dec["out_conv"] = conv("decoder.conv_out")

    if config.quant_convs:
        enc["quant_conv"] = conv("quant_conv")
        dec["post_quant_conv"] = conv("post_quant_conv")

    if leftover := sd.leftovers():
        raise ValueError(f"unmapped state-dict keys (first 10): {leftover[:10]}")
    return VAE(config), {"encoder": enc, "decoder": dec}


def mmdit_config(hf_config: Any) -> MMDiTConfig:
    """``diffusers.SD3Transformer2DModel`` config -> :class:`MMDiTConfig`
    (the SD3 wiring: dedicated pooled input, cropped pos-embed table,
    pre-only final text stream).  The whole family maps: SD3-medium (2B),
    SD3.5-large (qk RMS-norm), and SD3.5-medium (dual attention layers)."""
    get = _getter(hf_config)

    heads = get("num_attention_heads")
    dim = heads * get("attention_head_dim")
    if get("caption_projection_dim", dim) != dim:
        raise ValueError("caption_projection_dim != heads * attention_head_dim")
    if get("out_channels", get("in_channels")) != get("in_channels"):
        raise ValueError("in_channels != out_channels")
    if get("qk_norm") not in (None, "rms_norm"):
        raise ValueError(f"unsupported qk_norm {get('qk_norm')!r}")
    return MMDiTConfig(
        patch=get("patch_size", 2),
        channels=get("in_channels", 16),
        dim=dim,
        depth=get("num_layers"),
        heads=heads,
        context_dim=get("joint_attention_dim", 4096),
        pooled_dim=get("pooled_projection_dim", 2048),
        pos_embed_max=get("pos_embed_max_size", 192),
        final_txt_pre_only=True,
        qk_norm=get("qk_norm") == "rms_norm",
        dual_attention_layers=tuple(get("dual_attention_layers") or ()),
        compute_dtype=jnp.float32,
    )


def sd3_mmdit(source: Any) -> tuple[MMDiT, dict]:
    """Import a ``diffusers.SD3Transformer2DModel`` (or a ``(state_dict,
    config)`` pair) into ``(MMDiT, params)``.

    Verified against an independently written torch mirror of the published
    MMDiT architecture (arXiv 2403.03206 / the SD3 release) in
    ``tests/test_import_weights.py``.  Layout translations beyond the usual
    linear transpose:

    * q/k/v (and add_*_proj) fuse into our single qkv matmul,
    * adaLN-zero rows reorder from [shift, scale, gate] x (attn, mlp) to
      our [shift, gate, scale] grouping; the 2-parameter heads
      (``norm1_context`` of the final block, ``norm_out``) swap
      [scale, shift] -> [shift, scale],
    * ``pos_embed.proj`` (a patch-stride conv) flattens to our patchify
      dense; ``proj_out`` permutes its per-patch feature order from
      (p, q, C) to our (C, p, q).

    Every state-dict tensor must be consumed — unmapped keys raise."""
    if isinstance(source, tuple):
        raw_sd, hf_config = source
    else:
        raw_sd, hf_config = source.state_dict(), source.config
    config = mmdit_config(hf_config)
    sd = _TrackedSD(raw_sd)
    d, p, C = config.dim, config.patch, config.channels

    def ada6(key: str, groups: int = 6) -> dict:
        w, b = _np(sd[f"{key}.weight"]), _np(sd[f"{key}.bias"])
        # [shift, scale, gate] x (attn, mlp[, attn2]) -> our [shift, gate, scale]
        perm = [0, 2, 1, 3, 5, 4, 6, 8, 7][:groups]
        w = np.concatenate([w[g * d : (g + 1) * d] for g in perm], axis=0)
        b = np.concatenate([b[g * d : (g + 1) * d] for g in perm], axis=0)
        return {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}

    def ada2(key: str) -> dict:
        w, b = _np(sd[f"{key}.weight"]), _np(sd[f"{key}.bias"])
        return {  # [scale, shift] -> [shift, scale]
            "w": jnp.asarray(np.concatenate([w[d:], w[:d]], axis=0).T),
            "b": jnp.asarray(np.concatenate([b[d:], b[:d]], axis=0)),
        }

    blocks = []
    for i in range(config.depth):
        blk = f"transformer_blocks.{i}"
        attn = f"{blk}.attn"
        dual = i in config.dual_attention_layers
        img = {
            "ada": ada6(f"{blk}.norm1.linear", groups=9 if dual else 6),
            "qkv": _fused(sd, (f"{attn}.to_q", f"{attn}.to_k", f"{attn}.to_v")),
            "proj": _linear(sd, f"{attn}.to_out.0"),
            "mlp_in": _linear(sd, f"{blk}.ff.net.0.proj"),
            "mlp_out": _linear(sd, f"{blk}.ff.net.2"),
        }
        if dual:
            attn2 = f"{blk}.attn2"
            img["qkv2"] = _fused(sd, (f"{attn2}.to_q", f"{attn2}.to_k", f"{attn2}.to_v"))
            img["proj2"] = _linear(sd, f"{attn2}.to_out.0")
            if config.qk_norm:
                img["q_norm2"] = jnp.asarray(_np(sd[f"{attn2}.norm_q.weight"]))
                img["k_norm2"] = jnp.asarray(_np(sd[f"{attn2}.norm_k.weight"]))
        txt_qkv = _fused(sd, (f"{attn}.add_q_proj", f"{attn}.add_k_proj", f"{attn}.add_v_proj"))
        if i == config.depth - 1:  # context_pre_only
            txt = {"ada": ada2(f"{blk}.norm1_context.linear"), "qkv": txt_qkv}
        else:
            txt = {
                "ada": ada6(f"{blk}.norm1_context.linear"),
                "qkv": txt_qkv,
                "proj": _linear(sd, f"{attn}.to_add_out"),
                "mlp_in": _linear(sd, f"{blk}.ff_context.net.0.proj"),
                "mlp_out": _linear(sd, f"{blk}.ff_context.net.2"),
            }
        if config.qk_norm:
            img["q_norm"] = jnp.asarray(_np(sd[f"{attn}.norm_q.weight"]))
            img["k_norm"] = jnp.asarray(_np(sd[f"{attn}.norm_k.weight"]))
            txt["q_norm"] = jnp.asarray(_np(sd[f"{attn}.norm_added_q.weight"]))
            txt["k_norm"] = jnp.asarray(_np(sd[f"{attn}.norm_added_k.weight"]))
        blocks.append({"img": img, "txt": txt})

    # patch conv (dim, C, p, p) contracts the same (C, ph, pw) feature order
    # our patchify emits, so it flattens straight into the dense weight
    patch_w = _np(sd["pos_embed.proj.weight"]).reshape(d, C * p * p)
    # proj_out (p*p*C, dim) is laid out (ph, pw, C); ours is (C, ph, pw)
    out_w = _np(sd["proj_out.weight"]).reshape(p, p, C, d).transpose(2, 0, 1, 3).reshape(C * p * p, d)
    out_b = _np(sd["proj_out.bias"]).reshape(p, p, C).transpose(2, 0, 1).reshape(C * p * p)
    params = {
        "patch_in": {"w": jnp.asarray(patch_w.T), "b": jnp.asarray(_np(sd["pos_embed.proj.bias"]))},
        "pos_embed": jnp.asarray(_np(sd["pos_embed.pos_embed"])[0]),
        "ctx_in": _linear(sd, "context_embedder"),
        "t_mlp1": _linear(sd, "time_text_embed.timestep_embedder.linear_1"),
        "t_mlp2": _linear(sd, "time_text_embed.timestep_embedder.linear_2"),
        "pool_mlp1": _linear(sd, "time_text_embed.text_embedder.linear_1"),
        "pool_mlp2": _linear(sd, "time_text_embed.text_embedder.linear_2"),
        "final_mod": ada2("norm_out.linear"),
        "final_out": {"w": jnp.asarray(out_w.T), "b": jnp.asarray(out_b)},
        "blocks": blocks,
    }
    if leftover := sd.leftovers():
        raise ValueError(f"unmapped state-dict keys (first 10): {leftover[:10]}")
    return MMDiT(config), params


def unet_config(hf_config: Any, time_ids: int = 6) -> CondUNetConfig:
    """``diffusers.UNet2DConditionModel`` config -> :class:`CondUNetConfig`.
    Covers the SD1.5 and SDXL shapes; exotic variants (class embeddings,
    encoder projections, non-default mid blocks) are rejected.

    ``time_ids`` is the micro-conditioning id count, which the HF config
    does not record — the pooled width is derived as
    ``projection_class_embeddings_input_dim - time_ids * addition_time_embed_dim``.
    SDXL-base uses 6; the SDXL refiner uses 5 (aesthetic-score
    conditioning), so pass ``time_ids=5`` for refiner-class checkpoints or
    the split lands at the wrong boundary."""
    get = _getter(hf_config)

    widths = tuple(get("block_out_channels"))
    levels = len(widths)
    down_types = tuple(get("down_block_types"))
    if len(down_types) != levels or any(
        t not in ("DownBlock2D", "CrossAttnDownBlock2D") for t in down_types
    ):
        raise ValueError(f"unsupported down_block_types {down_types}")
    tl = get("transformer_layers_per_block", 1)
    tl = tuple(tl) if isinstance(tl, (list, tuple)) else (tl,) * levels
    transformer_layers = tuple(
        tl[i] if down_types[i] == "CrossAttnDownBlock2D" else 0 for i in range(levels)
    )
    heads = get("attention_head_dim", 8)  # diffusers' legacy naming: this IS the head count
    heads = tuple(heads) if isinstance(heads, (list, tuple)) else (heads,) * levels
    if get("class_embed_type") is not None or get("encoder_hid_dim") is not None:
        raise ValueError("class/encoder-hid embeddings are not supported")
    if get("addition_embed_type") not in (None, "text_time"):
        raise ValueError(f"unsupported addition_embed_type {get('addition_embed_type')!r}")
    if get("resnet_time_scale_shift", "default") != "default":
        raise ValueError("only the default resnet time-embedding injection is supported")
    if not get("flip_sin_to_cos", True) or get("freq_shift", 0) != 0:
        raise ValueError("only the flip_sin_to_cos=True, freq_shift=0 timestep embedding is supported")
    if get("mid_block_type", "UNetMidBlock2DCrossAttn") != "UNetMidBlock2DCrossAttn":
        raise ValueError(f"unsupported mid_block_type {get('mid_block_type')!r}")
    up_types = get("up_block_types")
    want_up = tuple(
        "CrossAttnUpBlock2D" if t == "CrossAttnDownBlock2D" else "UpBlock2D" for t in reversed(down_types)
    )
    if up_types is not None and tuple(up_types) != want_up:
        raise ValueError(f"up_block_types {tuple(up_types)} don't mirror the down path {want_up}")

    pooled_dim = 0
    add_dim = get("addition_time_embed_dim") or 256
    if get("addition_embed_type") == "text_time":
        proj_in = get("projection_class_embeddings_input_dim")
        pooled_dim = proj_in - time_ids * add_dim
        if pooled_dim <= 0:
            raise ValueError(f"projection_class_embeddings_input_dim {proj_in} too small")
    return CondUNetConfig(
        channels=get("in_channels", 4),
        widths=widths,
        layers_per_block=get("layers_per_block", 2),
        transformer_layers=transformer_layers,
        # the published mid block takes the RAW per-block count (SD1.5's
        # last down level is plain yet the mid block carries attention)
        mid_transformer_layers=tl[-1],
        heads=heads,
        context_dim=get("cross_attention_dim", 768),
        pooled_dim=pooled_dim,
        time_ids=time_ids,
        add_time_embed_dim=add_dim,
        groups=get("norm_num_groups", 32),
        compute_dtype=jnp.float32,
    )


def _unet_mappers(sd: "_TrackedSD"):
    "State-dict -> param-dict closures shared by the UNet and ControlNet importers."

    def conv(prefix: str) -> dict:
        return _conv_params(sd, prefix)

    def lin(prefix: str) -> dict:  # tolerates 1x1-conv storage (SD1.5 projections)
        return {"w": jnp.asarray(_mat(sd, f"{prefix}.weight").T), "b": jnp.asarray(_np(sd[f"{prefix}.bias"]))}

    def resnet(prefix: str) -> dict:
        return {
            "norm1": _ln(sd, f"{prefix}.norm1"),
            "conv1": conv(f"{prefix}.conv1"),
            "temb": lin(f"{prefix}.time_emb_proj"),
            "norm2": _ln(sd, f"{prefix}.norm2"),
            "conv2": conv(f"{prefix}.conv2"),
            "skip": conv(f"{prefix}.conv_shortcut") if f"{prefix}.conv_shortcut.weight" in sd else None,
        }

    def basic(prefix: str) -> dict:
        a1, a2 = f"{prefix}.attn1", f"{prefix}.attn2"
        return {
            "ln1": _ln(sd, f"{prefix}.norm1"),
            "attn1_qkv": _fused(sd, (f"{a1}.to_q", f"{a1}.to_k", f"{a1}.to_v")),
            "attn1_out": lin(f"{a1}.to_out.0"),
            "ln2": _ln(sd, f"{prefix}.norm2"),
            "attn2_q": _fused(sd, (f"{a2}.to_q",)),
            "attn2_kv": _fused(sd, (f"{a2}.to_k", f"{a2}.to_v")),
            "attn2_out": lin(f"{a2}.to_out.0"),
            "ln3": _ln(sd, f"{prefix}.norm3"),
            "ff_in": lin(f"{prefix}.ff.net.0.proj"),
            "ff_out": lin(f"{prefix}.ff.net.2"),
        }

    def transformer(prefix: str, depth: int) -> dict:
        return {
            "norm": _ln(sd, f"{prefix}.norm"),
            "proj_in": lin(f"{prefix}.proj_in"),
            "blocks": [basic(f"{prefix}.transformer_blocks.{k}") for k in range(depth)],
            "proj_out": lin(f"{prefix}.proj_out"),
        }

    return conv, lin, resnet, transformer


def _unet_encoder_params(sd: "_TrackedSD", config: CondUNetConfig) -> dict:
    "conv_in + time/text_time conditioning + down path + mid — shared with ControlNet."
    conv, lin, resnet, transformer = _unet_mappers(sd)
    down = []
    for i in range(config.levels):
        blk = f"down_blocks.{i}"
        depth = config.transformer_layers[i]
        ds = f"{blk}.downsamplers.0.conv"
        down.append(
            {
                "resnets": [resnet(f"{blk}.resnets.{j}") for j in range(config.layers_per_block)],
                "attns": [
                    transformer(f"{blk}.attentions.{j}", depth) if depth else None
                    for j in range(config.layers_per_block)
                ],
                "downsample": conv(ds) if f"{ds}.weight" in sd else None,
            }
        )
    mid_depth = config.resolved_mid_layers
    mid = {
        "res1": resnet("mid_block.resnets.0"),
        "attn": transformer("mid_block.attentions.0", mid_depth) if mid_depth else None,
        "res2": resnet("mid_block.resnets.1"),
    }
    params = {
        "conv_in": conv("conv_in"),
        "t_mlp1": lin("time_embedding.linear_1"),
        "t_mlp2": lin("time_embedding.linear_2"),
        "down": down,
        "mid": mid,
    }
    if config.pooled_dim:
        params["add_mlp1"] = lin("add_embedding.linear_1")
        params["add_mlp2"] = lin("add_embedding.linear_2")
    return params


def diffusers_unet(source: Any, time_ids: int = 6) -> tuple[CondUNet, dict]:
    """Import a ``diffusers.UNet2DConditionModel`` (SD1.5 / SDXL families)
    into ``(CondUNet, params)``.  ``time_ids``: see :func:`unet_config`
    (pass 5 for SDXL-refiner-class checkpoints).

    Verified against an independently written torch mirror of the published
    architecture in ``tests/test_import_weights.py``: SDXL shape (added
    text_time conditioning, linear token projections) and SD1.5 shape
    (conv 1x1 projections — folded into the dense layout, order-equivalent
    for 1x1).  Self-attention q/k/v fuse into one matmul; cross-attention
    k/v fuse into one.  Every state-dict tensor must be consumed."""
    if isinstance(source, tuple):
        raw_sd, hf_config = source
    else:
        raw_sd, hf_config = source.state_dict(), source.config
    config = unet_config(hf_config, time_ids=time_ids)
    sd = _TrackedSD(raw_sd)

    params = _unet_encoder_params(sd, config)
    conv, lin, resnet, transformer = _unet_mappers(sd)

    up = []
    for idx in range(config.levels):
        i = config.levels - 1 - idx  # up_blocks[0] is the coarsest level
        blk = f"up_blocks.{idx}"
        depth = config.transformer_layers[i]
        us = f"{blk}.upsamplers.0.conv"
        up.append(
            {
                "resnets": [resnet(f"{blk}.resnets.{j}") for j in range(config.layers_per_block + 1)],
                "attns": [
                    transformer(f"{blk}.attentions.{j}", depth) if depth else None
                    for j in range(config.layers_per_block + 1)
                ],
                "upsample": conv(us) if f"{us}.weight" in sd else None,
            }
        )

    params["up"] = up
    params["norm_out"] = _ln(sd, "conv_norm_out")
    params["conv_out"] = conv("conv_out")

    if leftover := sd.leftovers():
        raise ValueError(f"unmapped state-dict keys (first 10): {leftover[:10]}")
    return CondUNet(config), params


def controlnet_config(hf_config: Any, time_ids: int = 6) -> "ControlNetConfig":
    """``diffusers.ControlNetModel`` config -> :class:`ControlNetConfig`.
    The encoder shape reuses :func:`unet_config` (a ControlNet is a copy of
    its base UNet's encoder), plus the conditioning-embedding ladder."""
    from .controlnet import ControlNetConfig

    get = _getter(hf_config)
    return ControlNetConfig(
        unet=unet_config(hf_config, time_ids=time_ids),
        cond_channels=get("conditioning_channels", 3),
        cond_embed_channels=tuple(get("conditioning_embedding_out_channels", (16, 32, 96, 256))),
    )


def diffusers_controlnet(source: Any, time_ids: int = 6) -> tuple["ControlNet", dict]:
    """Import a ``diffusers.ControlNetModel`` (SD1.x/SD2.x/SDXL families)
    into ``(ControlNet, params)``.

    The encoder mapping is :func:`diffusers_unet`'s (shared helper); on top
    come the conditioning-embedding conv ladder
    (``controlnet_cond_embedding``) and the zero 1x1 convs
    (``controlnet_down_blocks``/``controlnet_mid_block``).  Verified against
    an independently written torch mirror, including residual injection into
    the base UNet, in ``tests/test_import_weights.py``.  Every state-dict
    tensor must be consumed."""
    from .controlnet import ControlNet

    if isinstance(source, tuple):
        raw_sd, hf_config = source
    else:
        raw_sd, hf_config = source.state_dict(), source.config
    config = controlnet_config(hf_config, time_ids=time_ids)
    sd = _TrackedSD(raw_sd)

    params = _unet_encoder_params(sd, config.unet)
    ladder = config.cond_embed_channels
    params["cond_embed"] = {
        "conv_in": _conv_params(sd, "controlnet_cond_embedding.conv_in"),
        "blocks": [
            _conv_params(sd, f"controlnet_cond_embedding.blocks.{j}") for j in range(2 * (len(ladder) - 1))
        ],
        "conv_out": _conv_params(sd, "controlnet_cond_embedding.conv_out"),
    }
    n_skips = 1 + config.unet.levels * config.unet.layers_per_block + (config.unet.levels - 1)
    params["zero_down"] = [_conv_params(sd, f"controlnet_down_blocks.{i}") for i in range(n_skips)]
    params["zero_mid"] = _conv_params(sd, "controlnet_mid_block")

    if leftover := sd.leftovers():
        raise ValueError(f"unmapped state-dict keys (first 10): {leftover[:10]}")
    return ControlNet(config), params


def flux_config(hf_config: Any) -> FluxConfig:
    """``diffusers.FluxTransformer2DModel`` config -> :class:`FluxConfig`.
    The pipeline-level 2x2 latent packing (``in_channels=64`` packed) is
    folded into the model's own patchify, so ``channels`` is the unpacked
    latent width."""
    get = _getter(hf_config)

    heads = get("num_attention_heads")
    head_dim = get("attention_head_dim")
    patch = get("patch_size", 1)
    if patch != 1:
        raise ValueError("Flux checkpoints pack patches pipeline-side (patch_size=1 expected)")
    packed = get("in_channels", 64)
    if packed % 4:
        raise ValueError(f"in_channels {packed} is not a packed 2x2 width")
    rope = tuple(get("axes_dims_rope", (16, 56, 56)))
    if sum(rope) != head_dim:
        raise ValueError(f"axes_dims_rope {rope} must sum to attention_head_dim {head_dim}")
    return FluxConfig(
        patch=2,
        channels=packed // 4,
        dim=heads * head_dim,
        depth=get("num_layers"),
        single_depth=get("num_single_layers"),
        heads=heads,
        context_dim=get("joint_attention_dim", 4096),
        pooled_dim=get("pooled_projection_dim", 768),
        guidance=bool(get("guidance_embeds", False)),
        rope_axes=rope,
        compute_dtype=jnp.float32,
    )


def flux_transformer(source: Any) -> tuple[Flux, dict]:
    """Import a ``diffusers.FluxTransformer2DModel`` (or a ``(state_dict,
    config)`` pair) into ``(Flux, params)``.

    Verified against an independently written torch mirror of the published
    FLUX.1 architecture in ``tests/test_import_weights.py`` (RoPE tables,
    qk-norm, double + single streams, guidance embedding).  Same layout
    translations as :func:`sd3_mmdit` where shared (fused qkv, adaLN group
    permutations); the single blocks' 3-group modulation permutes
    [shift, scale, gate] -> our [shift, gate, scale], and ``proj_out``
    consumes ``[attn | mlp]`` exactly as published.  Every state-dict
    tensor must be consumed — unmapped keys raise."""
    if isinstance(source, tuple):
        raw_sd, hf_config = source
    else:
        raw_sd, hf_config = source.state_dict(), source.config
    config = flux_config(hf_config)
    sd = _TrackedSD(raw_sd)
    d = config.dim

    def perm_ada(key: str, order: list[int]) -> dict:
        w, b = _np(sd[f"{key}.weight"]), _np(sd[f"{key}.bias"])
        w = np.concatenate([w[g * d : (g + 1) * d] for g in order], axis=0)
        b = np.concatenate([b[g * d : (g + 1) * d] for g in order], axis=0)
        return {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}

    def two_layer(prefix: str) -> dict:
        return {"l1": _linear(sd, f"{prefix}.linear_1"), "l2": _linear(sd, f"{prefix}.linear_2")}

    def norm_scale(key: str) -> jnp.ndarray:
        return jnp.asarray(_np(sd[f"{key}.weight"]))

    double = []
    for i in range(config.depth):
        blk = f"transformer_blocks.{i}"
        attn = f"{blk}.attn"
        double.append(
            {
                "img": {
                    "ada": perm_ada(f"{blk}.norm1.linear", [0, 2, 1, 3, 5, 4]),
                    "qkv": _fused(sd, (f"{attn}.to_q", f"{attn}.to_k", f"{attn}.to_v")),
                    "q_norm": norm_scale(f"{attn}.norm_q"),
                    "k_norm": norm_scale(f"{attn}.norm_k"),
                    "proj": _linear(sd, f"{attn}.to_out.0"),
                    "mlp_in": _linear(sd, f"{blk}.ff.net.0.proj"),
                    "mlp_out": _linear(sd, f"{blk}.ff.net.2"),
                },
                "txt": {
                    "ada": perm_ada(f"{blk}.norm1_context.linear", [0, 2, 1, 3, 5, 4]),
                    "qkv": _fused(sd, (f"{attn}.add_q_proj", f"{attn}.add_k_proj", f"{attn}.add_v_proj")),
                    "q_norm": norm_scale(f"{attn}.norm_added_q"),
                    "k_norm": norm_scale(f"{attn}.norm_added_k"),
                    "proj": _linear(sd, f"{attn}.to_add_out"),
                    "mlp_in": _linear(sd, f"{blk}.ff_context.net.0.proj"),
                    "mlp_out": _linear(sd, f"{blk}.ff_context.net.2"),
                },
            }
        )

    single = []
    for i in range(config.single_depth):
        blk = f"single_transformer_blocks.{i}"
        attn = f"{blk}.attn"
        single.append(
            {
                "ada": perm_ada(f"{blk}.norm.linear", [0, 2, 1]),
                "qkv": _fused(sd, (f"{attn}.to_q", f"{attn}.to_k", f"{attn}.to_v")),
                "q_norm": norm_scale(f"{attn}.norm_q"),
                "k_norm": norm_scale(f"{attn}.norm_k"),
                "mlp_in": _linear(sd, f"{blk}.proj_mlp"),
                "out": _linear(sd, f"{blk}.proj_out"),
            }
        )

    params = {
        "x_in": _linear(sd, "x_embedder"),
        "ctx_in": _linear(sd, "context_embedder"),
        "t_mlp": two_layer("time_text_embed.timestep_embedder"),
        "pool_mlp": two_layer("time_text_embed.text_embedder"),
        # norm_out is AdaLayerNormContinuous: [scale, shift] -> our [shift, scale]
        "final_mod": perm_ada("norm_out.linear", [1, 0]),
        "final_out": _linear(sd, "proj_out"),
        "double": double,
        "single": single,
    }
    if config.guidance:
        params["guid_mlp"] = two_layer("time_text_embed.guidance_embedder")

    if leftover := sd.leftovers():
        raise ValueError(f"unmapped state-dict keys (first 10): {leftover[:10]}")
    return Flux(config), params


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
