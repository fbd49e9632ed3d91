"""Pretrained CLIP text-tower import, verified against transformers.

The strongest parity evidence available in-sandbox: build a (random-weight)
``transformers.CLIPTextModel`` on CPU, import its state dict through
``clip_text_encoder``, and require OUR forward to reproduce the HF model's
hidden states and pooling — same weights, two implementations, float32."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import CLIPTextConfig, CLIPTextModel, CLIPTextModelWithProjection  # noqa: E402

from skrample_tpu.models.import_weights import clip_text_config, clip_text_encoder  # noqa: E402

# eos is the HIGHEST vocab id, the real-CLIP convention (eos 49407 of
# 49408): transformers' pooling has a legacy branch for eos_token_id == 2
# that gathers at argmax(input_ids) instead of the first eos match, and
# only this convention satisfies both branches
HF_CFG = dict(
    vocab_size=99,
    hidden_size=64,
    intermediate_size=256,
    num_hidden_layers=3,
    num_attention_heads=4,
    max_position_embeddings=16,
    eos_token_id=98,
    bos_token_id=97,
)


def token_batch(eos: int = 98) -> np.ndarray:
    ids = np.full((2, 16), 7, np.int64)  # trailing filler AFTER the eos
    ids[0, :5] = [97, 10, 20, 30, eos]
    ids[1, :3] = [97, 42, eos]
    return ids


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_clip_text_model_parity(act: str) -> None:
    torch.manual_seed(0)
    hf = CLIPTextModel(CLIPTextConfig(**HF_CFG, hidden_act=act)).eval()
    enc, params = clip_text_encoder(hf)

    ids = token_batch()
    with torch.no_grad():
        out = hf(input_ids=torch.as_tensor(ids))
    ours = enc.apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), out.last_hidden_state.numpy(), atol=2e-5)

    # pooled = feature at the first EOS position (identity text_proj here)
    _, pooled = enc.encode(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5)


def test_clip_with_projection_parity() -> None:
    torch.manual_seed(1)
    hf = CLIPTextModelWithProjection(
        CLIPTextConfig(**HF_CFG, hidden_act="quick_gelu", projection_dim=32)
    ).eval()
    enc, params = clip_text_encoder(hf)

    ids = token_batch()
    with torch.no_grad():
        out = hf(input_ids=torch.as_tensor(ids))
    _, pooled = enc.encode(params, jnp.asarray(ids, jnp.int32))
    assert pooled.shape == (2, 32)
    np.testing.assert_allclose(np.asarray(pooled), out.text_embeds.numpy(), atol=2e-5)


def test_config_mapping() -> None:
    cfg = clip_text_config(CLIPTextConfig(**HF_CFG, hidden_act="quick_gelu"))
    assert (cfg.dim, cfg.depth, cfg.heads, cfg.mlp_ratio) == (64, 3, 4, 4)
    assert cfg.max_tokens == 16 and cfg.ln_affine and cfg.causal
    assert cfg.act == "quick_gelu" and cfg.resolved_eos_id == 98


def test_state_dict_tuple_entry_point() -> None:
    torch.manual_seed(2)
    hf = CLIPTextModel(CLIPTextConfig(**HF_CFG, hidden_act="gelu")).eval()
    enc, params = clip_text_encoder((hf.state_dict(), hf.config))
    ids = token_batch()
    with torch.no_grad():
        ref = hf(input_ids=torch.as_tensor(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(enc.apply(params, jnp.asarray(ids, jnp.int32))), ref, atol=2e-5)


def test_imported_tree_matches_param_spec() -> None:
    "The imported tree shards with the encoder's own PartitionSpecs."
    torch.manual_seed(3)
    hf = CLIPTextModel(CLIPTextConfig(**HF_CFG, hidden_act="gelu")).eval()
    enc, params = clip_text_encoder(hf)
    jax.tree.map(lambda w, s: None, params, enc.param_spec())  # same structure or raises
