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


class TestT5:
    T5_CFG = dict(
        vocab_size=120,
        d_model=64,
        d_kv=16,
        num_heads=4,
        d_ff=128,
        num_layers=3,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=32,
    )

    def _parity(self, proj: str) -> None:
        from transformers import T5Config, T5EncoderModel

        from skrample_tpu.models.import_weights import t5_encoder

        torch.manual_seed(4)
        hf = T5EncoderModel(T5Config(**self.T5_CFG, feed_forward_proj=proj)).eval()
        enc, params = t5_encoder(hf)

        ids = np.asarray([[3, 14, 15, 92, 6, 53, 1, 0], [27, 18, 28, 1, 0, 0, 0, 0]], np.int64)
        with torch.no_grad():
            ref = hf(input_ids=torch.as_tensor(ids)).last_hidden_state.numpy()
        ours = np.asarray(enc.apply(params, jnp.asarray(ids, jnp.int32)))
        # NOTE: no attention_mask on either side — full bidirectional attention
        np.testing.assert_allclose(ours, ref, atol=3e-5)

    def test_gated_gelu_parity(self) -> None:
        "T5 v1.1 (the SD3/Flux tower family): gated-gelu FF."
        self._parity("gated-gelu")

    def test_relu_parity(self) -> None:
        "Original T5: relu FF."
        self._parity("relu")

    def test_spec_tree_matches(self) -> None:
        from transformers import T5Config, T5EncoderModel

        from skrample_tpu.models.import_weights import t5_encoder

        hf = T5EncoderModel(T5Config(**self.T5_CFG, feed_forward_proj="gated-gelu")).eval()
        enc, params = t5_encoder(hf)
        jax.tree.map(lambda w, s: None, params, enc.param_spec())

    def test_random_init_runs_and_feeds_mmdit(self) -> None:
        "Framework-native use without a checkpoint: init + MMDiT context."
        from skrample_tpu.models import MMDiT, MMDiTConfig, T5Encoder, T5EncoderConfig

        enc = T5Encoder(T5EncoderConfig(dim=64, head_dim=16, heads=4, ff_dim=128, depth=2, compute_dtype=jnp.float32))
        params = enc.init(jax.random.PRNGKey(0))
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, (2, 16)), jnp.int32)
        feats = enc.apply(params, ids)
        assert feats.shape == (2, 16, 64) and bool(jnp.isfinite(feats).all())

        mmdit = MMDiT(MMDiTConfig(dim=64, depth=1, heads=2, context_dim=64, compute_dtype=jnp.float32, attention="full"))
        mp = mmdit.init(jax.random.PRNGKey(1))
        out = mmdit.apply(mp, jnp.ones((2, 4, 8, 8)), jnp.asarray([0.5, 0.5]), feats)
        assert out.shape == (2, 4, 8, 8)
