"""SD3 stack assembly: the four importers glued by the published recipe.

The conditioning oracle is transformers itself (real CLIP towers with
random weights, ``hidden_states[-2]`` + projected pooling, plus a real T5
encoder); the transformer/VAE sides are the independently written torch
mirrors from ``test_import_weights``.  End-to-end: token ids -> encode ->
CFG flow sampling -> VAE decode, all in JAX."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.soak  # full text->image stack (SD3): full tier only

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import CLIPTextConfig, CLIPTextModelWithProjection, T5Config, T5EncoderModel  # noqa: E402

import tests.test_import_weights as oracles  # noqa: E402
from skrample_tpu.models.sd3 import SD3Stack  # noqa: E402

CLIP_L = dict(
    vocab_size=99,
    hidden_size=12,
    intermediate_size=48,
    num_hidden_layers=3,
    num_attention_heads=2,
    max_position_embeddings=16,
    eos_token_id=98,
    bos_token_id=97,
    hidden_act="gelu",
    projection_dim=16,
)
CLIP_G = dict(CLIP_L, hidden_size=16, intermediate_size=64, projection_dim=24)
T5_CFG = dict(
    vocab_size=120,
    d_model=32,
    d_kv=8,
    num_heads=2,
    d_ff=64,
    num_layers=2,
    relative_attention_num_buckets=8,
    relative_attention_max_distance=32,
    feed_forward_proj="gated-gelu",
)
# CLIP widths 12 + 16 = 28 pad up to context_dim 32 (= T5 d_model);
# pooled projections 16 + 24 = 40 = the mirror transformer's pooled_dim


def token_ids(fill: int = 7) -> np.ndarray:
    ids = np.full((1, 16), fill, np.int64)
    ids[0, :5] = [97, 10, 20, 30, 98]
    return ids


def empty_ids() -> np.ndarray:
    ids = np.full((1, 16), 7, np.int64)
    ids[0, :2] = [97, 98]
    return ids


def build_towers():
    torch.manual_seed(20)
    hf_l = CLIPTextModelWithProjection(CLIPTextConfig(**CLIP_L)).eval()
    hf_g = CLIPTextModelWithProjection(CLIPTextConfig(**CLIP_G)).eval()
    hf_t5 = T5EncoderModel(T5Config(**T5_CFG)).eval()
    return hf_l, hf_g, hf_t5


def build_stack(with_t5: bool = True) -> SD3Stack:
    hf_l, hf_g, hf_t5 = build_towers()
    transformer = oracles.TestSD3._torch_sd3().eval()
    vae = oracles.TestVAE._torch_vae().eval()
    return SD3Stack.from_checkpoints(
        (transformer.state_dict(), oracles.TestSD3.CFG),
        (vae.state_dict(), oracles.TestVAE.CFG),
        hf_l,
        hf_g,
        t5=hf_t5 if with_t5 else None,
        t5_tokens=8,
    )


def test_encode_prompt_matches_transformers() -> None:
    "The published recipe, with transformers' own towers as the oracle."
    hf_l, hf_g, hf_t5 = build_towers()
    transformer = oracles.TestSD3._torch_sd3().eval()
    vae = oracles.TestVAE._torch_vae().eval()
    stack = SD3Stack.from_checkpoints(
        (transformer.state_dict(), oracles.TestSD3.CFG),
        (vae.state_dict(), oracles.TestVAE.CFG),
        hf_l,
        hf_g,
        t5=hf_t5,
    )

    clip_ids = token_ids()
    t5_ids = np.asarray([[3, 14, 15, 92, 6, 53, 1, 0]], np.int64)
    with torch.no_grad():
        out_l = hf_l(input_ids=torch.as_tensor(clip_ids), output_hidden_states=True)
        out_g = hf_g(input_ids=torch.as_tensor(clip_ids), output_hidden_states=True)
        t5_feats = hf_t5(input_ids=torch.as_tensor(t5_ids)).last_hidden_state.numpy()
    clip_feats = np.concatenate(
        [out_l.hidden_states[-2].numpy(), out_g.hidden_states[-2].numpy()], axis=-1
    )
    clip_feats = np.pad(clip_feats, ((0, 0), (0, 0), (0, 32 - clip_feats.shape[-1])))
    want_ctx = np.concatenate([clip_feats, t5_feats], axis=1)
    want_pooled = np.concatenate([out_l.text_embeds.numpy(), out_g.text_embeds.numpy()], axis=-1)

    ctx, pooled = stack.encode_prompt(
        jnp.asarray(clip_ids, jnp.int32), jnp.asarray(clip_ids, jnp.int32), jnp.asarray(t5_ids, jnp.int32)
    )
    assert ctx.shape == (1, 16 + 8, 32) and pooled.shape == (1, 40)
    np.testing.assert_allclose(np.asarray(ctx), want_ctx, atol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled), want_pooled, atol=3e-5)


def test_t5_less_mode() -> None:
    "Dropping T5 substitutes zero features, the published degraded mode."
    stack = build_stack(with_t5=False)
    ctx, pooled = stack.encode_prompt(
        jnp.asarray(token_ids(), jnp.int32), jnp.asarray(token_ids(), jnp.int32)
    )
    assert ctx.shape == (1, 16 + 8, 32) and pooled.shape == (1, 40)
    np.testing.assert_array_equal(np.asarray(ctx[:, 16:]), 0.0)
    assert float(jnp.abs(ctx[:, :16]).max()) > 0


def test_mismatched_pooled_dim_rejected() -> None:
    hf_l, hf_g, hf_t5 = build_towers()
    bad_g = CLIPTextModelWithProjection(CLIPTextConfig(**dict(CLIP_G, projection_dim=10))).eval()
    transformer = oracles.TestSD3._torch_sd3().eval()
    vae = oracles.TestVAE._torch_vae().eval()
    with pytest.raises(ValueError, match="pooled_dim"):
        SD3Stack.from_checkpoints(
            (transformer.state_dict(), oracles.TestSD3.CFG),
            (vae.state_dict(), oracles.TestVAE.CFG),
            hf_l,
            bad_g,
        )


class TestEndToEnd:
    def test_ids_to_pixels(self) -> None:
        "Token ids -> CFG flow sampling -> pixels, deterministic in the key."
        stack = build_stack()
        t5_ids = jnp.asarray([[3, 14, 15, 92, 6, 53, 1, 0]], jnp.int32)
        clip = jnp.asarray(token_ids(), jnp.int32)
        cond = stack.encode_prompt(clip, clip, t5_ids)
        empty = jnp.asarray(empty_ids(), jnp.int32)
        uncond = stack.encode_prompt(empty, empty, jnp.zeros_like(t5_ids))

        pipe = stack.pipeline(*cond, height=16, width=16, steps=4, guidance_scale=3.0, uncond=uncond)
        latent = pipe.generate(jax.random.PRNGKey(0))
        assert latent.shape == (1, 4, 8, 8)
        pixels = stack.decode(latent)
        assert pixels.shape == (1, 3, 16, 16) and bool(jnp.isfinite(pixels).all())

        again = stack.decode(pipe.generate(jax.random.PRNGKey(0)))
        np.testing.assert_array_equal(np.asarray(pixels), np.asarray(again))

    def test_prompt_changes_pixels(self) -> None:
        stack = build_stack()
        clip_a = jnp.asarray(token_ids(), jnp.int32)
        clip_b = jnp.asarray(token_ids(fill=9), jnp.int32)
        t5_ids = jnp.asarray([[3, 14, 15, 92, 6, 53, 1, 0]], jnp.int32)

        outs = []
        for clip in (clip_a, clip_b):
            cond = stack.encode_prompt(clip, clip, t5_ids)
            pipe = stack.pipeline(*cond, height=16, width=16, steps=3, donate=False)
            outs.append(np.asarray(stack.decode(pipe.generate(jax.random.PRNGKey(1)))))
        assert not np.array_equal(outs[0], outs[1])

    def test_dynamic_batch_serving(self) -> None:
        "Per-prompt (context, pooled) pairs through ServingEngine: batched == solo."
        from skrample_tpu.serving import ServingEngine

        stack = build_stack()
        t5_ids = jnp.asarray([[3, 14, 15, 92, 6, 53, 1, 0]], jnp.int32)
        conds = []
        for fill in (7, 9, 11):
            clip = jnp.asarray(token_ids(fill=fill), jnp.int32)
            ctx, pooled = stack.encode_prompt(clip, clip, t5_ids)
            conds.append((ctx[0], pooled[0]))  # one request = one unbatched row pair

        kwargs = dict(item_shape=(4, 8, 8), steps=3, conditioned=True)
        with ServingEngine(stack.as_served(), buckets=(1,), **kwargs) as engine:
            ref = [np.asarray(engine.generate(k, context=c)) for k, c in enumerate(conds)]
        with ServingEngine(stack.as_served(), buckets=(4,), max_delay_ms=50.0, **kwargs) as engine:
            futs = [engine.submit(k, context=c) for k, c in enumerate(conds)]
            got = [np.asarray(f.result()) for f in futs]
            assert len(engine._executables) == 1
        # bucket-1 vs bucket-4 are DIFFERENT executables: XLA tiles the
        # transformer matmuls per batch shape, so equality is to reduction
        # order (the engine's documented cross-bucket contract), not bits
        for r, g in zip(ref, got):
            np.testing.assert_allclose(r, g, rtol=3e-5, atol=3e-6)
        assert not np.allclose(ref[0], ref[1], atol=1e-3)  # prompts actually condition

    def test_img2img_roundtrip_shapes(self) -> None:
        stack = build_stack()
        clip = jnp.asarray(token_ids(), jnp.int32)
        cond = stack.encode_prompt(clip, clip)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 16, 16))
        z = stack.encode_image(x, key=jax.random.PRNGKey(3))
        assert z.shape == (1, 4, 8, 8)
        pipe = stack.pipeline(*cond, height=16, width=16, steps=4)
        out = pipe.generate(jax.random.PRNGKey(4), initial=z, strength=0.5)
        assert out.shape == z.shape and bool(jnp.isfinite(out).all())
