"""Flux stack assembly: the FLUX.1 importers glued by the published recipe.

Conditioning oracle = transformers itself (T5 features as context, CLIP-L
pooler_output as the vector); the transformer/VAE are the independently
written mirrors from ``test_import_weights``, with Flux's quant-conv-less
VAE and latent shift_factor covered."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.soak  # full text->image stack (Flux): full tier only

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import CLIPTextConfig, CLIPTextModel, T5Config, T5EncoderModel  # noqa: E402

import tests.test_import_weights as oracles  # noqa: E402
from skrample_tpu.models.flux_stack import FluxStack  # noqa: E402

CLIP_CFG = dict(
    vocab_size=99,
    hidden_size=24,
    intermediate_size=96,
    num_hidden_layers=3,
    num_attention_heads=2,
    max_position_embeddings=16,
    eos_token_id=98,
    bos_token_id=97,
    hidden_act="gelu",
)
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
# the Flux AutoencoderKL shape: no quant convs, latent shift + scale
VAE_CFG = {
    **oracles.TestVAE.CFG,
    "use_quant_conv": False,
    "scaling_factor": 0.3611,
    "shift_factor": 0.1159,
}


def token_ids(fill: int = 7) -> np.ndarray:
    ids = np.full((1, 16), fill, np.int64)
    ids[0, :5] = [97, 10, 20, 30, 98]
    return ids


T5_IDS = np.asarray([[3, 14, 15, 92, 6, 53, 1, 0, 11, 9, 2, 4]], np.int64)  # 12 tokens


def build_stack() -> FluxStack:
    torch.manual_seed(30)
    return FluxStack.from_checkpoints(
        (oracles.TestFlux._torch_flux().state_dict(), oracles.TestFlux.CFG),
        (oracles.TestVAE._torch_vae(quant=False).state_dict(), VAE_CFG),
        CLIPTextModel(CLIPTextConfig(**CLIP_CFG)).eval(),
        T5EncoderModel(T5Config(**T5_CFG)).eval(),
    )


def test_encode_prompt_matches_transformers() -> None:
    torch.manual_seed(30)
    transformer = oracles.TestFlux._torch_flux().eval()
    vae = oracles.TestVAE._torch_vae(quant=False).eval()
    hf_clip = CLIPTextModel(CLIPTextConfig(**CLIP_CFG)).eval()
    hf_t5 = T5EncoderModel(T5Config(**T5_CFG)).eval()
    stack = FluxStack.from_checkpoints(
        (transformer.state_dict(), oracles.TestFlux.CFG), (vae.state_dict(), VAE_CFG), hf_clip, hf_t5
    )

    clip_ids, t5_ids = token_ids(), T5_IDS
    with torch.no_grad():
        want_ctx = hf_t5(input_ids=torch.as_tensor(t5_ids)).last_hidden_state.numpy()
        want_pooled = hf_clip(input_ids=torch.as_tensor(clip_ids)).pooler_output.numpy()
    ctx, pooled = stack.encode_prompt(jnp.asarray(clip_ids, jnp.int32), jnp.asarray(t5_ids, jnp.int32))
    assert ctx.shape == (1, 12, 32) and pooled.shape == (1, 24)
    np.testing.assert_allclose(np.asarray(ctx), want_ctx, atol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled), want_pooled, atol=3e-5)


def test_vae_shift_factor_semantics() -> None:
    "encode applies (z - shift) * scale; decode inverts — the Flux convention."
    torch.manual_seed(31)
    ref = oracles.TestVAE._torch_vae(quant=False).eval()
    from skrample_tpu.models.import_weights import diffusers_vae

    vae, params = diffusers_vae((ref.state_dict(), VAE_CFG))
    assert vae.config.shift_factor == pytest.approx(0.1159)
    assert not vae.config.quant_convs

    x = torch.randn(1, 3, 16, 16, generator=torch.Generator().manual_seed(32))
    with torch.no_grad():
        mean_t, _ = ref.moments(x)
    z = vae.encode(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(
        np.asarray(z), (mean_t.numpy() - 0.1159) * 0.3611, atol=5e-5
    )
    # decode(encode(x)) feeds the decoder the posterior mode exactly
    with torch.no_grad():
        want = ref.decode(mean_t).numpy()
    np.testing.assert_allclose(np.asarray(vae.decode(params, z)), want, atol=5e-5)


def test_dynamic_shift_matches_published_endpoints() -> None:
    "exp(mu) at the published anchor points: 256 tokens -> e^0.5, 4096 -> e^1.15."
    import math

    from skrample_tpu.models.flux_stack import dynamic_shift

    assert dynamic_shift(256) == pytest.approx(math.exp(0.5))
    assert dynamic_shift(4096) == pytest.approx(math.exp(1.15))
    # 1024px image: 128x128 latent, 2x2 packing -> 4096 tokens (the max anchor)
    stack_shift = dynamic_shift((128 // 2) * (128 // 2))
    assert stack_shift == pytest.approx(math.exp(1.15))


def test_pipeline_uses_resolution_shift() -> None:
    stack = build_stack()
    cond = stack.encode_prompt(jnp.asarray(token_ids(), jnp.int32), jnp.asarray(T5_IDS, jnp.int32))
    pipe = stack.pipeline(*cond, height=16, width=16, steps=2, donate=False)
    from skrample_tpu.models.flux_stack import dynamic_shift

    assert pipe.schedule.shift == pytest.approx(dynamic_shift(16))


def test_mismatched_t5_width_rejected() -> None:
    torch.manual_seed(33)
    with pytest.raises(ValueError, match="context_dim"):
        FluxStack.from_checkpoints(
            (oracles.TestFlux._torch_flux().state_dict(), oracles.TestFlux.CFG),
            (oracles.TestVAE._torch_vae(quant=False).state_dict(), VAE_CFG),
            CLIPTextModel(CLIPTextConfig(**CLIP_CFG)).eval(),
            T5EncoderModel(T5Config(**dict(T5_CFG, d_model=48, d_ff=96))).eval(),
        )


class TestEndToEnd:
    def test_ids_to_pixels(self) -> None:
        "Token ids -> guidance-embedded flow sampling -> pixels, key-deterministic."
        stack = build_stack()
        cond = stack.encode_prompt(jnp.asarray(token_ids(), jnp.int32), jnp.asarray(T5_IDS, jnp.int32))
        pipe = stack.pipeline(*cond, height=16, width=16, steps=4, guidance=3.5, donate=False)
        latent = pipe.generate(jax.random.PRNGKey(0))
        assert latent.shape == (1, 4, 8, 8)
        pixels = stack.decode(latent)
        assert pixels.shape == (1, 3, 16, 16) and bool(jnp.isfinite(pixels).all())
        again = stack.decode(pipe.generate(jax.random.PRNGKey(0)))
        np.testing.assert_array_equal(np.asarray(pixels), np.asarray(again))

    def test_true_cfg_with_negative_prompt(self) -> None:
        "The published optional true-CFG mode: negative prompt steers output."
        stack = build_stack()
        clip = jnp.asarray(token_ids(), jnp.int32)
        cond = stack.encode_prompt(clip, jnp.asarray(T5_IDS, jnp.int32))
        neg_clip = jnp.asarray(token_ids(fill=9), jnp.int32)
        neg = stack.encode_prompt(neg_clip, jnp.zeros_like(jnp.asarray(T5_IDS, jnp.int32)))

        fn_plain = stack.model_fn(*cond, guidance=3.5)
        fn_cfg = stack.model_fn(*cond, guidance=3.5, true_cfg_scale=4.0, negative=neg)
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 8, 8))
        a, b = fn_plain(x, 500.0, None, None), fn_cfg(x, 500.0, None, None)
        assert a.shape == b.shape == x.shape
        assert bool(jnp.isfinite(b).all()) and not np.allclose(np.asarray(a), np.asarray(b))
        with pytest.raises(ValueError, match="negative"):
            stack.model_fn(*cond, true_cfg_scale=4.0)

    def test_dynamic_batch_serving(self) -> None:
        "Per-prompt (context, pooled) pairs through ServingEngine."
        from skrample_tpu.serving import ServingEngine

        stack = build_stack()
        conds = []
        for fill in (7, 9):
            clip = jnp.asarray(token_ids(fill=fill), jnp.int32)
            ctx, pooled = stack.encode_prompt(clip, jnp.asarray(T5_IDS, jnp.int32))
            conds.append((ctx[0], pooled[0]))

        kwargs = dict(item_shape=(4, 8, 8), steps=2, conditioned=True)
        with ServingEngine(stack.as_served(guidance=3.5), buckets=(1,), **kwargs) as engine:
            ref = [np.asarray(engine.generate(k, context=c)) for k, c in enumerate(conds)]
        with ServingEngine(stack.as_served(guidance=3.5), buckets=(2,), max_delay_ms=50.0, **kwargs) as engine:
            futs = [engine.submit(k, context=c) for k, c in enumerate(conds)]
            got = [np.asarray(f.result()) for f in futs]
        for r, g in zip(ref, got):
            np.testing.assert_allclose(r, g, rtol=3e-5, atol=3e-6)
        assert not np.allclose(ref[0], ref[1], atol=1e-3)

    def test_guidance_changes_output(self) -> None:
        "dev's guidance is an embedded input: different scale, different image."
        stack = build_stack()
        cond = stack.encode_prompt(jnp.asarray(token_ids(), jnp.int32), jnp.asarray(T5_IDS, jnp.int32))
        outs = [
            np.asarray(
                stack.pipeline(*cond, height=16, width=16, steps=3, guidance=g, donate=False).generate(
                    jax.random.PRNGKey(1)
                )
            )
            for g in (1.0, 6.0)
        ]
        assert not np.array_equal(outs[0], outs[1])
