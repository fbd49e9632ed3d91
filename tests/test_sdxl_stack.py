"""SDXL / SD1.5 stack assembly: the UNet-family importers glued by the
published recipe.  Conditioning oracle = transformers (penultimate states
of both towers, CLIP-G projected pooling); the UNet/VAE are the mirrors
from ``test_import_weights``."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.soak  # full text->image stack (SDXL): full tier only

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import CLIPTextConfig, CLIPTextModel, CLIPTextModelWithProjection  # noqa: E402

import tests.test_import_weights as oracles  # noqa: E402
from skrample_tpu.models.sdxl import SDXLStack  # noqa: E402

CLIP_L = dict(
    vocab_size=99,
    hidden_size=20,
    intermediate_size=80,
    num_hidden_layers=3,
    num_attention_heads=2,
    max_position_embeddings=16,
    eos_token_id=98,
    bos_token_id=97,
    hidden_act="gelu",
)
# CLIP-G: projected pooling must match the mirror UNet's pooled_dim (56);
# widths 20 + 28 = 48 = the mirror's cross_attention_dim
CLIP_G = dict(CLIP_L, hidden_size=28, intermediate_size=112, projection_dim=56)
SD15_CLIP = dict(CLIP_L, hidden_size=24, intermediate_size=96)


def token_ids(fill: int = 7) -> np.ndarray:
    ids = np.full((1, 16), fill, np.int64)
    ids[0, :5] = [97, 10, 20, 30, 98]
    return ids


def build_sdxl() -> SDXLStack:
    torch.manual_seed(50)
    return SDXLStack.from_checkpoints(
        (oracles.TestCondUNet._torch_unet(oracles.TestCondUNet.SDXL_CFG).state_dict(), oracles.TestCondUNet.SDXL_CFG),
        (oracles.TestVAE._torch_vae().state_dict(), oracles.TestVAE.CFG),
        CLIPTextModel(CLIPTextConfig(**CLIP_L)).eval(),
        CLIPTextModelWithProjection(CLIPTextConfig(**CLIP_G)).eval(),
    )


def test_encode_prompt_matches_transformers() -> None:
    torch.manual_seed(50)
    unet = oracles.TestCondUNet._torch_unet(oracles.TestCondUNet.SDXL_CFG).eval()
    vae = oracles.TestVAE._torch_vae().eval()
    hf_l = CLIPTextModel(CLIPTextConfig(**CLIP_L)).eval()
    hf_g = CLIPTextModelWithProjection(CLIPTextConfig(**CLIP_G)).eval()
    stack = SDXLStack.from_checkpoints(
        (unet.state_dict(), oracles.TestCondUNet.SDXL_CFG), (vae.state_dict(), oracles.TestVAE.CFG), hf_l, hf_g
    )

    ids = token_ids()
    with torch.no_grad():
        out_l = hf_l(input_ids=torch.as_tensor(ids), output_hidden_states=True)
        out_g = hf_g(input_ids=torch.as_tensor(ids), output_hidden_states=True)
    want_ctx = np.concatenate(
        [out_l.hidden_states[-2].numpy(), out_g.hidden_states[-2].numpy()], axis=-1
    )
    ctx, pooled = stack.encode_prompt(jnp.asarray(ids, jnp.int32), jnp.asarray(ids, jnp.int32))
    assert ctx.shape == (1, 16, 48) and pooled.shape == (1, 56)
    np.testing.assert_allclose(np.asarray(ctx), want_ctx, atol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled), out_g.text_embeds.numpy(), atol=3e-5)


def test_sd15_shape_single_tower() -> None:
    torch.manual_seed(51)
    stack = SDXLStack.from_checkpoints(
        (
            oracles.TestCondUNet._torch_unet(oracles.TestCondUNet.SD15_CFG, linear_proj=False).state_dict(),
            oracles.TestCondUNet.SD15_CFG,
        ),
        (oracles.TestVAE._torch_vae().state_dict(), oracles.TestVAE.CFG),
        CLIPTextModel(CLIPTextConfig(**SD15_CLIP)).eval(),
    )
    ctx, pooled = stack.encode_prompt(jnp.asarray(token_ids(), jnp.int32))
    assert ctx.shape == (1, 16, 24) and pooled is None
    pipe = stack.pipeline(ctx, height=16, width=16, steps=4, donate=False)
    latent = pipe.generate(jax.random.PRNGKey(0))
    assert latent.shape == (1, 4, 8, 8)
    pixels = stack.decode(latent)
    assert pixels.shape == (1, 3, 16, 16) and bool(jnp.isfinite(pixels).all())


def test_param_spec_matches_tree() -> None:
    "Both family shapes shard with the CondUNet's own PartitionSpecs."
    from skrample_tpu.models.import_weights import diffusers_unet

    torch.manual_seed(53)
    for cfg, linear in ((oracles.TestCondUNet.SDXL_CFG, True), (oracles.TestCondUNet.SD15_CFG, False)):
        unet, params = diffusers_unet(
            (oracles.TestCondUNet._torch_unet(cfg, linear_proj=linear).state_dict(), cfg)
        )
        jax.tree.map(lambda w, s: None, params, unet.param_spec())  # same structure or raises


def test_int8_tree_runs_close() -> None:
    "W8A8 Transformer2D matmuls; convs and conditioning stay full precision."
    from skrample_tpu.models import CondUNet, CondUNetConfig

    cfg = CondUNetConfig(
        widths=(32, 64, 128),
        layers_per_block=1,
        transformer_layers=(0, 1, 2),
        heads=(2, 2, 4),
        context_dim=48,
        pooled_dim=56,
        add_time_embed_dim=8,
        groups=8,
        compute_dtype=jnp.float32,
        layout="nchw",
    )
    model = CondUNet(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda w: w + 0.02 * jax.random.normal(jax.random.PRNGKey(7), w.shape, w.dtype), params
    )
    q = model.quantize_params(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 10, 48))
    pooled = jax.random.normal(jax.random.PRNGKey(3), (1, 56))
    tids = jnp.asarray([[16.0, 16.0, 0.0, 0.0, 16.0, 16.0]])
    a = np.asarray(model.apply(params, x, 500.0, ctx, pooled, tids)).ravel()
    b = np.asarray(model.apply(q, x, 500.0, ctx, pooled, tids)).ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99, cos

    # SDXL conditioning without time_ids is an error, not silent zeros
    with pytest.raises(ValueError, match="time_ids"):
        model.apply(params, x, 500.0, ctx, pooled)


def test_padded_flash_self_attention_matches_eager() -> None:
    "head_dim-64 self-attention via zero-padded 128-lane flash is exact."
    import math

    from skrample_tpu.models import CondUNet, CondUNetConfig

    model = CondUNet(CondUNetConfig(compute_dtype=jnp.float32))
    B, N, heads, d = 2, 1024, 4, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, N, heads * d)) for kk in ks)
    flash = model._mha(q, k, v, heads)  # N >= 1024 -> the padded kernel path

    def split(x):
        return x.reshape(B, -1, heads, d).transpose(0, 2, 1, 3)

    a = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) / math.sqrt(d), -1)
    ref = jnp.einsum("bhqk,bhkd->bhqd", a, split(v)).transpose(0, 2, 1, 3).reshape(B, N, heads * d)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(ref), atol=3e-5)


def test_epsilon_loss_decreases() -> None:
    "CondUNet trains: adamw on an epsilon objective through the full graph."
    import optax

    from skrample_tpu.models import CondUNet, CondUNetConfig

    model = CondUNet(
        CondUNetConfig(
            widths=(32, 64),
            layers_per_block=1,
            transformer_layers=(0, 1),
            heads=(2, 2),
            context_dim=24,
            pooled_dim=0,
            groups=8,
            compute_dtype=jnp.float32,
            layout="nchw",
        )
    )
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adamw(2e-3)
    opt_state = opt.init(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 16, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 24))
    noise = jax.random.normal(jax.random.PRNGKey(3), x.shape)

    def loss_fn(p, sigma):
        s = sigma[:, None, None, None]
        xt = x + s * noise  # VP-style corruption, epsilon target
        pred = model.apply(p, xt, sigma * 1000.0, ctx)
        return jnp.mean((pred - noise) ** 2)

    @jax.jit
    def step(p, o, key):
        sigma = jax.random.uniform(key, (4,), minval=1e-3, maxval=1.0)
        loss, grads = jax.value_and_grad(loss_fn)(p, sigma)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    losses = []
    for i in range(30):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(100 + i))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_tower_mismatch_rejected() -> None:
    torch.manual_seed(52)
    with pytest.raises(ValueError, match="clip_g"):
        SDXLStack.from_checkpoints(
            (
                oracles.TestCondUNet._torch_unet(oracles.TestCondUNet.SDXL_CFG).state_dict(),
                oracles.TestCondUNet.SDXL_CFG,
            ),
            (oracles.TestVAE._torch_vae().state_dict(), oracles.TestVAE.CFG),
            CLIPTextModel(CLIPTextConfig(**CLIP_L)).eval(),  # missing clip_g for an SDXL UNet
        )


def test_controlnet_guided_sampling() -> None:
    """ControlNet composition through the stack: scale 0 reproduces the
    plain run EXACTLY (residual math truly off), the control image steers
    it otherwise, and CFG composes."""
    from skrample_tpu.models.import_weights import diffusers_controlnet

    stack = build_sdxl()
    torch.manual_seed(54)
    cn_cfg = {
        **oracles.TestCondUNet.SDXL_CFG,
        "conditioning_channels": 3,
        "conditioning_embedding_out_channels": (4, 8),
    }
    cn, cn_params = diffusers_controlnet(
        (oracles.TestCondUNet._torch_unet(cn_cfg).state_dict(), cn_cfg)
    )

    ids = jnp.asarray(token_ids(), jnp.int32)
    cond = stack.encode_prompt(ids, ids)
    uncond = stack.encode_prompt(jnp.asarray(token_ids(fill=9), jnp.int32), jnp.asarray(token_ids(fill=9), jnp.int32))
    tids = stack.time_ids((16, 16), (0, 0), (16, 16))
    # latent is 8x8 (16px through the 2x mirror VAE); the (4, 8) ladder has
    # ONE stride-2, so the control image sits at 2x the latent grid
    img = jax.random.normal(jax.random.PRNGKey(7), (1, 3, 16, 16))

    def run(**kw):
        pipe = stack.pipeline(
            *cond, height=16, width=16, steps=3, time_ids=tids,
            guidance_scale=4.0, uncond=uncond, donate=False, **kw,
        )
        return np.asarray(pipe.generate(jax.random.PRNGKey(0)))

    plain = run()
    zeroed = run(controlnet=(cn, cn_params), control_image=img, control_scale=0.0)
    np.testing.assert_array_equal(plain, zeroed)
    steered = run(controlnet=(cn, cn_params), control_image=img, control_scale=1.0)
    assert not np.allclose(plain, steered, atol=1e-4)
    other = run(controlnet=(cn, cn_params), control_image=img * -1.0, control_scale=1.0)
    assert not np.allclose(steered, other, atol=1e-4)


class TestEndToEnd:
    def test_ids_to_pixels_cfg(self) -> None:
        "SDXL: both towers, micro-conditioning, CFG, epsilon on Scaled."
        stack = build_sdxl()
        ids = jnp.asarray(token_ids(), jnp.int32)
        cond = stack.encode_prompt(ids, ids)
        empty = jnp.asarray(token_ids(fill=9), jnp.int32)
        uncond = stack.encode_prompt(empty, empty)

        pipe = stack.pipeline(
            *cond,
            height=16,
            width=16,
            steps=4,
            time_ids=stack.time_ids((16, 16), (0, 0), (16, 16)),
            guidance_scale=5.0,
            uncond=uncond,
            donate=False,
        )
        latent = pipe.generate(jax.random.PRNGKey(0))
        assert latent.shape == (1, 4, 8, 8)
        pixels = stack.decode(latent)
        assert pixels.shape == (1, 3, 16, 16) and bool(jnp.isfinite(pixels).all())
        again = stack.decode(pipe.generate(jax.random.PRNGKey(0)))
        np.testing.assert_array_equal(np.asarray(pixels), np.asarray(again))

    def test_dynamic_batch_serving(self) -> None:
        "SDXL (context, pooled) pairs through ServingEngine, time_ids bound."
        from skrample_tpu.serving import ServingEngine

        stack = build_sdxl()
        conds = []
        for fill in (7, 9):
            ids = jnp.asarray(token_ids(fill=fill), jnp.int32)
            ctx, pooled = stack.encode_prompt(ids, ids)
            conds.append((ctx[0], pooled[0]))
        served = stack.as_served(time_ids=stack.time_ids((16, 16), (0, 0), (16, 16)))

        from skrample_tpu import scheduling
        from skrample_tpu.sampling import models as sk_models

        kwargs = dict(
            item_shape=(4, 8, 8),
            steps=2,
            conditioned=True,
            schedule=scheduling.Karras(scheduling.Scaled()),
            model_transform=sk_models.NoiseModel(),
        )
        with ServingEngine(served, buckets=(1,), **kwargs) as engine:
            ref = [np.asarray(engine.generate(k, context=c)) for k, c in enumerate(conds)]
        with ServingEngine(served, buckets=(2,), max_delay_ms=50.0, **kwargs) as engine:
            got = [np.asarray(f.result()) for f in [engine.submit(k, context=c) for k, c in enumerate(conds)]]
        for r, g in zip(ref, got):
            np.testing.assert_allclose(r, g, rtol=3e-5, atol=3e-6)
        with pytest.raises(ValueError, match="time_ids"):
            stack.as_served()

    def test_time_ids_change_output(self) -> None:
        "The micro-conditioning is live: different crop ids, different image."
        stack = build_sdxl()
        ids = jnp.asarray(token_ids(), jnp.int32)
        cond = stack.encode_prompt(ids, ids)
        outs = []
        for crop in ((0, 0), (8, 8)):
            pipe = stack.pipeline(
                *cond,
                height=16,
                width=16,
                steps=3,
                time_ids=stack.time_ids((16, 16), crop, (16, 16)),
                donate=False,
            )
            outs.append(np.asarray(pipe.generate(jax.random.PRNGKey(1))))
        assert not np.array_equal(outs[0], outs[1])
