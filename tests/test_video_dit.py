"""VideoDiT (factorized spatio-temporal transformer) model family.

The reference's samplers are rank-agnostic — video latents pass through its
wrappers untouched (`/root/reference/tests/diffusers_pipes.py:221`) — but it
ships nothing to drive that shape.  These tests exercise 5-D latents
end-to-end: factorization correctness, kernel parity, temporal mixing, the
sampling stack over (B, C, F, H, W), and the serving/training extras.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from skrample_tpu import scheduling
from skrample_tpu.models import VideoDiT, VideoDiTConfig
from skrample_tpu.sampling import models, structured


def small_config(**kw) -> VideoDiTConfig:
    base = dict(dim=256, depth=2, heads=2, channels=16, compute_dtype=jnp.float32)
    base.update(kw)
    return VideoDiTConfig(**base)


def wake_params(model: VideoDiT, key: jax.Array) -> dict:
    "Replace the adaLN-zero weights so the model output is non-zero (see test_mmdit)."
    params = model.init(key)
    keys = iter(jax.random.split(jax.random.fold_in(key, 1), 2 + len(params["blocks"])))
    for name in ("final_mod", "final_out"):
        params[name]["w"] = jax.random.normal(next(keys), params[name]["w"].shape, jnp.float32) * 0.02
    for block in params["blocks"]:
        block["ada"]["w"] = jax.random.normal(next(keys), block["ada"]["w"].shape, jnp.float32) * 0.02
        if "proj_x" in block:  # zero-init cross-attention out-proj (adaLN-zero style)
            block["proj_x"]["w"] = (
                jax.random.normal(jax.random.fold_in(key, 99), block["proj_x"]["w"].shape, jnp.float32) * 0.02
            )
    return params


def test_forward_shape_and_finiteness() -> None:
    model = VideoDiT(small_config())
    params = wake_params(model, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 5, 16, 16), jnp.float32)
    out = model.apply(params, x, jnp.float32(500.0))
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.abs(out).max()) > 0


def test_temporal_mixing() -> None:
    """Temporal attention actually mixes frames: perturbing one frame changes
    the prediction on OTHER frames (a purely spatial model would not)."""
    model = VideoDiT(small_config())
    params = wake_params(model, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 4, 16, 16), jnp.float32)
    base = np.asarray(model.apply(params, x, jnp.float32(500.0)))
    x2 = x.at[:, :, 2].add(1.0)
    bumped = np.asarray(model.apply(params, x2, jnp.float32(500.0)))
    other_frames = [0, 1, 3]
    assert np.abs(bumped[:, :, other_frames] - base[:, :, other_frames]).max() > 1e-6


def test_frame_order_matters() -> None:
    "The factorized position embedding breaks frame-permutation equivariance."
    model = VideoDiT(small_config())
    params = wake_params(model, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 4, 16, 16), jnp.float32)
    out = np.asarray(model.apply(params, x, jnp.float32(500.0)))
    rev = np.asarray(model.apply(params, x[:, :, ::-1], jnp.float32(500.0)))[:, :, ::-1]
    assert np.abs(out - rev).max() > 1e-6


def test_full_vs_flash() -> None:
    """The fused-qkv kernel path (interpret mode off-TPU) matches the einsum
    oracle; spatial tokens tile into 128-lanes, temporal falls back."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 3, 32, 32), jnp.float32)
    outs = {}
    for attention in ("full", "flash"):
        model = VideoDiT(small_config(attention=attention))
        params = wake_params(model, jax.random.PRNGKey(0))
        outs[attention] = np.asarray(model.apply(params, x, jnp.float32(400.0)))
    np.testing.assert_allclose(outs["full"], outs["flash"], rtol=2e-5, atol=2e-5)


def test_generation_end_to_end_video_latents() -> None:
    "5-D latents through the full sampling pipeline, deterministic by key."
    from skrample_tpu.pipeline import GenerationPipeline

    model = VideoDiT(small_config())
    params = wake_params(model, jax.random.PRNGKey(0))

    pipe = GenerationPipeline(
        model_fn=model.as_sampleable(params),
        sampler=structured.DPM(order=2),
        schedule=scheduling.FlowShift(scheduling.Linear()),
        model_transform=models.FlowModel(),
        steps=4,
        latent_shape=(1, 16, 5, 16, 16),
    )
    out1 = pipe.generate(jax.random.PRNGKey(0))
    assert out1.shape == (1, 16, 5, 16, 16)
    assert bool(jnp.isfinite(out1).all())
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(pipe.generate(jax.random.PRNGKey(0))))
    assert not np.allclose(np.asarray(out1), np.asarray(pipe.generate(jax.random.PRNGKey(1))))


def test_remat_matches_plain() -> None:
    "jax.checkpoint blocks change memory, not math."
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 3, 16, 16), jnp.float32)
    fwd, grads = {}, {}
    for remat in (False, True, "dots"):
        model = VideoDiT(small_config(remat=remat))
        params = wake_params(model, jax.random.PRNGKey(0))
        fwd[remat] = np.asarray(model.apply(params, x, jnp.float32(500.0)))

        def loss(p, m=model):
            return (m.apply(p, x, jnp.float32(500.0)) ** 2).mean()

        grads[remat] = jax.jit(jax.grad(loss))(params)
    for mode in (True, "dots"):
        np.testing.assert_array_equal(fwd[False], fwd[mode])
        for a, b in zip(jax.tree.leaves(grads[False]), jax.tree.leaves(grads[mode]), strict=True):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_tp_spec_matches_param_tree() -> None:
    "param_spec mirrors the params pytree (plain and int8-quantized)."
    model = VideoDiT(small_config())
    params = model.init(jax.random.PRNGKey(0))
    is_spec = lambda z: isinstance(z, jax.sharding.PartitionSpec)  # noqa: E731
    jax.tree.map(lambda a, b: None, params, model.param_spec(), is_leaf=is_spec)

    qparams = model.quantize_params(params)
    jax.tree.map(lambda a, b: None, qparams, model.param_spec(quantized=True), is_leaf=is_spec)


def test_int8_serving_tree_close_to_f32() -> None:
    model = VideoDiT(small_config())
    params = wake_params(model, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 3, 16, 16), jnp.float32)

    ref = np.asarray(model.apply(params, x, jnp.float32(500.0))).ravel()
    got = np.asarray(model.apply(model.quantize_params(params), x, jnp.float32(500.0))).ravel()
    cos = float(np.dot(ref, got) / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-12))
    assert cos > 0.99, cos


def test_flops_formula_matches_trace() -> None:
    "The analytic FLOPs count matches a traced count of every dense/attention."
    from skrample_tpu.models import video_dit as vd_mod
    from skrample_tpu.models.dit import _dense as orig_dense
    from skrample_tpu.models.video_dit import video_dit_forward_flops

    config = small_config()
    model = VideoDiT(config)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 16, 4, 16, 16), jnp.float32)

    total = 0.0

    def dense(p, xx, dtype):
        nonlocal total
        total += 2.0 * p["w"].shape[0] * p["w"].shape[1] * (xx.size // xx.shape[-1])
        return orig_dense(p, xx, dtype)

    orig_attend = VideoDiT._attend
    orig_temporal = VideoDiT._temporal_attend

    def attend(self, qkv):
        nonlocal total
        rows, tok, _ = qkv.shape
        total += 4.0 * rows * tok * tok * config.dim
        return orig_attend(self, qkv)

    def temporal(self, qkv):
        nonlocal total
        b, f, n, _ = qkv.shape
        total += 4.0 * b * n * f * f * config.dim
        return orig_temporal(self, qkv)

    vd_mod._dense, VideoDiT._attend, VideoDiT._temporal_attend = dense, attend, temporal
    try:
        jax.eval_shape(lambda: model.apply(params, x, jnp.float32(1.0)))
    finally:
        vd_mod._dense, VideoDiT._attend, VideoDiT._temporal_attend = orig_dense, orig_attend, orig_temporal

    analytic = video_dit_forward_flops(config, 2, 4, 16, 16)
    assert abs(total - analytic) / total < 0.02, (total, analytic)


def test_sequence_parallel_matches_single_device() -> None:
    """Ulysses-style sp alternation (frames sharded for spatial attention,
    sites for temporal — XLA inserts the all-to-alls) == unsharded."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("sp",))

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 4, 32, 32), jnp.float32)
    config = small_config()
    ref_model = VideoDiT(config)
    params = wake_params(ref_model, jax.random.PRNGKey(0))
    ref = np.asarray(jax.jit(lambda p, a: ref_model.apply(p, a, jnp.float32(500.0)))(params, x))

    sp_model = VideoDiT(small_config(sequence_parallel=True), mesh=mesh)
    rep = jax.device_put(params, NamedSharding(mesh, P()))
    x_sp = jax.device_put(x, NamedSharding(mesh, P(None, None, "sp")))
    got = np.asarray(jax.jit(lambda p, a: sp_model.apply(p, a, jnp.float32(500.0)))(rep, x_sp))
    np.testing.assert_allclose(ref, got, rtol=2e-5, atol=2e-5)


# -- text conditioning (context_dim > 0): the text2video bridge ------------


def conditioned_config(**kw) -> VideoDiTConfig:
    return small_config(context_dim=96, **kw)


def test_conditioning_reaches_output() -> None:
    model = VideoDiT(conditioned_config())
    params = wake_params(model, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 2, 16, 16), jnp.float32)
    ctx_a = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 96), jnp.float32)
    ctx_b = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 96), jnp.float32)
    a = np.asarray(model.apply(params, x, 400.0, ctx_a))
    b = np.asarray(model.apply(params, x, 400.0, ctx_b))
    null = np.asarray(model.apply(params, x, 400.0))  # learned null row
    assert np.isfinite(a).all()
    assert np.abs(a - b).max() > 0
    assert np.abs(a - null).max() > 0


def test_unconditioned_model_rejects_context() -> None:
    import pytest

    model = VideoDiT(small_config())
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 16, 2, 16, 16), jnp.float32)
    with pytest.raises(ValueError, match="context_dim"):
        model.apply(params, x, 400.0, jnp.zeros((1, 4, 96), jnp.float32))


def test_cfg_scale_one_equals_plain_conditioned() -> None:
    model = VideoDiT(conditioned_config())
    params = wake_params(model, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 2, 16, 16), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 96), jnp.float32)
    plain = model.apply(params, x, 400.0, ctx)
    fn = model.as_sampleable(params, ctx, guidance_scale=1.0)
    np.testing.assert_array_equal(np.asarray(fn(x, 400.0, 1.0, 0.0)), np.asarray(plain))


def test_served_equals_sampleable_cfg() -> None:
    "The traced-context serving closure == the bound-context closure."
    model = VideoDiT(conditioned_config())
    params = wake_params(model, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 2, 16, 16), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 96), jnp.float32)
    bound = model.as_sampleable(params, ctx, guidance_scale=3.0)(x, 400.0, 1.0, 0.0)
    served = model.as_served(params, guidance_scale=3.0)(x, 400.0, 1.0, 0.0, ctx)
    np.testing.assert_allclose(np.asarray(served), np.asarray(bound), rtol=1e-6, atol=1e-7)


def test_conditioned_flops_formula_matches_trace() -> None:
    from skrample_tpu.models import video_dit as vd_mod
    from skrample_tpu.models.dit import _dense as orig_dense
    from skrample_tpu.models.video_dit import video_dit_forward_flops

    config = conditioned_config()
    model = VideoDiT(config)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 16, 4, 16, 16), jnp.float32)
    ctx = jnp.zeros((2, 6, 96), jnp.float32)

    total = 0.0

    def dense(p, xx, dtype):
        nonlocal total
        total += 2.0 * p["w"].shape[0] * p["w"].shape[1] * (xx.size // xx.shape[-1])
        return orig_dense(p, xx, dtype)

    orig_attend = VideoDiT._attend
    orig_temporal = VideoDiT._temporal_attend
    orig_cross = VideoDiT._cross_attend

    def attend(self, qkv):
        nonlocal total
        rows, tok, _ = qkv.shape
        total += 4.0 * rows * tok * tok * config.dim
        return orig_attend(self, qkv)

    def temporal(self, qkv):
        nonlocal total
        b, f, n, _ = qkv.shape
        total += 4.0 * b * n * f * f * config.dim
        return orig_temporal(self, qkv)

    def cross(self, block, q_tokens, context):
        nonlocal total
        b, s, _ = q_tokens.shape
        total += 4.0 * b * s * context.shape[1] * config.dim
        return orig_cross(self, block, q_tokens, context)

    vd_mod._dense = dense
    VideoDiT._attend, VideoDiT._temporal_attend, VideoDiT._cross_attend = attend, temporal, cross
    try:
        jax.eval_shape(lambda: model.apply(params, x, jnp.float32(1.0), ctx))
    finally:
        vd_mod._dense = orig_dense
        VideoDiT._attend, VideoDiT._temporal_attend, VideoDiT._cross_attend = (
            orig_attend,
            orig_temporal,
            orig_cross,
        )

    analytic = video_dit_forward_flops(config, 2, 4, 16, 16, txt_tokens=6)
    assert abs(total - analytic) / total < 0.02, (total, analytic)


def test_text_to_video_end_to_end() -> None:
    """The full standalone text -> video stack: tokenizer -> T5 -> VideoDiT
    (CFG cross-attention) -> compiled sampler -> causal VideoVAE decode.
    Deterministic, prompt-dependent, finite pixels."""
    from skrample_tpu.models import (
        T5Encoder,
        T5EncoderConfig,
        ByteTokenizer,
        VideoVAE,
        VideoVAEConfig,
    )
    from skrample_tpu.ops import CompiledDenoiser, compile_sampler

    t5 = T5Encoder(T5EncoderConfig(dim=64, head_dim=16, heads=2, ff_dim=96, depth=1, compute_dtype=jnp.float32))
    t5_params = t5.init(jax.random.PRNGKey(0))
    dit = VideoDiT(
        VideoDiTConfig(dim=64, depth=1, heads=2, channels=8, context_dim=64, compute_dtype=jnp.float32)
    )
    dit_params = wake_params(dit, jax.random.PRNGKey(1))
    vae = VideoVAE(
        VideoVAEConfig(
            base=16, levels=2, temporal_levels=1, blocks_per_level=1, groups=4,
            latent_channels=8, compute_dtype=jnp.float32,
        )
    )
    vae_params = vae.init(jax.random.PRNGKey(2))
    # the VAE's output conv is zero-init (training identity start): wake it
    # so pixels carry signal for the prompt-dependence assert
    vae_params["decoder"]["out_conv"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(9), vae_params["decoder"]["out_conv"]["w"].shape) * 0.05
    )

    tok = ByteTokenizer()
    prompts = ["a fox leaping over snow", "city lights at night"]
    ids = jnp.asarray(tok.batch(prompts, 16))
    compiled = compile_sampler(
        structured.DPM(order=2), scheduling.FlowShift(scheduling.Linear()), models.FlowModel(), 3
    )
    denoiser = CompiledDenoiser.build(compiled, dtype=jnp.float32)

    def text2video(ids, x):
        ctx = t5.apply(t5_params, ids)
        fn = dit.as_served(dit_params, guidance_scale=2.0)
        latent = denoiser.run(lambda xx, t, s, a: fn(xx, t, s, a, ctx), x)
        return vae.decode(vae_params, latent)

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 2, 8, 8), jnp.float32)
    pixels = jax.jit(text2video)(ids, x)
    assert pixels.shape == (2, 3, 4, 16, 16)  # T*2, H*2, W*2
    assert np.isfinite(np.asarray(pixels)).all()
    # deterministic, and the prompt matters
    again = jax.jit(text2video)(ids, x)
    np.testing.assert_array_equal(np.asarray(pixels), np.asarray(again))
    swapped = jax.jit(text2video)(ids[::-1], x)
    assert np.abs(np.asarray(pixels) - np.asarray(swapped)).max() > 0


def test_cfg_sequential_matches_batched() -> None:
    """The default sequential CFG (two B=1 passes — 22% faster on this
    family, see as_sampleable) is the same math as the doubled batch."""
    model = VideoDiT(conditioned_config())
    params = wake_params(model, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 2, 16, 16), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 96), jnp.float32)
    seq = model.as_sampleable(params, ctx, guidance_scale=3.0)(x, 400.0, 1.0, 0.0)
    bat = model.as_sampleable(params, ctx, guidance_scale=3.0, cfg_batched=True)(x, 400.0, 1.0, 0.0)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(bat), rtol=2e-5, atol=2e-5)
    sseq = model.as_served(params, guidance_scale=3.0)(x, 400.0, 1.0, 0.0, ctx)
    sbat = model.as_served(params, guidance_scale=3.0, cfg_batched=True)(x, 400.0, 1.0, 0.0, ctx)
    np.testing.assert_allclose(np.asarray(sseq), np.asarray(sbat), rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(sseq))
