"""MMDiT (dual-stream text-conditioned transformer) model family.

The reference has no model code (SURVEY.md §2.0); this is the SD3/Flux-class
conditioned architecture its wrappers are driven by in practice
(`/root/reference/examples/diffusers/wrapper.py` runs Flux pipelines), so the
tests here exercise conditioning, classifier-free guidance, joint attention
kernel parity, and the training path on the third model family.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from skrample_tpu import scheduling
from skrample_tpu.models import MMDiT, MMDiTConfig
from skrample_tpu.sampling import models, structured


def small_config(**kw) -> MMDiTConfig:
    base = dict(
        dim=256, depth=2, heads=2, context_dim=192, context_tokens=128, compute_dtype=jnp.float32
    )
    base.update(kw)
    return MMDiTConfig(**base)


def wake_params(model: MMDiT, key: jax.Array) -> dict:
    """init() uses adaLN-zero (modulation heads and final_out start at 0), so a
    fresh model outputs exactly zero.  Replace the zero weights with small
    random ones so conditioning actually reaches the output in tests."""
    params = model.init(key)
    keys = iter(jax.random.split(jax.random.fold_in(key, 1), 2 + 2 * len(params["blocks"])))
    for name in ("final_mod", "final_out"):
        params[name]["w"] = jax.random.normal(next(keys), params[name]["w"].shape, jnp.float32) * 0.02
    for block in params["blocks"]:
        for stream in ("img", "txt"):
            block[stream]["ada"]["w"] = (
                jax.random.normal(next(keys), block[stream]["ada"]["w"].shape, jnp.float32) * 0.02
            )
    return params


def test_conditioning_reaches_output() -> None:
    model = MMDiT(small_config())
    params = wake_params(model, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 192), jnp.float32)

    out_c = model.apply(params, x, jnp.float32(500.0), ctx)
    out_u = model.apply(params, x, jnp.float32(500.0), None)
    assert out_c.shape == x.shape
    assert bool(jnp.isfinite(out_c).all())
    assert float(jnp.abs(out_c - out_u).max()) > 1e-6

    # different prompts -> different predictions
    ctx2 = jax.random.normal(jax.random.PRNGKey(3), (2, 77, 192), jnp.float32)
    out_c2 = model.apply(params, x, jnp.float32(500.0), ctx2)
    assert float(jnp.abs(out_c - out_c2).max()) > 1e-6


def test_context_static_shape_rules() -> None:
    "Short prompts pad with the learned null embedding; long ones truncate."
    model = MMDiT(small_config())
    params = wake_params(model, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16), jnp.float32)
    ctx_full = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 192), jnp.float32)

    # a 128-token context passed whole == the same context pre-truncated from 200
    ctx_long = jnp.concatenate(
        [ctx_full, jax.random.normal(jax.random.PRNGKey(3), (1, 72, 192), jnp.float32)], axis=1
    )
    out_full = model.apply(params, x, jnp.float32(300.0), ctx_full)
    out_long = model.apply(params, x, jnp.float32(300.0), ctx_long)
    np.testing.assert_array_equal(np.asarray(out_full), np.asarray(out_long))

    # a short context == the same context hand-padded with the null rows
    ctx_short = ctx_full[:, :77]
    padded = jnp.concatenate(
        [ctx_short, jnp.broadcast_to(params["ctx_null"][77:], (1, 51, 192))], axis=1
    )
    out_short = model.apply(params, x, jnp.float32(300.0), ctx_short)
    out_padded = model.apply(params, x, jnp.float32(300.0), padded)
    np.testing.assert_array_equal(np.asarray(out_short), np.asarray(out_padded))


def test_joint_attention_full_vs_flash() -> None:
    """The packed Pallas joint attention (interpret mode off-TPU) matches the
    einsum oracle at a joint token count that exercises the divisor-fit
    tiling: 256 image + 128 text = 384 = 3 x 128."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32, 32), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 100, 192), jnp.float32)
    outs = {}
    for attention in ("full", "flash"):
        model = MMDiT(small_config(heads=2, dim=256, attention=attention))
        params = wake_params(model, jax.random.PRNGKey(0))
        outs[attention] = np.asarray(model.apply(params, x, jnp.float32(400.0), ctx))
    np.testing.assert_allclose(outs["full"], outs["flash"], rtol=2e-5, atol=2e-5)


def test_cfg_batched_equals_two_pass() -> None:
    "The batched CFG closure == u + s * (c - u) from two separate forwards."
    model = MMDiT(small_config())
    params = wake_params(model, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 192), jnp.float32)
    scale = 3.5

    guided = model.as_sampleable(params, ctx, guidance_scale=scale)
    got = guided(x, jnp.float32(500.0), 1.0, 0.0)
    c = model.apply(params, x, jnp.float32(500.0), ctx)
    u = model.apply(params, x, jnp.float32(500.0), None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(u + scale * (c - u)), rtol=1e-5, atol=1e-5)


def test_generation_end_to_end() -> None:
    "Flow-matching generation through the pipeline with CFG, deterministic by key."
    from skrample_tpu.pipeline import GenerationPipeline

    model = MMDiT(small_config())
    params = wake_params(model, jax.random.PRNGKey(0))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 192), jnp.float32)

    pipe = GenerationPipeline(
        model_fn=model.as_sampleable(params, ctx, guidance_scale=2.0),
        sampler=structured.DPM(order=2),
        schedule=scheduling.FlowShift(scheduling.Linear()),
        model_transform=models.FlowModel(),
        steps=4,
        latent_shape=(1, 4, 16, 16),
    )
    out1 = pipe.generate(jax.random.PRNGKey(0))
    assert out1.shape == (1, 4, 16, 16)
    assert bool(jnp.isfinite(out1).all())
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(pipe.generate(jax.random.PRNGKey(0))))
    assert not np.allclose(np.asarray(out1), np.asarray(pipe.generate(jax.random.PRNGKey(1))))


def test_remat_matches_plain() -> None:
    """jax.checkpoint blocks change memory, not math: forward bit-equal,
    grads within fp reassociation (same tolerance as the DiT remat test)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 192), jnp.float32)
    fwd, grads = {}, {}
    for remat in (False, True, "dots"):
        model = MMDiT(small_config(remat=remat))
        params = wake_params(model, jax.random.PRNGKey(0))
        fwd[remat] = np.asarray(model.apply(params, x, jnp.float32(500.0), ctx))

        def loss(p, m=model):
            return (m.apply(p, x, jnp.float32(500.0), ctx) ** 2).mean()

        grads[remat] = jax.jit(jax.grad(loss))(params)
    for mode in (True, "dots"):
        np.testing.assert_array_equal(fwd[False], fwd[mode])
        for a, b in zip(jax.tree.leaves(grads[False]), jax.tree.leaves(grads[mode]), strict=True):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_tp_spec_matches_param_tree() -> None:
    "param_spec mirrors the params pytree (plain and int8-quantized)."
    model = MMDiT(small_config())
    params = model.init(jax.random.PRNGKey(0))
    is_spec = lambda z: isinstance(z, jax.sharding.PartitionSpec)  # noqa: E731
    jax.tree.map(lambda a, b: None, params, model.param_spec(), is_leaf=is_spec)

    qparams = model.quantize_params(params)
    jax.tree.map(lambda a, b: None, qparams, model.param_spec(quantized=True), is_leaf=is_spec)


def test_int8_serving_tree_close_to_f32() -> None:
    model = MMDiT(small_config())
    params = wake_params(model, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 192), jnp.float32)

    ref = np.asarray(model.apply(params, x, jnp.float32(500.0), ctx)).ravel()
    got = np.asarray(model.apply(model.quantize_params(params), x, jnp.float32(500.0), ctx)).ravel()
    cos = float(np.dot(ref, got) / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-12))
    assert cos > 0.99, cos


def test_flops_formula_matches_trace() -> None:
    "The analytic FLOPs count matches a traced count of every dense/attention."
    from skrample_tpu.models import mmdit as mmdit_mod
    from skrample_tpu.models.mmdit import mmdit_forward_flops

    config = small_config()
    model = MMDiT(config)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 4, 16, 16), jnp.float32)
    ctx = jnp.zeros((2, 128, 192), jnp.float32)

    total = 0.0
    orig_dense = mmdit_mod._dense

    def dense(p, xx, dtype):
        nonlocal total
        total += 2.0 * p["w"].shape[0] * p["w"].shape[1] * (xx.size // xx.shape[-1])
        return orig_dense(p, xx, dtype)

    orig_joint = MMDiT._joint_attention

    def joint(self, qkv_img, qkv_txt):
        nonlocal total
        n = qkv_img.shape[1] + qkv_txt.shape[1]
        total += 4.0 * qkv_img.shape[0] * n * n * config.dim
        return orig_joint(self, qkv_img, qkv_txt)

    mmdit_mod._dense, MMDiT._joint_attention = dense, joint
    try:
        jax.eval_shape(lambda: model.apply(params, x, jnp.float32(1.0), ctx))
    finally:
        mmdit_mod._dense, MMDiT._joint_attention = orig_dense, orig_joint

    analytic = mmdit_forward_flops(config, 2, 16, 16)
    # t_mlp1/t_mlp2/patch-dims are the only terms the closed form rounds; keep them within 2%
    assert abs(total - analytic) / total < 0.02, (total, analytic)


def test_per_request_guidance_scale() -> None:
    """as_served(per_request_scale=True): each request carries (context,
    scale) and the CFG mix uses its own scale — one executable for every
    (prompt, guidance) combination."""
    from skrample_tpu.serving import ServingEngine

    model = MMDiT(small_config())
    params = wake_params(model, jax.random.PRNGKey(0))
    served = model.as_served(params, per_request_scale=True)

    # closure-level: per-item scales == the scalar formula per item
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 192), jnp.float32)
    scales = jnp.asarray([1.5, 6.0], jnp.float32)
    got = served(x, jnp.float32(500.0), 1.0, 0.0, (ctx, scales))
    c = model.apply(params, x, jnp.float32(500.0), ctx)
    u = model.apply(params, x, jnp.float32(500.0), None)
    ref = u + scales[:, None, None, None] * (c - u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    # engine-level: mixed scales batch together, bit-equal to solo runs,
    # sharing one executable
    kwargs = dict(
        sampler=structured.DPM(order=2),
        schedule=scheduling.FlowShift(scheduling.Linear()),
        model_transform=models.FlowModel(),
        item_shape=(4, 16, 16),
        steps=4,
        conditioned=True,
    )
    ctx1 = jax.random.normal(jax.random.PRNGKey(3), (77, 192), jnp.float32)
    requests = [(ctx1, jnp.float32(1.0)), (ctx1, jnp.float32(4.0)), (ctx1 * 0.5, jnp.float32(4.0))]
    with ServingEngine(served, buckets=(1,), **kwargs) as engine:
        ref_out = [np.asarray(engine.generate(k, context=r)) for k, r in enumerate(requests)]
    with ServingEngine(served, buckets=(4,), max_delay_ms=50.0, **kwargs) as engine:
        futs = [engine.submit(k, context=r) for k, r in enumerate(requests)]
        got_out = [np.asarray(f.result()) for f in futs]
        assert len(engine._executables) == 1
    for r, g in zip(ref_out, got_out):
        np.testing.assert_array_equal(r, g)
    # the scale knob matters: same prompt, different guidance -> different image
    assert not np.array_equal(got_out[0], got_out[1])
