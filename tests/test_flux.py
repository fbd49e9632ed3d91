"""Flux model family: kernels, FLOPs accounting, training path, sharding
specs.  (Checkpoint-import parity lives in test_import_weights.TestFlux;
stack glue in test_flux_stack.)"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skrample_tpu.models import Flux, FluxConfig


def small_config(**kw) -> FluxConfig:
    base = dict(
        dim=64,
        depth=2,
        single_depth=2,
        heads=4,
        context_dim=32,
        pooled_dim=24,
        rope_axes=(4, 6, 6),
        compute_dtype=jnp.float32,
        attention="full",
    )
    base.update(kw)
    return FluxConfig(**base)


def inputs(key=0, batch=2, hw=8, txt=12, cfg: FluxConfig | None = None):
    c = cfg or small_config()
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    x = jax.random.normal(ks[0], (batch, c.channels, hw, hw))
    ctx = jax.random.normal(ks[1], (batch, txt, c.context_dim))
    pooled = jax.random.normal(ks[2], (batch, c.pooled_dim))
    t = jax.random.uniform(ks[3], (batch,)) * 1000.0
    return x, t, ctx, pooled


def test_rope_text_rows_are_identity() -> None:
    "Text ids are all-zero: their rotation rows must be cos=1, sin=0."
    model = Flux(small_config())
    cos, sin = model._rope_tables(5, 4, 4)
    np.testing.assert_array_equal(np.asarray(cos[:5]), 1.0)
    np.testing.assert_array_equal(np.asarray(sin[:5]), 0.0)
    # image rows at distinct grid positions rotate differently
    assert not np.allclose(np.asarray(cos[5]), np.asarray(cos[-1]))


def test_rope_relative_position_property() -> None:
    """The defining RoPE property, independent of any mirror: rotated
    q . k depends only on the POSITION DIFFERENCE, so translating both
    tokens by the same grid offset leaves every attention logit unchanged."""
    model = Flux(small_config())
    cos, sin = model._rope_tables(0, 8, 8)  # image rows only, ids (0, y, x)

    def rotate(vec, row):  # consecutive-pair rotation with table row `row`
        pairs = vec.reshape(-1, 2)
        c, s = np.asarray(cos[row]), np.asarray(sin[row])
        return np.stack([pairs[:, 0] * c - pairs[:, 1] * s, pairs[:, 0] * s + pairs[:, 1] * c], -1).ravel()

    rng = np.random.default_rng(0)
    q = rng.normal(size=model.config.head_dim)
    k = rng.normal(size=model.config.head_dim)

    def logit(pos_q, pos_k):  # positions as (y, x) on the 8x8 grid
        return float(np.dot(rotate(q, pos_q[0] * 8 + pos_q[1]), rotate(k, pos_k[0] * 8 + pos_k[1])))

    base = logit((2, 3), (5, 6))
    for dy, dx in ((1, 1), (2, 0), (0, 1)):
        shifted = logit((2 + dy, 3 + dx), (5 + dy, 6 + dx))
        np.testing.assert_allclose(shifted, base, rtol=1e-6)
    # and it genuinely DOES depend on the relative offset
    assert abs(logit((2, 3), (6, 6)) - base) > 1e-3


def test_flash_matches_full_at_head_dim_128() -> None:
    "The fused Pallas path (interpret mode on CPU) == the einsum oracle."
    kwargs = dict(
        dim=256, depth=1, single_depth=1, heads=2, context_dim=32, pooled_dim=24, rope_axes=(32, 48, 48)
    )
    full = Flux(small_config(**kwargs))
    flash = Flux(small_config(**kwargs, attention="flash"))
    assert flash.config.head_dim == 128
    params = full.init(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda leaf: leaf + 0.02 * jax.random.normal(jax.random.PRNGKey(7), leaf.shape, leaf.dtype), params
    )
    # joint tokens must tile 128: 16 img (8x8 latent, patch 2) + 112 txt
    x, t, ctx, pooled = inputs(cfg=full.config, txt=112)
    a = full.apply(params, x, t, ctx, pooled, guidance=3.5)
    b = flash.apply(params, x, t, ctx, pooled, guidance=3.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


def test_flops_formula_matches_trace() -> None:
    "The analytic FLOPs count matches a traced count of every dense/attention."
    from skrample_tpu.models import flux as flux_mod
    from skrample_tpu.models.flux import flux_forward_flops

    config = small_config()
    model = Flux(config)
    params = model.init(jax.random.PRNGKey(0))
    x, t, ctx, pooled = inputs()

    total = 0.0
    orig_dense = flux_mod._dense

    def dense(p, xx, dtype):
        nonlocal total
        total += 2.0 * p["w"].shape[0] * p["w"].shape[1] * (xx.size // xx.shape[-1])
        return orig_dense(p, xx, dtype)

    orig_attn = Flux._attention

    def attention(self, qkv):
        nonlocal total
        n = qkv.shape[1]
        total += 4.0 * qkv.shape[0] * n * n * config.dim
        return orig_attn(self, qkv)

    flux_mod._dense, Flux._attention = dense, attention
    try:
        jax.eval_shape(lambda: model.apply(params, x, t, ctx, pooled, guidance=3.5))
    finally:
        flux_mod._dense, Flux._attention = orig_dense, orig_attn

    analytic = flux_forward_flops(config, 2, 8, 8, 12)
    assert abs(total - analytic) / total < 0.02, (total, analytic)


def test_remat_grads_equal() -> None:
    cfg = small_config()
    plain, remat = Flux(cfg), Flux(small_config(remat=True))
    params = plain.init(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda leaf: leaf + 0.02 * jax.random.normal(jax.random.PRNGKey(7), leaf.shape, leaf.dtype), params
    )
    x, t, ctx, pooled = inputs()

    def loss(m):
        return lambda p: jnp.mean(m.apply(p, x, t, ctx, pooled, guidance=3.5) ** 2)

    g1 = jax.grad(loss(plain))(params)
    g2 = jax.grad(loss(remat))(params)
    g3 = jax.grad(loss(Flux(small_config(remat="dots"))))(params)
    # not bitwise: XLA fuses the rematerialized forward differently inside
    # the backward (reassociated reductions); equality is to f32 roundoff
    for g in (g2, g3):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
            g1,
            g,
        )
    with pytest.raises(ValueError, match="remat"):
        Flux(small_config(remat="bogus")).apply(params, x, t, ctx, pooled, guidance=3.5)


def test_param_spec_matches_tree() -> None:
    for guidance in (True, False):
        model = Flux(small_config(guidance=guidance))
        params = model.init(jax.random.PRNGKey(0))
        jax.tree.map(lambda w, s: None, params, model.param_spec())
    # the quantized spec needs block matmuls big enough to actually quantize
    model = Flux(small_config(dim=256, heads=2, rope_axes=(32, 48, 48)))
    q = model.quantize_params(model.init(jax.random.PRNGKey(0)))
    jax.tree.map(lambda w, s: None, q, model.param_spec(quantized=True))


def test_quantized_tree_runs_close() -> None:
    model = Flux(small_config(dim=256, heads=2, rope_axes=(32, 48, 48)))
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda leaf: leaf + 0.02 * jax.random.normal(jax.random.PRNGKey(7), leaf.shape, leaf.dtype), params
    )
    x, t, ctx, pooled = inputs(cfg=model.config)
    a = np.asarray(model.apply(params, x, t, ctx, pooled, guidance=3.5)).ravel()
    b = np.asarray(model.apply(model.quantize_params(params), x, t, ctx, pooled, guidance=3.5)).ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99, cos


def test_flow_matching_loss_decreases() -> None:
    "The training path end-to-end: adamw on a flow-matching objective."
    import optax

    model = Flux(small_config(depth=1, single_depth=1))
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adamw(2e-3)
    opt_state = opt.init(params)
    x, _, ctx, pooled = inputs(batch=4)
    noise = jax.random.normal(jax.random.PRNGKey(9), x.shape)

    def loss_fn(p, sigma):
        s = sigma[:, None, None, None]
        xt = (1 - s) * x + s * noise
        pred = model.apply(p, xt, sigma * 1000.0, ctx, pooled, guidance=3.5)
        return jnp.mean((pred - (noise - x)) ** 2)

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


def test_guidance_contract() -> None:
    import pytest

    model = Flux(small_config())
    params = model.init(jax.random.PRNGKey(0))
    x, t, ctx, pooled = inputs()
    with pytest.raises(ValueError, match="guidance"):
        model.apply(params, x, t, ctx, pooled)  # dev needs guidance
    schnell = Flux(small_config(guidance=False))
    sp = schnell.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="guidance"):
        schnell.apply(sp, x, t, ctx, pooled, guidance=3.5)  # schnell forbids it


def test_as_served_matches_as_sampleable() -> None:
    """The traced-context serving closure (`as_served`, what the
    conditioned engines call with per-request (context, pooled) pairs)
    computes exactly what the bound-context closure does."""
    model = Flux(small_config())
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda leaf: leaf + 0.02 * jax.random.normal(jax.random.PRNGKey(7), leaf.shape, leaf.dtype), params
    )
    x, t, ctx, pooled = inputs()
    bound = model.as_sampleable(params, ctx, pooled, guidance=3.5)(x, t, 1.0, 0.0)
    served = model.as_served(params, guidance=3.5)(x, t, 1.0, 0.0, (ctx, pooled))
    np.testing.assert_array_equal(np.asarray(served), np.asarray(bound))
    # per-request contexts actually matter
    other = model.as_served(params, guidance=3.5)(x, t, 1.0, 0.0, (ctx + 1.0, pooled))
    assert np.abs(np.asarray(other) - np.asarray(served)).max() > 0
