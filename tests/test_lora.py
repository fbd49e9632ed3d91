"""LoRA fine-tuning: low-rank adapters over a frozen base tree."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from skrample_tpu.models import DiT, DiTConfig, MMDiT, MMDiTConfig, lora_init, lora_merge, lora_param_count


def _dit():
    model = DiT(DiTConfig(patch=2, channels=4, dim=64, depth=2, heads=4, compute_dtype=jnp.float32))
    return model, model.init(jax.random.PRNGKey(0))


def test_identity_at_init():
    "b = 0 -> the merged model IS the base, bit for bit."
    model, params = _dit()
    adapters = lora_init(jax.random.PRNGKey(1), params, rank=4)
    merged = lora_merge(params, adapters)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(model.apply(merged, x, jnp.full((2,), 500.0))),
        np.asarray(model.apply(params, x, jnp.full((2,), 500.0))),
    )


def test_targets_and_size():
    model, params = _dit()
    adapters = lora_init(jax.random.PRNGKey(1), params, rank=4)
    # every block dense is adapted; biases / modulation tables are not
    assert any("qkv" in k for k in adapters)
    assert any("mlp_in" in k for k in adapters)
    assert not any("'b'" in k.split("[")[-1] for k in adapters)
    base_count = sum(int(leaf.size) for leaf in jax.tree.leaves(params))
    assert lora_param_count(adapters) < 0.2 * base_count

    with pytest.raises(ValueError, match="no LoRA targets"):
        lora_init(jax.random.PRNGKey(1), {"x": jnp.zeros((4,))}, rank=4)


def test_adapter_training_decreases_loss_and_freezes_base():
    model, params = _dit()
    adapters = lora_init(jax.random.PRNGKey(1), params, rank=4)
    opt = optax.adam(1e-2)
    opt_state = opt.init(adapters)

    x0 = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 8, 8), jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(4), (4, 4, 8, 8), jnp.float32)
    sigma = jnp.asarray([0.2, 0.4, 0.6, 0.8])

    def loss_fn(ad):
        merged = lora_merge(params, ad)  # params are a closure constant: frozen
        s = sigma[:, None, None, None]
        pred = model.apply(merged, (1 - s) * x0 + s * noise, sigma * 1000.0)
        return jnp.mean((pred - (noise - x0)) ** 2)

    @jax.jit
    def step(ad, o):
        loss, grads = jax.value_and_grad(loss_fn)(ad)
        updates, o = opt.update(grads, o)
        return optax.apply_updates(ad, updates), o, loss

    base_snapshot = jax.tree.map(np.asarray, params)
    first = last = None
    for _ in range(80):
        adapters, opt_state, loss = step(adapters, opt_state)
        first = float(loss) if first is None else first
        last = float(loss)
    assert last < 0.65 * first, (first, last)
    # the base tree was never touched
    for ref, got in zip(jax.tree.leaves(base_snapshot), jax.tree.leaves(params)):
        np.testing.assert_array_equal(ref, np.asarray(got))
    # and the trained adapters actually change the model
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 8, 8), jnp.float32)
    out_base = np.asarray(model.apply(params, x, jnp.full((1,), 500.0)))
    out_tuned = np.asarray(model.apply(lora_merge(params, adapters), x, jnp.full((1,), 500.0)))
    assert np.abs(out_tuned - out_base).max() > 1e-4


def test_bf16_base_accumulates_delta_in_f32():
    "The low-rank delta is added in f32 even when the frozen base is bf16."
    _, params = _dit()
    base16 = jax.tree.map(lambda leaf: leaf.astype(jnp.bfloat16), params)
    adapters = lora_init(jax.random.PRNGKey(1), params, rank=4)
    # give b a tiny value far below bf16 resolution at |w| ~ 1
    adapters = jax.tree.map(lambda leaf: jnp.full_like(leaf, 1e-4), adapters)
    merged = lora_merge(base16, adapters)
    k = next(k for k in adapters)
    # dtype preserved (frozen base stays bf16 in memory)
    flat = {jax.tree_util.keystr(p): leaf for p, leaf in jax.tree_util.tree_flatten_with_path(merged)[0]}
    assert flat[k].dtype == jnp.bfloat16


def test_scale_and_generality_mmdit():
    "scale=0 is the base; the matcher generalizes to the MMDiT tree."
    model = MMDiT(
        MMDiTConfig(
            patch=2, channels=4, dim=64, depth=2, heads=4, context_dim=32, context_tokens=128,
            attention="full", compute_dtype=jnp.float32,
        )
    )
    params = model.init(jax.random.PRNGKey(0))
    adapters = lora_init(jax.random.PRNGKey(1), params, rank=4)
    assert any("img" in k for k in adapters) and any("txt" in k for k in adapters)
    # non-zero adapters at scale 0 change nothing
    adapters = jax.tree.map(lambda leaf: jnp.ones_like(leaf), adapters)
    merged0 = lora_merge(params, adapters, scale=0.0)
    for ref, got in zip(jax.tree.leaves(params), jax.tree.leaves(merged0)):
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_merge_composes_with_int8_serving():
    "Tune -> merge once -> quantize: the serving path runs on the merged tree."
    model, params = _dit()
    adapters = lora_init(jax.random.PRNGKey(1), params, rank=4)
    adapters = jax.tree.map(lambda leaf: leaf + 0.01, adapters)
    merged = lora_merge(params, adapters)
    q = model.quantize_params(merged)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 8, 8), jnp.float32)
    out = model.apply(q, x, jnp.full((1,), 500.0))
    assert bool(jnp.isfinite(out).all())
