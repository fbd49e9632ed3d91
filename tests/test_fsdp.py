"""FSDP (ZeRO-3 layout) tests on the virtual 8-device mesh.

Parameters + optimizer moments sharded over ``dp`` must train identically
(to reduction order) to the replicated layout — XLA inserts the
all-gathers / reduce-scatters from the shardings alone.  Composes with the
megatron tp layout from ``DiT.param_spec()``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from skrample_tpu import optim
from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.parallel import (
    constrain,
    fsdp_leaf_spec,
    fsdp_param_specs,
    make_mesh,
    opt_state_specs,
    per_device_bytes,
    shard_tree,
)


def test_leaf_spec_rules():
    # largest free dim wins
    assert fsdp_leaf_spec((512, 1536), 4) == P(None, "dp")
    # composes with tp: takes the dim tp left free
    assert fsdp_leaf_spec((512, 1536), 4, base=P(None, "tp")) == P("dp", "tp")
    assert fsdp_leaf_spec((512, 1536), 4, base=P("tp", None)) == P("tp", "dp")
    # small leaves keep their base layout
    assert fsdp_leaf_spec((128,), 4) == P()
    assert fsdp_leaf_spec((64, 64), 4, base=P(None, "tp"), min_size=2**15) == P(None, "tp")
    # non-divisible dims are ineligible
    assert fsdp_leaf_spec((511, 1533), 4, min_size=1) == P()
    assert fsdp_leaf_spec((511, 1536), 4, min_size=1) == P(None, "dp")
    # axis_size 1 is a no-op
    assert fsdp_leaf_spec((512, 1536), 1) == P()


def _model_and_mesh():
    mesh = make_mesh(dp=4, extra_axes={"tp": 2})
    model = DiT(DiTConfig(patch=2, channels=4, dim=128, depth=2, heads=8, compute_dtype=jnp.float32))
    params = model.init(jax.random.PRNGKey(0))
    return mesh, model, params


def _make_step(model, opt, mesh, specs, batch):
    data_sharding = NamedSharding(mesh, P("dp"))

    def loss_fn(params, x0, noise, sigma):
        s = sigma[:, None, None, None]
        xt = (1 - s) * x0 + s * noise
        pred = model.apply(params, xt, sigma * 1000.0)
        return jnp.mean((pred - (noise - x0)) ** 2)

    @jax.jit
    def step(params, opt_state, key):
        kd, kn, kt = jax.random.split(key, 3)
        x0 = jax.lax.with_sharding_constraint(jax.random.normal(kd, (batch, 4, 8, 8)), data_sharding)
        noise = jax.lax.with_sharding_constraint(jax.random.normal(kn, (batch, 4, 8, 8)), data_sharding)
        sigma = jax.random.uniform(kt, (batch,), minval=1e-3, maxval=1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params, x0, noise, sigma)
        # reduce-scatter the grads into the parameter layout
        grads = constrain(grads, mesh, specs)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def _run(model, params, mesh, specs, opt, steps=3, batch=8):
    params = shard_tree(params, mesh, specs)
    opt_state = shard_tree(opt.init(params), mesh, opt_state_specs(opt.init(params), params, specs, 4))
    step = _make_step(model, opt, mesh, specs, batch)
    losses = []
    with mesh:
        for i in range(steps):
            params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(100 + i))
            losses.append(float(loss))
    return params, opt_state, losses


def test_fsdp_matches_replicated_training():
    mesh, model, params0 = _model_and_mesh()
    tp_specs = model.param_spec()
    fsdp = fsdp_param_specs(params0, 4, base_specs=tp_specs, min_size=1024)

    # the big block weights must actually pick up the dp axis next to tp
    qkv_spec = fsdp["blocks"][0]["qkv"]["w"]
    assert "dp" in str(qkv_spec) and "tp" in str(qkv_spec), qkv_spec

    opt = optax.adamw(1e-3)
    p_ref, _, losses_ref = _run(model, params0, mesh, tp_specs, opt)
    p_fsdp, opt_fsdp, losses = _run(model, params0, mesh, fsdp, opt)

    np.testing.assert_allclose(losses, losses_ref, rtol=1e-5)
    for ref, got in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fsdp)):
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=2e-5, atol=2e-6)

    # the updated params keep the FSDP layout end-to-end
    assert "dp" in str(p_fsdp["blocks"][0]["qkv"]["w"].sharding.spec)

    # memory: each device holds a fraction of the replicated footprint
    full = per_device_bytes(shard_tree(params0, mesh, jax.tree.map(lambda _: P(), params0)))
    assert per_device_bytes(p_fsdp) < 0.55 * full


def test_opt_state_specs_structure():
    mesh, model, params = _model_and_mesh()
    specs = fsdp_param_specs(params, 4, base_specs=model.param_spec(), min_size=1024)
    opt = optax.adamw(1e-3)
    state = opt.init(params)
    sspecs = opt_state_specs(state, params, specs, 4)
    # mu/nu inherit the parameter layout exactly; count is replicated
    assert sspecs[0].mu["blocks"][0]["qkv"]["w"] == specs["blocks"][0]["qkv"]["w"]
    assert sspecs[0].nu["blocks"][0]["mlp_in"]["w"] == specs["blocks"][0]["mlp_in"]["w"]
    assert sspecs[0].count == P()


def test_fsdp_adamw8bit():
    mesh, model, params0 = _model_and_mesh()
    tp_specs = model.param_spec()
    fsdp = fsdp_param_specs(params0, 4, base_specs=tp_specs, min_size=1024)
    opt = optim.adamw8bit(1e-3)

    state = opt.init(params0)
    sspecs = opt_state_specs(state, params0, fsdp, 4)
    # the int8 block-packed moments shard over their blocks axis when divisible
    mom = state.moments["blocks"][0]["qkv"]["w"]
    mspec = sspecs.moments["blocks"][0]["qkv"]["w"]
    if mom.mq.shape[0] % 4 == 0:
        assert mspec.mq == P("dp") and mspec.ms == P("dp"), mspec

    p_ref, _, losses_ref = _run(model, params0, mesh, tp_specs, opt, steps=2)
    p_fsdp, _, losses = _run(model, params0, mesh, fsdp, opt, steps=2)
    # first-step loss is computed before any update: exact to reduction order
    np.testing.assert_allclose(losses[0], losses_ref[0], rtol=1e-5)
    # int8 moment codes may differ by one ulp under a different grad
    # reduction order; the resulting param drift is bounded by lr/127
    for ref, got in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fsdp)):
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=5e-4, rtol=0)


def test_fsdp_generalizes_to_flux_tree():
    """fsdp_param_specs is model-agnostic: it composes with the Flux
    double+single-stream param_spec and the fsdp-sharded forward matches
    the replicated one (weights all-gather on use)."""
    from skrample_tpu.models import Flux, FluxConfig

    mesh = make_mesh(dp=4, extra_axes={"tp": 2})
    model = Flux(
        FluxConfig(
            patch=1, channels=4, dim=128, heads=1, depth=1, single_depth=1,
            context_dim=32, pooled_dim=16, guidance=False,
            rope_axes=(32, 48, 48), compute_dtype=jnp.float32,
        )
    )
    params = model.init(jax.random.PRNGKey(0))
    specs = fsdp_param_specs(params, 4, base_specs=model.param_spec(), min_size=1024)

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 8, 8), jnp.float32)
    t = jnp.full((4,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 32), jnp.float32)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (4, 16), jnp.float32)

    expected = np.asarray(model.apply(params, x, t, ctx, pooled))
    with mesh:
        sharded = shard_tree(params, mesh, specs)
        got = jax.jit(lambda p: model.apply(p, x, t, ctx, pooled))(sharded)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-4)

    # at least one double- and one single-stream weight actually sharded over dp
    flat = jax.tree.leaves_with_path(specs)
    assert any("dp" in str(spec) and "double" in str(path) for path, spec in flat)
    assert any("dp" in str(spec) and "single" in str(path) for path, spec in flat)


def test_fsdp_state_roundtrips_through_checkpointer(tmp_path):
    """Save an FSDP-sharded train state with the orbax TrainCheckpointer,
    restore it INTO the fsdp shardings (like=), continue one step: identical
    to uninterrupted training, and the restored leaves land dp-sharded."""
    from skrample_tpu.models.checkpoint import TrainCheckpointer

    mesh, model, params0 = _model_and_mesh()
    specs = fsdp_param_specs(params0, 4, base_specs=model.param_spec(), min_size=1024)
    opt = optax.adamw(1e-3)

    p_straight, o_straight, _ = _run(model, params0, mesh, specs, opt, steps=2)

    p1, o1, _ = _run(model, params0, mesh, specs, opt, steps=1)
    with TrainCheckpointer(tmp_path / "fsdp") as ckpt:
        ckpt.save(1, {"params": p1, "opt": o1})
        ckpt.wait()
        restored = ckpt.restore(like={"params": p1, "opt": o1})
    rp, ro = restored["params"], restored["opt"]
    assert "dp" in str(rp["blocks"][0]["qkv"]["w"].sharding.spec)

    step = _make_step(model, opt, mesh, specs, batch=8)
    with mesh:
        p2, _o2, loss = step(rp, ro, jax.random.PRNGKey(101))
    assert np.isfinite(float(loss))
    for ref, got in zip(jax.tree.leaves(p_straight), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-6, atol=1e-7)



if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
