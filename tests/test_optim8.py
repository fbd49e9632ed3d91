"""8-bit block-quantized AdamW (`skrample_tpu.optim`).

Three tiers: code round-trip error bounds, trajectory agreement with
float32 optax.adamw (exact on the small-leaf path, statistical on the
quantized path), and equal-quality convergence on a real tiny-DiT
flow-matching objective.  Plus the memory claim itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from skrample_tpu import optim

HYPER = dict(learning_rate=1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-4)


def test_signed_roundtrip_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 256)) * 3.0
    q, s = optim._quant_signed(x)
    back = optim._dequant_signed(q, s)
    err = np.abs(np.asarray(back - x))
    # worst case of the cubic code is at the block max: d(t^3) = 3 t^2 dt,
    # dt = 1/254 (round-to-nearest) -> 3/254 of the scale
    assert err.max() <= np.asarray(s).max() * (3.0 / 254.0) * 1.01
    # near-zero values get *finer* steps than a linear code would give
    small = np.abs(np.asarray(x)) < 0.01 * np.asarray(s)
    assert err[small].max() <= np.asarray(s).max() * 1e-3


def test_pos_roundtrip_and_zero_blocks():
    v = jax.random.uniform(jax.random.PRNGKey(1), (4, 256)) ** 2
    q, s = optim._quant_pos(v)
    back = optim._dequant_pos(q, s)
    assert np.all(np.asarray(back) >= 0)
    err = np.abs(np.asarray(back - v))
    assert err.max() <= np.asarray(s).max() * (4.0 / 254.0) * 1.01
    # all-zero block: scale 1, exact zeros, no NaN
    qz, sz = optim._quant_pos(jnp.zeros((2, 256)))
    assert np.all(np.asarray(sz) == 1.0)
    assert np.all(np.asarray(optim._dequant_pos(qz, sz)) == 0.0)


def test_small_leaf_path_matches_optax_exactly():
    "Leaves under min_quant_size keep f32 moments -> bitwise-near optax.adamw."
    params = {"w": jax.random.normal(jax.random.PRNGKey(2), (17, 5)), "b": jnp.zeros((5,))}
    mine, ref = optim.adamw8bit(**HYPER), optax.adamw(**HYPER)
    s_m, s_r = mine.init(params), ref.init(params)
    p_m = p_r = params
    for i in range(20):
        g = jax.tree.map(lambda p: jnp.sin(p + i) * 0.1, p_r)
        u_m, s_m = mine.update(g, s_m, p_m)
        u_r, s_r = ref.update(g, s_r, p_r)
        p_m = optax.apply_updates(p_m, u_m)
        p_r = optax.apply_updates(p_r, u_r)
    for a, b in zip(jax.tree.leaves(p_m), jax.tree.leaves(p_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_quantized_trajectory_tracks_f32():
    "100 steps on a quadratic: 8-bit params stay close to f32 adamw's."
    key = jax.random.PRNGKey(3)
    target = jax.random.normal(key, (64, 256))
    params = {"w": jnp.zeros((64, 256))}

    def grad_fn(p):
        return {"w": p["w"] - target}

    mine = optim.adamw8bit(**HYPER, min_quant_size=1)  # force the 8-bit path
    ref = optax.adamw(**HYPER)
    s_m, s_r = mine.init(params), ref.init(params)
    p_m = p_r = params
    for _ in range(100):
        u_m, s_m = mine.update(grad_fn(p_m), s_m, p_m)
        u_r, s_r = ref.update(grad_fn(p_r), s_r, p_r)
        p_m = optax.apply_updates(p_m, u_m)
        p_r = optax.apply_updates(p_r, u_r)
    assert isinstance(jax.tree.leaves(s_m.moments, is_leaf=lambda x: isinstance(x, optim.Moment8))[0], optim.Moment8)
    a, b = np.asarray(p_m["w"]), np.asarray(p_r["w"])
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999
    # both made comparable progress toward the target
    d_m = float(np.linalg.norm(a - np.asarray(target)))
    d_r = float(np.linalg.norm(b - np.asarray(target)))
    assert d_m < 1.1 * d_r + 1e-3


def test_converges_like_f32_on_tiny_dit():
    "Real objective: flow-matching loss on a tiny DiT, 8-bit vs f32 adamw."
    from skrample_tpu.models import DiT, DiTConfig

    config = DiTConfig(dim=64, depth=2, heads=2, patch=4)
    model = DiT(config)
    params = model.init(jax.random.PRNGKey(0))

    def loss_fn(p, x0, noise, sigma):
        s = sigma[:, None, None, None]
        xt = (1 - s) * x0 + s * noise
        pred = model.apply(p, xt, sigma * 1000.0)
        return jnp.mean((pred - (noise - x0)) ** 2)

    def run(tx, steps=40):
        state = tx.init(params)
        p = params

        @jax.jit
        def one(p, state, key):
            kd, kn, kt = jax.random.split(key, 3)
            x0 = jax.random.normal(kd, (4, 4, 16, 16))
            noise = jax.random.normal(kn, (4, 4, 16, 16))
            sigma = jax.random.uniform(kt, (4,), minval=1e-3, maxval=1.0)
            loss, grads = jax.value_and_grad(loss_fn)(p, x0, noise, sigma)
            upd, state = tx.update(grads, state, p)
            return optax.apply_updates(p, upd), state, loss

        losses = []
        for i in range(steps):
            p, state, loss = one(p, state, jax.random.PRNGKey(i))
            losses.append(float(loss))
        return losses

    hyper = dict(HYPER, learning_rate=3e-3)
    l8 = run(optim.adamw8bit(**hyper, min_quant_size=256))
    l32 = run(optax.adamw(**hyper))
    # same seeds, same data: both made progress, and final quality is
    # equal-ish (the absolute drop is small — a 40-step tiny model on a
    # noise-matching objective moves slowly; the *comparison* is the test)
    assert np.mean(l8[-5:]) < np.mean(l8[:3])
    assert np.mean(l32[-5:]) < np.mean(l32[:3])
    assert np.mean(l8[-5:]) < 1.1 * np.mean(l32[-5:]) + 0.02


def test_memory_is_quarter_of_adam():
    params = {"w": jnp.zeros((512, 512)), "e": jnp.zeros((128, 2048))}
    n = sum(p.size for p in jax.tree.leaves(params))
    s8 = optim.adamw8bit(**HYPER).init(params)
    s32 = optax.adamw(**HYPER).init(params)
    b8, b32 = optim.optimizer_state_bytes(s8), optim.optimizer_state_bytes(s32)
    assert b32 >= 8 * n
    assert b8 <= 0.27 * b32  # ~2.03 bytes/param vs 8
    assert b8 >= 2 * n  # and it is not fake-compressing


def test_schedule_and_scan_compile():
    "Callable lr + update inside lax.scan: one compiled epoch."
    params = {"w": jnp.ones((64, 128))}
    sched = optax.cosine_decay_schedule(1e-3, 50)
    tx = optim.adamw8bit(learning_rate=sched, min_quant_size=1)
    state = tx.init(params)

    def body(carry, _):
        p, s = carry
        g = jax.tree.map(lambda x: x * 0.01, p)
        u, s = tx.update(g, s, p)
        return (optax.apply_updates(p, u), s), None

    (p2, s2), _ = jax.jit(lambda c: jax.lax.scan(body, c, None, length=7))((params, state))
    assert int(s2.count) == 7
    assert np.isfinite(np.asarray(p2["w"])).all()


def test_non_multiple_block_padding():
    "Leaf sizes that are not block multiples pad losslessly."
    params = {"w": jax.random.normal(jax.random.PRNGKey(9), (37, 113))}
    tx = optim.adamw8bit(**HYPER, min_quant_size=1, block=256)
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    u, state = tx.update(g, state, params)
    assert u["w"].shape == (37, 113)
    assert np.isfinite(np.asarray(u["w"])).all()


def test_requires_params():
    tx = optim.adamw8bit(**HYPER)
    state = tx.init({"w": jnp.zeros((8, 8))})
    with pytest.raises(ValueError):
        tx.update({"w": jnp.zeros((8, 8))}, state)


# --- stochastic rounding -------------------------------------------------


def test_sr_probability_matches_distance():
    "x a quarter of the way between bf16 neighbors -> rounds up ~25% of keys."
    # bf16 ulp at 1.0 is 2^-7 (7 mantissa bits); 1.0 + 0.25 * ulp is f32-exact
    ulp = 2.0**-7
    x = jnp.full((4096,), 1.0 + 0.25 * ulp, jnp.float32)
    out = optim.stochastic_round_bf16(jax.random.PRNGKey(0), x)
    vals = np.asarray(out, np.float32)
    assert set(np.unique(vals)) <= {1.0, 1.0 + ulp}
    frac_up = float((vals > 1.0).mean())
    assert abs(frac_up - 0.25) < 0.03, frac_up


def test_sr_exact_and_nonfinite_pass_through():
    exact = jnp.asarray([0.0, -1.5, 256.0, 2.0**-20], jnp.float32)  # all bf16-exact
    for seed in range(5):
        out = optim.stochastic_round_bf16(jax.random.PRNGKey(seed), exact)
        np.testing.assert_array_equal(np.asarray(out, np.float32), np.asarray(exact))
    weird = jnp.asarray([np.inf, -np.inf, np.nan], jnp.float32)
    out = np.asarray(optim.stochastic_round_bf16(jax.random.PRNGKey(0), weird), np.float32)
    assert out[0] == np.inf and out[1] == -np.inf and np.isnan(out[2])


def test_sr_unbiased_mean():
    "Expected value over keys equals the input to statistical tolerance."
    x = jax.random.normal(jax.random.PRNGKey(7), (512,)) * 3.0
    outs = jax.vmap(lambda k: optim.stochastic_round_bf16(k, x).astype(jnp.float32))(
        jax.random.split(jax.random.PRNGKey(1), 1024)
    )
    mean = np.asarray(outs, np.float64).mean(axis=0)
    # per-element se <= ulp/(2 sqrt(K)) ~ 1.2e-4 relative; allow 6 sigma
    rel = np.abs(mean - np.asarray(x, np.float64)) / np.maximum(np.abs(np.asarray(x, np.float64)), 1e-6)
    assert rel.max() < 8e-4, rel.max()


def test_sr_training_progresses_where_nearest_stalls():
    """The motivating failure: updates below half a bf16 ULP.  Round-to-
    nearest drops every one of them (params frozen forever); SR integrates
    them at the correct rate."""
    p0 = jnp.full((256,), 1.0, jnp.bfloat16)
    upd = jnp.full((256,), 1e-3, jnp.float32)  # ~ulp/8 at 1.0 (ulp = 2^-7)

    nearest = p0
    sr = p0
    for i in range(200):
        nearest = (nearest.astype(jnp.float32) + upd).astype(jnp.bfloat16)
        sr = optim.apply_updates_sr(sr, upd, jax.random.fold_in(jax.random.PRNGKey(0), i))
    assert float(jnp.max(jnp.abs(nearest.astype(jnp.float32) - 1.0))) == 0.0  # frozen
    drift = float(jnp.mean(sr.astype(jnp.float32))) - 1.0
    assert abs(drift - 0.2) < 0.02, drift  # integrated 200 * 1e-3 = 0.2


def test_apply_updates_sr_mixed_tree():
    params = {"big": jnp.ones((64,), jnp.bfloat16), "small": jnp.ones((3,), jnp.float32)}
    updates = {"big": jnp.full((64,), 1e-4, jnp.float32), "small": jnp.full((3,), 1e-4, jnp.float32)}
    out = optim.apply_updates_sr(params, updates, jax.random.PRNGKey(3))
    assert out["big"].dtype == jnp.bfloat16 and out["small"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out["small"]), 1.0 + 1e-4, rtol=1e-7)
    vals = np.unique(np.asarray(out["big"], np.float32))
    assert set(vals) <= {1.0, 1.0 + 2.0**-7}  # one of the two bf16 neighbors


def test_state_roundtrips_through_orbax_checkpointer(tmp_path):
    """Checkpoint/resume parity: an interrupted adamw8bit run restored from
    the orbax TrainCheckpointer continues identically to an uninterrupted
    one (the int8 codes + f32 scales are plain pytree leaves)."""
    from skrample_tpu.models.checkpoint import TrainCheckpointer

    tx = optim.adamw8bit(**HYPER, min_quant_size=8)
    params = {"w": jax.random.normal(jax.random.PRNGKey(0), (16, 256)), "b": jnp.zeros((4,))}

    def run(p, s, start, steps):
        for i in range(start, start + steps):
            g = jax.tree.map(lambda x: jnp.cos(x + i) * 0.1, p)
            u, s = tx.update(g, s, p)
            p = optax.apply_updates(p, u)
        return p, s

    s0 = tx.init(params)
    straight = run(params, s0, 0, 8)

    p, s = run(params, s0, 0, 4)
    with TrainCheckpointer(tmp_path / "opt8") as ckpt:
        ckpt.save(4, {"params": p, "opt_state": s})
        ckpt.wait()
        got = ckpt.restore(like={"params": p, "opt_state": s})
    m8 = [
        x
        for x in jax.tree.leaves(got["opt_state"].moments, is_leaf=lambda x: isinstance(x, optim.Moment8))
        if isinstance(x, optim.Moment8)
    ]
    assert m8 and m8[0].mq.dtype == jnp.int8  # the codes restored as int8, not upcast
    resumed = run(got["params"], optim.AdamW8State(*got["opt_state"]), 4, 4)
    for a, b in zip(jax.tree.leaves(straight), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adamw8bit_sr_loop_converges_bf16():
    "End-to-end: bf16 params + cast_updates=False + apply_updates_sr."
    target = jax.random.normal(jax.random.PRNGKey(4), (32, 256))
    params = {"w": jnp.zeros((32, 256), jnp.bfloat16)}
    tx = optim.adamw8bit(learning_rate=2e-2, min_quant_size=1, cast_updates=False)
    state = tx.init(params)

    @jax.jit
    def step(p, s, i):
        g = {"w": p["w"].astype(jnp.float32) - target}
        u, s = tx.update(g, s, p)
        assert u["w"].dtype == jnp.float32
        return optim.apply_updates_sr(p, u, jax.random.fold_in(jax.random.PRNGKey(5), i)), s

    for i in range(300):
        params, state = step(params, state, i)
    err = float(jnp.mean(jnp.abs(params["w"].astype(jnp.float32) - target)))
    assert err < 0.02, err  # converged to within ~bf16 resolution of the target


def test_gradient_accumulation_via_multisteps():
    """optax.MultiSteps composes with adamw8bit: k accumulated microbatch
    grads produce the same update as one k-x-larger batch (mean semantics),
    and the 8-bit moment state only advances on the boundary step."""
    k = 4
    params = {"w": jax.random.normal(jax.random.PRNGKey(3), (64, 32)) * 0.3}
    inner = optim.adamw8bit(**HYPER)
    acc = optax.MultiSteps(inner, every_k_schedule=k)
    ref = optim.adamw8bit(**HYPER)

    s_acc, s_ref = acc.init(params), ref.init(params)
    p_acc = p_ref = params
    micro = [jax.tree.map(lambda p, i=i: jnp.cos(p * (i + 1)) * 0.1, params) for i in range(k)]
    mean_grad = jax.tree.map(lambda *gs: sum(gs) / k, *micro)

    for g in micro:
        u, s_acc = acc.update(g, s_acc, p_acc)
        p_acc = optax.apply_updates(p_acc, u)
    u_ref, s_ref = ref.update(mean_grad, s_ref, p_ref)
    p_ref = optax.apply_updates(p_ref, u_ref)

    np.testing.assert_allclose(np.asarray(p_acc["w"]), np.asarray(p_ref["w"]), rtol=1e-6, atol=1e-7)
    # the wrapped 8-bit state stepped exactly once
    assert int(s_acc.inner_opt_state.count) == 1
