"""TPU engine: the table compiler and scan loops must reproduce the
polymorphic sampler spec exactly (float64 on CPU) for every compilable
sampler, schedule, and predictor family."""

import itertools
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

@pytest.fixture(autouse=True, scope="module")
def _x64():
    """This module's oracles compare against the float64 polymorphic spec,
    so x64 is on for its tests — and RESTORED after, since a leaked global
    x64 silently changes every later module's dtypes (weak-type f64
    literals promoted scan carries in test_serving when this was a
    module-level ``jax.config.update``)."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)

from fixture_common import MODEL_TYPES
from skrample_tpu import ops, scheduling
from skrample_tpu.ops.lincomb import Lin, NonlinearOperation
from skrample_tpu.sampling import functional, interface, models, structured, tableaux

SHAPE = (2, 4, 4)

COMPILABLE = {
    "Euler": structured.Euler(),
    "Euler(sde)": structured.Euler(stochasticity=1),
    "DPM(1)": structured.DPM(order=1),
    "DPM(2)": structured.DPM(order=2),
    "DPM(3)": structured.DPM(order=3),
    "DPM(2,sde)": structured.DPM(order=2, stochasticity=1),
    "DPM(1,sde)": structured.DPM(order=1, stochasticity=1),
    "Adams(4)": structured.Adams(order=4),
    "Adams(9)": structured.Adams(order=9),
    "UniP(2)": structured.UniP(order=2),
    "UniP(3)": structured.UniP(order=3),
    "UniPC(2)": structured.UniPC(order=2),
    "UniPC(3)": structured.UniPC(order=3),
    "UniPC(2,sde)": structured.UniPC(order=2, stochasticity=1),
    "UniPC(2,adams3)": structured.UniPC(order=2, predictor=structured.Adams(order=3)),
    "SPC": structured.SPC(),
    "SPC(dpm2)": structured.SPC(predictor=structured.DPM(order=2)),
    "DPM(2,noderiv)": structured.DPM(order=2, derivative_transform=None),
    "DPM(3,velderiv)": structured.DPM(order=3, derivative_transform=models.VelocityModel()),
}

SCHEDULES = {
    "Linear": scheduling.Linear(),
    "Scaled": scheduling.Scaled(),
    "FlowShift(Linear)": scheduling.FlowShift(scheduling.Linear()),
    "Karras(Scaled)": scheduling.Karras(scheduling.Scaled()),
}


def device_model(x, t, s, a):
    "Deterministic nonlinear pseudo-model usable both traced and with floats."
    return x * 0.9 + jnp.sin(x * 0.7) * s - t * 1e-4


def oracle_run(sampler, schedule, transform, steps, x0, noises, start=0):
    "The polymorphic spec run eagerly on jnp arrays (float64)."
    adapter = interface.StructuredFunctionalAdapter(sampler)
    counter = iter(range(start, steps))
    rng = (lambda _s: noises[next(counter)]) if sampler.require_noise else None
    return adapter.sample_model(x0, device_model, transform, schedule, steps, include=slice(start, None), rng=rng)


@pytest.mark.parametrize(
    ("s_name", "sch_name", "m_name"),
    [
        (s, sch, m)
        for s, sch, m in itertools.product(COMPILABLE, SCHEDULES, ["DataModel", "FlowModel", "VelocityModel"])
        # thin the matrix: full sampler sweep on one schedule/model, spot sweep elsewhere
        if (sch == "Linear" and m == "FlowModel") or s in ("DPM(2)", "UniPC(2)", "SPC", "Euler(sde)")
    ],
)
def test_compiled_matches_oracle(s_name, sch_name, m_name) -> None:
    sampler = COMPILABLE[s_name]
    schedule = SCHEDULES[sch_name]
    transform = MODEL_TYPES[m_name]
    steps = 9

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, SHAPE, jnp.float64)
    noises = jax.random.normal(jax.random.fold_in(key, 1), (steps, *SHAPE), jnp.float64)

    expected = oracle_run(sampler, schedule, transform, steps, x0, noises)
    actual = ops.sample_loop(sampler, schedule, transform, steps, device_model, x0, noises=noises)

    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=1e-12, atol=1e-12)


def test_compiled_start_offset() -> None:
    "start= must reproduce the adapter's include=slice(start, None) semantics."
    sampler = structured.DPM(order=2)
    schedule = SCHEDULES["Linear"]
    transform = MODEL_TYPES["FlowModel"]
    steps, start = 10, 4

    x0 = jax.random.normal(jax.random.PRNGKey(2), SHAPE, jnp.float64)
    adapter = interface.StructuredFunctionalAdapter(sampler)
    expected = adapter.sample_model(x0, device_model, transform, schedule, steps, include=slice(start, None))

    compiled = ops.compile_sampler(sampler, schedule, transform, steps, start=start)
    denoiser = ops.CompiledDenoiser.build(compiled, dtype=jnp.float64)
    x = x0
    ring = denoiser.init_ring(x)
    jit_step = denoiser.jitted_step()
    for n in range(start, steps):
        point = compiled.points[n]
        o = device_model(x, *point)
        x, ring = jit_step(denoiser.weights[n], x, o, ring)

    np.testing.assert_allclose(np.asarray(x), np.asarray(expected), rtol=1e-12, atol=1e-12)


def test_single_step_equals_scan() -> None:
    sampler = structured.UniPC(order=3)
    schedule = SCHEDULES["Scaled"]
    transform = MODEL_TYPES["VelocityModel"]
    steps = 8

    x0 = jax.random.normal(jax.random.PRNGKey(3), SHAPE, jnp.float64)
    compiled = ops.compile_sampler(sampler, schedule, transform, steps)
    denoiser = ops.CompiledDenoiser.build(compiled, dtype=jnp.float64)

    scan_result = denoiser.run(device_model, x0)

    x, ring = x0, denoiser.init_ring(x0)
    jit_step = denoiser.jitted_step()
    for n in range(steps):
        o = device_model(x, *compiled.points[n])
        x, ring = jit_step(denoiser.weights[n], x, o, ring)

    np.testing.assert_allclose(np.asarray(x), np.asarray(scan_result), rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize(
    "s_name", ["DPM(2)", "UniPC(2,sde)", "Adams(4)", "Euler(sde)", "UniPC(3)"]
)
def test_step_batched_matches_per_row_scalar_step(s_name) -> None:
    """Per-item weights (continuous batching): a (B, rows, width) gather
    applied by step_batched == B independent scalar-weight steps, per row,
    bit-exactly — covers trivial (rows=1) and synthesized (rows=3) stores
    and the ring-noise (slots=3) layout."""
    sampler = COMPILABLE[s_name]
    steps, B = 8, 3
    compiled = ops.compile_sampler(sampler, SCHEDULES["Scaled"], MODEL_TYPES["VelocityModel"], steps)
    # kernel="xla": step_batched always uses the XLA FMA chain, while "auto"
    # resolves to the Pallas kernel on a TPU backend — pin both sides to the
    # same chain so the bit-equality assert holds on every backend
    denoiser = ops.CompiledDenoiser.build(compiled, dtype=jnp.float64, kernel="xla")

    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (B, *SHAPE), jnp.float64)
    o = jax.random.normal(jax.random.fold_in(key, 1), (B, *SHAPE), jnp.float64)
    ring = tuple(
        jax.random.normal(jax.random.fold_in(key, 10 + i), (B, *SHAPE), jnp.float64)
        for i in range(denoiser.history * denoiser.slots)
    )
    z = jax.random.normal(jax.random.fold_in(key, 2), (B, *SHAPE), jnp.float64)
    noise = z if denoiser.requires_noise else None
    n = jnp.array([1, 4, steps - 1])  # each slot at its own trajectory position

    xb, ringb = denoiser.step_batched(denoiser.weights[n], x, o, ring, noise)

    for i in range(B):
        ring_i = tuple(r[i] for r in ring)
        z_i = z[i] if denoiser.requires_noise else None
        xi, ring_new_i = denoiser.step(denoiser.weights[int(n[i])], x[i], o[i], ring_i, z_i)
        np.testing.assert_array_equal(np.asarray(xb[i]), np.asarray(xi))
        for rb, rs in zip(ringb, ring_new_i):
            np.testing.assert_array_equal(np.asarray(rb[i]), np.asarray(rs))


def test_nonlinear_sampler_rejected() -> None:
    with pytest.raises(ops.NonlinearSamplerError):
        ops.compile_sampler(
            structured.SPC(power=2), SCHEDULES["Linear"], MODEL_TYPES["DataModel"], 8
        )


def test_generic_loop_handles_nonlinear() -> None:
    sampler = structured.SPC(power=2)
    schedule = SCHEDULES["Linear"]
    transform = MODEL_TYPES["DataModel"]
    steps = 6
    x0 = jax.random.normal(jax.random.PRNGKey(4), SHAPE, jnp.float64)
    expected = oracle_run(sampler, schedule, transform, steps, x0, None)
    actual = jax.jit(
        lambda x: ops.generic_sample_loop(sampler, schedule, transform, steps, device_model, x)
    )(x0)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize(
    ("rk", "sch_name", "m_name"),
    [
        (functional.RKUltra(order=2, providers={2: tableaux.RKE2.Heun}), "Linear", "FlowModel"),
        (functional.RKUltra(order=4), "Linear", "FlowModel"),
        (functional.RKUltra(order=4), "Scaled", "VelocityModel"),
        (functional.RKUltra(order=8), "Karras(Scaled)", "DataModel"),
        (functional.RKUltra(order=2, providers={2: tableaux.RKE2.Heun}, stochasticity=1), "Linear", "FlowModel"),
        (functional.RKUltra(order=3, derivative_transform=models.VelocityModel()), "Linear", "FlowModel"),
        (functional.DynasauRK(order=2), "Linear", "FlowModel"),
        (functional.DynasauRK(order=3), "Scaled", "DataModel"),
        (functional.DynasauRK(order=4), "FlowShift(Linear)", "FlowModel"),
    ],
    ids=str,
)
def test_rk_loop_matches_generic(rk, sch_name, m_name) -> None:
    schedule = SCHEDULES[sch_name]
    transform = MODEL_TYPES[m_name]
    steps = 7

    x0 = jax.random.normal(jax.random.PRNGKey(5), SHAPE, jnp.float64)
    noises = jax.random.normal(jax.random.PRNGKey(6), (steps, *SHAPE), jnp.float64)

    counter = iter(range(steps))
    rng = (lambda _s: noises[next(counter)]) if abs(rk.stochasticity) > 1e-8 else None
    expected = rk.sample_model(x0, device_model, transform, schedule, steps, rng=rng)

    actual = ops.rk_sample_loop(rk, schedule, transform, steps, device_model, x0, noises=noises)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=1e-10, atol=1e-10)


def test_lincomb_algebra() -> None:
    a, b = Lin("a"), Lin("b")
    expr = (a * 2 + b) / 4 - a * 0.25
    assert expr.coefficient("a") == pytest.approx(0.25)
    assert expr.coefficient("b") == pytest.approx(0.25)
    assert (-expr).coefficient("a") == pytest.approx(-0.25)
    assert math.sumprod((a, b), (2.0, 3.0)).coefficient("b") == 3.0
    with pytest.raises(NonlinearOperation):
        abs(a)
    with pytest.raises(NonlinearOperation):
        a * b  # type: ignore[operator]
    with pytest.raises(NonlinearOperation):
        float(a)


def test_fused_pallas_interpret_matches_xla() -> None:
    "Pallas kernel (interpret mode on CPU) must equal the XLA tensordot."
    key = jax.random.PRNGKey(9)
    stack = jax.random.normal(key, (7, 4, 33, 65), jnp.float32)  # non-aligned on purpose
    weights = jax.random.normal(jax.random.fold_in(key, 1), (3, 7), jnp.float32)

    expected = ops.fused_step(weights, stack)
    actual = ops.fused_step_pallas(weights, stack, interpret=True)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=1e-6, atol=1e-6)


def test_sample_loop_start_matches_adapter() -> None:
    "sample_loop(start=) == adapter include=slice(start, None)."
    sampler = structured.UniPC(order=2)
    schedule = SCHEDULES["Scaled"]
    transform = MODEL_TYPES["VelocityModel"]
    steps, start = 9, 3
    x0 = jax.random.normal(jax.random.PRNGKey(11), SHAPE, jnp.float64)
    expected = interface.StructuredFunctionalAdapter(sampler).sample_model(
        x0, device_model, transform, schedule, steps, include=slice(start, None)
    )
    actual = ops.sample_loop(sampler, schedule, transform, steps, device_model, x0, start=start)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=1e-12, atol=1e-12)


def test_brownian_shared_prefix_regression() -> None:
    "The shared-prefix increment must equal the naive two-descent form."
    import math as _math

    from skrample_tpu.noise import brownian_at, brownian_increment

    key = jax.random.PRNGKey(123)
    depth, shape = 11, (32,)
    for t0, t1 in ((0.1, 0.8), (0.3, 0.31), (0.0, 0.5), (0.5, 1.0), (0.24, 0.26)):
        scale = 1 << depth
        g0, g1 = round(t0 * scale), round(t1 * scale)
        naive = (
            brownian_at(key, g1 / scale, depth, shape) - brownian_at(key, g0 / scale, depth, shape)
        ) / _math.sqrt((g1 - g0) / scale)
        shared = brownian_increment(key, t0, t1, depth, shape)
        np.testing.assert_array_equal(np.asarray(shared), np.asarray(naive))


def test_scan_callback() -> None:
    "Per-step observer hook through jax.debug.callback."
    sampler = structured.DPM(order=2)
    schedule = SCHEDULES["Linear"]
    transform = MODEL_TYPES["FlowModel"]
    steps = 6
    compiled = ops.compile_sampler(sampler, schedule, transform, steps)
    denoiser = ops.CompiledDenoiser.build(compiled, dtype=jnp.float64)

    seen: list[int] = []

    def observer(sample, n):
        seen.append(int(n))

    x0 = jax.random.normal(jax.random.PRNGKey(12), SHAPE, jnp.float64)
    denoiser.run(device_model, x0, callback=observer).block_until_ready()
    assert sorted(seen) == list(range(steps))


@pytest.mark.parametrize(
    ("order", "threshold", "steps"),
    [(2, 1e-3, 40), (3, 1e-4, 60), (5, 1e-3, 50), (2, 1e-2, 30)],
)
def test_rkmoire_loop_matches_eager(order, threshold, steps) -> None:
    "The jitted adaptive loop must reproduce the eager spec path exactly."
    sampler = functional.RKMoire(order=order, threshold=threshold)
    schedule = SCHEDULES["FlowShift(Linear)"]
    transform = MODEL_TYPES["FlowModel"]

    x0 = jax.random.normal(jax.random.PRNGKey(13), SHAPE, jnp.float64)
    expected = sampler.sample_model(x0, device_model, transform, schedule, steps)
    actual = ops.rkmoire_sample_loop(sampler, schedule, transform, steps, device_model, x0)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=1e-9, atol=1e-10)


def test_rkmoire_loop_custom_evaluator_fallback() -> None:
    "Non-default evaluators route through the eager spec path."
    calls = []

    def max_err(a, b):
        calls.append(1)
        from skrample_tpu import common

        return common.mean(abs(a - b) ** 2)

    sampler = functional.RKMoire(order=2, evaluator=max_err)
    x0 = jax.random.normal(jax.random.PRNGKey(14), SHAPE, jnp.float64)
    out = ops.rkmoire_sample_loop(
        sampler, SCHEDULES["Linear"], MODEL_TYPES["FlowModel"], 30, device_model, x0
    )
    assert calls, "custom evaluator was not invoked"
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize(
    ("schedule_name", "model_name", "steps", "order"),
    [
        ("FlowLinear", "FlowModel", 40, 2),
        ("KarrasScaled", "NoiseModel", 50, 4),
        ("Linear", "FlowModel", 30, 6),
        ("Scaled", "VelocityModel", 24, 2),
    ],
)
def test_rkmoire_device_loop_matches_host(schedule_name, model_name, steps, order) -> None:
    """The lax.while_loop adaptive controller must reproduce the host
    controller exactly: same accepted-step count, same trajectory (f32)."""
    from skrample_tpu.ops.adaptive import rkmoire_device_loop

    extra = {
        "FlowLinear": scheduling.FlowShift(scheduling.Linear()),
        "KarrasScaled": scheduling.Karras(scheduling.Scaled()),
    }
    schedule = extra.get(schedule_name, SCHEDULES.get(schedule_name))
    transform = MODEL_TYPES[model_name]
    sampler = functional.RKMoire(order=order)

    x0 = jax.random.normal(jax.random.PRNGKey(5), SHAPE, jnp.float32)

    def model(x, t, s, a):
        return x * 0.95 + jnp.sin(t / 700.0) * 0.1

    host_steps: list[int] = []
    host = sampler.sample_model(x0, model, transform, schedule, steps, callback=lambda s, n, d: host_steps.append(n))
    device, accepted, trials = rkmoire_device_loop(
        sampler, schedule, transform, steps, model, x0, return_counters=True
    )

    assert int(accepted) == len(host_steps), "accepted-step count parity with the host controller"
    assert int(trials) >= int(accepted) - 1
    np.testing.assert_allclose(np.asarray(device), np.asarray(host), rtol=2e-5, atol=2e-6)


def test_rkmoire_device_loop_partial_include() -> None:
    "Partial trajectories (img2img-style include slices) stay in lockstep too."
    from skrample_tpu.ops.adaptive import rkmoire_device_loop

    schedule = scheduling.FlowShift(scheduling.Linear())
    transform = MODEL_TYPES["FlowModel"]
    sampler = functional.RKMoire(order=2)
    steps = 40

    x0 = jax.random.normal(jax.random.PRNGKey(6), SHAPE, jnp.float32)

    def model(x, t, s, a):
        return x * 0.9

    for include in (slice(10, None), slice(None, 30), slice(5, 35)):
        host = sampler.sample_model(x0, model, transform, schedule, steps, include=include)
        device = rkmoire_device_loop(sampler, schedule, transform, steps, model, x0, include=include)
        np.testing.assert_allclose(np.asarray(device), np.asarray(host), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("case", range(60))
def test_compiled_vs_eager_fuzz(case: int) -> None:
    """Randomized configs through the table compiler vs the polymorphic spec.

    The compiler is the core net-new component; this fuzz hunts coefficient-
    extraction edge cases the fixed config matrix misses."""
    import random

    rng = random.Random(31_000 + case)

    sampler_kind = rng.choice(["euler", "dpm", "adams", "unip", "unipc", "spc"])
    order = rng.randint(1, 6)
    sde = rng.choice([0, 0, rng.random()])
    dt = rng.choice([models.DataModel(), None, models.VelocityModel(), models.NoiseModel()])
    match sampler_kind:
        case "euler":
            sampler = structured.Euler(stochasticity=sde)
        case "dpm":
            sampler = structured.DPM(order=order, stochasticity=sde, derivative_transform=dt)
        case "adams":
            sampler = structured.Adams(order=order, stochasticity=sde, derivative_transform=dt)
        case "unip":
            sampler = structured.UniP(order=order, stochasticity=sde, derivative_transform=dt)
        case "unipc":
            sampler = structured.UniPC(order=order, stochasticity=sde, derivative_transform=dt)
        case "spc":
            sampler = structured.SPC(predictor=structured.DPM(order=min(order, 3)), derivative_transform=dt)

    schedule = rng.choice(
        [
            scheduling.Linear(),
            scheduling.Scaled(),
            scheduling.FlowShift(scheduling.Linear(), shift=rng.uniform(0.5, 6)),
            scheduling.Karras(scheduling.Scaled(), rho=rng.uniform(3, 9)),
            scheduling.Hyper(scheduling.Exponential(scheduling.Scaled())),
        ]
    )
    transform = rng.choice([models.FlowModel(), models.NoiseModel(), models.VelocityModel()])
    steps = rng.randint(2, 12)
    start = rng.choice([0, 0, rng.randint(0, steps - 1)])

    try:
        compiled = ops.compile_sampler(sampler, schedule, transform, steps, start=start)
    except (ops.NonlinearSamplerError, ZeroDivisionError, ValueError, OverflowError):
        return  # legitimately non-compilable config; the wrapper falls back

    denoiser = ops.CompiledDenoiser.build(compiled, dtype=jnp.float64)
    x0 = jax.random.normal(jax.random.PRNGKey(case), SHAPE, jnp.float64)

    noises = None
    if compiled.requires_noise:
        noises = jax.random.normal(jax.random.PRNGKey(1000 + case), (steps, *SHAPE), jnp.float64)

    device = denoiser.run(device_model, x0, noises=noises, start=start)
    expected = oracle_run(sampler, schedule, transform, steps, x0, noises, start=start)

    if not bool(jnp.isfinite(expected).all()):
        return  # degenerate config blows up identically on both paths
    np.testing.assert_allclose(np.asarray(device), np.asarray(expected), rtol=1e-9, atol=1e-11)


# --- flash attention kernel -------------------------------------------------


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("shape", [(2, 4, 256, 64), (1, 2, 512, 128), (1, 1, 128, 32)])
def test_flash_attention_matches_f64_truth(dtype, shape) -> None:
    """The Pallas kernel must be at least as close to exact attention as the
    einsum path is.  Both run matmuls at the backend's default (bf16-pass)
    precision, so they are compared against a float64 ground truth rather
    than each other."""
    from skrample_tpu.ops.flash_attention import attention_reference, flash_attention

    dt = jnp.dtype(dtype)
    B, H, N, d = shape
    keys = jax.random.split(jax.random.PRNGKey(hash(shape) % 2**31), 3)
    q, k, v = (jax.random.normal(kk, shape).astype(dt) for kk in keys)

    q6, k6, v6 = (np.asarray(a, np.float64) for a in (q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)))
    s = np.einsum("bhqd,bhkd->bhqk", q6, k6) / np.sqrt(d)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    truth = np.einsum("bhqk,bhkd->bhqd", p, v6)

    flash_err = np.abs(np.asarray(flash_attention(q, k, v), np.float64) - truth).max()
    einsum_err = np.abs(np.asarray(attention_reference(q, k, v), np.float64) - truth).max()
    # same-precision budget: the kernel may differ in reduction order only
    assert flash_err <= 2.0 * einsum_err + 1e-6, (flash_err, einsum_err)


def test_flash_attention_gradients_match_reference() -> None:
    from skrample_tpu.ops.flash_attention import attention_reference, flash_attention

    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    q, k, v = (jax.random.normal(kk, (1, 2, 128, 64), jnp.float32) for kk in keys[:3])
    g = jax.random.normal(keys[3], (1, 2, 128, 64), jnp.float32)

    _, vjp_flash = jax.vjp(flash_attention, q, k, v)
    _, vjp_ref = jax.vjp(attention_reference, q, k, v)
    for a, b in zip(vjp_flash(g), vjp_ref(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_flash_attention_rejects_ragged_tokens() -> None:
    from skrample_tpu.ops.flash_attention import flash_attention_forward

    q = jnp.ones((1, 1, 192, 64), jnp.float32)  # 192 is not a multiple of 128
    with pytest.raises(ValueError, match="divide"):
        flash_attention_forward(q, q, q, block_q=192)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize(
    ("shape", "heads", "blocks"),
    [
        ((2, 256, 256), 2, {}),  # head_dim 128, single KV block
        ((1, 512, 128), 1, {"block_q": 128, "block_k": 128}),  # online-softmax path (4 KV blocks)
        ((1, 256, 384), 3, {}),  # 3 heads of 128
        ((1, 640, 128), 1, {}),  # auto single (N, N) tile: N > the 512 bq default
    ],
)
def test_flash_attention_packed_matches_truth(dtype, shape, heads, blocks) -> None:
    "The packed (B, N, H*d) kernel equals f64 attention within einsum's budget."
    from skrample_tpu.ops.flash_attention import _packed_reference, flash_attention_packed_forward

    dt = jnp.dtype(dtype)
    B, N, D = shape
    d = D // heads
    keys = jax.random.split(jax.random.PRNGKey(hash((shape, heads)) % 2**31), 3)
    q, k, v = (jax.random.normal(kk, shape).astype(dt) for kk in keys)

    q6, k6, v6 = (
        np.asarray(a, np.float64).reshape(B, N, heads, d).transpose(0, 2, 1, 3)
        for a in (q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    )
    s = np.einsum("bhqd,bhkd->bhqk", q6, k6) / np.sqrt(d)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    truth = np.einsum("bhqk,bhkd->bhqd", p, v6).transpose(0, 2, 1, 3).reshape(B, N, D)

    interpret = jax.default_backend() != "tpu"
    packed = flash_attention_packed_forward(q, k, v, heads, interpret=interpret, **blocks)
    packed_err = np.abs(np.asarray(packed, np.float64) - truth).max()
    einsum_err = np.abs(np.asarray(_packed_reference(q, k, v, heads), np.float64) - truth).max()
    assert packed_err <= 2.0 * einsum_err + 1e-6, (packed_err, einsum_err)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize(
    ("B", "N", "heads", "d", "blocks"),
    [
        (2, 256, 2, 128, {}),  # single KV block
        (1, 512, 1, 128, {"block_q": 128, "block_k": 128}),  # 4 KV blocks, online softmax
    ],
)
def test_flash_attention_qkv_matches_split_reference(dtype, B, N, heads, d, blocks) -> None:
    "The fused-qkv kernel equals split + per-head f64 attention."
    from skrample_tpu.ops.flash_attention import _qkv_reference, flash_attention_qkv_forward

    dt = jnp.dtype(dtype)
    qkv = jax.random.normal(jax.random.PRNGKey(B * N + heads), (B, N, 3 * heads * d)).astype(dt)

    q6, k6, v6 = np.split(np.asarray(qkv.astype(jnp.float32), np.float64), 3, axis=-1)
    q6, k6, v6 = (a.reshape(B, N, heads, d).transpose(0, 2, 1, 3) for a in (q6, k6, v6))
    s = np.einsum("bhqd,bhkd->bhqk", q6, k6) / np.sqrt(d)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    truth = np.einsum("bhqk,bhkd->bhqd", p, v6).transpose(0, 2, 1, 3).reshape(B, N, heads * d)

    interpret = jax.default_backend() != "tpu"
    mine = flash_attention_qkv_forward(qkv, heads, interpret=interpret, **blocks)
    kernel_err = np.abs(np.asarray(mine, np.float64) - truth).max()
    einsum_err = np.abs(np.asarray(_qkv_reference(qkv, heads), np.float64) - truth).max()
    assert kernel_err <= 2.0 * einsum_err + 1e-6, (kernel_err, einsum_err)


@pytest.mark.parametrize(
    ("B", "N", "heads", "blocks"),
    [
        (2, 256, 2, {}),  # single KV block forward, one Q/KV tile pair backward
        (1, 512, 1, {"block_q": 128, "block_k": 128}),  # 4x4 tile sweep: online softmax + accumulators
    ],
)
def test_flash_qkv_backward_kernel_matches_vjp(B, N, heads, blocks) -> None:
    "The Pallas backward (recomputed score tiles) equals the einsum vjp."
    from skrample_tpu.ops.flash_attention import (
        _qkv_reference,
        flash_attention_qkv_backward,
        flash_attention_qkv_forward_lse,
    )

    d = 128
    keys = jax.random.split(jax.random.PRNGKey(N + heads), 2)
    qkv = jax.random.normal(keys[0], (B, N, 3 * heads * d), jnp.float32)
    g = jax.random.normal(keys[1], (B, N, heads * d), jnp.float32)

    interpret = jax.default_backend() != "tpu"
    o, lse = flash_attention_qkv_forward_lse(qkv, heads, interpret=interpret, **blocks)
    ref_o, vjp_ref = jax.vjp(lambda a: _qkv_reference(a, heads), qkv)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref_o), atol=2e-5)

    mine = flash_attention_qkv_backward(qkv, o, lse, g, heads, interpret=interpret, **blocks)
    np.testing.assert_allclose(np.asarray(mine), np.asarray(vjp_ref(g)[0]), atol=2e-4)


@pytest.mark.parametrize("case", range(8))
def test_flash_qkv_fuzz_shapes(case: int) -> None:
    """Randomized (B, N, heads, d, blocks, dtype) sweep through the packed
    forward AND backward kernels vs the einsum reference — catches tiling
    edge cases the hand-picked shapes miss."""
    from skrample_tpu.ops.flash_attention import (
        _qkv_reference,
        flash_attention_qkv_backward,
        flash_attention_qkv_forward_lse,
    )

    rng = np.random.default_rng(9000 + case)
    B = int(rng.integers(1, 4))
    N = 128 * int(rng.integers(1, 5))
    heads = int(rng.integers(1, 4))
    d = 128 * int(rng.integers(1, 3))
    block_q = int(rng.choice([128, 256, 512]))
    block_k = int(rng.choice([128, 256, 512]))
    dt = jnp.dtype(str(rng.choice(["float32", "bfloat16"])))

    keys = jax.random.split(jax.random.PRNGKey(case), 2)
    qkv = jax.random.normal(keys[0], (B, N, 3 * heads * d)).astype(dt)
    g = jax.random.normal(keys[1], (B, N, heads * d)).astype(dt)

    interpret = jax.default_backend() != "tpu"
    o, lse = flash_attention_qkv_forward_lse(qkv, heads, block_q=block_q, block_k=block_k, interpret=interpret)
    ref_o, vjp = jax.vjp(lambda a: _qkv_reference(a, heads), qkv)
    atol = 1e-5 if dt == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(ref_o, np.float32), atol=atol,
        err_msg=f"fwd case {case}: B{B} N{N} h{heads} d{d} bq{block_q} bk{block_k} {dt}",
    )
    mine = flash_attention_qkv_backward(qkv, o, lse, g, heads, block_q=block_q, block_k=block_k, interpret=interpret)
    np.testing.assert_allclose(
        np.asarray(mine, np.float32), np.asarray(vjp(g)[0], np.float32), atol=atol * 20,
        err_msg=f"bwd case {case}: B{B} N{N} h{heads} d{d} bq{block_q} bk{block_k} {dt}",
    )


@pytest.mark.parametrize("case", range(6))
def test_adaln_fuzz_shapes(case: int) -> None:
    "Randomized shapes/blocks through the adaLN forward + backward kernels."
    from skrample_tpu.ops.adaln import adaln_backward, adaln_forward, adaln_reference

    rng = np.random.default_rng(7000 + case)
    B = int(rng.integers(1, 5))
    D = 128 * int(rng.integers(1, 5))
    block_n = int(rng.choice([8, 32, 64, 128, 256]))
    N = block_n * int(rng.integers(1, 5))
    dt = jnp.dtype(str(rng.choice(["float32", "bfloat16"])))

    keys = jax.random.split(jax.random.PRNGKey(case), 4)
    x = (jax.random.normal(keys[0], (B, N, D)) * 2 + 0.1).astype(dt)
    shift = jax.random.normal(keys[1], (B, D)).astype(dt)
    scale = jax.random.normal(keys[2], (B, D)).astype(dt)
    g = jax.random.normal(keys[3], (B, N, D)).astype(dt)

    interpret = jax.default_backend() != "tpu"
    atol = 1e-5 if dt == jnp.float32 else 5e-2
    msg = f"case {case}: B{B} N{N} D{D} block_n{block_n} {dt}"
    fused = adaln_forward(x, shift, scale, block_n=block_n, interpret=interpret)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(adaln_reference(x, shift, scale), np.float32),
        atol=atol, err_msg=msg,
    )
    _, vjp = jax.vjp(adaln_reference, x, shift, scale)
    rdx, rdsh, rdsc = vjp(g)
    dx, dsh, dsc = adaln_backward(x, g, scale, block_n=block_n, interpret=interpret)
    np.testing.assert_allclose(np.asarray(dx, np.float32), np.asarray(rdx, np.float32), atol=atol * 10, err_msg=msg)
    np.testing.assert_allclose(np.asarray(dsh), np.asarray(rdsh, np.float32), atol=atol * N, err_msg=msg)
    np.testing.assert_allclose(np.asarray(dsc), np.asarray(rdsc, np.float32), atol=atol * N, err_msg=msg)


def test_flash_qkv_lse_values() -> None:
    "The saved logsumexp matches a direct f64 computation."
    from skrample_tpu.ops.flash_attention import flash_attention_qkv_forward_lse

    B, N, heads, d = 1, 256, 2, 128
    qkv = jax.random.normal(jax.random.PRNGKey(3), (B, N, 3 * heads * d), jnp.float32)
    _, lse = flash_attention_qkv_forward_lse(qkv, heads, interpret=jax.default_backend() != "tpu")

    q, k, _ = np.split(np.asarray(qkv, np.float64), 3, axis=-1)
    q = q.reshape(B, N, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(B, N, heads, d).transpose(0, 2, 1, 3)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    truth = s.max(-1) + np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1))
    np.testing.assert_allclose(np.asarray(lse)[..., 0], truth, atol=1e-4)


def test_flash_attention_qkv_gradients_match_reference() -> None:
    from skrample_tpu.ops.flash_attention import _qkv_reference, flash_attention_qkv

    keys = jax.random.split(jax.random.PRNGKey(13), 2)
    qkv = jax.random.normal(keys[0], (2, 128, 3 * 256), jnp.float32)
    g = jax.random.normal(keys[1], (2, 128, 256), jnp.float32)

    _, vjp_kernel = jax.vjp(lambda a: flash_attention_qkv(a, 2), qkv)
    _, vjp_ref = jax.vjp(lambda a: _qkv_reference(a, 2), qkv)
    np.testing.assert_allclose(np.asarray(vjp_kernel(g)[0]), np.asarray(vjp_ref(g)[0]), atol=1e-5)


def test_flash_attention_packed_gradients_match_reference() -> None:
    from skrample_tpu.ops.flash_attention import _packed_reference, flash_attention_packed

    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    q, k, v = (jax.random.normal(kk, (2, 128, 256), jnp.float32) for kk in keys[:3])
    g = jax.random.normal(keys[3], (2, 128, 256), jnp.float32)

    _, vjp_packed = jax.vjp(lambda a, b, c: flash_attention_packed(a, b, c, 2), q, k, v)
    _, vjp_ref = jax.vjp(lambda a, b, c: _packed_reference(a, b, c, 2), q, k, v)
    for a, b in zip(vjp_packed(g), vjp_ref(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_flash_attention_packed_fallback_on_narrow_heads() -> None:
    "head_dim 64 can't lane-align: the public entry silently takes the einsum path."
    from skrample_tpu.ops.flash_attention import _packed_reference, flash_attention_packed

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 128), jnp.float32)
    out = flash_attention_packed(q, q, q, heads=2)  # head_dim 64
    np.testing.assert_allclose(np.asarray(out), np.asarray(_packed_reference(q, q, q, 2)), atol=1e-6)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("shape", [(2, 256, 256), (1, 512, 128), (3, 128, 384)])
def test_adaln_kernel_matches_eager(dtype, shape) -> None:
    "The fused layernorm+modulate kernel equals the eager composition."
    from skrample_tpu.ops.adaln import adaln_forward, adaln_reference

    dt = jnp.dtype(dtype)
    B, N, D = shape
    keys = jax.random.split(jax.random.PRNGKey(hash(shape) % 2**31), 3)
    x = (jax.random.normal(keys[0], shape) * 3.0 + 0.5).astype(dt)
    shift = jax.random.normal(keys[1], (B, D)).astype(dt)
    scale = jax.random.normal(keys[2], (B, D)).astype(dt)

    fused = adaln_forward(x, shift, scale, interpret=jax.default_backend() != "tpu")
    eager = adaln_reference(x, shift, scale)
    # the kernel reduces in a different order than the eager composition
    atol = 1e-5 if dtype == "float32" else 1e-2
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(eager, np.float32), atol=atol
    )


def test_adaln_gradients_match_eager() -> None:
    from skrample_tpu.ops.adaln import adaln_modulate, adaln_reference

    keys = jax.random.split(jax.random.PRNGKey(5), 4)
    x = jax.random.normal(keys[0], (2, 128, 256), jnp.float32)
    shift = jax.random.normal(keys[1], (2, 256), jnp.float32)
    scale = jax.random.normal(keys[2], (2, 256), jnp.float32)
    g = jax.random.normal(keys[3], (2, 128, 256), jnp.float32)

    _, vjp_fused = jax.vjp(adaln_modulate, x, shift, scale)
    _, vjp_ref = jax.vjp(adaln_reference, x, shift, scale)
    for a, b in zip(vjp_fused(g), vjp_ref(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize(
    ("shape", "block_n"),
    [((2, 256, 256), 256), ((1, 512, 128), 128), ((3, 128, 384), 64)],  # incl. multi-tile accumulation
)
def test_adaln_backward_kernel_matches_vjp(dtype, shape, block_n) -> None:
    "The one-pass backward kernel (dx + accumulated dshift/dscale) equals the eager vjp."
    from skrample_tpu.ops.adaln import adaln_backward, adaln_reference

    dt = jnp.dtype(dtype)
    B, N, D = shape
    keys = jax.random.split(jax.random.PRNGKey(hash(shape) % 2**31), 4)
    x = (jax.random.normal(keys[0], shape) * 2.0 + 0.3).astype(dt)
    shift = jax.random.normal(keys[1], (B, D)).astype(dt)
    scale = jax.random.normal(keys[2], (B, D)).astype(dt)
    g = jax.random.normal(keys[3], shape).astype(dt)

    _, vjp = jax.vjp(adaln_reference, x, shift, scale)
    ref_dx, ref_dsh, ref_dsc = vjp(g)

    interpret = jax.default_backend() != "tpu"
    dx, dsh, dsc = adaln_backward(x, g, scale, block_n=block_n, interpret=interpret)
    atol = 2e-5 if dtype == "float32" else 5e-2
    np.testing.assert_allclose(np.asarray(dx, np.float32), np.asarray(ref_dx, np.float32), atol=atol)
    np.testing.assert_allclose(np.asarray(dsh), np.asarray(ref_dsh, np.float32), atol=atol * N)
    np.testing.assert_allclose(np.asarray(dsc), np.asarray(ref_dsc, np.float32), atol=atol * N)


def test_adaln_fallback_on_ragged_shapes() -> None:
    "Non-lane-aligned D silently takes the eager path with identical results."
    from skrample_tpu.ops.adaln import adaln_modulate, adaln_reference

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 96), jnp.float32)
    shift = jnp.zeros((1, 96), jnp.float32)
    scale = jnp.ones((1, 96), jnp.float32) * 0.1
    np.testing.assert_allclose(
        np.asarray(adaln_modulate(x, shift, scale)),
        np.asarray(adaln_reference(x, shift, scale)),
        atol=1e-7,
    )


def test_dit_packed_flash_matches_full() -> None:
    "A head_dim-128 DiT routes flash through the packed kernel and matches full attention."
    from skrample_tpu.models import DiT, DiTConfig

    kwargs = dict(dim=256, depth=2, heads=2, channels=4, compute_dtype=jnp.float32)
    full = DiT(DiTConfig(attention="full", **kwargs))
    flash = DiT(DiTConfig(attention="flash", **kwargs))
    assert flash.config.head_dim % 128 == 0
    params = full.init(jax.random.PRNGKey(0))

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32), jnp.float32)
    t = jnp.asarray([0.3, 0.8], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(flash.apply(params, x, t)), np.asarray(full.apply(params, x, t)), atol=5e-3
    )


def test_dit_flash_attention_matches_full() -> None:
    "DiTConfig(attention='flash') is numerically the full-attention model."
    from skrample_tpu.models import DiT, DiTConfig

    kwargs = dict(dim=128, depth=2, heads=2, channels=4, compute_dtype=jnp.float32)
    full = DiT(DiTConfig(attention="full", **kwargs))
    flash = DiT(DiTConfig(attention="flash", **kwargs))
    params = full.init(jax.random.PRNGKey(0))

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32), jnp.float32)
    t = jnp.asarray([0.3, 0.8], jnp.float32)
    out_full = full.apply(params, x, t)
    out_flash = flash.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_full), atol=5e-3)


def test_dit_remat_matches_plain() -> None:
    """``DiTConfig(remat=True)`` must change memory, not results: forward and
    gradients equal the un-checkpointed model bit-for-bit on CPU."""
    from skrample_tpu.models import DiT, DiTConfig

    kwargs = dict(dim=128, depth=2, heads=1, channels=4, compute_dtype=jnp.float32, attention="flash")
    plain = DiT(DiTConfig(**kwargs))
    remat = DiT(DiTConfig(**kwargs, remat=True))
    params = plain.init(jax.random.PRNGKey(0))
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    params = jax.tree.unflatten(
        treedef, [leaf + 0.02 * jax.random.normal(kk, leaf.shape, leaf.dtype) for leaf, kk in zip(leaves, keys)]
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32), jnp.float32)
    t = jnp.asarray([0.2, 0.9], jnp.float32)

    np.testing.assert_array_equal(
        np.asarray(plain.apply(params, x, t)), np.asarray(remat.apply(params, x, t))
    )

    def loss(model, p):
        return jnp.mean(model.apply(p, x, t) ** 2)

    g_plain = jax.grad(lambda p: loss(plain, p))(params)
    for mode in (True, "dots"):
        g_remat = jax.grad(lambda p: loss(DiT(DiTConfig(**kwargs, remat=mode)), p))(params)
        for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dit_flash_attention_trains() -> None:
    "The custom-vjp backward lets jax.grad flow through the flash DiT."
    from skrample_tpu.models import DiT, DiTConfig

    model = DiT(DiTConfig(dim=128, depth=1, heads=2, channels=1, attention="flash", compute_dtype=jnp.float32))
    params = model.init(jax.random.PRNGKey(0))
    # adaLN-zero initializes the output projections to 0 (so the model is the
    # identity map at init and all grads vanish); perturb to get signal
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    params = jax.tree.unflatten(
        treedef, [leaf + 0.02 * jax.random.normal(kk, leaf.shape, leaf.dtype) for leaf, kk in zip(leaves, keys)]
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 32, 32), jnp.float32)

    def loss(p):
        return jnp.mean(model.apply(p, x, jnp.asarray([0.5])) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("fuse_silu", [False, True])
@pytest.mark.parametrize(
    ("shape", "groups"),
    [((2, 256, 128), 16), ((1, 64, 256), 32), ((3, 128, 512), 16)],
)
def test_groupnorm_kernel_matches_eager(dtype, fuse_silu, shape, groups) -> None:
    "The whole-slice grouped-norm(+SiLU) kernel equals the eager composition."
    from skrample_tpu.ops.groupnorm import groupnorm_forward, groupnorm_reference

    dt = jnp.dtype(dtype)
    x = (jax.random.normal(jax.random.PRNGKey(hash(shape) % 2**31), shape) * 2.0 + 0.3).astype(dt)
    fused = groupnorm_forward(x, groups, fuse_silu, interpret=jax.default_backend() != "tpu")
    eager = groupnorm_reference(x, groups, fuse_silu)
    atol = 2e-5 if dtype == "float32" else 1e-2
    np.testing.assert_allclose(np.asarray(fused, np.float32), np.asarray(eager, np.float32), atol=atol)


@pytest.mark.parametrize("fuse_silu", [False, True])
@pytest.mark.parametrize(("shape", "groups"), [((2, 4096, 64), 16), ((1, 2048, 128), 32)])
def test_groupnorm_eager_bign_matches_reference(fuse_silu, shape, groups) -> None:
    """The 3-pass big-slice path (uncentered f32 stats, one fused sum+sumsq
    reduction) agrees with the centered reference to bf16 rounding."""
    from skrample_tpu.ops.groupnorm import groupnorm_eager_bign, groupnorm_reference

    key = jax.random.PRNGKey(hash(shape) % 2**31)
    x = (jax.random.normal(key, shape) * 3.0 + 1.7).astype(jnp.bfloat16)
    scale = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (shape[-1],))
    bias = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (shape[-1],))
    got = groupnorm_eager_bign(x, groups, fuse_silu, scale=scale, bias=bias)
    want = groupnorm_reference(x, groups, fuse_silu, scale=scale, bias=bias)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2)


def test_groupnorm_kernel_affine_fused() -> None:
    "Learned scale/bias apply in f32 inside the kernel, before the SiLU."
    from skrample_tpu.ops.groupnorm import groupnorm_forward, groupnorm_reference

    x = jax.random.normal(jax.random.PRNGKey(8), (2, 64, 128))
    scale = jax.random.normal(jax.random.PRNGKey(9), (128,)) * 0.5 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(10), (128,)) * 0.2
    for fuse_silu in (False, True):
        fused = groupnorm_forward(
            x, 16, fuse_silu, interpret=jax.default_backend() != "tpu", scale=scale, bias=bias
        )
        eager = groupnorm_reference(x, 16, fuse_silu, scale=scale, bias=bias)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(eager), atol=2e-5)


def test_groupnorm_affine_gradients() -> None:
    "d/dscale and d/dbias flow through the custom vjp (the affine trains)."
    from skrample_tpu.ops.groupnorm import groupnorm_cl, groupnorm_reference

    x = jax.random.normal(jax.random.PRNGKey(11), (2, 8, 8, 128))
    scale = jnp.ones((128,)) * 1.3
    bias = jnp.zeros((128,)) + 0.1

    def fused_loss(xx, ss, bb):
        return jnp.sum(groupnorm_cl(xx, 16, fuse_silu=True, scale=ss, bias=bb) ** 2)

    def eager_loss(xx, ss, bb):
        return jnp.sum(groupnorm_reference(xx.reshape(2, 64, 128), 16, True, scale=ss, bias=bb) ** 2)

    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(x, scale, bias)
    ge = jax.grad(eager_loss, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gf, ge):
        np.testing.assert_allclose(np.asarray(a).ravel(), np.asarray(b).ravel(), rtol=2e-5, atol=2e-6)


def test_groupnorm_kernel_eps_variant() -> None:
    "The conditional UNet's eps 1e-5 threads through the kernel exactly."
    from skrample_tpu.ops.groupnorm import groupnorm_forward, groupnorm_reference

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 128)) * 1e-3  # eps-sensitive scale
    fused = groupnorm_forward(x, 16, eps=1e-5, interpret=jax.default_backend() != "tpu")
    eager = groupnorm_reference(x, 16, eps=1e-5)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(eager), atol=2e-5)
    # and it genuinely differs from the default-eps result at this scale
    assert not np.allclose(np.asarray(fused), np.asarray(groupnorm_reference(x, 16)), atol=1e-4)


def test_groupnorm_gradients_match_eager() -> None:
    "custom_vjp backward == differentiating the eager composition."
    from skrample_tpu.ops.groupnorm import groupnorm_cl, groupnorm_reference

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 128), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(4), x.shape, jnp.float32)
    _, vjp_fused = jax.vjp(lambda a: groupnorm_cl(a, 16, fuse_silu=True), x)
    _, vjp_ref = jax.vjp(
        lambda a: groupnorm_reference(a.reshape(2, 64, 128), 16, True).reshape(x.shape), x
    )
    np.testing.assert_allclose(np.asarray(vjp_fused(g)[0]), np.asarray(vjp_ref(g)[0]), atol=1e-5)


def test_groupnorm_envelope_gating() -> None:
    "Shapes outside the kernel envelope take the eager path with identical results."
    from skrample_tpu.ops.groupnorm import fits_kernel, groupnorm_cl, groupnorm_reference

    assert fits_kernel(4096, 128) and not fits_kernel(16384, 512)
    assert not fits_kernel(256, 96)  # non-lane-aligned C
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 96), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(groupnorm_cl(x, 12)),
        np.asarray(groupnorm_reference(x.reshape(1, 64, 96), 12).reshape(x.shape)),
    )


# --- fused qk-norm + RoPE (ops/rope.py) --------------------------------------


def _rope_case(B=2, N=256, heads=3, d=128, seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * heads * d)), jnp.float32).astype(dtype)
    gq = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1, jnp.float32)
    gk = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1, jnp.float32)
    ang = jnp.asarray(rng.uniform(0, 6.28, size=(N, d // 2)), jnp.float32)
    return qkv, gq, gk, jnp.cos(ang), jnp.sin(ang)


def test_rope_reference_matches_f64_truth() -> None:
    "The jnp reference equals an independently written f64 numpy computation."
    from skrample_tpu.ops.rope import rope_qk_norm_reference

    B, N, heads, d = 1, 64, 2, 128
    qkv, gq, gk, cos, sin = _rope_case(B, N, heads, d, seed=3, dtype=jnp.float32)
    x = np.asarray(qkv, np.float64).reshape(B, N, 3, heads, d)
    co, si = np.asarray(cos, np.float64), np.asarray(sin, np.float64)
    truth = x.copy()
    for third, g in ((0, np.asarray(gq, np.float64)), (1, np.asarray(gk, np.float64))):
        y = x[:, :, third] / np.sqrt((x[:, :, third] ** 2).mean(-1, keepdims=True) + 1e-6) * g
        out = np.empty_like(y)
        out[..., 0::2] = y[..., 0::2] * co[None, :, None] - y[..., 1::2] * si[None, :, None]
        out[..., 1::2] = y[..., 0::2] * si[None, :, None] + y[..., 1::2] * co[None, :, None]
        truth[:, :, third] = out
    got = np.asarray(rope_qk_norm_reference(qkv, gq, gk, cos, sin, heads), np.float64)
    np.testing.assert_allclose(got, truth.reshape(B, N, 3 * heads * d), atol=1e-5)


@pytest.mark.parametrize(("dtype", "B", "N", "heads"), [("bfloat16", 2, 256, 3), ("float32", 1, 512, 2)])
def test_rope_kernel_matches_reference(dtype, B, N, heads) -> None:
    from skrample_tpu.ops.rope import rope_qk_norm_forward, rope_qk_norm_reference

    qkv, gq, gk, cos, sin = _rope_case(B, N, heads, dtype=jnp.dtype(dtype), seed=B + N)
    ref = rope_qk_norm_reference(qkv, gq, gk, cos, sin, heads)
    got = rope_qk_norm_forward(qkv, gq, gk, cos, sin, heads, interpret=jax.default_backend() != "tpu")
    atol = 5e-3 if dtype == "bfloat16" else 1e-6
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=atol
    )


def test_rope_kernel_v_third_bit_identical() -> None:
    "The v feature blocks are never addressed: aliased input bits pass through."
    from skrample_tpu.ops.rope import rope_qk_norm_forward

    heads = 3
    qkv, gq, gk, cos, sin = _rope_case(heads=heads, seed=7)
    got = rope_qk_norm_forward(qkv, gq, gk, cos, sin, heads, interpret=jax.default_backend() != "tpu")
    D = heads * 128
    np.testing.assert_array_equal(np.asarray(got[..., 2 * D :]), np.asarray(qkv[..., 2 * D :]))
    assert not np.array_equal(np.asarray(got[..., : 2 * D]), np.asarray(qkv[..., : 2 * D]))


def test_rope_gradients_match_reference() -> None:
    "The custom vjp (kernel forward) returns the reference's exact gradients."
    from skrample_tpu.ops.rope import _rope_vjp, rope_qk_norm_reference

    heads = 2
    qkv, gq, gk, cos, sin = _rope_case(B=1, N=128, heads=heads, dtype=jnp.float32, seed=11)
    g = jnp.asarray(np.random.default_rng(12).normal(size=qkv.shape), jnp.float32)

    out, vjp = jax.vjp(lambda a, q, k: _rope_vjp(a, q, k, cos, sin, heads, 1e-6), qkv, gq, gk)
    ref_out, vjp_ref = jax.vjp(lambda a, q, k: rope_qk_norm_reference(a, q, k, cos, sin, heads), qkv, gq, gk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
    for mine, ref in zip(vjp(g), vjp_ref(g), strict=True):
        np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), atol=1e-5)


def test_rope_fused_fallback_off_kernel_envelope() -> None:
    "Non-128-multiple N or head_dim takes the reference path exactly."
    from skrample_tpu.ops.rope import fused_rope_qk_norm, rope_qk_norm_reference

    heads, d, N = 2, 64, 77  # CLIP-ish: neither N nor d tiles
    rng = np.random.default_rng(5)
    qkv = jnp.asarray(rng.normal(size=(1, N, 3 * heads * d)), jnp.float32)
    gq = jnp.ones((d,), jnp.float32)
    gk = jnp.ones((d,), jnp.float32)
    ang = jnp.asarray(rng.uniform(size=(N, d // 2)), jnp.float32)
    got = fused_rope_qk_norm(qkv, gq, gk, jnp.cos(ang), jnp.sin(ang), heads)
    ref = rope_qk_norm_reference(qkv, gq, gk, jnp.cos(ang), jnp.sin(ang), heads)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_rope_spmd_shards_batch() -> None:
    "Batch sharding is carried through the custom call; tables replicate."
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from skrample_tpu.ops.rope import _rope_spmd, rope_qk_norm_reference

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    heads = 2
    qkv, gq, gk, cos, sin = _rope_case(B=8, N=128, heads=heads, dtype=jnp.float32, seed=21)
    single = rope_qk_norm_reference(qkv, gq, gk, cos, sin, heads)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("dp",))
    xs = jax.device_put(qkv, NamedSharding(mesh, P("dp")))
    with mesh:
        out = jax.jit(_rope_spmd(heads, 1e-6, True))(xs, gq, gk, cos, sin)
        out.block_until_ready()
    assert "dp" in str(out.sharding.spec), out.sharding
    np.testing.assert_allclose(np.asarray(out), np.asarray(single), atol=1e-5)


class TestFusedConv:
    """Norm-into-conv kernels (ops/fused_conv.py) vs their eager oracles in
    interpret mode: outputs, epilogue statistics, and custom_vjp grads."""

    @pytest.mark.parametrize("shape", [(3, 16, 8, 8, 8), (2, 128, 8, 8, 8), (1, 192, 8, 8, 16)])
    @pytest.mark.parametrize("use_stats", [False, True])
    @pytest.mark.parametrize("use_res", [False, True])
    def test_conv3x3_matches_ref(self, shape, use_stats, use_res) -> None:
        from skrample_tpu.ops.fused_conv import channel_stats, conv3x3_gn_silu, conv3x3_ref, finalize_group_stats

        N, H, W, C, Co = shape
        key = jax.random.PRNGKey(hash(shape) % 2**31)
        x = jax.random.normal(key, (N, H, W, C), jnp.float32) * 2 + 0.5
        w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, C, Co), jnp.float32) * 0.2
        b = jax.random.normal(jax.random.fold_in(key, 2), (Co,), jnp.float32) * 0.1
        res = jax.random.normal(jax.random.fold_in(key, 3), (N, H, W, Co), jnp.float32) if use_res else None
        stats = finalize_group_stats(channel_stats(x), groups=4, count=H * W) if use_stats else None
        got, graw = conv3x3_gn_silu(x, w, b, stats=stats, residual=res, interpret=True)
        want, wraw = conv3x3_ref(x, w, b, stats, res, use_stats)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(graw), np.asarray(wraw), rtol=2e-4, atol=2e-3)

    @pytest.mark.parametrize("use_stats", [False, True])
    @pytest.mark.parametrize("use_res", [False, True])
    def test_tconv_matches_ref(self, use_stats, use_res) -> None:
        from skrample_tpu.ops.fused_conv import (
            channel_stats,
            finalize_group_stats,
            tconv_causal_gn_silu,
            tconv_causal_ref,
        )

        B, T, S, C, Co, k = 2, 4, 32, 8, 8, 3
        key = jax.random.PRNGKey(11)
        x = jax.random.normal(key, (B, T, S, C), jnp.float32) * 1.5 + 0.2
        w = jax.random.normal(jax.random.fold_in(key, 4), (k, C, Co), jnp.float32) * 0.3
        b = jax.random.normal(jax.random.fold_in(key, 5), (Co,), jnp.float32) * 0.1
        res = jax.random.normal(jax.random.fold_in(key, 6), (B, T, S, Co), jnp.float32) if use_res else None
        stats = finalize_group_stats(channel_stats(x, sample_dims=2), groups=4, count=S) if use_stats else None
        got, graw = tconv_causal_gn_silu(x, w, b, stats=stats, residual=res, interpret=True)
        want, wraw = tconv_causal_ref(x, w, b, stats, res, use_stats, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(graw), np.asarray(wraw), rtol=2e-4, atol=2e-3)

    def test_tconv_repeat_folds_frame_upsample(self) -> None:
        from skrample_tpu.ops.fused_conv import tconv_causal_gn_silu, tconv_causal_ref

        B, T, S, C, Co, k = 2, 4, 32, 8, 8, 3
        key = jax.random.PRNGKey(12)
        x = jax.random.normal(key, (B, T, S, C), jnp.float32)
        w = jax.random.normal(jax.random.fold_in(key, 4), (k, C, Co), jnp.float32) * 0.3
        b = jnp.zeros((Co,), jnp.float32)
        got, graw = tconv_causal_gn_silu(x, w, b, repeat_in=2, interpret=True)
        want, wraw = tconv_causal_ref(x, w, b, None, None, False, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(graw), np.asarray(wraw), rtol=2e-4, atol=2e-3)

    def test_conv3x3_vjp_matches_ref(self) -> None:
        from skrample_tpu.ops.fused_conv import channel_stats, conv3x3_gn_silu, conv3x3_ref, finalize_group_stats

        key = jax.random.PRNGKey(13)
        x = jax.random.normal(key, (2, 16, 8, 8), jnp.float32)
        res = jax.random.normal(jax.random.fold_in(key, 3), (2, 16, 8, 8), jnp.float32)
        w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 8, 8), jnp.float32) * 0.2
        b = jnp.zeros((8,), jnp.float32)
        stats = finalize_group_stats(channel_stats(x), groups=4, count=16 * 8)

        def loss(fn):
            def inner(xx, ww):
                o, r = fn(xx, ww)
                return (o.astype(jnp.float32) ** 2).mean() + (r**2).sum() * 1e-6

            return inner

        g1 = jax.grad(loss(lambda xx, ww: conv3x3_gn_silu(xx, ww, b, stats=stats, residual=res, interpret=True)))(x, w)
        g2 = jax.grad(loss(lambda xx, ww: conv3x3_ref(xx, ww, b, stats, res, True)))(x, w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


class TestFlashPairs:
    """d=64 head-pair packed attention (two heads per 128-lane tile) vs the
    einsum reference — the SDXL/CondUNet head shape without the padded
    path's 2x HBM traffic."""

    @pytest.mark.parametrize(("B", "N", "heads"), [(2, 256, 4), (1, 1024, 10), (1, 512, 2)])
    def test_matches_reference(self, B, N, heads) -> None:
        from skrample_tpu.ops.flash_attention import (
            _packed_reference,
            flash_attention_pairs_forward,
            pairs_kernel_fits,
        )

        D = heads * 64
        key = jax.random.PRNGKey(N + heads)
        q = jax.random.normal(key, (B, N, D), jnp.float32)
        k = jax.random.normal(jax.random.fold_in(key, 1), (B, N, D), jnp.float32)
        v = jax.random.normal(jax.random.fold_in(key, 2), (B, N, D), jnp.float32)
        assert pairs_kernel_fits(N, heads, 64)
        got = flash_attention_pairs_forward(q, k, v, heads, interpret=True)
        want = _packed_reference(q, k, v, heads)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_gradients_match_reference(self) -> None:
        from skrample_tpu.ops.flash_attention import _packed_reference, flash_attention_pairs

        q = jax.random.normal(jax.random.PRNGKey(3), (1, 256, 256), jnp.float32)
        g1 = jax.grad(lambda x: flash_attention_pairs(x, q, q, 4).sum())(q)
        g2 = jax.grad(lambda x: _packed_reference(x, q, q, 4).sum())(q)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)

    def test_odd_heads_fall_back(self) -> None:
        from skrample_tpu.ops.flash_attention import flash_attention_pairs, pairs_kernel_fits

        assert not pairs_kernel_fits(256, 5, 64)
        q = jax.random.normal(jax.random.PRNGKey(4), (1, 256, 320), jnp.float32)
        out = flash_attention_pairs(q, q, q, 5)  # einsum fallback, no raise
        assert out.shape == q.shape
