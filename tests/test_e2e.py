"""End-to-end: the full jax-native generation path on the DiT reference model
(the random-weight mini-pipeline strategy), exercising compiled loops, RK
loops, noise generators, and img2img partial starts together."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skrample_tpu import noise as jaxnoise
from skrample_tpu import scheduling
from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.ops import CompiledDenoiser, compile_sampler, rk_sample_loop
from skrample_tpu.sampling import functional, interface, models, structured, tableaux

CONFIG = DiTConfig(dim=64, depth=2, heads=4, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def dit():
    model = DiT(CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_compiled_generation(dit) -> None:
    model, params = dit
    steps = 8
    sampler = structured.DPM(order=2, stochasticity=0.5)
    schedule = scheduling.FlowShift(scheduling.Linear())
    transform = models.FlowModel()

    compiled = compile_sampler(sampler, schedule, transform, steps)
    denoiser = CompiledDenoiser.build(compiled)

    gen = jaxnoise.Brownian.from_inputs((1, 4, 16, 16), 7)
    noises = jaxnoise.stack_noise(gen, steps)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16), jnp.float32)

    out = jax.jit(lambda x, n: denoiser.run(model.as_sampleable(params), x, noises=n))(x0, noises)
    assert out.shape == x0.shape
    assert bool(jnp.isfinite(out).all())

    # must match the eager polymorphic run at f32 tolerance
    counter = iter(range(steps))
    oracle = interface.StructuredFunctionalAdapter(sampler).sample_model(
        x0, model.as_sampleable(params), transform, schedule, steps, rng=lambda _s: noises[next(counter)]
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), rtol=1e-4, atol=1e-5)


def test_rk_generation(dit) -> None:
    model, params = dit
    steps = 5
    sampler = functional.RKUltra(order=4)
    schedule = scheduling.Karras(scheduling.Scaled())
    transform = models.NoiseModel()

    x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16, 16), jnp.float32)
    out = jax.jit(
        lambda x: rk_sample_loop(sampler, schedule, transform, steps, model.as_sampleable(params), x)
    )(x0)
    assert bool(jnp.isfinite(out).all())

    oracle = sampler.sample_model(x0, model.as_sampleable(params), transform, schedule, steps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), rtol=1e-4, atol=1e-5)


def test_img2img_partial_start(dit) -> None:
    "Partial-range sampling (strength < 1) through the functional interface."
    model, params = dit
    steps, start = 10, 6
    sampler = interface.StructuredFunctionalAdapter(structured.DPM(order=2))
    schedule = scheduling.FlowShift(scheduling.Linear())
    transform = models.FlowModel()

    rng = jaxnoise.Random.from_inputs((1, 4, 16, 16), 3)
    initial = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 16, 16), jnp.float32) * 0.1

    counter = iter(range(steps + 1))
    out = sampler.generate_model(
        model.as_sampleable(params),
        transform,
        schedule,
        lambda _s: rng.generate(next(counter), _s),
        steps,
        include=slice(start, None),
        initial=initial,
    )
    assert bool(jnp.isfinite(out).all())
    # weak img2img property: partial denoise stays closer to the init image
    # than a full generation from pure noise
    counter2 = iter(range(steps + 1))
    full = sampler.generate_model(
        model.as_sampleable(params),
        transform,
        schedule,
        lambda _s: rng.generate(next(counter2), _s),
        steps,
    )
    d_partial = float(jnp.mean((out - initial) ** 2))
    d_full = float(jnp.mean((full - initial) ** 2))
    assert d_partial < d_full


def test_dynasau_generation(dit) -> None:
    model, params = dit
    steps = 6
    sampler = functional.DynasauRK(order=3)
    schedule = scheduling.Linear()
    transform = models.FlowModel()
    x0 = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 16, 16), jnp.float32)

    out = rk_sample_loop(sampler, schedule, transform, steps, model.as_sampleable(params), x0)
    oracle = sampler.sample_model(x0, model.as_sampleable(params), transform, schedule, steps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), rtol=1e-4, atol=1e-5)


def test_rkmoire_adaptive(dit) -> None:
    "Adaptive solver: host-controlled loop over jitted embedded stages."
    model, params = dit
    sampler = functional.RKMoire(order=3, threshold=1e-3)
    schedule = scheduling.Linear()
    transform = models.FlowModel()
    x0 = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 16, 16), jnp.float32)

    out = sampler.sample_model(x0, model.as_sampleable(params), transform, schedule, 50)
    assert bool(jnp.isfinite(out).all())


def test_tableau_catalog_on_model(dit) -> None:
    "A spread of catalog tableaux must produce finite samples end to end."
    model, params = dit
    schedule = scheduling.Linear()
    transform = models.FlowModel()
    x0 = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 8, 8), jnp.float32)

    for provider in (tableaux.RK4.Kutta, tableaux.SSP.RK4_5, tableaux.RKZ.CV8, tableaux.RKE5.DormandPrince):
        sampler = functional.RKUltra(order=99, providers={len(provider.tableau().stages): provider})
        out = sampler.sample_model(x0, model.as_sampleable(params), transform, schedule, 3)
        assert bool(jnp.isfinite(out).all()), provider


def test_generation_pipeline(dit) -> None:
    "The serving-shaped pipeline: construct once, generate repeatedly."
    from skrample_tpu.pipeline import GenerationPipeline
    from skrample_tpu.sampling import models as sk_models
    from skrample_tpu import scheduling as sched

    model, params = dit
    pipe = GenerationPipeline(
        model_fn=model.as_sampleable(params),
        sampler=structured.DPM(order=2, stochasticity=0.3),
        schedule=sched.FlowShift(sched.Linear()),
        model_transform=sk_models.FlowModel(),
        steps=6,
        latent_shape=(1, 4, 16, 16),
    )
    out1 = pipe.generate(jax.random.PRNGKey(0))
    out2 = pipe.generate(jax.random.PRNGKey(1))
    assert out1.shape == (1, 4, 16, 16)
    assert bool(jnp.isfinite(out1).all())
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # same key -> same image
    out1b = pipe.generate(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out1b))


def test_video_latents_rank_agnostic() -> None:
    "Samplers are elementwise: 5D video latents pass through untouched."
    steps = 5
    sampler = structured.DPM(order=2, stochasticity=0.5)
    schedule = scheduling.FlowShift(scheduling.Linear())
    transform = models.FlowModel()

    compiled = compile_sampler(sampler, schedule, transform, steps)
    denoiser = CompiledDenoiser.build(compiled)

    shape = (1, 16, 7, 16, 16)  # B, C, T, H, W
    x0 = jax.random.normal(jax.random.PRNGKey(8), shape, jnp.float32)

    def model_fn(x, t, s, a):
        return x * 0.9

    out = jax.jit(lambda x, k: denoiser.run(model_fn, x, key=k))(x0, jax.random.PRNGKey(9))
    assert out.shape == shape
    assert bool(jnp.isfinite(out).all())

    # 1D latents too
    x1 = jax.random.normal(jax.random.PRNGKey(10), (64,), jnp.float32)
    out1 = denoiser.run(model_fn, x1, key=jax.random.PRNGKey(11))
    assert out1.shape == (64,)


def test_unet_generation() -> None:
    "Conv UNet model family end-to-end with DPM + Karras."
    from skrample_tpu.models import UNet, UNetConfig

    unet = UNet(UNetConfig(base=32, levels=2, groups=8, compute_dtype=jnp.float32))
    params = unet.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16), jnp.float32)

    # raw forward sanity
    out = unet.apply(params, x, jnp.float32(500.0))
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())

    steps = 5
    sampler = structured.DPM(order=2)
    schedule = scheduling.Karras(scheduling.Scaled())
    transform = models.NoiseModel()
    compiled = compile_sampler(sampler, schedule, transform, steps)
    denoiser = CompiledDenoiser.build(compiled)
    latent = jax.jit(lambda x: denoiser.run(unet.as_sampleable(params), x))(x)
    assert bool(jnp.isfinite(latent).all())

    oracle = interface.StructuredFunctionalAdapter(sampler).sample_model(
        x, unet.as_sampleable(params), transform, schedule, steps
    )
    np.testing.assert_allclose(np.asarray(latent), np.asarray(oracle), rtol=1e-4, atol=1e-5)


def test_unet_layout_equivalence() -> None:
    """The TPU-native channels-last interior matches the NCHW interior
    bit-for-bit in f32 (same OIHW params tree, same NCHW interface)."""
    from skrample_tpu.models import UNet, UNetConfig

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16), jnp.float32)
    outs = {}
    for layout in ("nchw", "nhwc"):
        model = UNet(UNetConfig(base=32, levels=3, groups=8, compute_dtype=jnp.float32, layout=layout))
        params = model.init(jax.random.PRNGKey(0))
        outs[layout] = np.asarray(model.apply(params, x, jnp.float32(500.0)))
    np.testing.assert_array_equal(outs["nchw"], outs["nhwc"])
