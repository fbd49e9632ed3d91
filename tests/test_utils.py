"""Utility surface: torch bridge, profiler trace, compile cache, pipeline builder."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from skrample_tpu.utils import enable_compilation_cache, from_torch, to_torch, trace


def test_torch_roundtrip() -> None:
    t = torch.randn(4, 4)
    j = from_torch(t)
    np.testing.assert_allclose(t.numpy(), np.asarray(j))
    back = to_torch(j, dtype=torch.float64)
    assert back.dtype == torch.float64
    np.testing.assert_allclose(t.numpy(), back.numpy())


def test_trace_contextmanager(tmp_path) -> None:
    with trace(tmp_path):
        jnp.ones(8).block_until_ready()
    assert any(tmp_path.iterdir())  # wrote profile artifacts


def test_compilation_cache(tmp_path) -> None:
    enable_compilation_cache(tmp_path)
    assert jax.config.jax_compilation_cache_dir == str(tmp_path)


def test_build_pipeline() -> None:
    from skrample_tpu.pipeline import build_pipeline

    pipe = build_pipeline(lambda x, t, s, a: x * 0.9, (1, 4, 8, 8), steps=4)
    out = pipe.generate(jax.random.PRNGKey(0))
    assert out.shape == (1, 4, 8, 8)
    assert pipe.nfe == 4


def test_ssim_properties():
    "SSIM: identity = 1, monotone degradation, bounded."
    import numpy as np

    from skrample_tpu.utils.quality import psnr, ssim

    rng = np.random.default_rng(0)
    img = rng.normal(size=(32, 32))
    assert ssim(img, img) == 1.0
    light = ssim(img, img + rng.normal(size=img.shape) * 0.05)
    heavy = ssim(img, img + rng.normal(size=img.shape) * 0.5)
    assert 1.0 > light > heavy > -1.0
    assert psnr(img, img) == float("inf")
    assert psnr(img, img + 0.1) > psnr(img, img + 1.0)


def test_param_checkpoint_roundtrip(tmp_path):
    import jax
    import numpy as np

    from skrample_tpu.models import DiT, DiTConfig, load_params, save_params

    model = DiT(DiTConfig(dim=64, depth=2, heads=2, channels=1))
    params = model.init(jax.random.PRNGKey(0))
    save_params(tmp_path / "p.npz", params)
    loaded = load_params(tmp_path / "p.npz")
    assert jax.tree.all(jax.tree.map(lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), params, loaded))
    # blocks list survives as a list in order
    assert isinstance(loaded["blocks"], list) and len(loaded["blocks"]) == 2


def test_param_checkpoint_none_leaves(tmp_path):
    """None leaves (identity skips in the UNet tree) round-trip without
    pickled object arrays — np.load(allow_pickle=False) must succeed."""
    import numpy as np

    from skrample_tpu.models import load_params, save_params

    tree = {"a": {"w": np.ones((2, 2), np.float32), "skip": None}, "b": [None, np.arange(3)]}
    save_params(tmp_path / "p.npz", tree)
    with np.load(tmp_path / "p.npz") as raw:  # allow_pickle defaults to False
        assert all(raw[k].dtype != object for k in raw.files)
    loaded = load_params(tmp_path / "p.npz")
    assert loaded["a"]["skip"] is None and loaded["b"][0] is None
    assert np.array_equal(loaded["a"]["w"], tree["a"]["w"])
    assert np.array_equal(loaded["b"][1], tree["b"][1])


def test_committed_surrogates_load():
    "Both committed quality-search surrogate checkpoints must deserialize."
    import pathlib

    from skrample_tpu.models import load_params

    assets = pathlib.Path(__file__).parent.parent / "skrample_tpu" / "models" / "assets"
    for name in ("surrogate_flow_32.npz", "surrogate_eps_unet_32.npz"):
        params = load_params(assets / name)
        assert params  # non-empty tree


def test_classifier_free_guidance():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from skrample_tpu.utils import classifier_free, rescaled_classifier_free

    cond = lambda x, t, s, a: x * 0.5  # noqa: E731
    uncond = lambda x, t, s, a: x * 0.1  # noqa: E731
    x = jnp.ones((2, 4))

    g = classifier_free(cond, uncond, scale=3.0)(x, 500.0, 0.5, 0.5)
    np.testing.assert_allclose(np.asarray(g), 0.1 + 3.0 * 0.4, rtol=1e-6)
    # degenerate scales
    np.testing.assert_allclose(
        np.asarray(classifier_free(cond, uncond, 1.0)(x, 0, 0, 0)), 0.5, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(classifier_free(cond, uncond, 0.0)(x, 0, 0, 0)), 0.1, rtol=1e-6
    )

    # rescaled variant: finite, and pulled toward the conditioned std
    key = jax.random.PRNGKey(0)
    xr = jax.random.normal(key, (2, 8))
    cond_r = lambda x, t, s, a: x * 2.0  # noqa: E731
    uncond_r = lambda x, t, s, a: x * 0.5  # noqa: E731
    out = rescaled_classifier_free(cond_r, uncond_r, scale=7.5, rescale=1.0)(xr, 0, 0, 0)
    assert bool(jnp.isfinite(out).all())
    assert abs(float(out.std()) - float((xr * 2.0).std())) < 1e-5


def test_interval_classifier_free_guidance():
    "CFG only inside the sigma band (arXiv:2404.07724); conditioned elsewhere."
    import jax
    import jax.numpy as jnp
    import numpy as np

    from skrample_tpu.utils import classifier_free, interval_classifier_free

    cond = lambda x, t, s, a: x * 0.5  # noqa: E731
    uncond = lambda x, t, s, a: x * 0.1  # noqa: E731
    x = jnp.ones((2, 4))

    g = interval_classifier_free(cond, uncond, scale=3.0, sigma_range=(0.2, 0.8))
    inside = classifier_free(cond, uncond, 3.0)(x, 0.0, 0.5, 0.5)
    np.testing.assert_allclose(np.asarray(g(x, 0.0, 0.5, 0.5)), np.asarray(inside), rtol=1e-6)
    # outside the band: bare conditioned model (scale collapses to 1)
    for s in (0.1, 0.9):
        np.testing.assert_allclose(np.asarray(g(x, 0.0, s, 0.5)), 0.5, rtol=1e-6)
    # band edges are inclusive
    np.testing.assert_allclose(np.asarray(g(x, 0.0, 0.2, 0.5)), np.asarray(inside), rtol=1e-6)

    # traces under jit with sigma as a traced scalar (one executable, no rebranching)
    jitted = jax.jit(g)
    np.testing.assert_allclose(np.asarray(jitted(x, 0.0, jnp.float32(0.5), 0.5)), np.asarray(inside), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jitted(x, 0.0, jnp.float32(0.9), 0.5)), 0.5, rtol=1e-6)


def test_pipeline_img2img_and_guidance():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from skrample_tpu import scheduling
    from skrample_tpu.pipeline import GenerationPipeline
    from skrample_tpu.sampling import interface, models, structured

    def cond(x, t, s, a):
        return x * 0.9

    def uncond(x, t, s, a):
        return x * 0.5

    pipe = GenerationPipeline(
        model_fn=cond,
        sampler=structured.DPM(order=2),
        schedule=scheduling.FlowShift(scheduling.Linear()),
        model_transform=models.FlowModel(),
        steps=8,
        latent_shape=(1, 4, 8, 8),
        donate=False,
        uncond_model_fn=uncond,
        guidance_scale=3.0,
    )

    # txt2img runs and is finite
    out = pipe.generate(jax.random.PRNGKey(0))
    assert out.shape == (1, 4, 8, 8) and bool(jnp.isfinite(out).all())

    # img2img enters mid-trajectory and matches the functional recipe
    initial = jnp.full((1, 4, 8, 8), 0.4, jnp.float32)
    key = jax.random.PRNGKey(1)
    out2 = pipe.generate(key, initial=initial, strength=0.5)

    # independent eager replication of the same path
    start = round(8 * 0.5)
    k_init, k_steps = jax.random.split(key)
    seed = jax.random.normal(k_init, (1, 4, 8, 8), jnp.float32)
    entry = pipe.schedule.ipoint(start / 8)
    x0 = entry.add_noise(initial, seed) / pipe.schedule.point_1.add_noise(0.0, 1.0)
    from skrample_tpu.utils.guidance import classifier_free

    guided = classifier_free(cond, uncond, 3.0)
    expected = interface.StructuredFunctionalAdapter(pipe.sampler).sample_model(
        x0, guided, pipe.model_transform, pipe.schedule, 8, include=slice(start, None)
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(expected), rtol=2e-5, atol=1e-6)


def test_adaptive_pipeline():
    import jax
    import jax.numpy as jnp

    from skrample_tpu import scheduling
    from skrample_tpu.pipeline import AdaptivePipeline
    from skrample_tpu.sampling import models
    from skrample_tpu.sampling.rk_solvers import RKMoire

    pipe = AdaptivePipeline(
        model_fn=lambda x, t, s, a: x * 0.92,
        sampler=RKMoire(order=2),
        schedule=scheduling.FlowShift(scheduling.Linear()),
        model_transform=models.FlowModel(),
        steps=40,
        latent_shape=(1, 4, 8, 8),
    )
    out, accepted, trials = pipe.generate(jax.random.PRNGKey(0))
    assert out.shape == (1, 4, 8, 8)
    assert bool(jnp.isfinite(out).all())
    assert accepted >= 1 and trials >= accepted - 1
