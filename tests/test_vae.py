"""VAE (fifth model family): the pixel <-> latent bridge.

The reference delegates pixel transcoding to the surrounding diffusers
pipeline's VAE; a standalone framework ships its own, so these tests pin
the contract the rest of the stack relies on: shapes/downsample factor,
layout bit-equality (NCHW vs channels-last), counter-based posterior draws,
scaling-factor semantics, and trainability of the joint objective."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skrample_tpu.models import VAE, VAEConfig

TINY = VAEConfig(base=16, levels=2, blocks_per_level=1, groups=4, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def vae():
    model = VAE(TINY)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_shapes_and_downsample_factor(vae) -> None:
    model, params = vae
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32), jnp.float32)
    f = model.config.downsample_factor
    assert f == 2

    mean, logvar = model.posterior(params, x)
    assert mean.shape == logvar.shape == (2, model.config.latent_channels, 32 // f, 32 // f)

    z = model.encode(params, x, key=jax.random.PRNGKey(2))
    assert z.shape == mean.shape
    out = model.decode(params, z)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_posterior_mode_vs_sample(vae) -> None:
    model, params = vae
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 16, 16), jnp.float32)
    mode = model.encode(params, x)  # no key: the mean
    mean, _ = model.posterior(params, x)
    np.testing.assert_allclose(np.asarray(mode), np.asarray(mean) * model.config.scaling_factor, rtol=1e-6)

    # same key -> same draw; different key -> different draw (counter-based)
    s1 = model.encode(params, x, key=jax.random.PRNGKey(7))
    s2 = model.encode(params, x, key=jax.random.PRNGKey(7))
    s3 = model.encode(params, x, key=jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert not np.array_equal(np.asarray(s1), np.asarray(s3))


def test_scaling_factor_round_trip(vae) -> None:
    "decode must un-apply exactly the factor encode applied."
    model, params = vae
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 16, 16), jnp.float32)
    z = model.encode(params, x)
    rescaled = VAE(VAEConfig(**{**TINY.__dict__, "scaling_factor": 1.0}))
    np.testing.assert_allclose(
        np.asarray(model.decode(params, z)),
        np.asarray(rescaled.decode(params, z / TINY.scaling_factor)),
        rtol=1e-6,
    )


def test_layout_equivalence_f32() -> None:
    "NCHW and channels-last interiors are the same function in f32."
    cfgs = [
        VAEConfig(**{**TINY.__dict__, "layout": layout}) for layout in ("nchw", "nhwc")
    ]
    params = VAE(cfgs[0]).init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 16, 16), jnp.float32)
    key = jax.random.PRNGKey(6)
    outs = [VAE(c).decode(params, VAE(c).encode(params, x, key=key)) for c in cfgs]
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]), rtol=2e-5, atol=2e-5)


def test_batch_consistency(vae) -> None:
    "Per-item results do not depend on batch packing (deterministic path)."
    model, params = vae
    x = jax.random.normal(jax.random.PRNGKey(9), (3, 3, 16, 16), jnp.float32)
    full = model.decode(params, model.encode(params, x))
    solo = model.decode(params, model.encode(params, x[1:2]))
    np.testing.assert_allclose(np.asarray(full[1:2]), np.asarray(solo), rtol=1e-5, atol=1e-6)


def test_loss_trains() -> None:
    "A few SGD steps on one batch reduce the reconstruction loss."
    model = VAE(TINY)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 3, 16, 16), jnp.float32)

    @jax.jit
    def step(p, key):
        (loss, aux), grads = jax.value_and_grad(model.loss, has_aux=True)(p, x, key)
        p = jax.tree.map(lambda w, g: w - 1e-3 * g, p, grads)
        return p, loss, aux

    losses = []
    for i in range(8):
        params, loss, aux = step(params, jax.random.PRNGKey(100 + i))
        losses.append(float(loss))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(aux["kl"]))
    assert losses[-1] < losses[0]


def test_logvar_clipped(vae) -> None:
    model, params = vae
    x = 1e6 * jax.random.normal(jax.random.PRNGKey(11), (1, 3, 16, 16), jnp.float32)
    _, logvar = model.posterior(params, x)
    assert bool((logvar <= 20.0).all()) and bool((logvar >= -30.0).all())


class TestFusedDecode:
    """The norm-into-conv fused decode (shared with VideoVAE) against the
    reference composition — incl. the AutoencoderKL learned-affine fold
    (``finalize_group_stats(scale=, bias=)``)."""

    @pytest.mark.parametrize("norm_affine", [False, True])
    def test_fused_matches_reference(self, norm_affine) -> None:
        kw = dict(
            base=16, levels=2, blocks_per_level=1, groups=4,
            compute_dtype=jnp.float32, layout="nhwc", norm_affine=norm_affine,
        )
        ref_vae = VAE(VAEConfig(**kw, fused_decode=False))
        fused_vae = VAE(VAEConfig(**kw, fused_decode=True))
        params = ref_vae.init(jax.random.PRNGKey(0))
        if norm_affine:
            # perturb the affines so the fold is actually exercised
            def bump(tree, s):
                for k, v in tree.items():
                    if isinstance(v, dict):
                        if "g" in v and "b" in v and v["g"].ndim == 1:
                            v["g"] = v["g"] + 0.2 * jax.random.normal(jax.random.PRNGKey(s), v["g"].shape)
                            v["b"] = v["b"] + 0.1 * jax.random.normal(jax.random.PRNGKey(s + 1), v["b"].shape)
                        else:
                            bump(v, s + 7)
                    elif isinstance(v, list):
                        for item in v:
                            if isinstance(item, dict):
                                bump(item, s + 13)

            bump(params["decoder"], 3)
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8), jnp.float32)
        want = np.asarray(ref_vae.decode(params, z))
        got = np.asarray(fused_vae.decode(params, z))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    def test_fused_loss_grads_match_reference(self) -> None:
        kw = dict(base=16, levels=2, blocks_per_level=1, groups=4, compute_dtype=jnp.float32, layout="nhwc")
        ref_vae = VAE(VAEConfig(**kw, fused_decode=False))
        fused_vae = VAE(VAEConfig(**kw, fused_decode=True))
        params = ref_vae.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 16, 16), jnp.float32)
        gr = jax.grad(lambda p: ref_vae.loss(p, x, jax.random.PRNGKey(7))[0])(params)
        gf = jax.grad(lambda p: fused_vae.loss(p, x, jax.random.PRNGKey(7))[0])(params)
        for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)

    def test_nchw_config_ignores_fused_flag(self) -> None:
        "fused decode is NHWC-only; NCHW configs stay on the reference path."
        vae = VAE(VAEConfig(base=16, levels=2, blocks_per_level=1, groups=4,
                            compute_dtype=jnp.float32, layout="nchw", fused_decode=True))
        params = vae.init(jax.random.PRNGKey(0))
        out = vae.decode(params, jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8), jnp.float32))
        assert out.shape == (1, 3, 16, 16)
