"""VideoVAE: the causal spatio-temporal pixel bridge (models/video_vae.py).

The reference's samplers pass 5-D video latents through untouched
(``/root/reference/tests/diffusers_pipes.py:221``) but ship no pixel
bridge; these tests pin the one the TPU build adds.  The load-bearing
property is CAUSALITY — prefix invariance in both directions — which is
what makes streaming decode and image-as-first-frame conditioning sound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skrample_tpu.models import VideoVAE, VideoVAEConfig

CONFIG = VideoVAEConfig(
    base=16,
    levels=2,
    temporal_levels=1,
    blocks_per_level=1,
    groups=4,
    latent_channels=8,
    compute_dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def vae_and_params():
    vae = VideoVAE(CONFIG)
    return vae, vae.init(jax.random.PRNGKey(0))


def test_shapes_round_trip(vae_and_params) -> None:
    vae, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 16, 16), jnp.float32)
    z = vae.encode(params, x)
    assert z.shape == (2, 8, 2, 8, 8)  # T/2, H/2, W/2
    y = vae.decode(params, z)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_indivisible_frames_rejected(vae_and_params) -> None:
    vae, params = vae_and_params
    x = jnp.zeros((1, 3, 3, 16, 16), jnp.float32)
    with pytest.raises(ValueError, match="temporal factor"):
        vae.encode(params, x)


def test_posterior_sample_is_counter_based(vae_and_params) -> None:
    "The draw is a pure function of (params, x, key) — same key, same draw."
    vae, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 2, 16, 16), jnp.float32)
    a = vae.encode(params, x, key=jax.random.PRNGKey(7))
    b = vae.encode(params, x, key=jax.random.PRNGKey(7))
    c = vae.encode(params, x, key=jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_encoder_prefix_causality(vae_and_params) -> None:
    """Encoding the first k*ft input frames == the first k latent frames of
    the full encode: no activation ever looks at a later frame."""
    vae, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 8, 16, 16), jnp.float32)
    full_mean, full_logvar = vae.posterior(params, x)
    for t_prefix in (2, 4, 6):
        mean, logvar = vae.posterior(params, x[:, :, :t_prefix])
        k = t_prefix // CONFIG.temporal_factor
        np.testing.assert_allclose(
            np.asarray(mean), np.asarray(full_mean[:, :, :k]), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(logvar), np.asarray(full_logvar[:, :, :k]), rtol=1e-4, atol=1e-5
        )


def test_decoder_prefix_causality(vae_and_params) -> None:
    "decode(z[:, :, :k]) == decode(z)[:, :, :k*ft] — streaming decode is sound."
    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 4, 8, 8), jnp.float32)
    full = vae.decode(params, z)
    for k in (1, 2, 3):
        part = vae.decode(params, z[:, :, :k])
        np.testing.assert_allclose(
            np.asarray(part),
            np.asarray(full[:, :, : k * CONFIG.temporal_factor]),
            rtol=1e-4,
            atol=1e-5,
        )


def test_temporal_receptive_field_is_strictly_past(vae_and_params) -> None:
    "Perturbing input frame t never changes latent frames before t // ft."
    vae, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 8, 16, 16), jnp.float32)
    base, _ = vae.posterior(params, x)
    bumped = x.at[:, :, 6].add(10.0)  # frame 6 -> latent frame 3
    mean, _ = vae.posterior(params, bumped)
    np.testing.assert_array_equal(np.asarray(mean[:, :, :3]), np.asarray(base[:, :, :3]))
    assert np.abs(np.asarray(mean[:, :, 3:]) - np.asarray(base[:, :, 3:])).max() > 0


def test_loss_and_grads_finite(vae_and_params) -> None:
    vae, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 3, 2, 16, 16), jnp.float32)

    def scalar_loss(p):
        return vae.loss(p, x, jax.random.PRNGKey(0))[0]

    loss, grads = jax.value_and_grad(scalar_loss)(params)
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    # the causal branch really trains: tconv2 gets gradient at init (tconv1
    # legitimately does not — its path flows through the zero-initialized
    # tconv2, the standard zero-init-residual warmup)
    g = grads["encoder"]["down"][0]["tblock"]["tconv2"]["w"]
    assert np.abs(np.asarray(g)).max() > 0


def test_scaling_and_shift_factors() -> None:
    cfg = VideoVAEConfig(
        base=16,
        levels=2,
        temporal_levels=1,
        blocks_per_level=1,
        groups=4,
        latent_channels=8,
        compute_dtype=jnp.float32,
        scaling_factor=0.5,
        shift_factor=0.1,
    )
    vae = VideoVAE(cfg)
    params = vae.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 2, 16, 16), jnp.float32)
    mean, _ = vae.posterior(params, x)
    z = vae.encode(params, x)
    np.testing.assert_allclose(np.asarray(z), (np.asarray(mean) - 0.1) * 0.5, rtol=1e-6)
    # decode inverts the normalization before entering the decoder
    plain = VideoVAE(
        VideoVAEConfig(
            base=16,
            levels=2,
            temporal_levels=1,
            blocks_per_level=1,
            groups=4,
            latent_channels=8,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(
        np.asarray(vae.decode(params, z)),
        np.asarray(plain.decode(params, mean.astype(jnp.float32))),
        rtol=1e-5,
        atol=1e-6,
    )


def test_temporal_levels_validated() -> None:
    with pytest.raises(ValueError, match="temporal_levels"):
        VideoVAEConfig(levels=2, temporal_levels=2)


class TestFusedDecode:
    """The norm-into-conv fused decode (ops/fused_conv.py) against the
    reference composition: same params, same latent, activation-dtype
    agreement.  The fused path replaces every GroupNorm HBM pass with
    normalize-on-conv-input-read + stats-from-conv-epilogue; statistics are
    the uncentered f32 kind, so agreement is to rounding, not bit-exact."""

    @pytest.mark.parametrize("levels,tlevels", [(2, 1), (3, 2)])
    def test_fused_matches_reference(self, levels, tlevels) -> None:
        kw = dict(
            base=16, levels=levels, temporal_levels=tlevels, blocks_per_level=1,
            groups=4, latent_channels=8, compute_dtype=jnp.float32,
        )
        ref_vae = VideoVAE(VideoVAEConfig(**kw, fused_decode=False))
        fused_vae = VideoVAE(VideoVAEConfig(**kw, fused_decode=True))
        params = ref_vae.init(jax.random.PRNGKey(0))
        t = 2 ** tlevels
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, t, 8, 8), jnp.float32)
        want = np.asarray(ref_vae.decode(params, z))
        got = np.asarray(fused_vae.decode(params, z))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_fused_decode_prefix_causality(self) -> None:
        "Streaming soundness survives the fusion: prefix decode == decode prefix."
        cfg = VideoVAEConfig(
            base=16, levels=2, temporal_levels=1, blocks_per_level=1,
            groups=4, latent_channels=8, compute_dtype=jnp.float32, fused_decode=True,
        )
        vae = VideoVAE(cfg)
        params = vae.init(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 4, 8, 8), jnp.float32)
        full = np.asarray(vae.decode(params, z))
        half = np.asarray(vae.decode(params, z[:, :, :2]))
        np.testing.assert_allclose(half, full[:, :, : half.shape[2]], rtol=1e-4, atol=1e-4)

    def test_fused_loss_grads_match_reference(self) -> None:
        "custom_vjp backward (eager composition) == reference grads."
        kw = dict(
            base=16, levels=2, temporal_levels=1, blocks_per_level=1,
            groups=4, latent_channels=8, compute_dtype=jnp.float32,
        )
        ref_vae = VideoVAE(VideoVAEConfig(**kw, fused_decode=False))
        fused_vae = VideoVAE(VideoVAEConfig(**kw, fused_decode=True))
        params = ref_vae.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 2, 16, 16), jnp.float32)

        gr = jax.grad(lambda p: ref_vae.loss(p, x, jax.random.PRNGKey(7))[0])(params)
        gf = jax.grad(lambda p: fused_vae.loss(p, x, jax.random.PRNGKey(7))[0])(params)
        flat_r = jax.tree.leaves(gr)
        flat_f = jax.tree.leaves(gf)
        for a, b in zip(flat_r, flat_f):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)
