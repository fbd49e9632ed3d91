"""ControlNet-guided sampling: spatially conditioned generation with the
SD-family CondUNet, end to end on the framework's own models.

    ControlNet.apply(latents, t, text ctx, CONTROL IMAGE)
        -> (down_residuals, mid_residual)
    CondUNet.apply(..., control=(down, mid))  # residuals add at the skips

The control image enters at PIXEL resolution through the conv ladder
(three stride-2 stages — the SD 8x VAE factor) and steers every skip
connection.  This demo runs random weights and asserts the mechanism:
the control image changes the trajectory, ``scale`` modulates it smoothly,
and scale=0 is EXACTLY the unconditioned UNet.

Import published weights with ``models.diffusers_controlnet`` /
``models.diffusers_unet`` (tests/test_import_weights.py::TestControlNet
pins parity against the published architecture).

Run: python examples/controlnet_guided.py   (CPU: ~a minute)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):  # hermetic CPU runs under the site hook
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from skrample_tpu import scheduling
from skrample_tpu.models import CondUNet, CondUNetConfig, ControlNet, ControlNetConfig
from skrample_tpu.ops import CompiledDenoiser, compile_sampler
from skrample_tpu.sampling import models, structured

unet_config = CondUNetConfig(
    widths=(32, 64),
    layers_per_block=1,
    transformer_layers=(0, 1),
    heads=(2, 2),
    context_dim=48,
    pooled_dim=0,
    groups=8,
    compute_dtype=jnp.float32,
)
unet = CondUNet(unet_config)
unet_params = unet.init(jax.random.PRNGKey(0))
# the UNet's output conv is zero-init (training identity start): wake it so
# random weights predict something control can steer
unet_params["conv_out"]["w"] = (
    jax.random.normal(jax.random.PRNGKey(8), unet_params["conv_out"]["w"].shape) * 0.05
)

control = ControlNet(ControlNetConfig(unet=unet_config, cond_embed_channels=(8, 16, 32, 32)))
ctrl_params = control.init(jax.random.PRNGKey(1))
# the ladder's conv_out and the per-skip projections are zero-init (the
# trained-identity start); wake them so random weights demonstrate steering
for name in ("conv_out",):
    w = ctrl_params["cond_embed"][name]["w"]
    ctrl_params["cond_embed"][name]["w"] = jax.random.normal(jax.random.PRNGKey(2), w.shape) * 0.05
for key in ("zero_down", "zero_mid"):
    ctrl_params[key] = jax.tree.map(
        lambda leaf: leaf + 0.05 * jax.random.normal(jax.random.PRNGKey(3), leaf.shape, leaf.dtype),
        ctrl_params[key],
    )

B, HW = 1, 16
ctx = jax.random.normal(jax.random.PRNGKey(4), (B, 6, 48), jnp.float32)
edge_map = jnp.zeros((B, 3, HW * 8, HW * 8), jnp.float32).at[:, :, :, 60:68].set(1.0)  # a vertical bar

compiled = compile_sampler(
    structured.DPM(order=2), scheduling.Karras(scheduling.Scaled()), models.NoiseModel(), 6
)
denoiser = CompiledDenoiser.build(compiled, dtype=jnp.float32)


def generate(scale: float, cond_image) -> np.ndarray:
    def model_fn(x, t, s, a):
        residuals = control.apply(ctrl_params, x, t, ctx, cond_image, scale=scale)
        return unet.apply(unet_params, x, t, ctx, control=residuals)

    x0 = jax.random.normal(jax.random.PRNGKey(7), (B, 4, HW, HW), jnp.float32)
    return np.asarray(jax.jit(lambda x: denoiser.run(model_fn, x))(x0))


plain_unet = np.asarray(
    jax.jit(
        lambda x: denoiser.run(lambda xx, t, s, a: unet.apply(unet_params, xx, t, ctx), x)
    )(jax.random.normal(jax.random.PRNGKey(7), (B, 4, HW, HW), jnp.float32))
)

off = generate(0.0, edge_map)
half = generate(0.5, edge_map)
full = generate(1.0, edge_map)
other = generate(1.0, jnp.roll(edge_map, 40, axis=3))

np.testing.assert_array_equal(off, plain_unet)  # scale=0 is exactly the bare UNet
d_half, d_full = np.abs(half - off).max(), np.abs(full - off).max()
assert 0 < d_half < d_full, (d_half, d_full)  # strength modulates smoothly
assert np.abs(other - full).max() > 0  # the control IMAGE matters, not just its presence
assert np.isfinite(full).all()

print(f"controlnet steering: |delta| scale 0.5 -> {d_half:.4f}, 1.0 -> {d_full:.4f}; scale=0 == bare UNet")
print("spatial conditioning mechanism: OK")
