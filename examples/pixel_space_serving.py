"""End-to-end pixel-space serving: denoise in latent space, decode with the
VAE, hand callers pixels — all inside one async dispatch chain.

The reference stops at latents (the surrounding diffusers pipeline owns the
VAE); this framework ships the bridge itself (`models/vae.py`), and
`ServingEngine(postprocess=...)` runs the decode on device right behind the
denoise scan, so the serving worker still never blocks and the decode of
batch N overlaps the denoise of batch N+1.

Run: python examples/pixel_space_serving.py  (CPU: ~a minute; chip: add dims)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu.models import DiT, DiTConfig, VAE, VAEConfig
from skrample_tpu.serving import ServingEngine

# -- models: a latent-space DiT denoiser + the pixel-bridge VAE -------------
dit = DiT(DiTConfig(dim=128, depth=2, heads=2, compute_dtype=jnp.float32))
dit_params = dit.init(jax.random.PRNGKey(0))

vae = VAE(VAEConfig(base=32, levels=3, blocks_per_level=1, groups=8, compute_dtype=jnp.float32))
vae_params = vae.init(jax.random.PRNGKey(1))

LATENT = (4, 16, 16)  # VAE downsample factor 4: 16x16 latents -> 64x64 pixels

with ServingEngine(
    model_fn=dit.as_sampleable(dit_params),
    item_shape=LATENT,
    steps=8,
    buckets=(1, 4),
    postprocess=lambda z: vae.decode(vae_params, z),
) as engine:
    t0 = time.perf_counter()
    futures = [engine.submit(seed) for seed in range(6)]
    images = [np.asarray(f.result()) for f in futures]
    dt = time.perf_counter() - t0

print(f"served {len(images)} requests in {dt:.2f}s")
print(f"latent item {LATENT} -> pixel item {images[0].shape}")
assert images[0].shape == (3, 64, 64)
assert all(np.isfinite(img).all() for img in images)

# the hook is exact: pixels == decode(latents served without the hook)
with ServingEngine(
    model_fn=dit.as_sampleable(dit_params), item_shape=LATENT, steps=8, buckets=(1, 4)
) as latent_engine:
    latents = [np.asarray(latent_engine.submit(seed).result()) for seed in range(6)]
ref = np.asarray(vae.decode(vae_params, jnp.stack(latents)))
np.testing.assert_allclose(np.stack(images), ref, rtol=1e-5, atol=1e-5)
print("pixel-space serving == decode(latent serving): OK")
