"""The full standalone text -> image stack: prompt in, pixels out, no
torch, no diffusers.

    ByteTokenizer -> TextEncoder -> ServingEngine(MMDiT.as_served + CFG)
                                        -> VAE.decode (postprocess hook)

The reference is only the sampler layer of this stack — its examples lean
on a diffusers pipeline for the text encoder, the denoiser, and the VAE
(`/root/reference/examples/diffusers/wrapper.py`).  Here every stage is
this framework's own model family, and the serving engine batches
arbitrary prompts into shared executables: the per-request context is a
traced argument, so new prompts never recompile.

Run: python examples/text_to_image.py   (CPU: ~a minute; chip: add dims)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu.models import (
    VAE,
    ByteTokenizer,
    MMDiT,
    MMDiTConfig,
    TextEncoder,
    TextEncoderConfig,
    VAEConfig,
)
from skrample_tpu.serving import ServingEngine

WIDTH = 128  # shared context width: encoder dim == MMDiT context_dim

# -- the three model families (random weights; swap in trained params) ------
encoder = TextEncoder(TextEncoderConfig(dim=WIDTH, depth=2, heads=2, compute_dtype=jnp.float32))
enc_params = encoder.init(jax.random.PRNGKey(0))

mmdit = MMDiT(
    MMDiTConfig(dim=WIDTH, depth=2, heads=2, context_dim=WIDTH, compute_dtype=jnp.float32, attention="full")
)
mmdit_params = mmdit.init(jax.random.PRNGKey(1))
# adaLN-zero init gates conditioning closed (a fresh model outputs exactly 0,
# the training-friendly identity start); un-zero the output heads so random
# weights behave like a (badly) trained model for this demo
for name in ("final_mod", "final_out"):
    shape = mmdit_params[name]["w"].shape
    mmdit_params[name]["w"] = jax.random.normal(jax.random.PRNGKey(3), shape) * 0.05

vae = VAE(VAEConfig(base=32, levels=3, blocks_per_level=1, groups=8, compute_dtype=jnp.float32))
vae_params = vae.init(jax.random.PRNGKey(2))
# the VAE's output conv is zero-init for the same training reason
vae_params["decoder"]["out_conv"]["w"] = (
    jax.random.normal(jax.random.PRNGKey(5), vae_params["decoder"]["out_conv"]["w"].shape) * 0.05
)

LATENT = (4, 16, 16)  # -> 64x64 pixels through the VAE's 4x upsample

# -- encode prompts (one jitted batch; features drive the MMDiT context) ----
tokenizer = ByteTokenizer()
prompts = ["a watercolor fox", "a neon city at night", "a bowl of ramen"]
ids = jnp.asarray(tokenizer.batch(prompts, encoder.config.max_tokens))
features = jax.jit(encoder.apply)(enc_params, ids)

# -- serve: prompts batch together, CFG inside the executable ---------------
with ServingEngine(
    model_fn=mmdit.as_served(mmdit_params, guidance_scale=4.0),
    item_shape=LATENT,
    steps=8,
    buckets=(1, 4),
    max_delay_ms=50.0,
    conditioned=True,
    postprocess=lambda z: vae.decode(vae_params, z),
) as engine:
    t0 = time.perf_counter()
    futures = [engine.submit(seed, context=features[i]) for i, seed in enumerate([7, 7, 7])]
    images = [np.asarray(f.result()) for f in futures]
    dt = time.perf_counter() - t0

    print(f"served {len(prompts)} prompts in {dt:.2f}s -> pixel shape {images[0].shape}")
    assert images[0].shape == (3, 64, 64)
    assert all(np.isfinite(img).all() for img in images)

    # same seed, different prompts: conditioning (not noise) separates them
    assert not np.array_equal(images[0], images[1])
    assert not np.array_equal(images[1], images[2])

    # same seed, same prompt: bit-identical
    repeat = np.asarray(engine.generate(7, context=features[0]))

np.testing.assert_array_equal(images[0], repeat)
print("prompt-dependence and determinism: OK")
