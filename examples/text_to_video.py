"""The full standalone text -> video stack: prompt in, video pixels out,
no torch, no diffusers.

    ByteTokenizer -> T5Encoder -> ContinuousServingEngine(
        VideoDiT.as_served + CFG cross-attention)
            -> VideoVAE.decode (postprocess hook, causal 2+1D)

The reference only passes 5-D video latents through its samplers
(`/root/reference/tests/diffusers_pipes.py:221`); here every stage is this
framework's own family — the Wan/LTX-class workload end-to-end.  The
serving side is the continuous slot pool: requests join at denoise-step
boundaries, the per-request context is a traced argument (no recompiles per
prompt), and retired latents decode to pixels on device via the
``postprocess=`` hook.

Run: python examples/text_to_video.py   (CPU: ~a minute; chip: add dims)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):  # hermetic CPU runs under the site hook
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from skrample_tpu.continuous import ContinuousServingEngine
from skrample_tpu.models import (
    T5Encoder,
    T5EncoderConfig,
    ByteTokenizer,
    VideoDiT,
    VideoDiTConfig,
    VideoVAE,
    VideoVAEConfig,
)

WIDTH = 96  # shared context width: T5 dim == VideoDiT context_dim

# -- the three model families (random weights; swap in trained params) ------
t5 = T5Encoder(T5EncoderConfig(dim=WIDTH, head_dim=24, heads=2, ff_dim=128, depth=2, compute_dtype=jnp.float32))
t5_params = t5.init(jax.random.PRNGKey(0))

dit = VideoDiT(
    VideoDiTConfig(dim=128, depth=2, heads=2, channels=8, context_dim=WIDTH, compute_dtype=jnp.float32, attention="full")
)
dit_params = dit.init(jax.random.PRNGKey(1))
# adaLN-zero gates everything closed at init; un-zero the output heads and
# the cross-attention out-projs so random weights behave like a (badly)
# trained model for this demo
for name in ("final_mod", "final_out"):
    shape = dit_params[name]["w"].shape
    dit_params[name]["w"] = jax.random.normal(jax.random.PRNGKey(3), shape) * 0.05
for i, block in enumerate(dit_params["blocks"]):
    block["ada"]["w"] = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(4), i), block["ada"]["w"].shape) * 0.02
    block["proj_x"]["w"] = (
        jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(5), i), block["proj_x"]["w"].shape) * 0.02
    )

vae = VideoVAE(
    VideoVAEConfig(base=16, levels=2, temporal_levels=1, blocks_per_level=1, groups=4, latent_channels=8, compute_dtype=jnp.float32)
)
vae_params = vae.init(jax.random.PRNGKey(2))
vae_params["decoder"]["out_conv"]["w"] = (
    jax.random.normal(jax.random.PRNGKey(6), vae_params["decoder"]["out_conv"]["w"].shape) * 0.05
)

LATENT = (8, 4, 8, 8)  # (C, T, H, W) -> 8 frames of 16x16 pixels

# -- encode prompts (one jitted batch; features drive the cross-attention) --
tokenizer = ByteTokenizer()
prompts = ["a fox leaping through snow", "city lights at night", "waves rolling onto a beach"]
ids = jnp.asarray(tokenizer.batch(prompts, 16))
features = jax.jit(t5.apply)(t5_params, ids)

# -- serve: the continuous slot pool, pixels out ----------------------------
with ContinuousServingEngine(
    model_fn=dit.as_served(dit_params, guidance_scale=4.0),
    item_shape=LATENT,
    steps=6,
    slots=2,
    conditioned=True,
    context_like=features[0],
    postprocess=lambda z: vae.decode(vae_params, z),
) as engine:
    t0 = time.perf_counter()
    futures = [engine.submit(7, context=features[i]) for i in range(len(prompts))]
    videos = [np.asarray(f.result()) for f in futures]
    dt = time.perf_counter() - t0

    print(f"served {len(prompts)} prompts in {dt:.2f}s -> video shape {videos[0].shape}")
    assert videos[0].shape == (3, 8, 16, 16)  # (C, T, H, W) pixels
    assert all(np.isfinite(v).all() for v in videos)

    # same seed, different prompts: conditioning (not noise) separates them
    assert not np.array_equal(videos[0], videos[1])
    assert not np.array_equal(videos[1], videos[2])

    # same seed, same prompt: bit-identical (admission timing invisible)
    repeat = np.asarray(engine.generate(7, context=features[0]))

np.testing.assert_array_equal(videos[0], repeat)
print("prompt-dependence and determinism: OK")
