#!/usr/bin/env python
"""Text-conditioned generation with classifier-free guidance on the MMDiT.

The reference library is driven by exactly this class of pipeline (its
wrapper examples run Flux/SD3, `/root/reference/examples/diffusers/
wrapper.py`); here the conditioned model, the guidance combinator, and the
compiled sampling loop are all native.  A real deployment would feed
`context` from a text encoder (T5/CLIP features, any length — the model
pads/truncates to its static token count); this example fakes the encoder
output with random features for two "prompts"."""

import jax
import jax.numpy as jnp

from skrample_tpu import scheduling
from skrample_tpu.models import MMDiT, MMDiTConfig
from skrample_tpu.pipeline import GenerationPipeline
from skrample_tpu.sampling import models, structured

model = MMDiT(MMDiTConfig(dim=256, depth=4, heads=2, context_dim=512, compute_dtype=jnp.float32))
params = model.init(jax.random.PRNGKey(0))
# fresh init is adaLN-zero (output exactly 0); nudge it so the demo denoises
params = jax.tree.map(
    lambda leaf: leaf + 0.02 * jax.random.normal(jax.random.PRNGKey(7), leaf.shape, leaf.dtype), params
)

# stand-in for a text encoder: (batch, prompt_tokens, context_dim) features
prompts = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 512), jnp.float32)

pipe = GenerationPipeline(
    model_fn=model.as_sampleable(params, prompts, guidance_scale=4.0),
    sampler=structured.DPM(order=2),
    schedule=scheduling.FlowShift(scheduling.Linear()),
    model_transform=models.FlowModel(),
    steps=20,
    latent_shape=(2, 4, 32, 32),
)

latents = pipe.generate(jax.random.PRNGKey(1))
print("guided latents:", latents.shape, float(jnp.std(latents)))

# same seed, no conditioning: the null-context branch alone
pipe_uncond = GenerationPipeline(
    model_fn=model.as_sampleable(params, None),
    sampler=structured.DPM(order=2),
    schedule=scheduling.FlowShift(scheduling.Linear()),
    model_transform=models.FlowModel(),
    steps=20,
    latent_shape=(2, 4, 32, 32),
)
uncond = pipe_uncond.generate(jax.random.PRNGKey(1))
print("uncond latents: ", uncond.shape, float(jnp.std(uncond)))
print("guidance moved the trajectory:", bool(jnp.abs(latents - uncond).max() > 1e-6))
