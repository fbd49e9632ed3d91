"""Run an SDXL checkpoint end-to-end on TPU: state dicts in, pixels out.

    diffusers_unet + diffusers_vae + clip_text_encoder x2
        -> SDXLStack.from_checkpoints
        -> encode_prompt (penultimate CLIP-L+G concat, CLIP-G pooling)
        -> GenerationPipeline (CFG, epsilon prediction on Karras(Scaled) —
           the VP regime, unlike the flow-matching SD3/Flux stacks)
        -> VAE decode

SD1.5 checkpoints use the same stack with a single tower
(``from_checkpoints(unet, vae, clip_l)``).  With real weights the recipe
matches examples/sd3_from_checkpoints.py: load each component's
safetensors + config.json pairs.  This demo builds SMALL random-weight
checkpoint stand-ins with the real state-dict naming.

Run: python examples/sdxl_from_checkpoints.py      (CPU: ~a minute)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp
import numpy as np

import torch  # noqa: E402
from transformers import CLIPTextConfig, CLIPTextModel, CLIPTextModelWithProjection  # noqa: E402

import test_import_weights as oracles  # noqa: E402
import test_sdxl_stack as fixtures  # noqa: E402
from skrample_tpu.models.sdxl import SDXLStack  # noqa: E402

torch.manual_seed(0)
stack = SDXLStack.from_checkpoints(
    (oracles.TestCondUNet._torch_unet(oracles.TestCondUNet.SDXL_CFG).state_dict(), oracles.TestCondUNet.SDXL_CFG),
    (oracles.TestVAE._torch_vae().state_dict(), oracles.TestVAE.CFG),
    CLIPTextModel(CLIPTextConfig(**fixtures.CLIP_L)),
    CLIPTextModelWithProjection(CLIPTextConfig(**fixtures.CLIP_G)),
)

ids = jnp.asarray(fixtures.token_ids(), jnp.int32)
cond = stack.encode_prompt(ids, ids)
empty = jnp.asarray(fixtures.token_ids(fill=9), jnp.int32)
uncond = stack.encode_prompt(empty, empty)
print(f"context {cond[0].shape}, pooled {cond[1].shape}")

pipe = stack.pipeline(
    *cond,
    height=16,
    width=16,
    steps=8,
    time_ids=stack.time_ids((16, 16), (0, 0), (16, 16)),
    guidance_scale=5.0,
    uncond=uncond,
)
latent = pipe.generate(jax.random.PRNGKey(42))
pixels = stack.decode(latent)
print(f"latent {latent.shape} -> pixels {pixels.shape}")

again = stack.decode(pipe.generate(jax.random.PRNGKey(42)))
assert np.array_equal(np.asarray(pixels), np.asarray(again)), "same key, same image"
assert bool(jnp.isfinite(pixels).all())
print("deterministic in the key; pixels finite — SDXL checkpoint path OK")
