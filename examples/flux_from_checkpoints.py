"""Run a FLUX.1 checkpoint end-to-end on TPU: state dicts in, pixels out.

    flux_transformer + diffusers_vae + clip_text_encoder + t5_encoder
        -> FluxStack.from_checkpoints
        -> encode_prompt (T5 context + CLIP-L pooling, the published recipe)
        -> GenerationPipeline (guidance-EMBEDDED flow sampling — dev is
           guidance-distilled: one forward per step, no CFG doubling)
        -> VAE decode (Flux's latent shift_factor + scale conventions)

With real weights (downloaded elsewhere; this sandbox has no egress) the
recipe is the same as examples/sd3_from_checkpoints.py: load each
component's safetensors + config.json and hand the pairs to
FluxStack.from_checkpoints (t5 = text_encoder_2 for Flux).  This demo
builds SMALL random-weight checkpoint stand-ins with the real state-dict
naming so the full path is runnable anywhere.

Run: python examples/flux_from_checkpoints.py      (CPU: ~a minute)
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
from transformers import CLIPTextConfig, CLIPTextModel, T5Config, T5EncoderModel  # noqa: E402

import test_flux_stack as fixtures  # noqa: E402
import test_import_weights as oracles  # noqa: E402
from skrample_tpu.models.flux_stack import FluxStack  # noqa: E402

torch.manual_seed(0)
stack = FluxStack.from_checkpoints(
    (oracles.TestFlux._torch_flux().state_dict(), oracles.TestFlux.CFG),
    (oracles.TestVAE._torch_vae(quant=False).state_dict(), fixtures.VAE_CFG),
    CLIPTextModel(CLIPTextConfig(**fixtures.CLIP_CFG)),
    T5EncoderModel(T5Config(**fixtures.T5_CFG)),
)

clip_ids = jnp.asarray(fixtures.token_ids(), jnp.int32)
t5_ids = jnp.asarray(fixtures.T5_IDS, jnp.int32)
context, pooled = stack.encode_prompt(clip_ids, t5_ids)
print(f"context {context.shape}, pooled {pooled.shape}")

pipe = stack.pipeline(context, pooled, height=16, width=16, steps=8, guidance=3.5)
latent = pipe.generate(jax.random.PRNGKey(42))
pixels = stack.decode(latent)
print(f"latent {latent.shape} -> pixels {pixels.shape}")

again = stack.decode(pipe.generate(jax.random.PRNGKey(42)))
assert np.array_equal(np.asarray(pixels), np.asarray(again)), "same key, same image"
assert bool(jnp.isfinite(pixels).all())
print("deterministic in the key; pixels finite — FLUX.1 checkpoint path OK")

# -- community LoRA adapters merge BEFORE import (architecture-agnostic) ------
from skrample_tpu.models import merge_lora  # noqa: E402

torch.manual_seed(1)
base_sd = {k: v.numpy().copy() for k, v in oracles.TestFlux._torch_flux().state_dict().items()}
rng = np.random.default_rng(2)
lora_sd = {  # stand-in for a downloaded LoRA safetensors file
    "transformer.transformer_blocks.0.attn.to_q.lora_A.weight": rng.normal(size=(4, 64)).astype(np.float32),
    "transformer.transformer_blocks.0.attn.to_q.lora_B.weight": rng.normal(size=(64, 4)).astype(np.float32),
}
def build(transformer_sd):
    torch.manual_seed(2)
    return FluxStack.from_checkpoints(
        (transformer_sd, oracles.TestFlux.CFG),
        (oracles.TestVAE._torch_vae(quant=False).state_dict(), fixtures.VAE_CFG),
        CLIPTextModel(CLIPTextConfig(**fixtures.CLIP_CFG)),
        T5EncoderModel(T5Config(**fixtures.T5_CFG)),
    )


def render(s):
    p = s.pipeline(*s.encode_prompt(clip_ids, t5_ids), height=16, width=16, steps=8, guidance=3.5)
    return np.asarray(s.decode(p.generate(jax.random.PRNGKey(42))))


plain = render(build(base_sd))
adapted = render(build(merge_lora(base_sd, lora_sd, scale=0.8, prefix="transformer")))
assert not np.array_equal(plain, adapted), "the adapter changed the image"
print("LoRA merge path OK — same base + adapter alters the output")
