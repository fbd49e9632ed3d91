"""Run an SD3 checkpoint end-to-end on TPU: state dicts in, pixels out.

    sd3_mmdit + diffusers_vae + clip_text_encoder x2 (+ t5_encoder)
        -> SD3Stack.from_checkpoints
        -> encode_prompt (the published conditioning recipe)
        -> GenerationPipeline (CFG flow sampling)
        -> VAE decode

The reference swaps only the *scheduler* of a loaded diffusers pipeline
(`/root/reference/examples/diffusers/wrapper.py`); here the whole pipeline
is replaced — the transformer, VAE, and text towers are imported into this
framework's pytrees and everything from token ids to pixels runs in JAX.

With real weights (downloaded elsewhere; this sandbox has no egress):

    import safetensors.torch as st
    stack = SD3Stack.from_checkpoints(
        (st.load_file("transformer/model.safetensors"), json.load(open("transformer/config.json"))),
        (st.load_file("vae/model.safetensors"), json.load(open("vae/config.json"))),
        (st.load_file("text_encoder/model.safetensors"), json.load(open("text_encoder/config.json"))),
        (st.load_file("text_encoder_2/model.safetensors"), json.load(open("text_encoder_2/config.json"))),
        t5=(st.load_file("text_encoder_3/model.safetensors"), json.load(open("text_encoder_3/config.json"))),
    )
    # ids come from the checkpoints' own tokenizers (transformers or equivalent)

This demo builds SMALL random-weight checkpoint stand-ins with the real
state-dict naming (torch modules shaped like diffusers'/transformers'
classes) so the full path is runnable anywhere.

Run: python examples/sd3_from_checkpoints.py      (CPU: ~a minute)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu.models.sd3 import SD3Stack

# -- checkpoint stand-ins (real naming, random weights) -----------------------
# the torch mirrors + HF towers used by the parity tests double as fixtures
import torch  # noqa: E402

from transformers import CLIPTextConfig, CLIPTextModelWithProjection, T5Config, T5EncoderModel  # noqa: E402

import test_import_weights as oracles  # noqa: E402
import test_sd3_stack as stack_fixtures  # noqa: E402

torch.manual_seed(0)
stack = SD3Stack.from_checkpoints(
    (oracles.TestSD3._torch_sd3().state_dict(), oracles.TestSD3.CFG),
    (oracles.TestVAE._torch_vae().state_dict(), oracles.TestVAE.CFG),
    CLIPTextModelWithProjection(CLIPTextConfig(**stack_fixtures.CLIP_L)),
    CLIPTextModelWithProjection(CLIPTextConfig(**stack_fixtures.CLIP_G)),
    t5=T5EncoderModel(T5Config(**stack_fixtures.T5_CFG)),
    t5_tokens=8,
)

# -- conditioning: the published SD3 recipe ---------------------------------
clip_ids = jnp.asarray(stack_fixtures.token_ids(), jnp.int32)
t5_ids = jnp.asarray([[3, 14, 15, 92, 6, 53, 1, 0]], jnp.int32)
cond = stack.encode_prompt(clip_ids, clip_ids, t5_ids)

empty = jnp.asarray(stack_fixtures.empty_ids(), jnp.int32)
uncond = stack.encode_prompt(empty, empty, jnp.zeros_like(t5_ids))
print(f"context {cond[0].shape}, pooled {cond[1].shape}")

# -- CFG flow sampling + decode ----------------------------------------------
pipe = stack.pipeline(*cond, height=16, width=16, steps=8, guidance_scale=4.0, uncond=uncond)
latent = pipe.generate(jax.random.PRNGKey(42))
pixels = stack.decode(latent)
print(f"latent {latent.shape} -> pixels {pixels.shape}")

again = stack.decode(pipe.generate(jax.random.PRNGKey(42)))
assert np.array_equal(np.asarray(pixels), np.asarray(again)), "same key, same image"
assert bool(jnp.isfinite(pixels).all())
print("deterministic in the key; pixels finite — SD3 checkpoint path OK")
