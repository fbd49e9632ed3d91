"""SD3 model stack: the four imported checkpoints assembled into one
text -> image system.

The reference library is the *scheduler* inside someone else's SD3
pipeline (`/root/reference/examples/diffusers/wrapper.py` swaps the
scheduler of a loaded `DiffusionPipeline`); a standalone framework has to
ship the rest of that pipeline.  With the per-model importers in place
(``sd3_mmdit``, ``diffusers_vae``, ``clip_text_encoder``, ``t5_encoder``)
this module supplies the glue the diffusers pipeline would otherwise
provide: the published SD3 prompt-conditioning recipe and the sampling /
decode wiring, so a real SD3 checkpoint runs end-to-end on TPU with no
torch in the loop.

The conditioning recipe (the SD3 release / diffusers
``StableDiffusion3Pipeline``):

* sequence features = concat(CLIP-L, CLIP-G) **penultimate** hidden states
  along width (``layer_skip=1``), zero-padded up to the transformer's
  ``context_dim`` (4096), then concatenated along TOKENS with the T5
  features (zeros when T5 is dropped — the published T5-less mode),
* pooled vector = concat of the two CLIP projected EOS poolings (2048),
* the unconditional branch is the *encoded empty prompt*, not a learned
  null.

Callers pass token ids; the vocabularies are checkpoint assets, and both
id producers live in-framework — ``models.CLIPBPETokenizer`` over the
checkpoint's ``vocab.json``/``merges.txt`` for the CLIP towers and
``models.UnigramTokenizer.from_tokenizer_json`` for the T5 tower — so
everything from text to pixels runs here (any equivalent external
tokenizer works too).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from .import_weights import clip_text_encoder, diffusers_vae, sd3_mmdit, t5_encoder
from .mmdit import MMDiT
from .t5_encoder import T5Encoder
from .text_encoder import TextEncoder
from .vae import VAE


@dataclass
class SD3Stack:
    """Imported SD3 components + the published glue.

    Construct via :meth:`from_checkpoints`; then ``encode_prompt`` (ids ->
    conditioning), ``model_fn`` (a sampleable closure for any sampler /
    :class:`GenerationPipeline` / :class:`ServingEngine`), and
    ``decode``/``encode_image`` (pixels <-> scaled latents)."""

    mmdit: MMDiT
    mmdit_params: dict
    vae: VAE
    vae_params: dict
    clip_l: TextEncoder
    clip_l_params: dict
    clip_g: TextEncoder
    clip_g_params: dict
    t5: T5Encoder | None = None
    t5_params: dict | None = None
    t5_tokens: int = 256
    "Zero-feature token count standing in for T5 when it is dropped."

    @classmethod
    def from_checkpoints(
        cls,
        transformer: Any,
        vae: Any,
        clip_l: Any,
        clip_g: Any,
        t5: Any | None = None,
        t5_tokens: int = 256,
    ) -> "SD3Stack":
        """Each argument is a model object (``.state_dict()``/``.config``)
        or a ``(state_dict, config)`` pair, as the per-model importers
        accept.  ``t5=None`` runs the published T5-less mode."""
        mmdit, mmdit_params = sd3_mmdit(transformer)
        vae_m, vae_params = diffusers_vae(vae)
        l_m, l_params = clip_text_encoder(clip_l)
        g_m, g_params = clip_text_encoder(clip_g)
        t5_m, t5_params = (None, None) if t5 is None else t5_encoder(t5)

        pooled = l_params["text_proj"]["w"].shape[1] + g_params["text_proj"]["w"].shape[1]
        if pooled != mmdit.config.pooled_dim:
            raise ValueError(
                f"CLIP projection dims sum to {pooled}, transformer expects pooled_dim "
                f"{mmdit.config.pooled_dim}"
            )
        if t5_m is not None and t5_m.config.dim != mmdit.config.context_dim:
            raise ValueError(
                f"T5 width {t5_m.config.dim} != transformer context_dim {mmdit.config.context_dim}"
            )
        return cls(
            mmdit=mmdit,
            mmdit_params=mmdit_params,
            vae=vae_m,
            vae_params=vae_params,
            clip_l=l_m,
            clip_l_params=l_params,
            clip_g=g_m,
            clip_g_params=g_params,
            t5=t5_m,
            t5_params=t5_params,
            t5_tokens=t5_tokens,
        )

    # -- conditioning -------------------------------------------------------

    def encode_prompt(
        self,
        clip_l_ids: jax.Array,
        clip_g_ids: jax.Array,
        t5_ids: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Token ids (one batch row per prompt) -> ``(context, pooled)`` for
        the transformer, following the published SD3 recipe (see module
        docstring).  Verified against transformers' own towers in
        ``tests/test_sd3_stack.py``."""
        # one forward per tower: penultimate features + full-tower pooling
        feats_l, pooled_l = self.clip_l.encode(self.clip_l_params, clip_l_ids, layer_skip=1)
        feats_g, pooled_g = self.clip_g.encode(self.clip_g_params, clip_g_ids, layer_skip=1)

        clip_feats = jnp.concatenate([feats_l, feats_g], axis=-1)
        width = self.mmdit.config.context_dim
        if clip_feats.shape[-1] > width:
            raise ValueError(f"CLIP widths sum to {clip_feats.shape[-1]} > context_dim {width}")
        clip_feats = jnp.pad(clip_feats, ((0, 0), (0, 0), (0, width - clip_feats.shape[-1])))

        if self.t5 is not None and t5_ids is not None:
            t5_feats = self.t5.apply(self.t5_params, t5_ids).astype(clip_feats.dtype)
        else:
            t5_feats = jnp.zeros((clip_feats.shape[0], self.t5_tokens, width), clip_feats.dtype)

        context = jnp.concatenate([clip_feats, t5_feats], axis=1)
        pooled = jnp.concatenate([pooled_l, pooled_g], axis=-1)
        return context, pooled

    # -- sampling / pixels ----------------------------------------------------

    def model_fn(
        self,
        context: jax.Array,
        pooled: jax.Array,
        guidance_scale: float = 1.0,
        uncond: tuple[jax.Array, jax.Array] | None = None,
    ):
        """A ``(x, t, sigma, alpha) -> prediction`` closure for the samplers.

        ``uncond`` is the ``encode_prompt`` output for the empty prompt;
        required when ``guidance_scale != 1`` (SD3 has no learned null)."""
        if guidance_scale == 1.0:
            return self.mmdit.as_sampleable(self.mmdit_params, context, pooled=pooled)
        if uncond is None:
            raise ValueError("guidance_scale != 1 needs uncond=(context, pooled) — the encoded empty prompt")
        return self.mmdit.as_sampleable(
            self.mmdit_params,
            context,
            guidance_scale,
            pooled=pooled,
            uncond_context=uncond[0],
            uncond_pooled=uncond[1],
        )

    def as_served(
        self,
        guidance_scale: float = 1.0,
        uncond: tuple[jax.Array, jax.Array] | None = None,
    ):
        """A ``(x, t, sigma, alpha, cond)`` closure for
        ``ServingEngine(conditioned=True)``: each request submits its own
        ``context=(context_row, pooled_row)`` pair (one ``encode_prompt``
        row each) and the engine stacks them per batch — one executable per
        bucket serves every prompt.  ``uncond`` is a single-prompt
        ``encode_prompt`` output used for classifier-free guidance."""
        if guidance_scale != 1.0 and uncond is None:
            raise ValueError("guidance_scale != 1 needs uncond=(context, pooled) — the encoded empty prompt")

        from .conditioning import doubled_t, guided_mix, per_item

        def model_fn(x, t, sigma, alpha, cond=None):
            if cond is None:
                raise ValueError("SD3 serving requires context=(context, pooled) per request")
            context, pooled = cond
            if guidance_scale == 1.0:
                return self.mmdit.apply(self.mmdit_params, x, t, context, pooled=pooled)
            B = x.shape[0]
            both = self.mmdit.apply(
                self.mmdit_params,
                jnp.concatenate([x, x]),
                doubled_t(t, B),
                jnp.concatenate([context, per_item(uncond[0], B, 2)]),
                pooled=jnp.concatenate([pooled, per_item(uncond[1], B, 1)]),
            )
            return guided_mix(both[:B], both[B:], guidance_scale)

        return model_fn

    def pipeline(
        self,
        context: jax.Array,
        pooled: jax.Array,
        height: int,
        width: int,
        steps: int = 25,
        guidance_scale: float = 1.0,
        uncond: tuple[jax.Array, jax.Array] | None = None,
        batch: int = 1,
        **kwargs: Any,
    ):
        """A :class:`GenerationPipeline` over this stack with the SD3
        defaults: flow-matching transform, FlowShift(Linear) schedule,
        latent shape derived from the VAE's downsample factor.  ``kwargs``
        pass through (sampler=, mesh=, dtype=, ...)."""
        from ..pipeline import GenerationPipeline
        from .. import scheduling
        from ..sampling import models, structured

        f = self.vae.config.downsample_factor
        if height % f or width % f:
            raise ValueError(f"height/width must be multiples of the VAE factor {f}")
        latent_shape = (batch, self.mmdit.config.channels, height // f, width // f)
        defaults: dict[str, Any] = {
            "sampler": structured.Euler(),
            "schedule": scheduling.FlowShift(scheduling.Linear()),
            "model_transform": models.FlowModel(),
        }
        return GenerationPipeline(
            model_fn=self.model_fn(context, pooled, guidance_scale, uncond),
            steps=steps,
            latent_shape=latent_shape,
            **{**defaults, **kwargs},
        )

    def decode(self, z: jax.Array) -> jax.Array:
        "Scaled latents -> pixels (the VAE handles the scaling factor)."
        return self.vae.decode(self.vae_params, z)

    def encode_image(self, x: jax.Array, key: jax.Array | None = None) -> jax.Array:
        "Pixels -> scaled latents (posterior draw with ``key``, else mode)."
        return self.vae.encode(self.vae_params, x, key)
