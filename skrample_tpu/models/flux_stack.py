"""Flux model stack: imported FLUX.1 checkpoints assembled into one
text -> image system (the sibling of :mod:`.sd3`'s ``SD3Stack``).

The published Flux conditioning is simpler than SD3's: the transformer's
sequence context is the T5 features alone (512 tokens at full scale), and
the pooled vector is CLIP-L's EOS pooling (``pooler_output``, no
projection).  FLUX.1-dev is guidance-distilled — the guidance scale is an
*embedded model input*, one forward per step, not a CFG doubling;
FLUX.1-schnell drops it.  The Flux AutoencoderKL carries a latent
``shift_factor`` alongside the scale, both folded into our VAE's
``encode``/``decode``.

Callers pass token ids; ``models.CLIPBPETokenizer`` (tokenizer/) and
``models.UnigramTokenizer.from_tokenizer_json`` (tokenizer_2/) produce
them from the checkpoint's own vocabulary assets, so everything from text
to pixels runs here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import math

import jax
import jax.numpy as jnp

from .flux import Flux
from .import_weights import clip_text_encoder, diffusers_vae, flux_transformer, t5_encoder
from .t5_encoder import T5Encoder
from .text_encoder import TextEncoder
from .vae import VAE


def dynamic_shift(
    seq_len: int,
    base_seq: int = 256,
    max_seq: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    """The published Flux resolution-dependent schedule shift: ``mu`` is
    linear in the image-token count between (base_seq, base_shift) and
    (max_seq, max_shift), and the flow shift is ``exp(mu)`` — more noise
    retention at higher resolutions."""
    slope = (max_shift - base_shift) / (max_seq - base_seq)
    return math.exp(seq_len * slope + base_shift - base_seq * slope)


@dataclass
class FluxStack:
    """Imported FLUX.1 components + the published glue.

    Construct via :meth:`from_checkpoints`; then ``encode_prompt`` (ids ->
    conditioning), ``model_fn`` (a sampleable closure), and
    ``decode``/``encode_image`` (pixels <-> shifted+scaled latents)."""

    flux: Flux
    flux_params: dict
    vae: VAE
    vae_params: dict
    clip: TextEncoder
    clip_params: dict
    t5: T5Encoder
    t5_params: dict

    @classmethod
    def from_checkpoints(cls, transformer: Any, vae: Any, clip: Any, t5: Any) -> "FluxStack":
        """Each argument is a model object (``.state_dict()``/``.config``)
        or a ``(state_dict, config)`` pair, as the per-model importers
        accept."""
        flux, flux_params = flux_transformer(transformer)
        vae_m, vae_params = diffusers_vae(vae)
        clip_m, clip_params = clip_text_encoder(clip)
        t5_m, t5_params = t5_encoder(t5)

        if t5_m.config.dim != flux.config.context_dim:
            raise ValueError(f"T5 width {t5_m.config.dim} != transformer context_dim {flux.config.context_dim}")
        pooled = clip_params["text_proj"]["w"].shape[1]
        if pooled != flux.config.pooled_dim:
            raise ValueError(f"CLIP pooled width {pooled} != transformer pooled_dim {flux.config.pooled_dim}")
        if vae_m.config.latent_channels != flux.config.channels:
            raise ValueError(
                f"VAE latent channels {vae_m.config.latent_channels} != transformer channels {flux.config.channels}"
            )
        return cls(flux, flux_params, vae_m, vae_params, clip_m, clip_params, t5_m, t5_params)

    def encode_prompt(self, clip_ids: jax.Array, t5_ids: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Token ids -> ``(context, pooled)``: T5 sequence features as the
        context, CLIP-L EOS pooling as the vector — the published Flux
        recipe.  Verified against transformers' towers in
        ``tests/test_flux_stack.py``."""
        context = self.t5.apply(self.t5_params, t5_ids)
        _, pooled = self.clip.encode(self.clip_params, clip_ids)
        return context, pooled

    def model_fn(
        self,
        context: jax.Array,
        pooled: jax.Array,
        guidance: float | None = 3.5,
        true_cfg_scale: float = 1.0,
        negative: tuple[jax.Array, jax.Array] | None = None,
    ):
        """(x, t, sigma, alpha) -> prediction closure.

        ``guidance`` is the embedded dev-mode input (ignored for schnell).
        ``true_cfg_scale != 1`` with ``negative=(context, pooled)`` (an
        encoded negative prompt) additionally runs the published
        true-classifier-free-guidance mode: both branches carry the
        embedded guidance and combine as ``neg + s * (pos - neg)`` in one
        doubled-batch forward."""
        g = guidance if self.flux.config.guidance else None
        if true_cfg_scale == 1.0:
            if negative is not None:
                raise ValueError("negative= has no effect at true_cfg_scale=1 — set the scale too")
            return self.flux.as_sampleable(self.flux_params, context, pooled, guidance=g)
        if negative is None:
            raise ValueError("true_cfg_scale != 1 needs negative=(context, pooled)")

        from .conditioning import doubled_t, guided_mix, per_item

        def guided_fn(x, t, s, a):
            B = x.shape[0]
            both = self.flux.apply(
                self.flux_params,
                jnp.concatenate([x, x]),
                doubled_t(t, B),
                jnp.concatenate([per_item(context, B, 2), per_item(negative[0], B, 2)]),
                jnp.concatenate([per_item(pooled, B, 1), per_item(negative[1], B, 1)]),
                guidance=g,
            )
            return guided_mix(both[:B], both[B:], true_cfg_scale)

        return guided_fn

    def as_served(self, guidance: float | None = 3.5):
        """A ``(x, t, sigma, alpha, cond)`` closure for
        ``ServingEngine(conditioned=True)``: each request submits
        ``context=(context_row, pooled_row)`` and the engine stacks them —
        one executable per bucket serves every prompt.  Guidance is the
        embedded dev-mode input (None for schnell)."""
        g = guidance if self.flux.config.guidance else None

        def model_fn(x, t, sigma, alpha, cond=None):
            if cond is None:
                raise ValueError("Flux serving requires context=(context, pooled) per request")
            context, pooled = cond
            return self.flux.apply(self.flux_params, x, t, context, pooled, guidance=g)

        return model_fn

    def pipeline(
        self,
        context: jax.Array,
        pooled: jax.Array,
        height: int,
        width: int,
        steps: int = 25,
        guidance: float | None = 3.5,
        batch: int = 1,
        **kwargs: Any,
    ):
        """A :class:`GenerationPipeline` with the Flux flow defaults,
        including the published DYNAMIC schedule shift: the FlowShift factor
        is ``exp(mu)`` for this resolution's image-token count (see
        :func:`dynamic_shift`); pass ``schedule=`` to override."""
        from .. import scheduling
        from ..pipeline import GenerationPipeline
        from ..sampling import models, structured

        f = self.vae.config.downsample_factor
        if height % f or width % f:
            raise ValueError(f"height/width must be multiples of the VAE factor {f}")
        latent_shape = (batch, self.flux.config.channels, height // f, width // f)
        p = self.flux.config.patch
        seq_len = (height // f // p) * (width // f // p)
        defaults: dict[str, Any] = {
            "sampler": structured.Euler(),
            "schedule": scheduling.FlowShift(scheduling.Linear(), shift=dynamic_shift(seq_len)),
            "model_transform": models.FlowModel(),
        }
        return GenerationPipeline(
            model_fn=self.model_fn(context, pooled, guidance),
            steps=steps,
            latent_shape=latent_shape,
            **{**defaults, **kwargs},
        )

    def decode(self, z: jax.Array) -> jax.Array:
        "Diffusion latents -> pixels (shift + scale handled by the VAE)."
        return self.vae.decode(self.vae_params, z)

    def encode_image(self, x: jax.Array, key: jax.Array | None = None) -> jax.Array:
        "Pixels -> diffusion latents (posterior draw with ``key``, else mode)."
        return self.vae.encode(self.vae_params, x, key)
