"""SDXL model stack: imported SDXL checkpoints assembled into one
text -> image system (sibling of :mod:`.sd3` / :mod:`.flux_stack`).

The published SDXL conditioning: sequence context = concat of the two CLIP
towers' penultimate hidden states (L 768 + G 1280 = 2048) along width;
pooled vector = CLIP-G's projected EOS pooling (1280); plus the
``time_ids`` micro-conditioning ``[orig_h, orig_w, crop_top, crop_left,
target_h, target_w]`` embedded inside the UNet.  The denoiser is an
epsilon-predictor on the Scaled (VP) schedule — the stack's pipeline
defaults reflect that, unlike the flow-matching SD3/Flux stacks.

SD1.5 checkpoints also load (``pooled_dim == 0``): single CLIP tower,
``encode_prompt`` takes one id batch, no pooled/time_ids.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from .import_weights import clip_text_encoder, diffusers_unet, diffusers_vae
from .text_encoder import TextEncoder
from .unet_cond import CondUNet
from .vae import VAE


@dataclass
class SDXLStack:
    """Imported SDXL (or SD1.5) components + the published glue."""

    unet: CondUNet
    unet_params: dict
    vae: VAE
    vae_params: dict
    clip_l: TextEncoder
    clip_l_params: dict
    clip_g: TextEncoder | None = None
    clip_g_params: dict | None = None

    @classmethod
    def from_checkpoints(cls, unet: Any, vae: Any, clip_l: Any, clip_g: Any | None = None) -> "SDXLStack":
        """Each argument is a model object (``.state_dict()``/``.config``)
        or a ``(state_dict, config)`` pair.  ``clip_g=None`` is the SD1.5
        shape (single tower, no added conditioning)."""
        unet_m, unet_params = diffusers_unet(unet)
        vae_m, vae_params = diffusers_vae(vae)
        l_m, l_params = clip_text_encoder(clip_l)
        g_m = g_params = None
        if clip_g is not None:
            g_m, g_params = clip_text_encoder(clip_g)

        if bool(unet_m.config.pooled_dim) != (g_m is not None):
            raise ValueError("SDXL UNets (pooled_dim > 0) need clip_g; SD1.5 UNets take only clip_l")
        ctx = l_m.config.dim + (g_m.config.dim if g_m else 0)
        if ctx != unet_m.config.context_dim:
            raise ValueError(f"text widths sum to {ctx}, UNet expects context_dim {unet_m.config.context_dim}")
        if g_m is not None:
            pooled = g_params["text_proj"]["w"].shape[1]
            if pooled != unet_m.config.pooled_dim:
                raise ValueError(
                    f"CLIP-G projection width {pooled} != UNet pooled_dim {unet_m.config.pooled_dim}"
                )
        return cls(unet_m, unet_params, vae_m, vae_params, l_m, l_params, g_m, g_params)

    def encode_prompt(
        self, clip_l_ids: jax.Array, clip_g_ids: jax.Array | None = None
    ) -> tuple[jax.Array, jax.Array | None]:
        """Token ids -> ``(context, pooled)``: penultimate states of both
        towers concatenated along width, CLIP-G's projected pooling — the
        published SDXL recipe (verified against transformers in
        ``tests/test_sdxl_stack.py``).  SD1.5: one tower's penultimate
        states, ``pooled=None``."""
        feats_l = self.clip_l.apply(self.clip_l_params, clip_l_ids, layer_skip=1)
        if self.clip_g is None:
            if clip_g_ids is not None:
                raise ValueError("this stack has no CLIP-G tower")
            return feats_l, None
        if clip_g_ids is None:
            raise ValueError("SDXL needs both towers' ids")
        # one CLIP-G forward: penultimate features + full-tower pooling
        feats_g, pooled = self.clip_g.encode(self.clip_g_params, clip_g_ids, layer_skip=1)
        return jnp.concatenate([feats_l, feats_g], axis=-1), pooled

    @staticmethod
    def time_ids(
        orig: tuple[int, int], crop: tuple[int, int], target: tuple[int, int]
    ) -> jax.Array:
        "The SDXL micro-conditioning row: (orig_h, orig_w, crop_top, crop_left, target_h, target_w)."
        return jnp.asarray([[*orig, *crop, *target]], jnp.float32)

    def model_fn(
        self,
        context: jax.Array,
        pooled: jax.Array | None = None,
        time_ids: jax.Array | None = None,
        guidance_scale: float = 1.0,
        uncond: tuple[jax.Array, jax.Array | None] | None = None,
        controlnet: tuple[Any, dict] | None = None,
        control_image: jax.Array | None = None,
        control_scale: float = 1.0,
    ):
        """(x, t, sigma, alpha) -> prediction closure; CFG against the
        encoded empty prompt.

        ``controlnet=(model, params)`` + ``control_image`` (pixel-resolution,
        (1-or-B, channels, H, W)) runs the ControlNet every step on the
        current latents — the published composition: both CFG branches see
        the same control residuals scaled by ``control_scale``."""
        if (controlnet is None) != (control_image is None):
            raise ValueError("controlnet= and control_image= go together")
        if guidance_scale != 1.0 and uncond is None:
            raise ValueError("guidance_scale != 1 needs uncond=(context, pooled) — the encoded empty prompt")
        if controlnet is None:
            if guidance_scale == 1.0:
                return self.unet.as_sampleable(self.unet_params, context, pooled, time_ids)
            return self.unet.as_sampleable(
                self.unet_params,
                context,
                pooled,
                time_ids,
                guidance_scale=guidance_scale,
                uncond_context=uncond[0],
                uncond_pooled=uncond[1],
            )

        from .conditioning import doubled_t, guided_mix, per_item

        cn, cn_params = controlnet
        sdxl = bool(self.unet.config.pooled_dim)

        def controlled_fn(x, t, s, a):
            B = x.shape[0]
            guided = guidance_scale != 1.0
            if guided:
                xx = jnp.concatenate([x, x])
                tt = doubled_t(t, B)
                ctx = jnp.concatenate([per_item(context, B, 2), per_item(uncond[0], B, 2)])
                pool = jnp.concatenate([per_item(pooled, B, 1), per_item(uncond[1], B, 1)]) if sdxl else None
                tid = jnp.concatenate([per_item(time_ids, B, 1)] * 2) if sdxl else None
            else:
                xx, tt = x, jnp.broadcast_to(t, (B,)) if jnp.ndim(t) == 0 else t
                ctx = per_item(context, B, 2)
                pool = per_item(pooled, B, 1) if sdxl else None
                tid = per_item(time_ids, B, 1) if sdxl else None
            img = per_item(control_image, xx.shape[0], 3)
            control = cn.apply(cn_params, xx, tt, ctx, img, pool, tid, scale=control_scale)
            out = self.unet.apply(self.unet_params, xx, tt, ctx, pool, tid, control=control)
            return guided_mix(out[:B], out[B:], guidance_scale) if guided else out

        return controlled_fn

    def as_served(
        self,
        time_ids: jax.Array | None = None,
        guidance_scale: float = 1.0,
        uncond: tuple[jax.Array, jax.Array | None] | None = None,
    ):
        """A ``(x, t, sigma, alpha, cond)`` closure for
        ``ServingEngine(conditioned=True)``: each request submits
        ``context=(context_row, pooled_row)`` (SDXL) or a bare context row
        (SD1.5) and the engine stacks them.  ``time_ids`` binds one
        micro-conditioning row for all requests (per-request ids can ride
        the context tree instead if needed)."""
        sdxl = bool(self.unet.config.pooled_dim)
        if sdxl and time_ids is None:
            raise ValueError("SDXL serving needs time_ids= — see SDXLStack.time_ids")
        if guidance_scale != 1.0 and uncond is None:
            raise ValueError("guidance_scale != 1 needs uncond= — the encoded empty prompt")

        from .conditioning import doubled_t, guided_mix, per_item

        def model_fn(x, t, sigma, alpha, cond=None):
            if cond is None:
                raise ValueError("conditioned serving requires context= per request")
            if sdxl:
                context, pooled = cond
            else:  # SD1.5: a bare context row, or encode_prompt's (context, None)
                context = cond[0] if isinstance(cond, tuple) else cond
                pooled = None
            B = x.shape[0]
            tid = None if not sdxl else per_item(time_ids, B, 1)
            if guidance_scale == 1.0:
                return self.unet.apply(self.unet_params, x, t, context, pooled, tid)
            pool = tid2 = None
            if sdxl:
                pool = jnp.concatenate([pooled, per_item(uncond[1], B, 1)])
                tid2 = jnp.concatenate([tid, tid])
            both = self.unet.apply(
                self.unet_params,
                jnp.concatenate([x, x]),
                doubled_t(t, B),
                jnp.concatenate([context, per_item(uncond[0], B, 2)]),
                pool,
                tid2,
            )
            return guided_mix(both[:B], both[B:], guidance_scale)

        return model_fn

    def pipeline(
        self,
        context: jax.Array,
        pooled: jax.Array | None = None,
        height: int = 64,
        width: int = 64,
        steps: int = 25,
        time_ids: jax.Array | None = None,
        guidance_scale: float = 1.0,
        uncond: tuple[jax.Array, jax.Array | None] | None = None,
        batch: int = 1,
        controlnet: tuple[Any, dict] | None = None,
        control_image: jax.Array | None = None,
        control_scale: float = 1.0,
        **kwargs: Any,
    ):
        """A :class:`GenerationPipeline` with the SDXL defaults:
        epsilon prediction on Karras(Scaled) — the VP regime, not flow.
        ``controlnet``/``control_image``/``control_scale``: see
        :meth:`model_fn`."""
        from .. import scheduling
        from ..pipeline import GenerationPipeline
        from ..sampling import models, structured

        f = self.vae.config.downsample_factor
        if height % f or width % f:
            raise ValueError(f"height/width must be multiples of the VAE factor {f}")
        if self.unet.config.pooled_dim and time_ids is None:
            time_ids = self.time_ids((height, width), (0, 0), (height, width))
        latent_shape = (batch, self.unet.config.channels, height // f, width // f)
        defaults: dict[str, Any] = {
            "sampler": structured.DPM(order=2),
            "schedule": scheduling.Karras(scheduling.Scaled()),
            "model_transform": models.NoiseModel(),
        }
        return GenerationPipeline(
            model_fn=self.model_fn(
                context,
                pooled,
                time_ids,
                guidance_scale,
                uncond,
                controlnet=controlnet,
                control_image=control_image,
                control_scale=control_scale,
            ),
            steps=steps,
            latent_shape=latent_shape,
            **{**defaults, **kwargs},
        )

    def decode(self, z: jax.Array) -> jax.Array:
        return self.vae.decode(self.vae_params, z)

    def encode_image(self, x: jax.Array, key: jax.Array | None = None) -> jax.Array:
        return self.vae.encode(self.vae_params, x, key)
