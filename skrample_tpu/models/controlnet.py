"""ControlNet for the SD1.x/SD2.x/SDXL conditional UNet, in pure JAX.

The published architecture (arXiv 2302.05543 / diffusers
``ControlNetModel``): a trainable COPY of the base UNet's encoder whose
input adds an embedded control image (canny / depth / pose / ... at pixel
resolution, brought to the latent grid by a small conv ladder with three
stride-2 stages), and whose skip/mid activations pass through zero-

initialized 1x1 convs to become residuals the base UNet adds at its own
skip-collection points and after its mid block.

This class shares the encoder implementation with :class:`.unet_cond.
CondUNet` (same resnets, Transformer2D stages, downsample grid, time +
text_time conditioning), so any importable UNet family shape works as a
ControlNet shape.  ``apply`` returns ``(down_residuals, mid_residual)``
ready for ``CondUNet.apply(..., control=...)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from .unet import _conv, _conv_init
from .unet_cond import CondUNet, CondUNetConfig


@dataclass(frozen=True)
class ControlNetConfig:
    unet: CondUNetConfig = field(default_factory=CondUNetConfig)
    "The base UNet's encoder shape (widths/layers/attention/conditioning)."
    cond_channels: int = 3
    "Control-image channels (pixel space)."
    cond_embed_channels: tuple[int, ...] = (16, 32, 96, 256)
    """The conditioning-embedding conv ladder; each step after the first
    halves the resolution, so its length fixes the pixel -> latent factor
    (three stride-2 stages for the SD families' 8x VAEs)."""


class ControlNet:
    """Functional model: ``init`` -> params pytree, ``apply(params, x, t,
    context, cond_image, ...)`` -> ``(down_residuals, mid_residual)``."""

    def __init__(self, config: ControlNetConfig = ControlNetConfig()):
        self.config = config
        self._unet = CondUNet(config.unet)  # shared encoder implementation

    # -- init -----------------------------------------------------------------

    def init(self, key: jax.Array) -> dict:
        c = self.config
        u = c.unet
        unet_params = self._unet.init(key)
        params: dict = {
            k: unet_params[k]
            for k in ("conv_in", "t_mlp1", "t_mlp2", "down", "mid")
        }
        if u.pooled_dim:
            params["add_mlp1"] = unet_params["add_mlp1"]
            params["add_mlp2"] = unet_params["add_mlp2"]

        keys = iter(jax.random.split(jax.random.fold_in(key, 1), 256))
        ladder = c.cond_embed_channels
        embed: dict = {"conv_in": _conv_init(next(keys), 3, c.cond_channels, ladder[0]), "blocks": []}
        for a, b in zip(ladder[:-1], ladder[1:]):
            embed["blocks"].append(_conv_init(next(keys), 3, a, a))
            embed["blocks"].append(_conv_init(next(keys), 3, a, b))
        embed["conv_out"] = _conv_init(next(keys), 3, ladder[-1], u.widths[0], scale=0.0)
        params["cond_embed"] = embed

        skip_widths = [u.widths[0]]
        for i, w in enumerate(u.widths):
            skip_widths += [w] * u.layers_per_block
            if i < u.levels - 1:
                skip_widths.append(w)
        params["zero_down"] = [_conv_init(next(keys), 1, w, w, scale=0.0) for w in skip_widths]
        params["zero_mid"] = _conv_init(next(keys), 1, u.widths[-1], u.widths[-1], scale=0.0)
        return params

    # -- forward ------------------------------------------------------------

    def _embed_cond(self, p: dict, cond: jax.Array, dtype: Any, cl: bool) -> jax.Array:
        "The published conv ladder: conv-silu pairs, stride 2 on each width step."
        h = jax.nn.silu(_conv(p["conv_in"], cond.astype(dtype), dtype, cl=cl))
        for j, blk in enumerate(p["blocks"]):
            stride = 2 if j % 2 else 1  # every second conv steps the width AND halves resolution
            h = jax.nn.silu(_conv(blk, h, dtype, stride=stride, cl=cl, pad=1))
        return _conv(p["conv_out"], h, dtype, cl=cl)

    def apply(
        self,
        params: dict,
        x: jax.Array,
        t: jax.Array,
        context: jax.Array,
        cond_image: jax.Array,
        pooled: jax.Array | None = None,
        time_ids: jax.Array | None = None,
        scale: float = 1.0,
    ) -> tuple[list[jax.Array], jax.Array]:
        """(B, C, h, w) latents + (B, cond_channels, H, W) PIXEL-resolution
        control image -> ``(down_residuals, mid_residual)`` (NCHW), each
        scaled by ``scale`` (the conditioning strength)."""
        u = self.config.unet
        dtype = u.compute_dtype
        cl = u.resolved_layout == "nhwc"
        B = x.shape[0]
        if jnp.ndim(t) == 0:
            t = jnp.broadcast_to(t, (B,))
        cond_vec = self._unet._cond_vector(params, t, pooled, time_ids, B, dtype)
        context = context.astype(dtype)

        h = x.astype(dtype).transpose(0, 2, 3, 1) if cl else x.astype(dtype)
        img = cond_image.astype(dtype).transpose(0, 2, 3, 1) if cl else cond_image.astype(dtype)
        # the control embedding adds AFTER conv_in, before the first skip
        h = _conv(params["conv_in"], h, dtype, cl=cl) + self._embed_cond(params["cond_embed"], img, dtype, cl)

        skips = [h]
        for i, level in enumerate(params["down"]):
            for res, attn in zip(level["resnets"], level["attns"]):
                h = self._unet._resnet(res, h, cond_vec, dtype, cl)
                if attn is not None:
                    h = self._unet._transformer(attn, h, context, u.heads[i], dtype, cl)
                skips.append(h)
            if level["downsample"] is not None:
                h = _conv(level["downsample"], h, dtype, stride=2, cl=cl, pad=1)
                skips.append(h)
        mid = params["mid"]
        h = self._unet._resnet(mid["res1"], h, cond_vec, dtype, cl)
        if mid["attn"] is not None:
            h = self._unet._transformer(mid["attn"], h, context, u.heads[-1], dtype, cl)
        h = self._unet._resnet(mid["res2"], h, cond_vec, dtype, cl)

        to_nchw = (lambda a: a.transpose(0, 3, 1, 2)) if cl else (lambda a: a)
        down = [
            to_nchw(_conv(z, s, dtype, cl=cl)) * scale for z, s in zip(params["zero_down"], skips)
        ]
        mid_res = to_nchw(_conv(params["zero_mid"], h, dtype, cl=cl)) * scale
        return down, mid_res
