"""SD-class convolutional VAE (AutoencoderKL) in pure JAX — the pixel
bridge for the latent-diffusion stack.

The reference is a sampling library: it operates on latents and leaves the
pixel <-> latent transcoding to the surrounding diffusers pipeline
(`/root/reference/examples/diffusers/wrapper.py` hands latents to the
pipeline's own VAE).  A standalone TPU framework has to ship that bridge
itself, so this is the fifth model family: an SD-style KL autoencoder
(conv resnet stacks + one mid attention, 2x downsample per level) whose
encoder produces a diagonal-Gaussian posterior over a ``latent_channels``
latent at ``1/2**(levels-1)`` resolution and whose decoder maps latents
back to pixels.

TPU design notes (same playbook as :mod:`skrample_tpu.models.unet`):

* interface is NCHW (diffusers convention); the interior runs channels-last
  (NHWC) by default so the channel axis sits on the 128-wide lane dimension
  and XLA's implicit-GEMM conv needs no relayout copies.  Weights stay OIHW
  in the params tree — checkpoints are layout-portable.
* GroupNorm(+SiLU) routes through the fused Pallas kernel
  (``ops/groupnorm.py``) in channels-last mode: pixel-space activations
  make eager GroupNorm's extra HBM round-trips far more expensive than in
  latent space.
* compute in bfloat16 with float32 accumulation; statistics in float32.
* the posterior sample is a pure function of ``(params, x, key)`` —
  counter-based RNG, so batching/sharding never changes a request's draw.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from .unet import _conv, _conv_init, _dense, _dense_init, _groupnorm


@dataclass(frozen=True)
class VAEConfig:
    channels: int = 3
    "Pixel-space channels."
    latent_channels: int = 4
    base: int = 128
    "Channel width at full resolution; doubles per down level (capped at 4x)."
    levels: int = 3
    "Resolutions; spatial downsample factor is ``2**(levels-1)``."
    blocks_per_level: int = 2
    groups: int = 32
    scaling_factor: float = 0.18215
    """Latent normalization: ``encode`` multiplies posterior draws by this
    and ``decode`` divides before the decoder — the SD convention that puts
    diffusion-model latents at roughly unit variance."""
    shift_factor: float = 0.0
    """Latent re-centering applied BEFORE the scale (the SDXL-refresh /
    Flux AutoencoderKL convention): ``encode`` computes ``(z - shift) *
    scale`` and ``decode`` inverts with ``z / scale + shift``."""
    compute_dtype: Any = jnp.bfloat16
    layout: str = "auto"
    """Interior activation layout, as in :class:`UNetConfig`: ``"auto"``
    picks NHWC when ``base`` fills the 128-wide lane dimension."""
    norm_affine: bool = False
    """Learnable GroupNorm scale/bias.  Off by default (the convs carry the
    affine role); AutoencoderKL checkpoints need it on (``import_weights
    .diffusers_vae``)."""
    quant_convs: bool = False
    """AutoencoderKL's 1x1 ``quant_conv``/``post_quant_conv`` around the
    latent.  Off by default; on for imported diffusers checkpoints."""
    fused_decode: Any = "auto"
    """Decode via the norm-into-conv Pallas kernels (``ops/fused_conv.py``,
    shared with :class:`VideoVAE`).  **Measured negative result at
    base=128** (`scripts/bench_bridges.py` A/B: fused 22.0 vs unfused 19.1
    ms for the 512^2 decode): with every level lane-filling (C >= 128),
    XLA's conv lowering beats the kernel's implicit GEMM and the unfused
    path already gets the 3-pass big-slice GroupNorm — the kernels' win
    lives at half-lane widths (the video VAE's base=64: 2.16x at the
    finest level).  ``"auto"`` therefore enables the fused path only for
    channels-last interiors with ``base < 128`` on TPU; ``True`` forces it
    anywhere (CPU runs use kernel interpret mode); ``False`` keeps the
    reference composition.  Outputs agree with the unfused path to
    activation-dtype rounding (tested)."""

    @property
    def resolved_layout(self) -> str:
        if self.layout != "auto":
            return self.layout
        return "nhwc" if self.base >= 128 else "nchw"

    @property
    def downsample_factor(self) -> int:
        return 2 ** (self.levels - 1)

    def widths(self) -> list[int]:
        return [self.base * min(2**level, 4) for level in range(self.levels)]


class VAE:
    """Functional KL autoencoder: ``init`` -> params pytree, then
    ``encode(params, x, key)`` -> scaled latent, ``decode(params, z)`` ->
    pixels.  ``posterior`` exposes the raw (mean, logvar)."""

    def __init__(self, config: VAEConfig = VAEConfig()):
        self.config = config

    # -- init -------------------------------------------------------------

    @staticmethod
    def _affine_init(width: int) -> dict:
        return {"g": jnp.ones((width,), jnp.float32), "b": jnp.zeros((width,), jnp.float32)}

    def _resblock_init(self, keys, c_in: int, c_out: int) -> dict:
        affine = (
            {"norm1": self._affine_init(c_in), "norm2": self._affine_init(c_out)}
            if self.config.norm_affine
            else {}
        )
        return {
            "conv1": _conv_init(next(keys), 3, c_in, c_out),
            "conv2": _conv_init(next(keys), 3, c_out, c_out, scale=0.0),
            "skip": _conv_init(next(keys), 1, c_in, c_out) if c_in != c_out else None,
            **affine,
        }

    def _attn_init(self, keys, width: int) -> dict:
        affine = {"norm": self._affine_init(width)} if self.config.norm_affine else {}
        return {
            "qkv": _dense_init(next(keys), width, 3 * width),
            "proj": _dense_init(next(keys), width, width, scale=0.0),
            **affine,
        }

    def init(self, key: jax.Array) -> dict:
        c = self.config
        widths = c.widths()
        keys = iter(jax.random.split(key, 4096))
        mid = widths[-1]

        enc: dict = {"in_conv": _conv_init(next(keys), 3, c.channels, widths[0]), "down": []}
        for level, width in enumerate(widths):
            prev = widths[max(level - 1, 0)]
            blocks = [
                self._resblock_init(keys, prev if b == 0 else width, width)
                for b in range(c.blocks_per_level)
            ]
            down = _conv_init(next(keys), 3, width, width) if level < c.levels - 1 else None
            enc["down"].append({"blocks": blocks, "downsample": down})
        enc["mid1"] = self._resblock_init(keys, mid, mid)
        enc["mid_attn"] = self._attn_init(keys, mid)
        enc["mid2"] = self._resblock_init(keys, mid, mid)
        # 2x latent channels: mean and logvar of the diagonal posterior
        enc["out_conv"] = _conv_init(next(keys), 3, mid, 2 * c.latent_channels)
        if c.norm_affine:
            enc["norm_out"] = self._affine_init(mid)
        if c.quant_convs:
            enc["quant_conv"] = _conv_init(next(keys), 1, 2 * c.latent_channels, 2 * c.latent_channels)

        dec: dict = {"in_conv": _conv_init(next(keys), 3, c.latent_channels, mid)}
        if c.quant_convs:
            dec["post_quant_conv"] = _conv_init(next(keys), 1, c.latent_channels, c.latent_channels)
        dec["mid1"] = self._resblock_init(keys, mid, mid)
        dec["mid_attn"] = self._attn_init(keys, mid)
        dec["mid2"] = self._resblock_init(keys, mid, mid)
        dec["up"] = []
        for level in reversed(range(c.levels)):
            width = widths[level]
            above = widths[min(level + 1, c.levels - 1)]
            blocks = [
                self._resblock_init(keys, above if b == 0 else width, width)
                for b in range(c.blocks_per_level + 1)  # SD decoders run one extra block
            ]
            up = _conv_init(next(keys), 3, width, width) if level > 0 else None
            dec["up"].append({"blocks": blocks, "upsample": up})
        dec["out_conv"] = _conv_init(next(keys), 3, widths[0], c.channels, scale=0.0)
        if c.norm_affine:
            dec["norm_out"] = self._affine_init(widths[0])

        return {"encoder": enc, "decoder": dec}

    # -- building blocks ----------------------------------------------------

    def _gn(self, x: jax.Array, cl: bool, p: dict | None = None, silu: bool = False) -> jax.Array:
        "GroupNorm, optionally with imported affine params (AutoencoderKL)."
        c = self.config
        if p is None:
            return _groupnorm(x, c.groups, cl, silu=silu)
        if cl:
            # one fused pass: statistics + normalize + f32 affine (+SiLU)
            from ..ops.groupnorm import groupnorm_cl

            return groupnorm_cl(x, c.groups, fuse_silu=silu, scale=p["g"], bias=p["b"])
        y = _groupnorm(x, c.groups, cl)
        y = y * p["g"][None, :, None, None] + p["b"][None, :, None, None]
        return jax.nn.silu(y) if silu else y

    def _resblock(self, p: dict, x: jax.Array, dtype: Any, cl: bool) -> jax.Array:
        h = _conv(p["conv1"], self._gn(x, cl, p.get("norm1"), silu=True), dtype, cl=cl)
        h = _conv(p["conv2"], self._gn(h, cl, p.get("norm2"), silu=True), dtype, cl=cl)
        skip = _conv(p["skip"], x, dtype, cl=cl) if p["skip"] is not None else x
        return skip + h

    def _attention(self, p: dict, x: jax.Array, dtype: Any, cl: bool) -> jax.Array:
        "Single-head full attention over the (coarsest) spatial grid."
        c = self.config
        if cl:
            B, H, W, C = x.shape
            tokens = self._gn(x, cl, p.get("norm")).reshape(B, H * W, C)
        else:
            B, C, H, W = x.shape
            tokens = self._gn(x, cl, p.get("norm")).reshape(B, C, H * W).transpose(0, 2, 1)
        qkv = _dense(p["qkv"], tokens.astype(dtype), dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(C),
            axis=-1,
        ).astype(dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v, preferred_element_type=jnp.float32).astype(dtype)
        out = _dense(p["proj"], out, dtype)
        return x + (out.reshape(B, H, W, C) if cl else out.transpose(0, 2, 1).reshape(B, C, H, W))

    # -- encoder / decoder ----------------------------------------------------

    def posterior(self, params: dict, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        "(B, C, H, W) pixels -> (mean, logvar), each (B, latent, H/f, W/f), f32."
        c = self.config
        dtype = c.compute_dtype
        cl = c.resolved_layout == "nhwc"
        enc = params["encoder"]

        h = x.astype(dtype).transpose(0, 2, 3, 1) if cl else x.astype(dtype)
        h = _conv(enc["in_conv"], h, dtype, cl=cl)
        for level in enc["down"]:
            for block in level["blocks"]:
                h = self._resblock(block, h, dtype, cl)
            if level["downsample"] is not None:
                h = _conv(level["downsample"], h, dtype, stride=2, cl=cl)
        h = self._resblock(enc["mid1"], h, dtype, cl)
        h = self._attention(enc["mid_attn"], h, dtype, cl)
        h = self._resblock(enc["mid2"], h, dtype, cl)
        h = self._gn(h, cl, enc.get("norm_out"), silu=True)
        h = _conv(enc["out_conv"], h, dtype, cl=cl)
        if "quant_conv" in enc:
            h = _conv(enc["quant_conv"], h, dtype, cl=cl)
        if cl:
            h = h.transpose(0, 3, 1, 2)
        mean, logvar = jnp.split(h.astype(jnp.float32), 2, axis=1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, params: dict, x: jax.Array, key: jax.Array | None = None) -> jax.Array:
        """Pixels -> scaled latent.  With ``key`` draws from the posterior
        (counter-based: the draw depends only on the key, never on batch
        packing); without, returns the posterior mode (mean)."""
        mean, logvar = self.posterior(params, x)
        z = mean
        if key is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, jnp.float32)
        return ((z - self.config.shift_factor) * self.config.scaling_factor).astype(x.dtype)

    # -- fused decode (norm-into-conv kernels, shared with VideoVAE) -------

    def _use_fused_decode(self, cl: bool) -> bool:
        mode = self.config.fused_decode
        if mode == "auto":
            # only half-lane widths win (see the config docstring's A/B)
            return cl and self.config.base < 128 and jax.default_backend() == "tpu"
        return bool(mode) and cl

    def _finalize(self, raw: jax.Array, hw: int, affine: dict | None) -> jax.Array:
        from ..ops.fused_conv import finalize_group_stats

        scale = affine["g"] if affine is not None else None
        bias = affine["b"] if affine is not None else None
        return finalize_group_stats(raw, self.config.groups, hw, scale=scale, bias=bias)

    def _resblock_fused(self, p: dict, x: jax.Array, raw: jax.Array, dtype: Any):
        "conv1/conv2 with input GN(+affine)+SiLU; skip added in conv2's epilogue."
        from ..ops.fused_conv import conv3x3_gn_silu

        _B, H, W, _C = x.shape
        hwio = lambda w: w.transpose(2, 3, 1, 0)  # noqa: E731 — params stay OIHW
        h1, raw1 = conv3x3_gn_silu(
            x, hwio(p["conv1"]["w"]), p["conv1"]["b"], stats=self._finalize(raw, H * W, p.get("norm1"))
        )
        skip = _conv(p["skip"], x, dtype, cl=True) if p["skip"] is not None else x
        return conv3x3_gn_silu(
            h1, hwio(p["conv2"]["w"]), p["conv2"]["b"], stats=self._finalize(raw1, H * W, p.get("norm2")), residual=skip
        )

    def _decode_fused(self, params: dict, h: jax.Array, in_dtype: Any) -> jax.Array:
        "NHWC decode with the stats chain threaded producer -> consumer."
        from ..ops.fused_conv import _normalize_silu, channel_stats, conv3x3_gn_silu

        c = self.config
        dtype = c.compute_dtype
        dec = params["decoder"]
        hwio = lambda w: w.transpose(2, 3, 1, 0)  # noqa: E731

        if "post_quant_conv" in dec:
            h = _conv(dec["post_quant_conv"], h, dtype, cl=True)
        h = _conv(dec["in_conv"], h, dtype, cl=True)
        raw = channel_stats(h.reshape(h.shape[0], -1, h.shape[-1]))
        h, raw = self._resblock_fused(dec["mid1"], h, raw, dtype)
        h = self._attention(dec["mid_attn"], h, dtype, True)  # small; keeps its own norm
        raw = channel_stats(h.reshape(h.shape[0], -1, h.shape[-1]))
        h, raw = self._resblock_fused(dec["mid2"], h, raw, dtype)
        for level in dec["up"]:
            for block in level["blocks"]:
                h, raw = self._resblock_fused(block, h, raw, dtype)
            if level["upsample"] is not None:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, 2 * H, 2 * W, C), method="nearest")
                h, raw = conv3x3_gn_silu(h, hwio(level["upsample"]["w"]), level["upsample"]["b"])
        # final norm reuses the chained stats; the 3-channel out_conv stays
        # on XLA (a Co=3 tile would idle the MXU)
        B, H, W, C = h.shape
        st = self._finalize(raw, H * W, dec.get("norm_out"))
        h = _normalize_silu(h.astype(jnp.float32), st[:, None, None, 0, :], st[:, None, None, 1, :]).astype(dtype)
        h = _conv(dec["out_conv"], h, dtype, cl=True)
        return h.transpose(0, 3, 1, 2).astype(in_dtype)

    def decode(self, params: dict, z: jax.Array) -> jax.Array:
        "Scaled latent (B, latent, h, w) -> pixels (B, C, h*f, w*f)."
        c = self.config
        dtype = c.compute_dtype
        in_dtype = z.dtype
        cl = c.resolved_layout == "nhwc"
        dec = params["decoder"]

        z = (z.astype(jnp.float32) / c.scaling_factor + c.shift_factor).astype(dtype)
        h = z.transpose(0, 2, 3, 1) if cl else z
        if self._use_fused_decode(cl):
            return self._decode_fused(params, h, in_dtype)
        if "post_quant_conv" in dec:
            h = _conv(dec["post_quant_conv"], h, dtype, cl=cl)
        h = _conv(dec["in_conv"], h, dtype, cl=cl)
        h = self._resblock(dec["mid1"], h, dtype, cl)
        h = self._attention(dec["mid_attn"], h, dtype, cl)
        h = self._resblock(dec["mid2"], h, dtype, cl)
        for level in dec["up"]:
            for block in level["blocks"]:
                h = self._resblock(block, h, dtype, cl)
            if level["upsample"] is not None:
                if cl:
                    B, H, W, C = h.shape
                    h = jax.image.resize(h, (B, 2 * H, 2 * W, C), method="nearest")
                else:
                    B, C, H, W = h.shape
                    h = jax.image.resize(h, (B, C, 2 * H, 2 * W), method="nearest")
                h = _conv(level["upsample"], h, dtype, cl=cl)
        h = self._gn(h, cl, dec.get("norm_out"), silu=True)
        h = _conv(dec["out_conv"], h, dtype, cl=cl)
        return (h.transpose(0, 3, 1, 2) if cl else h).astype(in_dtype)

    # -- training ----------------------------------------------------------

    def loss(
        self, params: dict, x: jax.Array, key: jax.Array, kl_weight: float = 1e-6
    ) -> tuple[jax.Array, dict]:
        """Reconstruction (MSE) + KL-to-standard-normal training objective.
        Returns ``(scalar_loss, {"recon": ..., "kl": ...})``."""
        mean, logvar = self.posterior(params, x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, jnp.float32)
        recon = self.decode(params, ((z - self.config.shift_factor) * self.config.scaling_factor).astype(x.dtype))
        recon_loss = jnp.mean((recon.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        kl = 0.5 * jnp.mean(jnp.sum(mean**2 + jnp.exp(logvar) - 1.0 - logvar, axis=1))
        return recon_loss + kl_weight * kl, {"recon": recon_loss, "kl": kl}
