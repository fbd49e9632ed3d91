"""Factorized causal spatio-temporal KL autoencoder — the pixel bridge for
the video-latent stack.

The reference only *passes through* video latents — its samplers are
rank-agnostic and ``[1, 16, 77, 32, 32]`` tensors ride its wrappers
untouched (``/root/reference/tests/diffusers_pipes.py:221``) — but it ships
nothing that maps them to pixels.  The image stack here closes that gap
with :class:`~skrample_tpu.models.vae.VAE`; this module closes it for the
Wan/LTX-class 5-D ``(B, C, T, H, W)`` workload so
``tokenizer -> T5 -> VideoDiT -> VideoVAE`` is a complete standalone
text -> video pipeline.

Architecture: "2+1D" factorized causal convolutions.

* Every level runs the same spatial resnet blocks as the image VAE
  (frames fold into the batch axis — a pure reshape) followed by one
  **temporal resblock** of causal 1-D convolutions along T.
* Temporal convs are causal: the time axis is padded on the LEFT only, so
  activation frame ``t`` depends exclusively on input frames ``<= t``.
  Causality is load-bearing, not stylistic — it gives prefix invariance
  (encoding/decoding the first k frames equals the first k frames of the
  full result, tested in ``tests/test_video_vae.py``), which is what makes
  chunked/streaming decode and image-as-first-frame conditioning sound.
* Temporal downsampling is a causal stride-2 conv at the first
  ``temporal_levels`` level transitions (encoder) and a frame-repeat +
  causal conv (decoder).  ``T`` must divide by ``2**temporal_levels`` —
  uniform compression, a deliberate simplification of the ``1 + 4k``
  first-frame-image convention some checkpoints use.
* The mid stack keeps the image VAE's single-head spatial attention
  (per-frame: frames stay folded into batch) plus a temporal resblock.

TPU-native notes:

* The interior is channels-last: spatial convs are XLA implicit-GEMM on
  ``(B*T, H, W, C)`` views, and GroupNorm(+SiLU) routes through the fused
  Pallas kernel per frame (statistics are per-(sample, frame) — no
  temporal mixing, which also preserves causality).
* A causal temporal conv is ``k`` shifted channel-contraction matmuls on
  the ``(B, T, H, W, C)`` view — MXU work with no relayout copies, instead
  of a genuine 3-D convolution (whose time-axis im2col XLA handles poorly).
* The posterior draw is a pure function of ``(params, x, key)`` — the same
  counter-based-RNG contract as every other family here.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from .unet import _conv, _conv_init, _dense, _dense_init, _groupnorm


def _tconv_init(key, k: int, c_in: int, c_out: int, scale: float | None = None) -> dict:
    scale = scale if scale is not None else 1 / math.sqrt(k * c_in)
    return {
        "w": jax.random.normal(key, (k, c_in, c_out), jnp.float32) * scale,
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def _tconv(params: dict, x: jax.Array, dtype: Any, stride: int = 1) -> jax.Array:
    """Causal temporal conv on ``(B, T, H, W, C)``: left-pad ``k - 1``
    frames, then ``k`` shifted matmuls over the channel axis (f32
    accumulation).  Output frame ``j`` reads input frames
    ``j*stride - (k-1) .. j*stride`` — strictly causal."""
    w = params["w"].astype(dtype)
    k = w.shape[0]
    T = x.shape[1]
    xp = jnp.pad(x.astype(dtype), ((0, 0), (k - 1, 0), (0, 0), (0, 0), (0, 0)))
    acc = None
    for i in range(k):
        tap = jax.lax.dynamic_slice_in_dim(xp, i, T, axis=1)
        if stride > 1:
            tap = tap[:, ::stride]
        part = jnp.einsum("bthwc,cd->bthwd", tap, w[i], preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return (acc + params["b"]).astype(dtype)


@dataclass(frozen=True)
class VideoVAEConfig:
    channels: int = 3
    "Pixel-space channels."
    latent_channels: int = 16
    "Wan/LTX-class video latents carry 16 channels."
    base: int = 64
    "Channel width at full resolution; doubles per down level (capped at 4x)."
    levels: int = 3
    "Spatial resolutions; downsample factor is ``2**(levels-1)``."
    temporal_levels: int = 2
    """Causal stride-2 temporal downsamples, applied at the FIRST
    ``temporal_levels`` level transitions; temporal factor ``2**this``.
    Must be ``<= levels - 1``."""
    blocks_per_level: int = 2
    temporal_kernel: int = 3
    groups: int = 16
    scaling_factor: float = 1.0
    "Latent normalization (see :class:`VAEConfig.scaling_factor`)."
    shift_factor: float = 0.0
    compute_dtype: Any = jnp.bfloat16
    fused_decode: Any = "auto"
    """``decode`` via the norm-into-conv Pallas kernels
    (``ops/fused_conv.py``): GroupNorm+SiLU fold into each conv's input
    read and the next norm's statistics come from each conv's output
    epilogue, so the normalized tensor never round-trips HBM (decode is
    bandwidth-bound: 12.3% -> >20% MFU at base=64, BASELINE.md).  ``"auto"``
    enables it on TPU; ``False`` keeps the reference composition
    (bit-identical to the NCHW image-VAE recipe); ``True`` forces it (CPU
    runs use kernel interpret mode).  Statistics are the uncentered-f32
    kind (``ops/groupnorm.groupnorm_eager_bign``); outputs agree with the
    unfused path to activation-dtype rounding (tested)."""

    def __post_init__(self) -> None:
        if self.temporal_levels > self.levels - 1:
            raise ValueError(
                f"temporal_levels={self.temporal_levels} exceeds the {self.levels - 1} level transitions"
            )

    @property
    def downsample_factor(self) -> int:
        return 2 ** (self.levels - 1)

    @property
    def temporal_factor(self) -> int:
        return 2**self.temporal_levels

    def widths(self) -> list[int]:
        return [self.base * min(2**level, 4) for level in range(self.levels)]


class VideoVAE:
    """Functional causal video KL autoencoder: ``init`` -> params, then
    ``encode(params, x, key)`` -> scaled latent ``(B, lc, T/ft, H/f, W/f)``
    and ``decode(params, z)`` -> pixels.  ``posterior`` exposes the raw
    (mean, logvar)."""

    def __init__(self, config: VideoVAEConfig = VideoVAEConfig()):
        self.config = config

    # -- init -------------------------------------------------------------

    def _resblock_init(self, keys, c_in: int, c_out: int) -> dict:
        return {
            "conv1": _conv_init(next(keys), 3, c_in, c_out),
            "conv2": _conv_init(next(keys), 3, c_out, c_out, scale=0.0),
            "skip": _conv_init(next(keys), 1, c_in, c_out) if c_in != c_out else None,
        }

    def _tresblock_init(self, keys, width: int) -> dict:
        k = self.config.temporal_kernel
        return {
            "tconv1": _tconv_init(next(keys), k, width, width),
            "tconv2": _tconv_init(next(keys), k, width, width, scale=0.0),
        }

    def _attn_init(self, keys, width: int) -> dict:
        return {
            "qkv": _dense_init(next(keys), width, 3 * width),
            "proj": _dense_init(next(keys), width, width, scale=0.0),
        }

    def init(self, key: jax.Array) -> dict:
        c = self.config
        widths = c.widths()
        keys = iter(jax.random.split(key, 4096))
        mid = widths[-1]
        k = c.temporal_kernel

        enc: dict = {"in_conv": _conv_init(next(keys), 3, c.channels, widths[0]), "down": []}
        for level, width in enumerate(widths):
            prev = widths[max(level - 1, 0)]
            enc["down"].append(
                {
                    "blocks": [
                        self._resblock_init(keys, prev if b == 0 else width, width)
                        for b in range(c.blocks_per_level)
                    ],
                    "tblock": self._tresblock_init(keys, width),
                    "downsample": _conv_init(next(keys), 3, width, width) if level < c.levels - 1 else None,
                    "tdown": (
                        _tconv_init(next(keys), k, width, width) if level < c.temporal_levels else None
                    ),
                }
            )
        enc["mid1"] = self._resblock_init(keys, mid, mid)
        enc["mid_attn"] = self._attn_init(keys, mid)
        enc["mid_t"] = self._tresblock_init(keys, mid)
        enc["mid2"] = self._resblock_init(keys, mid, mid)
        enc["out_conv"] = _conv_init(next(keys), 3, mid, 2 * c.latent_channels)

        dec: dict = {"in_conv": _conv_init(next(keys), 3, c.latent_channels, mid)}
        dec["mid1"] = self._resblock_init(keys, mid, mid)
        dec["mid_attn"] = self._attn_init(keys, mid)
        dec["mid_t"] = self._tresblock_init(keys, mid)
        dec["mid2"] = self._resblock_init(keys, mid, mid)
        dec["up"] = []
        for level in reversed(range(c.levels)):
            width = widths[level]
            above = widths[min(level + 1, c.levels - 1)]
            dec["up"].append(
                {
                    "blocks": [
                        self._resblock_init(keys, above if b == 0 else width, width)
                        for b in range(c.blocks_per_level + 1)
                    ],
                    "tblock": self._tresblock_init(keys, width),
                    "upsample": _conv_init(next(keys), 3, width, width) if level > 0 else None,
                    # decoder mirrors the encoder: the LAST temporal_levels
                    # up transitions (levels closest to full resolution)
                    "tup": _tconv_init(next(keys), k, width, width) if 0 < level <= c.temporal_levels else None,
                }
            )
        dec["out_conv"] = _conv_init(next(keys), 3, widths[0], c.channels, scale=0.0)
        return {"encoder": enc, "decoder": dec}

    # -- building blocks --------------------------------------------------

    def _gn(self, x: jax.Array, silu: bool = False) -> jax.Array:
        "(B, T, H, W, C) GroupNorm per (sample, frame) — causal by construction."
        B, T, H, W, C = x.shape
        return _groupnorm(x.reshape(B * T, H, W, C), self.config.groups, cl=True, silu=silu).reshape(x.shape)

    def _sconv(self, p: dict, x: jax.Array, dtype: Any, stride: int = 1) -> jax.Array:
        "Per-frame spatial conv: (B, T, H, W, C) folded to (B*T, H, W, C)."
        B, T, H, W, C = x.shape
        y = _conv(p, x.reshape(B * T, H, W, C), dtype, stride=stride, cl=True)
        return y.reshape(B, T, *y.shape[1:])

    def _resblock(self, p: dict, x: jax.Array, dtype: Any) -> jax.Array:
        h = self._sconv(p["conv1"], self._gn(x, silu=True), dtype)
        h = self._sconv(p["conv2"], self._gn(h, silu=True), dtype)
        skip = self._sconv(p["skip"], x, dtype) if p["skip"] is not None else x
        return skip + h

    def _tresblock(self, p: dict, x: jax.Array, dtype: Any) -> jax.Array:
        h = _tconv(p["tconv1"], self._gn(x, silu=True), dtype)
        h = _tconv(p["tconv2"], self._gn(h, silu=True), dtype)
        return x + h

    def _attention(self, p: dict, x: jax.Array, dtype: Any) -> jax.Array:
        "Single-head spatial attention per frame (frames stay in batch)."
        B, T, H, W, C = x.shape
        tokens = self._gn(x).reshape(B * T, H * W, C)
        qkv = _dense(p["qkv"], tokens.astype(dtype), dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(C),
            axis=-1,
        ).astype(dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v, preferred_element_type=jnp.float32).astype(dtype)
        return x + _dense(p["proj"], out, dtype).reshape(x.shape)

    # -- encoder / decoder ------------------------------------------------

    def posterior(self, params: dict, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        "(B, C, T, H, W) pixels -> (mean, logvar), each (B, lc, T/ft, H/f, W/f), f32."
        c = self.config
        dtype = c.compute_dtype
        if x.shape[2] % c.temporal_factor:
            raise ValueError(f"T={x.shape[2]} must divide by temporal factor {c.temporal_factor}")
        enc = params["encoder"]

        h = x.astype(dtype).transpose(0, 2, 3, 4, 1)  # (B, T, H, W, C)
        h = self._sconv(enc["in_conv"], h, dtype)
        for level in enc["down"]:
            for block in level["blocks"]:
                h = self._resblock(block, h, dtype)
            h = self._tresblock(level["tblock"], h, dtype)
            if level["downsample"] is not None:
                h = self._sconv(level["downsample"], h, dtype, stride=2)
            if level["tdown"] is not None:
                h = _tconv(level["tdown"], h, dtype, stride=2)
        h = self._resblock(enc["mid1"], h, dtype)
        h = self._attention(enc["mid_attn"], h, dtype)
        h = self._tresblock(enc["mid_t"], h, dtype)
        h = self._resblock(enc["mid2"], h, dtype)
        h = self._sconv(enc["out_conv"], self._gn(h, silu=True), dtype)
        h = h.transpose(0, 4, 1, 2, 3).astype(jnp.float32)  # (B, 2lc, T', H', W')
        mean, logvar = jnp.split(h, 2, axis=1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, params: dict, x: jax.Array, key: jax.Array | None = None) -> jax.Array:
        """Pixels -> scaled latent.  With ``key`` draws from the posterior
        (counter-based RNG); without, returns the posterior mode."""
        mean, logvar = self.posterior(params, x)
        z = mean
        if key is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, jnp.float32)
        return ((z - self.config.shift_factor) * self.config.scaling_factor).astype(x.dtype)

    # -- fused decode building blocks (norm-into-conv, ops/fused_conv.py) --

    def _use_fused_decode(self) -> bool:
        mode = self.config.fused_decode
        if mode == "auto":
            return jax.default_backend() == "tpu"
        return bool(mode)

    def _finalize(self, raw: jax.Array, hw: int) -> jax.Array:
        from ..ops.fused_conv import finalize_group_stats

        return finalize_group_stats(raw, self.config.groups, hw)

    def _resblock_fused(self, p: dict, x5: jax.Array, raw: jax.Array, dtype: Any):
        "conv1/conv2 with input GN+SiLU; skip added in conv2's epilogue."
        from ..ops.fused_conv import conv3x3_gn_silu

        B, T, H, W, C = x5.shape
        x = x5.reshape(B * T, H, W, C).astype(dtype)
        hwio = lambda w: w.transpose(2, 3, 1, 0)  # noqa: E731 — params stay OIHW
        h1, raw1 = conv3x3_gn_silu(x, hwio(p["conv1"]["w"]), p["conv1"]["b"], stats=self._finalize(raw, H * W))
        if p["skip"] is not None:
            skip = self._sconv(p["skip"], x5, dtype).reshape(B * T, H, W, -1)
        else:
            skip = x
        out, raw_out = conv3x3_gn_silu(
            h1, hwio(p["conv2"]["w"]), p["conv2"]["b"], stats=self._finalize(raw1, H * W), residual=skip
        )
        return out.reshape(B, T, H, W, -1), raw_out

    def _tresblock_fused(self, p: dict, x5: jax.Array, raw: jax.Array, dtype: Any):
        from ..ops.fused_conv import tconv_causal_gn_silu

        B, T, H, W, C = x5.shape
        xt = x5.reshape(B, T, H * W, C).astype(dtype)
        raw_t = raw.reshape(B, T, 2, C)
        h1, raw1 = tconv_causal_gn_silu(xt, p["tconv1"]["w"], p["tconv1"]["b"], stats=self._finalize(raw_t, H * W))
        out, raw_out = tconv_causal_gn_silu(
            h1, p["tconv2"]["w"], p["tconv2"]["b"], stats=self._finalize(raw1, H * W), residual=xt
        )
        return out.reshape(B, T, H, W, C), raw_out.reshape(B * T, 2, C)

    def _decode_fused(self, params: dict, z: jax.Array, in_dtype: Any) -> jax.Array:
        """Decode with the stats chain threaded producer -> consumer.

        Small mid-level tensors reseed the chain with an XLA stats read
        where a non-fused op (attention, resize) breaks it; the big
        finest-level tensors flow kernel-to-kernel with zero norm passes."""
        from ..ops.fused_conv import channel_stats, conv3x3_gn_silu, tconv_causal_gn_silu

        c = self.config
        dtype = c.compute_dtype
        dec = params["decoder"]
        hwio = lambda w: w.transpose(2, 3, 1, 0)  # noqa: E731

        h = self._sconv(dec["in_conv"], z, dtype)
        B, T = h.shape[:2]
        raw = channel_stats(h.reshape(B * T, -1, h.shape[-1]))
        h, raw = self._resblock_fused(dec["mid1"], h, raw, dtype)
        h = self._attention(dec["mid_attn"], h, dtype)  # small; keeps its own norm
        raw = channel_stats(h.reshape(B * T, -1, h.shape[-1]))
        h, raw = self._tresblock_fused(dec["mid_t"], h, raw, dtype)
        h, raw = self._resblock_fused(dec["mid2"], h, raw, dtype)
        for level in dec["up"]:
            for block in level["blocks"]:
                h, raw = self._resblock_fused(block, h, raw, dtype)
            h, raw = self._tresblock_fused(level["tblock"], h, raw, dtype)
            if level["tup"] is not None:
                B, T, H, W, C = h.shape
                ht, raw_t = tconv_causal_gn_silu(
                    h.reshape(B, T, H * W, C), level["tup"]["w"], level["tup"]["b"], repeat_in=2
                )
                T = 2 * T
                h = ht.reshape(B, T, H, W, C)
                raw = raw_t.reshape(B * T, 2, C)
            if level["upsample"] is not None:
                B, T, H, W, C = h.shape
                h = jax.image.resize(h, (B, T, 2 * H, 2 * W, C), method="nearest")
                hu, raw = conv3x3_gn_silu(
                    h.reshape(B * T, 2 * H, 2 * W, C),
                    hwio(level["upsample"]["w"]),
                    level["upsample"]["b"],
                )
                h = hu.reshape(B, T, 2 * H, 2 * W, C)
        # final norm reuses the chained stats (one normalize pass; the
        # 3-channel out_conv stays on XLA — a Co=3 tile would idle the MXU)
        from ..ops.fused_conv import _normalize_silu

        B, T, H, W, C = h.shape
        st = self._finalize(raw, H * W)  # (B*T, 2, C) [mean, inv]
        mean = st[:, 0].reshape(B, T, 1, 1, C)
        inv = st[:, 1].reshape(B, T, 1, 1, C)
        h = _normalize_silu(h.astype(jnp.float32), mean, inv).astype(dtype)
        h = self._sconv(dec["out_conv"], h, dtype)
        return h.transpose(0, 4, 1, 2, 3).astype(in_dtype)

    def decode(self, params: dict, z: jax.Array) -> jax.Array:
        "Scaled latent (B, lc, t, h, w) -> pixels (B, C, t*ft, h*f, w*f)."
        c = self.config
        dtype = c.compute_dtype
        in_dtype = z.dtype
        dec = params["decoder"]

        z = (z.astype(jnp.float32) / c.scaling_factor + c.shift_factor).astype(dtype)
        h = z.transpose(0, 2, 3, 4, 1)  # (B, T, H, W, C)
        if self._use_fused_decode():
            return self._decode_fused(params, h, in_dtype)
        h = self._sconv(dec["in_conv"], h, dtype)
        h = self._resblock(dec["mid1"], h, dtype)
        h = self._attention(dec["mid_attn"], h, dtype)
        h = self._tresblock(dec["mid_t"], h, dtype)
        h = self._resblock(dec["mid2"], h, dtype)
        for level in dec["up"]:
            for block in level["blocks"]:
                h = self._resblock(block, h, dtype)
            h = self._tresblock(level["tblock"], h, dtype)
            if level["tup"] is not None:
                # frame-repeat keeps causality: upsampled frame 2j (and
                # 2j+1) depends on decoder frame j; the causal conv then
                # only ever looks left
                h = jnp.repeat(h, 2, axis=1)
                h = _tconv(level["tup"], h, dtype)
            if level["upsample"] is not None:
                B, T, H, W, C = h.shape
                h = jax.image.resize(h, (B, T, 2 * H, 2 * W, C), method="nearest")
                h = self._sconv(level["upsample"], h, dtype)
        h = self._sconv(dec["out_conv"], self._gn(h, silu=True), dtype)
        return h.transpose(0, 4, 1, 2, 3).astype(in_dtype)

    # -- training ---------------------------------------------------------

    def loss(
        self, params: dict, x: jax.Array, key: jax.Array, kl_weight: float = 1e-6
    ) -> tuple[jax.Array, dict]:
        """Reconstruction (MSE) + KL training objective, the image VAE's
        recipe on 5-D inputs.  Returns ``(scalar, {"recon", "kl"})``."""
        mean, logvar = self.posterior(params, x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, jnp.float32)
        recon = self.decode(
            params, ((z - self.config.shift_factor) * self.config.scaling_factor).astype(x.dtype)
        )
        recon_loss = jnp.mean((recon.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        kl = 0.5 * jnp.mean(jnp.sum(mean**2 + jnp.exp(logvar) - 1.0 - logvar, axis=1))
        return recon_loss + kl_weight * kl, {"recon": recon_loss, "kl": kl}
