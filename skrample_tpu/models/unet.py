"""A compact SD-style conv UNet in pure JAX.

Second reference model family (conv + attention hybrid, NCHW latents) so the
sampling stack is exercised against both DiT-style and UNet-style predictors.
Conv layout notes for TPU: the public interface is NCHW (diffusers
convention) but ``UNetConfig(layout="nhwc")`` runs the whole interior
channels-last — the TPU-native conv layout, where the channel axis maps to
the 128-wide lane dimension and XLA's implicit-GEMM lowering needs no
relayout copies.  One transpose at entry and exit; weights stay OIHW in the
params tree (checkpoint-compatible across layouts) and are reshaped to HWIO
at use time, which XLA folds into the conv's layout assignment.  bf16
compute with f32 accumulation via ``preferred_element_type``, GroupNorm in
f32.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class UNetConfig:
    channels: int = 4
    base: int = 64
    "Channel width at full resolution; doubles per down level."
    levels: int = 3
    blocks_per_level: int = 1
    groups: int = 16
    compute_dtype: Any = jnp.bfloat16
    layout: str = "auto"
    """Interior activation layout: ``"nhwc"`` (TPU-native: channels on the
    lane dimension, no relayout copies around XLA's implicit-GEMM conv),
    ``"nchw"`` (torch-style; what round 3's first characterization ran), or
    ``"auto"`` (default): nhwc when ``base`` fills the 128-wide lane
    dimension, nchw below that.  Measured on v5e (bf16, batch 4, 64x64):
    base=128 nhwc wins 2164 vs 2761 us/fwd (38.7%% vs 30.3%% MFU); base=64
    nhwc *loses* 3.4x because 64 channels leave half the lanes empty, so
    XLA's own layout assignment beats the forced channels-last placement.
    The ``apply`` interface is NCHW either way."""

    @property
    def resolved_layout(self) -> str:
        if self.layout != "auto":
            return self.layout
        return "nhwc" if self.base >= 128 else "nchw"


def _conv_init(key, k, c_in, c_out, scale=None):
    scale = scale if scale is not None else 1 / math.sqrt(k * k * c_in)
    return {
        "w": jax.random.normal(key, (c_out, c_in, k, k), jnp.float32) * scale,
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def _conv(params, x, dtype, stride=1, cl=False, pad="SAME"):
    """``cl``: channels-last (NHWC) activations; params stay OIHW either way.

    ``pad``: "SAME" (stride-2 pads (0, 1) on even inputs — the VAE
    downsampler's asymmetric padding) or an int for torch-style symmetric
    padding (the conditional UNet's stride-2 downsample uses padding=1,
    which samples a DIFFERENT grid than SAME)."""
    w = params["w"].astype(dtype)
    if cl:
        w = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO; folded into layout assignment
    out = jax.lax.conv_general_dilated(
        x.astype(dtype),
        w,
        window_strides=(stride, stride),
        padding=pad if isinstance(pad, str) else ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC") if cl else ("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    bias = params["b"] if cl else params["b"][None, :, None, None]
    return (out + bias).astype(dtype)


def _dense_init(key, d_in, d_out, scale=None):
    scale = scale if scale is not None else 1 / math.sqrt(d_in)
    return {
        "w": jax.random.normal(key, (d_in, d_out), jnp.float32) * scale,
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def _dense(params, x, dtype):
    if "w_q" in params:  # int8 serving tree (see ops/quant.py)
        from ..ops.quant import dense_int8

        return dense_int8(params, x, dtype)
    return (jnp.dot(x, params["w"].astype(dtype), preferred_element_type=jnp.float32) + params["b"]).astype(dtype)


def _groupnorm(x, groups, cl=False, silu=False):
    """Grouped norm, f32 stats, optionally fused with the following SiLU.

    Channels-last routes through the Pallas kernel on TPU
    (``ops/groupnorm.py`` — the profiler attributed 35% of the base=128
    forward to eager GroupNorm's broken fusion); NCHW stays eager."""
    if cl:
        from ..ops.groupnorm import groupnorm_cl

        return groupnorm_cl(x, groups, fuse_silu=silu)
    B, C, H, W = x.shape
    x32 = x.astype(jnp.float32).reshape(B, groups, C // groups, H, W)
    mean = x32.mean((2, 3, 4), keepdims=True)
    var = x32.var((2, 3, 4), keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + 1e-6)).reshape(B, C, H, W).astype(x.dtype)
    return jax.nn.silu(y) if silu else y


def _timestep_embedding(t, dim):
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class UNet:
    "Functional model: ``init`` -> params pytree, ``apply(params, x, t)``."

    def __init__(self, config: UNetConfig = UNetConfig()):
        self.config = config

    def _resblock_init(self, keys, c_in, c_out, temb_dim):
        return {
            "conv1": _conv_init(next(keys), 3, c_in, c_out),
            "conv2": _conv_init(next(keys), 3, c_out, c_out, scale=0.0),
            "temb": _dense_init(next(keys), temb_dim, c_out),
            "skip": _conv_init(next(keys), 1, c_in, c_out) if c_in != c_out else None,
        }

    def init(self, key: jax.Array) -> dict:
        c = self.config
        temb_dim = c.base * 4
        widths = [c.base * (2**level) for level in range(c.levels)]
        keys = iter(jax.random.split(key, 1024))

        params: dict = {
            "in_conv": _conv_init(next(keys), 3, c.channels, widths[0]),
            "t_mlp1": _dense_init(next(keys), 256, temb_dim),
            "t_mlp2": _dense_init(next(keys), temb_dim, temb_dim),
            "down": [],
            "mid1": None,
            "mid_attn": None,
            "mid2": None,
            "up": [],
            "out_conv": _conv_init(next(keys), 3, widths[0], c.channels, scale=0.0),
        }

        for level, width in enumerate(widths):
            prev = widths[max(level - 1, 0)]
            blocks = [self._resblock_init(keys, prev if b == 0 else width, width, temb_dim) for b in range(c.blocks_per_level)]
            down = _conv_init(next(keys), 3, width, width) if level < c.levels - 1 else None
            params["down"].append({"blocks": blocks, "downsample": down})

        mid = widths[-1]
        params["mid1"] = self._resblock_init(keys, mid, mid, temb_dim)
        params["mid_attn"] = {
            "qkv": _dense_init(next(keys), mid, 3 * mid),
            "proj": _dense_init(next(keys), mid, mid, scale=0.0),
        }
        params["mid2"] = self._resblock_init(keys, mid, mid, temb_dim)

        for level in reversed(range(c.levels)):
            width = widths[level]
            above = widths[min(level + 1, c.levels - 1)]
            blocks = [
                self._resblock_init(keys, (above + width) if b == 0 else width, width, temb_dim)
                for b in range(c.blocks_per_level)
            ]
            params["up"].append({"blocks": blocks})

        return params

    def _resblock(self, p, x, temb, dtype, cl):
        c = self.config
        temb_b = _dense(p["temb"], temb, dtype)
        h = _conv(p["conv1"], _groupnorm(x, c.groups, cl, silu=True), dtype, cl=cl)
        h = h + (temb_b[:, None, None, :] if cl else temb_b[:, :, None, None])
        h = _conv(p["conv2"], _groupnorm(h, c.groups, cl, silu=True), dtype, cl=cl)
        skip = _conv(p["skip"], x, dtype, cl=cl) if p["skip"] is not None else x
        return skip + h

    def _attention(self, p, x, dtype, cl):
        # channels-last makes the token view a pure reshape (no transpose)
        if cl:
            B, H, W, C = x.shape
            tokens = _groupnorm(x, self.config.groups, cl).reshape(B, H * W, C)
        else:
            B, C, H, W = x.shape
            tokens = _groupnorm(x, self.config.groups).reshape(B, C, H * W).transpose(0, 2, 1)
        qkv = _dense(p["qkv"], tokens, dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(C), axis=-1
        ).astype(dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v, preferred_element_type=jnp.float32).astype(dtype)
        out = _dense(p["proj"], out, dtype)
        return x + (out.reshape(B, H, W, C) if cl else out.transpose(0, 2, 1).reshape(B, C, H, W))

    def apply(self, params: dict, x: jax.Array, t: jax.Array) -> jax.Array:
        c = self.config
        dtype = c.compute_dtype
        in_dtype = x.dtype
        B = x.shape[0]

        if jnp.ndim(t) == 0:
            t = jnp.broadcast_to(t, (B,))

        temb = _timestep_embedding(t, 256)
        temb = _dense(params["t_mlp2"], jax.nn.silu(_dense(params["t_mlp1"], temb.astype(dtype), dtype)), dtype)
        temb = jax.nn.silu(temb)

        cl = c.resolved_layout == "nhwc"
        h = x.astype(dtype).transpose(0, 2, 3, 1) if cl else x.astype(dtype)
        h = _conv(params["in_conv"], h, dtype, cl=cl)
        skips = []
        for level in params["down"]:
            for block in level["blocks"]:
                h = self._resblock(block, h, temb, dtype, cl)
            skips.append(h)
            if level["downsample"] is not None:
                h = _conv(level["downsample"], h, dtype, stride=2, cl=cl)

        h = self._resblock(params["mid1"], h, temb, dtype, cl)
        h = self._attention(params["mid_attn"], h, dtype, cl)
        h = self._resblock(params["mid2"], h, temb, dtype, cl)

        spatial = (lambda a: a.shape[1:3]) if cl else (lambda a: a.shape[-2:])
        for level in params["up"]:
            skip = skips.pop()
            if spatial(h) != spatial(skip):
                if cl:
                    h = jax.image.resize(h, (h.shape[0], *skip.shape[1:3], h.shape[-1]), method="nearest")
                else:
                    h = jax.image.resize(h, (*h.shape[:2], *skip.shape[-2:]), method="nearest")
            h = jnp.concatenate([h, skip], axis=-1 if cl else 1)  # skip joins the first block only
            for block in level["blocks"]:
                h = self._resblock(block, h, temb, dtype, cl)

        h = _groupnorm(h, c.groups, cl, silu=True)
        h = _conv(params["out_conv"], h, dtype, cl=cl)
        return (h.transpose(0, 3, 1, 2) if cl else h).astype(in_dtype)

    def as_sampleable(self, params: dict):
        def model_fn(x, t, s, a):
            return self.apply(params, x, t)

        return model_fn
