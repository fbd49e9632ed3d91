"""A compact SD-style conv UNet in pure JAX.

Second reference model family (conv + attention hybrid, NCHW latents) so the
sampling stack is exercised against both DiT-style and UNet-style predictors.
Conv layout notes for TPU: NCHW in, channels padded by construction to
MXU-friendly sizes, bf16 compute with f32 accumulation via
``preferred_element_type``, GroupNorm in f32.
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


def _conv_init(key, k, c_in, c_out, scale=None):
    scale = scale if scale is not None else 1 / math.sqrt(k * k * c_in)
    return {
        "w": jax.random.normal(key, (c_out, c_in, k, k), jnp.float32) * scale,
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def _conv(params, x, dtype, stride=1):
    out = jax.lax.conv_general_dilated(
        x.astype(dtype),
        params["w"].astype(dtype),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    return (out + params["b"][None, :, None, None]).astype(dtype)


def _dense_init(key, d_in, d_out, scale=None):
    scale = scale if scale is not None else 1 / math.sqrt(d_in)
    return {
        "w": jax.random.normal(key, (d_in, d_out), jnp.float32) * scale,
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def _dense(params, x, dtype):
    return (jnp.dot(x, params["w"].astype(dtype), preferred_element_type=jnp.float32) + params["b"]).astype(dtype)


def _groupnorm(x, groups):
    B, C, H, W = x.shape
    x32 = x.astype(jnp.float32).reshape(B, groups, C // groups, H, W)
    mean = x32.mean((2, 3, 4), keepdims=True)
    var = x32.var((2, 3, 4), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + 1e-6)).reshape(B, C, H, W).astype(x.dtype)


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

    def _resblock(self, p, x, temb, dtype):
        c = self.config
        h = _conv(p["conv1"], jax.nn.silu(_groupnorm(x, c.groups)), dtype)
        h = h + _dense(p["temb"], temb, dtype)[:, :, None, None]
        h = _conv(p["conv2"], jax.nn.silu(_groupnorm(h, c.groups)), dtype)
        skip = _conv(p["skip"], x, dtype) if p["skip"] is not None else x
        return skip + h

    def _attention(self, p, x, dtype):
        B, C, H, W = x.shape
        tokens = _groupnorm(x, self.config.groups).reshape(B, C, H * W).transpose(0, 2, 1)
        qkv = _dense(p["qkv"], tokens, dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(C), axis=-1
        ).astype(dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v, preferred_element_type=jnp.float32).astype(dtype)
        out = _dense(p["proj"], out, dtype)
        return x + out.transpose(0, 2, 1).reshape(B, C, H, W)

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

        h = _conv(params["in_conv"], x.astype(dtype), dtype)
        skips = []
        for level in params["down"]:
            for block in level["blocks"]:
                h = self._resblock(block, h, temb, dtype)
            skips.append(h)
            if level["downsample"] is not None:
                h = _conv(level["downsample"], h, dtype, stride=2)

        h = self._resblock(params["mid1"], h, temb, dtype)
        h = self._attention(params["mid_attn"], h, dtype)
        h = self._resblock(params["mid2"], h, temb, dtype)

        for level in params["up"]:
            skip = skips.pop()
            if h.shape[-2:] != skip.shape[-2:]:
                h = jax.image.resize(h, (*h.shape[:2], *skip.shape[-2:]), method="nearest")
            h = jnp.concatenate([h, skip], axis=1)  # skip joins the first block only
            for block in level["blocks"]:
                h = self._resblock(block, h, temb, dtype)

        h = jax.nn.silu(_groupnorm(h, c.groups))
        return _conv(params["out_conv"], h, dtype).astype(in_dtype)

    def as_sampleable(self, params: dict):
        def model_fn(x, t, s, a):
            return self.apply(params, x, t)

        return model_fn
