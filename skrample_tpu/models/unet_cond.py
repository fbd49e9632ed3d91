"""Text-conditioned SD-class UNet (UNet2DConditionModel) in pure JAX — the
SD1.5 / SDXL checkpoint family.

The reference's wrapper drops into SD1.5/SDXL pipelines (its own
integration tests build random-weight SDXL pipes,
`/root/reference/tests/diffusers_pipes.py:80-130`); this module ships the
denoiser those pipelines are built around, per the published architecture:

* resnet blocks with timestep-embedding injection
  (``h += time_emb_proj(silu(emb))``) and GroupNorm(affine, eps 1e-5),
* ``Transformer2DModel`` attention stages per level: GroupNorm + token
  projection, then K basic blocks of self-attention, cross-attention over
  the text context, and a GEGLU feed-forward (exact gelu gate) — K is the
  per-level ``transformer_layers`` (SDXL: (0, 2, 10); SD1.5: (1, 1, 1, 0)),
* skip-connection concatenation down -> up, stride-2 conv downsample with
  torch ``padding=1`` (a DIFFERENT sampling grid than SAME — see
  ``unet._conv``), nearest-2x upsample + conv,
* SDXL's added conditioning: pooled text + six sinusoidally-embedded
  ``time_ids``, concatenated through a second MLP into the time embedding.

TPU notes follow :mod:`.unet`: interior activations run channels-last by
default (``layout="auto"``) so convs hit XLA's implicit-GEMM path with the
channel axis on the 128-wide lanes; weights stay OIHW (checkpoint
portable); attention reshapes to ``(B, H*W, C)`` tokens either way.
bf16 compute, f32 statistics/accumulation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from .unet import _conv, _conv_init, _dense, _dense_init


@dataclass(frozen=True)
class CondUNetConfig:
    channels: int = 4
    widths: tuple[int, ...] = (320, 640, 1280)
    "Per-level channel widths (SDXL's (320, 640, 1280); SD1.5 adds a 4th 1280)."
    layers_per_block: int = 2
    transformer_layers: tuple[int, ...] = (0, 2, 10)
    """Basic transformer blocks per attention stage, per level; 0 = a plain
    (attention-free) level."""
    mid_transformer_layers: int | None = None
    """Mid-block depth; None = the last level's count.  SD1.5 needs it
    explicit: its LAST down level is plain but the mid block still carries
    attention (the published architecture takes the raw per-block count)."""
    heads: tuple[int, ...] = (5, 10, 20)
    "Attention heads per level (head_dim = width / heads; 64 for SDXL)."
    context_dim: int = 2048
    pooled_dim: int = 1280
    """SDXL's added conditioning: pooled-text width (with ``time_ids``
    micro-conditioning).  0 = SD1.5 (no added embedding)."""
    time_ids: int = 6
    add_time_embed_dim: int = 256
    groups: int = 32
    compute_dtype: Any = jnp.bfloat16
    layout: str = "auto"
    "As :class:`UNetConfig.layout`; auto picks NHWC when widths[0] >= 128."

    @property
    def resolved_layout(self) -> str:
        if self.layout != "auto":
            return self.layout
        return "nhwc" if self.widths[0] >= 128 else "nchw"

    @property
    def levels(self) -> int:
        return len(self.widths)

    @property
    def resolved_mid_layers(self) -> int:
        return self.transformer_layers[-1] if self.mid_transformer_layers is None else self.mid_transformer_layers

    @property
    def time_dim(self) -> int:
        return 4 * self.widths[0]


def _affine_init(width: int) -> dict:
    return {"g": jnp.ones((width,), jnp.float32), "b": jnp.zeros((width,), jnp.float32)}


def _ln_affine(x: jax.Array, p: dict) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (((x32 - mean) * jax.lax.rsqrt(var + 1e-5)) * p["g"] + p["b"]).astype(x.dtype)


def _timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    "[cos | sin], denominator dim/2 — the diffusers flip_sin_to_cos layout."
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class CondUNet:
    """Functional model: ``init`` -> params pytree, then
    ``apply(params, x, t, context[, pooled, time_ids])``."""

    def __init__(self, config: CondUNetConfig = CondUNetConfig()):
        self.config = config
        c = config
        if not (len(c.transformer_layers) == len(c.heads) == c.levels):
            raise ValueError("widths / transformer_layers / heads must have equal lengths")
        for w, h, k in zip(c.widths, c.heads, c.transformer_layers):
            if k and w % h:
                raise ValueError(f"width {w} not divisible by heads {h}")

    # -- init -----------------------------------------------------------------

    def _resnet_init(self, keys, c_in: int, c_out: int) -> dict:
        return {
            "norm1": _affine_init(c_in),
            "conv1": _conv_init(next(keys), 3, c_in, c_out),
            "temb": _dense_init(next(keys), self.config.time_dim, c_out),
            "norm2": _affine_init(c_out),
            "conv2": _conv_init(next(keys), 3, c_out, c_out, scale=0.0),
            "skip": _conv_init(next(keys), 1, c_in, c_out) if c_in != c_out else None,
        }

    def _basic_init(self, keys, d: int) -> dict:
        c = self.config
        return {
            "ln1": _affine_init(d),
            "attn1_qkv": _dense_init(next(keys), d, 3 * d),
            "attn1_out": _dense_init(next(keys), d, d),
            "ln2": _affine_init(d),
            "attn2_q": _dense_init(next(keys), d, d),
            "attn2_kv": _dense_init(next(keys), c.context_dim, 2 * d),
            "attn2_out": _dense_init(next(keys), d, d),
            "ln3": _affine_init(d),
            "ff_in": _dense_init(next(keys), d, 8 * d),
            "ff_out": _dense_init(next(keys), 4 * d, d),
        }

    def _transformer_init(self, keys, d: int, depth: int) -> dict:
        return {
            "norm": _affine_init(d),
            "proj_in": _dense_init(next(keys), d, d),
            "blocks": [self._basic_init(keys, d) for _ in range(depth)],
            "proj_out": _dense_init(next(keys), d, d, scale=0.0),
        }

    def init(self, key: jax.Array) -> dict:
        c = self.config
        keys = iter(jax.random.split(key, 4096))
        widths = c.widths

        params: dict = {
            "conv_in": _conv_init(next(keys), 3, c.channels, widths[0]),
            "t_mlp1": _dense_init(next(keys), widths[0], c.time_dim),
            "t_mlp2": _dense_init(next(keys), c.time_dim, c.time_dim),
            "norm_out": _affine_init(widths[0]),
            "conv_out": _conv_init(next(keys), 3, widths[0], c.channels, scale=0.0),
        }
        if c.pooled_dim:
            add_in = c.pooled_dim + c.time_ids * c.add_time_embed_dim
            params["add_mlp1"] = _dense_init(next(keys), add_in, c.time_dim)
            params["add_mlp2"] = _dense_init(next(keys), c.time_dim, c.time_dim)

        params["down"] = []
        for i, w in enumerate(widths):
            prev = widths[max(i - 1, 0)]
            level = {
                "resnets": [
                    self._resnet_init(keys, prev if j == 0 else w, w) for j in range(c.layers_per_block)
                ],
                "attns": [
                    self._transformer_init(keys, w, c.transformer_layers[i])
                    if c.transformer_layers[i]
                    else None
                    for _ in range(c.layers_per_block)
                ],
                "downsample": _conv_init(next(keys), 3, w, w) if i < c.levels - 1 else None,
            }
            params["down"].append(level)

        mid = widths[-1]
        params["mid"] = {
            "res1": self._resnet_init(keys, mid, mid),
            "attn": self._transformer_init(keys, mid, c.resolved_mid_layers)
            if c.resolved_mid_layers
            else None,
            "res2": self._resnet_init(keys, mid, mid),
        }

        # skip-channel bookkeeping mirrors the down path exactly
        skip_widths = [widths[0]]
        for i, w in enumerate(widths):
            skip_widths += [w] * c.layers_per_block
            if i < c.levels - 1:
                skip_widths.append(w)

        params["up"] = []
        for i in reversed(range(c.levels)):
            w = widths[i]
            prev = widths[min(i + 1, c.levels - 1)]
            resnets, attns = [], []
            for j in range(c.layers_per_block + 1):
                c_in = (prev if j == 0 else w) + skip_widths.pop()
                resnets.append(self._resnet_init(keys, c_in, w))
                attns.append(
                    self._transformer_init(keys, w, c.transformer_layers[i])
                    if c.transformer_layers[i]
                    else None
                )
            params["up"].append(
                {
                    "resnets": resnets,
                    "attns": attns,
                    "upsample": _conv_init(next(keys), 3, w, w) if i > 0 else None,
                }
            )
        return params

    def param_spec(self) -> dict:
        """PartitionSpecs over mesh axis 'tp': the transformer stages shard
        megatron-style (qkv/ff-in column-parallel, out/ff-out row-parallel;
        cross-attention k/v column-parallel so heads split); convs,
        norms, and time embeddings replicate — they are latency noise next
        to the attention/FF matmuls at SDXL widths."""
        from jax.sharding import PartitionSpec as P

        col = {"w": P(None, "tp"), "b": P("tp")}
        row = {"w": P("tp", None), "b": P()}
        rep_c = {"w": P(), "b": P()}
        aff = {"g": P(), "b": P()}

        def resnet_spec(has_skip: bool) -> dict:
            return {
                "norm1": dict(aff),
                "conv1": dict(rep_c),
                "temb": dict(rep_c),
                "norm2": dict(aff),
                "conv2": dict(rep_c),
                "skip": dict(rep_c) if has_skip else None,
            }

        def basic_spec() -> dict:
            return {
                "ln1": dict(aff),
                "attn1_qkv": dict(col),
                "attn1_out": dict(row),
                "ln2": dict(aff),
                "attn2_q": dict(col),
                "attn2_kv": dict(col),
                "attn2_out": dict(row),
                "ln3": dict(aff),
                "ff_in": dict(col),
                "ff_out": dict(row),
            }

        def transformer_spec(depth: int) -> dict:
            return {
                "norm": dict(aff),
                "proj_in": dict(rep_c),
                "blocks": [basic_spec() for _ in range(depth)],
                "proj_out": dict(rep_c),
            }

        c = self.config
        spec: dict = {
            "conv_in": dict(rep_c),
            "t_mlp1": dict(rep_c),
            "t_mlp2": dict(rep_c),
            "norm_out": dict(aff),
            "conv_out": dict(rep_c),
        }
        if c.pooled_dim:
            spec["add_mlp1"] = dict(rep_c)
            spec["add_mlp2"] = dict(rep_c)
        spec["down"] = [
            {
                "resnets": [
                    resnet_spec(j == 0 and c.widths[max(i - 1, 0)] != c.widths[i])
                    for j in range(c.layers_per_block)
                ],
                "attns": [
                    transformer_spec(c.transformer_layers[i]) if c.transformer_layers[i] else None
                    for _ in range(c.layers_per_block)
                ],
                "downsample": dict(rep_c) if i < c.levels - 1 else None,
            }
            for i in range(c.levels)
        ]
        spec["mid"] = {
            "res1": resnet_spec(False),
            "attn": transformer_spec(c.resolved_mid_layers) if c.resolved_mid_layers else None,
            "res2": resnet_spec(False),
        }
        spec["up"] = [
            {
                # up-path resnets always consume a skip concat: c_in > width
                "resnets": [resnet_spec(True) for _ in range(c.layers_per_block + 1)],
                "attns": [
                    transformer_spec(c.transformer_layers[i]) if c.transformer_layers[i] else None
                    for _ in range(c.layers_per_block + 1)
                ],
                "upsample": dict(rep_c) if i > 0 else None,
            }
            for i in reversed(range(c.levels))
        ]
        return spec

    # -- building blocks ----------------------------------------------------

    def _gn(self, x: jax.Array, p: dict, cl: bool, silu: bool = False) -> jax.Array:
        "Affine GroupNorm (eps 1e-5, matching the published UNet) + optional SiLU."
        c = self.config
        B = x.shape[0]
        if cl:
            # one fused Pallas pass: statistics + normalize + f32 affine
            # (+SiLU) — vs 3-4 HBM round trips for the eager composition,
            # and exactly ONE rounding to the activation dtype
            from ..ops.groupnorm import groupnorm_cl

            return groupnorm_cl(x, c.groups, fuse_silu=silu, eps=1e-5, scale=p["g"], bias=p["b"])
        else:
            C = x.shape[1]
            x32 = x.astype(jnp.float32).reshape(B, c.groups, C // c.groups, *x.shape[2:])
            mean = x32.mean((2, 3, 4), keepdims=True)
            var = x32.var((2, 3, 4), keepdims=True)
            y = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(x.shape)
            y = y * p["g"][None, :, None, None] + p["b"][None, :, None, None]
        y = y.astype(x.dtype)
        return jax.nn.silu(y) if silu else y

    def _resnet(self, p: dict, x: jax.Array, cond: jax.Array, dtype: Any, cl: bool) -> jax.Array:
        h = _conv(p["conv1"], self._gn(x, p["norm1"], cl, silu=True), dtype, cl=cl)
        emb = _dense(p["temb"], cond, dtype)
        h = h + (emb[:, None, None, :] if cl else emb[:, :, None, None])
        h = _conv(p["conv2"], self._gn(h, p["norm2"], cl, silu=True), dtype, cl=cl)
        skip = _conv(p["skip"], x, dtype, cl=cl) if p["skip"] is not None else x
        return skip + h

    def _mha(self, q: jax.Array, k: jax.Array, v: jax.Array, heads: int) -> jax.Array:
        B, N, D = q.shape
        d = D // heads
        kv_len = k.shape[1]

        # big self-attention (the 64x64-grid stages at SDXL scale) rides a
        # Pallas kernel.  Preferred: the head-PAIR kernel — two d=64 heads
        # share each 128-lane tile, reading the packed projections AS-IS
        # (the padded path below materializes 2x-size zero-padded q/k/v in
        # HBM around the custom call plus a padded output round-trip; MXU
        # cycles are identical either way — the 64-deep contraction is the
        # documented structural ceiling).
        if kv_len == N and d == 64 and heads % 2 == 0 and N >= 1024:
            from ..ops.flash_attention import flash_attention_pairs, pairs_kernel_fits

            if pairs_kernel_fits(N, heads, d):
                return flash_attention_pairs(q, k, v, heads)

        # fallback: zero-pad each head to the 128-lane tile — padded q/k
        # lanes add zero logits and padded v lanes slice away, so the
        # result is EXACT; q pre-scales by sqrt(d_pad/d) to cancel the
        # kernel's 1/sqrt(d_pad).  Keeps the (N, N) score matrix out of
        # HBM (640 MB per stage at 4096 tokens) for 2x padded-lane FLOPs.
        if kv_len == N and N % 128 == 0 and d <= 128 and 128 % d == 0 and N >= 1024:
            from ..ops.flash_attention import flash_attention_packed

            def pad_heads(x, scale=1.0):
                h = x.reshape(B, N, heads, d)
                if scale != 1.0:
                    h = h * jnp.asarray(scale, h.dtype)
                if d < 128:
                    h = jnp.pad(h, ((0, 0), (0, 0), (0, 0), (0, 128 - d)))
                return h.reshape(B, N, heads * 128)

            out = flash_attention_packed(
                pad_heads(q, math.sqrt(128 / d)), pad_heads(k), pad_heads(v), heads
            )
            return out.reshape(B, N, heads, 128)[..., :d].reshape(B, N, D)

        def split(x):
            return x.reshape(B, -1, heads, d).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        a = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(d),
            axis=-1,
        ).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", a, v, preferred_element_type=jnp.float32).astype(v.dtype)
        return out.transpose(0, 2, 1, 3).reshape(B, N, D)

    def _transformer(
        self, p: dict, x: jax.Array, context: jax.Array, heads: int, dtype: Any, cl: bool
    ) -> jax.Array:
        "Transformer2DModel: norm -> tokens -> K basic blocks -> back + residual."
        residual = x
        if cl:
            B, H, W, C = x.shape
            tokens = self._gn(x, p["norm"], cl).reshape(B, H * W, C)
        else:
            B, C, H, W = x.shape
            tokens = self._gn(x, p["norm"], cl).reshape(B, C, H * W).transpose(0, 2, 1)
        h = _dense(p["proj_in"], tokens.astype(dtype), dtype)
        for blk in p["blocks"]:
            qkv = _dense(blk["attn1_qkv"], _ln_affine(h, blk["ln1"]), dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            h = h + _dense(blk["attn1_out"], self._mha(q, k, v, heads), dtype)
            q = _dense(blk["attn2_q"], _ln_affine(h, blk["ln2"]), dtype)
            kv = _dense(blk["attn2_kv"], context, dtype)
            k, v = jnp.split(kv, 2, axis=-1)
            h = h + _dense(blk["attn2_out"], self._mha(q, k, v, heads), dtype)
            ff = _dense(blk["ff_in"], _ln_affine(h, blk["ln3"]), dtype)
            gate, act = jnp.split(ff, 2, axis=-1)
            # GEGLU uses the exact (erf) gelu, unlike the DiT family's tanh
            h = h + _dense(blk["ff_out"], gate * jax.nn.gelu(act, approximate=False), dtype)
        h = _dense(p["proj_out"], h, dtype)
        out = h.reshape(B, H, W, C) if cl else h.transpose(0, 2, 1).reshape(B, C, H, W)
        return residual + out

    # -- forward ------------------------------------------------------------

    def _cond_vector(
        self,
        params: dict,
        t: jax.Array,
        pooled: jax.Array | None,
        time_ids: jax.Array | None,
        batch: int,
        dtype: Any,
    ) -> jax.Array:
        "silu(time embedding [+ SDXL text_time added conditioning]) — shared with the ControlNet."
        c = self.config
        if (pooled is not None) != bool(c.pooled_dim):
            raise ValueError("pooled= goes with CondUNetConfig(pooled_dim > 0), and is required there")
        if c.pooled_dim and time_ids is None:
            # SDXL was TRAINED on this micro-conditioning; silently zeroing
            # it would sample a degenerate 0x0 crop without any error
            raise ValueError(
                "SDXL conditioning needs time_ids= (orig_h, orig_w, crop_top, crop_left, "
                "target_h, target_w) — see SDXLStack.time_ids"
            )
        temb = _dense(
            params["t_mlp2"],
            jax.nn.silu(_dense(params["t_mlp1"], _timestep_embedding(t, c.widths[0]).astype(dtype), dtype)),
            dtype,
        )
        if c.pooled_dim:
            ids_emb = _timestep_embedding(time_ids.reshape(-1), c.add_time_embed_dim)
            add = jnp.concatenate([pooled.astype(jnp.float32), ids_emb.reshape(batch, -1)], axis=-1)
            temb = temb + _dense(
                params["add_mlp2"], jax.nn.silu(_dense(params["add_mlp1"], add.astype(dtype), dtype)), dtype
            )
        return jax.nn.silu(temb)  # every resnet consumes time_emb_proj(silu(emb))

    def _encode(
        self, params: dict, h: jax.Array, cond: jax.Array, context: jax.Array, dtype: Any, cl: bool
    ) -> tuple[jax.Array, list[jax.Array]]:
        "conv_in -> down path -> mid; returns (mid output, skip stack) — shared with the ControlNet."
        c = self.config
        h = _conv(params["conv_in"], h, dtype, cl=cl)
        skips = [h]
        for i, level in enumerate(params["down"]):
            for res, attn in zip(level["resnets"], level["attns"]):
                h = self._resnet(res, h, cond, dtype, cl)
                if attn is not None:
                    h = self._transformer(attn, h, context, c.heads[i], dtype, cl)
                skips.append(h)
            if level["downsample"] is not None:
                h = _conv(level["downsample"], h, dtype, stride=2, cl=cl, pad=1)
                skips.append(h)

        mid = params["mid"]
        h = self._resnet(mid["res1"], h, cond, dtype, cl)
        if mid["attn"] is not None:
            h = self._transformer(mid["attn"], h, context, c.heads[-1], dtype, cl)
        h = self._resnet(mid["res2"], h, cond, dtype, cl)
        return h, skips

    def apply(
        self,
        params: dict,
        x: jax.Array,
        t: jax.Array,
        context: jax.Array,
        pooled: jax.Array | None = None,
        time_ids: jax.Array | None = None,
        control: tuple[list[jax.Array], jax.Array] | None = None,
    ) -> jax.Array:
        """(B, C, H, W), (B,) timestep, (B, L, context_dim) text features
        [, (B, pooled_dim), (B, time_ids)] -> same-shape prediction.

        ``control``: a ``(down_residuals, mid_residual)`` pair from
        :meth:`ControlNet.apply` (NCHW) — the published injection points:
        each down residual adds to the matching skip entry, the mid
        residual adds after the mid block."""
        c = self.config
        dtype = c.compute_dtype
        cl = c.resolved_layout == "nhwc"
        B = x.shape[0]
        in_dtype = x.dtype
        if jnp.ndim(t) == 0:
            t = jnp.broadcast_to(t, (B,))
        cond = self._cond_vector(params, t, pooled, time_ids, B, dtype)
        context = context.astype(dtype)

        h = x.astype(dtype).transpose(0, 2, 3, 1) if cl else x.astype(dtype)
        h, skips = self._encode(params, h, cond, context, dtype, cl)

        if control is not None:
            down_res, mid_res = control
            if len(down_res) != len(skips):
                raise ValueError(f"control carries {len(down_res)} down residuals, the UNet has {len(skips)} skips")
            to_layout = (lambda r: r.transpose(0, 2, 3, 1)) if cl else (lambda r: r)
            skips = [s + to_layout(r).astype(s.dtype) for s, r in zip(skips, down_res)]
            h = h + to_layout(mid_res).astype(h.dtype)

        for idx, level in enumerate(params["up"]):
            i = c.levels - 1 - idx
            for res, attn in zip(level["resnets"], level["attns"]):
                h = jnp.concatenate([h, skips.pop()], axis=-1 if cl else 1)
                h = self._resnet(res, h, cond, dtype, cl)
                if attn is not None:
                    h = self._transformer(attn, h, context, c.heads[i], dtype, cl)
            if level["upsample"] is not None:
                if cl:
                    Bh, H, W, C = h.shape
                    h = jax.image.resize(h, (Bh, 2 * H, 2 * W, C), method="nearest")
                else:
                    Bh, C, H, W = h.shape
                    h = jax.image.resize(h, (Bh, C, 2 * H, 2 * W), method="nearest")
                h = _conv(level["upsample"], h, dtype, cl=cl)

        h = self._gn(h, params["norm_out"], cl, silu=True)
        h = _conv(params["conv_out"], h, dtype, cl=cl)
        return (h.transpose(0, 3, 1, 2) if cl else h).astype(in_dtype)

    def quantize_params(self, params: dict, scope: str = "deep") -> dict:
        """Int8 serving tree with a per-family default that never regresses.

        ``scope`` selects which Transformer2D stages go W8A8 (convs are
        untouched — 4-D weights — and the conditioning pathway stays f32:
        its outputs feed every resnet's time injection):

        * ``"deep"`` (default): only stages with >= 4 basic blocks — at the
          SDXL base shape that is the 10-deep width-1280 mid/down/up stages,
          a long conv-free run of blocks holding most of the matmul FLOPs.
          The conv-interleaved width-320/640 stages keep their bf16 fusion.
          Measured (v5e, `scripts/bench_sdxl.py`): CFG serving — the
          realistic SDXL mode — **wins vs bf16** (124.2 vs 129.3 ms); the
          uncond forward trails by ~6% (65.1 vs 61.4 ms).
        * ``"all"``: every dense above the quantizer's size floor — the
          round-3 behavior, measured SLOWER than bf16 end-to-end at SDXL
          (77.4 vs 61.4 ms/fwd this round; 78.2 vs 60.3 in round 3) even
          though int8 wins 5/6 stage matmul shapes in isolation
          (`scripts/micro_sdxl.py --int8`): the loss is XLA giving up
          fusion/layout around ~450 int8 dot boundaries in the
          conv-interleaved graph, not the ~2 ms quantize epilogue.  The
          conv-free families (DiT/MMDiT/Flux) keep their int8 wins at
          ``"all"``-equivalent trees.
        * ``"none"``: return the tree unchanged (bf16 opt-out — the pick
          for uncond-only SDXL serving).

        A/B rows live in `scripts/bench_sdxl.py`."""
        from ..ops.quant import quantize_params

        c = self.config
        exclude = frozenset({"temb", "t_mlp1", "t_mlp2", "add_mlp1", "add_mlp2"})
        if scope == "none":
            return params
        if scope == "all":
            return quantize_params(params, exclude=exclude)
        if scope != "deep":
            raise ValueError(f"scope must be 'deep', 'all', or 'none', got {scope!r}")

        threshold = 4
        deep = {i for i, tl in enumerate(c.transformer_layers) if tl >= threshold}

        def maybe(level: int, attn: dict | None) -> dict | None:
            if attn is None or level not in deep:
                return attn
            return quantize_params(attn, exclude=exclude)

        out = dict(params)
        out["down"] = [
            {**lvl, "attns": [maybe(i, a) for a in lvl["attns"]]}
            for i, lvl in enumerate(params["down"])
        ]
        if params["mid"].get("attn") is not None and c.resolved_mid_layers >= threshold:
            out["mid"] = {**params["mid"], "attn": quantize_params(params["mid"]["attn"], exclude=exclude)}
        out["up"] = [
            {**lvl, "attns": [maybe(len(c.widths) - 1 - j, a) for a in lvl["attns"]]}
            for j, lvl in enumerate(params["up"])
        ]
        return out

    def as_sampleable(
        self,
        params: dict,
        context: jax.Array,
        pooled: jax.Array | None = None,
        time_ids: jax.Array | None = None,
        guidance_scale: float = 1.0,
        uncond_context: jax.Array | None = None,
        uncond_pooled: jax.Array | None = None,
    ):
        """Sampling closure.  ``guidance_scale != 1`` runs classifier-free
        guidance against ``uncond_context`` (the encoded empty prompt),
        both branches in one doubled-batch forward."""
        from .conditioning import doubled_t, guided_mix, per_item

        if guidance_scale == 1.0:

            def model_fn(x, t, s, a):
                B = x.shape[0]  # single-prompt conditioning serves any batch
                pool = None if pooled is None else per_item(pooled, B, 1)
                tid = None if time_ids is None else per_item(time_ids, B, 1)
                return self.apply(params, x, t, per_item(context, B, 2), pool, tid)

            return model_fn

        if uncond_context is None or (pooled is not None and uncond_pooled is None):
            raise ValueError("guided sampling needs uncond_context= (and uncond_pooled= with SDXL)")

        def guided_fn(x, t, s, a):
            B = x.shape[0]
            ctx = jnp.concatenate([per_item(context, B, 2), per_item(uncond_context, B, 2)])
            pool = ids = None
            if pooled is not None:
                pool = jnp.concatenate([per_item(pooled, B, 1), per_item(uncond_pooled, B, 1)])
                ids = jnp.concatenate([per_item(time_ids, B, 1)] * 2)
            both = self.apply(params, jnp.concatenate([x, x]), doubled_t(t, B), ctx, pool, ids)
            return guided_mix(both[:B], both[B:], guidance_scale)

        return guided_fn
