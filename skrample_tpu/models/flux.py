"""Flux-class rectified-flow transformer in pure JAX — the reference's own
headline pipeline family.

The reference's flagship example drops its wrapper into a loaded Flux
pipeline (`/root/reference/examples/diffusers/wrapper.py`); this module
ships the transformer itself so Flux checkpoints (dev / schnell) run on
TPU with no torch in the loop.  The published architecture
(black-forest-labs FLUX.1; diffusers ``FluxTransformer2DModel``):

* **double-stream blocks** (19 at full scale): image and text streams with
  separate weights, adaLN-zero modulation, per-head RMS qk-norm, ONE joint
  attention per block over the ``[text, image]`` sequence (text first —
  the opposite order from SD3), 4x GELU MLPs per stream;
* **single-stream blocks** (38): the concatenated sequence runs blocks
  with a 3-parameter modulation where attention and MLP branch from the
  SAME normalized input and one fused output projection combines
  ``[attn | gelu(mlp)]`` back to width;
* **RoPE** over 3 position axes (a zero axis for text, (y, x) for image
  patches), per-axis rotary dims summing to head_dim, theta 10000,
  consecutive-pair rotation;
* **conditioning vector** = timestep embedding + (dev only) guidance
  embedding + pooled CLIP projection, each through linear-silu-linear.

TPU notes: head_dim 128 puts the joint attention straight onto the fused
Pallas flash kernel; qk-norm and RoPE rewrite the q/k thirds of the fused
qkv tensor in place (one elementwise pass) so every attention scheme sees
prepared heads.  The 2x2 latent packing the diffusers pipeline does on the
host is our ``patchify`` (identical (C, p, q) feature order), so ``apply``
takes plain ``(B, 16, H, W)`` latents.

Timestep convention: ``t`` is the schedule timestep (sigma * 1000 for the
flow schedules, matching the reference pipelines); guidance is embedded as
``sin(guidance * 1000)`` per the published implementation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .dit import _adaln, _dense, _dense_init, _remat_wrap, _timestep_embedding


@dataclass(frozen=True)
class FluxConfig:
    patch: int = 2
    "The pipeline-level 2x2 latent packing, folded into the model."
    channels: int = 16
    "Unpacked latent channels; the packed width is ``channels * patch**2``."
    dim: int = 512
    depth: int = 2
    "Double-stream block count (19 at full scale)."
    single_depth: int = 4
    "Single-stream block count (38 at full scale)."
    heads: int = 4
    mlp_ratio: int = 4
    context_dim: int = 512
    "T5 feature width (4096 at full scale)."
    pooled_dim: int = 256
    "CLIP pooled width (768 at full scale)."
    guidance: bool = True
    "FLUX.1-dev's guidance-distilled embedding; False for schnell."
    rope_axes: tuple[int, ...] = (16, 56, 56)
    "Per-axis rotary dims (text-zero, y, x); must sum to head_dim."
    theta: int = 10000
    compute_dtype: Any = jnp.bfloat16
    attention: str = "flash"
    '``"flash"`` (fused Pallas when head_dim % 128 == 0) or ``"full"``.'
    remat: bool | str = False
    """``True`` reruns whole blocks in the backward (minimum memory);
    ``"dots"`` saves matmul outputs and recomputes only the elementwise
    chain (``dots_with_no_batch_dims_saveable``) — ~2x the activation
    memory of full remat but skips re-doing the MXU work, the right trade
    whenever the saved dots still fit HBM (they do at reduced depth)."""

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    @property
    def packed_width(self) -> int:
        return self.channels * self.patch * self.patch


def _two_layer_init(keys, d_in: int, dim: int) -> dict:
    return {"l1": _dense_init(next(keys), d_in, dim), "l2": _dense_init(next(keys), dim, dim)}


def _two_layer(p: dict, x: jax.Array, dtype: Any) -> jax.Array:
    return _dense(p["l2"], jax.nn.silu(_dense(p["l1"], x, dtype)), dtype)


class Flux:
    "Functional model: ``init`` -> params pytree, ``apply(params, x, t, context, pooled[, guidance])``."

    def __init__(self, config: FluxConfig = FluxConfig(), mesh: Any = None):
        self.config = config
        self.mesh = mesh
        if sum(config.rope_axes) != config.head_dim:
            raise ValueError(f"rope_axes {config.rope_axes} must sum to head_dim {config.head_dim}")
        if config.attention not in ("flash", "full"):
            raise ValueError(f"unknown attention kind {config.attention!r}")

    # -- init -----------------------------------------------------------------

    def _double_stream_init(self, keys) -> dict:
        c = self.config
        return {
            "ada": _dense_init(next(keys), c.dim, 6 * c.dim, scale=0.0),
            "qkv": _dense_init(next(keys), c.dim, 3 * c.dim),
            "q_norm": jnp.ones((c.head_dim,), jnp.float32),
            "k_norm": jnp.ones((c.head_dim,), jnp.float32),
            "proj": _dense_init(next(keys), c.dim, c.dim),
            "mlp_in": _dense_init(next(keys), c.dim, c.mlp_ratio * c.dim),
            "mlp_out": _dense_init(next(keys), c.mlp_ratio * c.dim, c.dim),
        }

    def init(self, key: jax.Array) -> dict:
        c = self.config
        keys = iter(jax.random.split(key, 16 + 16 * c.depth + 8 * c.single_depth))
        params: dict = {
            "x_in": _dense_init(next(keys), c.packed_width, c.dim),
            "ctx_in": _dense_init(next(keys), c.context_dim, c.dim),
            "t_mlp": _two_layer_init(keys, 256, c.dim),
            "pool_mlp": _two_layer_init(keys, c.pooled_dim, c.dim),
            "final_mod": _dense_init(next(keys), c.dim, 2 * c.dim, scale=0.0),
            "final_out": _dense_init(next(keys), c.dim, c.packed_width, scale=0.0),
            "double": [],
            "single": [],
        }
        if c.guidance:
            params["guid_mlp"] = _two_layer_init(keys, 256, c.dim)
        for _ in range(c.depth):
            params["double"].append(
                {"img": self._double_stream_init(keys), "txt": self._double_stream_init(keys)}
            )
        for _ in range(c.single_depth):
            params["single"].append(
                {
                    "ada": _dense_init(next(keys), c.dim, 3 * c.dim, scale=0.0),
                    "qkv": _dense_init(next(keys), c.dim, 3 * c.dim),
                    "q_norm": jnp.ones((c.head_dim,), jnp.float32),
                    "k_norm": jnp.ones((c.head_dim,), jnp.float32),
                    "mlp_in": _dense_init(next(keys), c.dim, c.mlp_ratio * c.dim),
                    "out": _dense_init(next(keys), (1 + c.mlp_ratio) * c.dim, c.dim),
                }
            )
        return params

    def param_spec(self, quantized: bool = False) -> dict:
        "Megatron-style tensor-parallel PartitionSpecs over mesh axis 'tp'."
        col = {"w": P(None, "tp"), "b": P("tp")}
        row = {"w": P("tp", None), "b": P()}
        rep = {"w": P(), "b": P()}
        if quantized:
            col = {"w_q": {"q": P(None, "tp"), "s": P("tp")}, "b": P("tp")}
            row = {"w_q": {"q": P("tp", None), "s": P()}, "b": P()}
        two = {"l1": dict(rep), "l2": dict(rep)}
        stream = {
            "ada": dict(rep),
            "qkv": dict(col),
            "q_norm": P(),
            "k_norm": P(),
            "proj": dict(row),
            "mlp_in": dict(col),
            "mlp_out": dict(row),
        }
        single = {
            "ada": dict(rep),
            "qkv": dict(col),
            "q_norm": P(),
            "k_norm": P(),
            "mlp_in": dict(col),
            "out": dict(row),
        }
        c = self.config
        spec: dict = {
            "x_in": rep,
            "ctx_in": rep,
            "t_mlp": dict(two),
            "pool_mlp": dict(two),
            "final_mod": rep,
            "final_out": rep,
            "double": [{"img": dict(stream), "txt": dict(stream)} for _ in range(c.depth)],
            "single": [dict(single) for _ in range(c.single_depth)],
        }
        if c.guidance:
            spec["guid_mlp"] = dict(two)
        return spec

    # -- patch packing (the diffusers pipeline's host-side pack, on device) ----

    def patchify(self, x: jax.Array) -> jax.Array:
        c = self.config
        B, C, H, W = x.shape
        x = x.reshape(B, C, H // c.patch, c.patch, W // c.patch, c.patch)
        x = x.transpose(0, 2, 4, 1, 3, 5)
        return x.reshape(B, (H // c.patch) * (W // c.patch), C * c.patch * c.patch)

    def unpatchify(self, x: jax.Array, H: int, W: int) -> jax.Array:
        c = self.config
        B = x.shape[0]
        x = x.reshape(B, H // c.patch, W // c.patch, c.channels, c.patch, c.patch)
        x = x.transpose(0, 3, 1, 4, 2, 5)
        return x.reshape(B, c.channels, H, W)

    # -- RoPE -------------------------------------------------------------------

    def _rope_tables(self, txt_len: int, grid_h: int, grid_w: int) -> tuple[jax.Array, jax.Array]:
        """(cos, sin) of shape (txt_len + grid_h * grid_w, head_dim // 2) for
        the joint [text, image] sequence: text ids are all-zero, image ids
        are (0, y, x) over the patch grid, each axis with its own rotary
        dims — the published 3-axis scheme."""
        c = self.config
        ys, xs = jnp.meshgrid(
            jnp.arange(grid_h, dtype=jnp.float32), jnp.arange(grid_w, dtype=jnp.float32), indexing="ij"
        )
        img_ids = jnp.stack(
            [jnp.zeros(grid_h * grid_w, jnp.float32), ys.reshape(-1), xs.reshape(-1)], axis=-1
        )
        ids = jnp.concatenate([jnp.zeros((txt_len, 3), jnp.float32), img_ids], axis=0)
        parts = []
        for axis, dim_a in enumerate(c.rope_axes):
            omega = 1.0 / c.theta ** (jnp.arange(0, dim_a, 2, dtype=jnp.float32) / dim_a)
            parts.append(ids[:, axis : axis + 1] * omega[None])
        angles = jnp.concatenate(parts, axis=-1)  # (N, head_dim/2)
        return jnp.cos(angles), jnp.sin(angles)

    def _prep_qkv(self, qkv: jax.Array, p: dict, cos: jax.Array, sin: jax.Array) -> jax.Array:
        """RMS-normalize AND rotate the q/k thirds of a fused qkv tensor in
        ONE pass (per head; consecutive-pair rotation, the published
        pairing).  ``cos``/``sin`` are the rope-table rows for exactly this
        tensor's token positions — per-stream slices for the double blocks,
        the full joint tables for the single blocks.  On TPU this is the
        Pallas kernel in ``ops/rope.py`` (one read + one write of the q/k
        thirds, v aliased through untouched — the jnp version measured
        9.3 ms/fwd of the 57 ms Flux-scale forward against ~1.7 ms of
        unavoidable traffic, `scripts/profile_flux.py`)."""
        from ..ops.rope import fused_rope_qk_norm

        return fused_rope_qk_norm(qkv, p["q_norm"], p["k_norm"], cos, sin, self.config.heads)

    # -- attention ----------------------------------------------------------------

    def _attention(self, qkv: jax.Array) -> jax.Array:
        c = self.config
        if c.attention == "flash" and c.head_dim % 128 == 0:
            from ..ops.flash_attention import flash_attention_qkv

            return flash_attention_qkv(qkv, c.heads)
        from ..ops.flash_attention import _qkv_reference

        return _qkv_reference(qkv, c.heads)

    # -- blocks -------------------------------------------------------------------

    def _double_block(
        self, block: dict, img: jax.Array, txt: jax.Array, cond: jax.Array, cos: jax.Array, sin: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        c = self.config
        dtype = c.compute_dtype
        L = txt.shape[1]

        (si_a, gi_a, ci_a, si_m, gi_m, ci_m) = jnp.split(_dense(block["img"]["ada"], cond, dtype), 6, axis=-1)
        (st_a, gt_a, ct_a, st_m, gt_m, ct_m) = jnp.split(_dense(block["txt"]["ada"], cond, dtype), 6, axis=-1)

        qkv_txt = _dense(block["txt"]["qkv"], _adaln(txt, st_a, ct_a), dtype)
        qkv_img = _dense(block["img"]["qkv"], _adaln(img, si_a, ci_a), dtype)
        # one fused norm+rotate pass per stream (rope rows sliced to each
        # stream's joint positions: [txt, img] order), then joint attention
        qkv_txt = self._prep_qkv(qkv_txt, block["txt"], cos[:L], sin[:L])
        qkv_img = self._prep_qkv(qkv_img, block["img"], cos[L:], sin[L:])
        out = self._attention(jnp.concatenate([qkv_txt, qkv_img], axis=1))
        attn_txt, attn_img = out[:, :L], out[:, L:]

        img = img + gi_a[:, None] * _dense(block["img"]["proj"], attn_img, dtype)
        txt = txt + gt_a[:, None] * _dense(block["txt"]["proj"], attn_txt, dtype)
        h = _adaln(img, si_m, ci_m)
        img = img + gi_m[:, None] * _dense(
            block["img"]["mlp_out"], jax.nn.gelu(_dense(block["img"]["mlp_in"], h, dtype)), dtype
        )
        h = _adaln(txt, st_m, ct_m)
        txt = txt + gt_m[:, None] * _dense(
            block["txt"]["mlp_out"], jax.nn.gelu(_dense(block["txt"]["mlp_in"], h, dtype)), dtype
        )
        return img, txt

    def _single_block(self, block: dict, x: jax.Array, cond: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
        c = self.config
        dtype = c.compute_dtype
        shift, gate, scale = jnp.split(_dense(block["ada"], cond, dtype), 3, axis=-1)
        h = _adaln(x, shift, scale)
        qkv = self._prep_qkv(_dense(block["qkv"], h, dtype), block, cos, sin)
        attn = self._attention(qkv)
        mlp = jax.nn.gelu(_dense(block["mlp_in"], h, dtype))
        return x + gate[:, None] * _dense(block["out"], jnp.concatenate([attn, mlp], axis=-1), dtype)

    # -- forward -------------------------------------------------------------------

    def apply(
        self,
        params: dict,
        x: jax.Array,
        t: jax.Array,
        context: jax.Array,
        pooled: jax.Array,
        guidance: jax.Array | float | None = None,
    ) -> jax.Array:
        """(B, C, H, W) latents, (B,) schedule timestep, (B, L, context_dim)
        T5 features, (B, pooled_dim) CLIP pooling [, guidance scale] ->
        same-shape prediction."""
        c = self.config
        dtype = c.compute_dtype
        B, _C, H, W = x.shape
        in_dtype = x.dtype
        if (guidance is not None) != c.guidance:
            raise ValueError("guidance= goes with FluxConfig(guidance=True), and is required there")
        if jnp.ndim(t) == 0:
            t = jnp.broadcast_to(t, (B,))

        img = _dense(params["x_in"], self.patchify(x).astype(dtype), dtype)
        txt = _dense(params["ctx_in"], context.astype(dtype), dtype)
        L = txt.shape[1]
        cos, sin = self._rope_tables(L, H // c.patch, W // c.patch)

        cond = _two_layer(params["t_mlp"], _timestep_embedding(t, 256).astype(dtype), dtype)
        if c.guidance:
            g = jnp.broadcast_to(jnp.asarray(guidance, jnp.float32), (B,))
            cond = cond + _two_layer(params["guid_mlp"], _timestep_embedding(g * 1000.0, 256).astype(dtype), dtype)
        cond = cond + _two_layer(params["pool_mlp"], pooled.astype(dtype), dtype)
        cond = jax.nn.silu(cond)

        dbl = self._double_block
        sgl = self._single_block
        dbl = _remat_wrap(dbl, c.remat)
        sgl = _remat_wrap(sgl, c.remat)
        for block in params["double"]:
            img, txt = dbl(block, img, txt, cond, cos, sin)
        h = jnp.concatenate([txt, img], axis=1)
        for block in params["single"]:
            h = sgl(block, h, cond, cos, sin)
        img = h[:, L:]

        shift, scale = jnp.split(_dense(params["final_mod"], cond, dtype), 2, axis=-1)
        img = _adaln(img, shift, scale)
        out = _dense(params["final_out"], img, dtype)
        return self.unpatchify(out, H, W).astype(in_dtype)

    # -- serving ---------------------------------------------------------------

    def quantize_params(self, params: dict) -> dict:
        "Int8 serving tree, same recipe as :meth:`DiT.quantize_params`."
        from ..ops.quant import quantize_params

        return quantize_params(
            params,
            exclude=frozenset(
                {"ada", "final_mod", "final_out", "t_mlp", "pool_mlp", "guid_mlp", "ctx_in", "x_in"}
            ),
        )

    def as_sampleable(
        self,
        params: dict,
        context: jax.Array,
        pooled: jax.Array,
        guidance: float | None = None,
    ):
        """Sampling closure with conditioning bound.  Flux-dev is
        guidance-distilled: ``guidance`` is an EMBEDDED input, not a CFG
        doubling — one forward per step."""

        from .conditioning import per_item

        def model_fn(x, t, s, a):
            B = x.shape[0]
            return self.apply(params, x, t, per_item(context, B, 2), per_item(pooled, B, 1), guidance=guidance)

        return model_fn

    def as_served(self, params: dict, guidance: float | None = None):
        """Conditioned-serving closure ``(x, t, sigma, alpha, context)``.

        The serving-engine analog of :meth:`MMDiT.as_served`: conditioning
        arrives as a TRACED argument — the pair ``(context, pooled)`` per
        request, stacked to ``((B, T, D), (B, D))`` by the engine — so one
        executable serves every prompt.  Flux is guidance-distilled, so
        there is no CFG doubling; ``guidance`` is the embedded input."""

        def model_fn(x, t, s, a, ctx):
            context, pooled = ctx
            return self.apply(params, x, t, context, pooled, guidance=guidance)

        return model_fn


def flux_forward_flops(config: FluxConfig, batch: int, h: int, w: int, txt_tokens: int) -> float:
    "Analytic matmul FLOPs of one forward (checked against a traced count in tests/test_flux.py)."
    c = config
    n_img = (h // c.patch) * (w // c.patch)
    n = n_img + txt_tokens
    d = c.dim
    total = 0.0
    # double blocks: per-token qkv(6) + proj(2) + mlp(8+8) = 24 d^2 per stream
    for tokens in (n_img, txt_tokens):
        total += c.depth * batch * tokens * d * d * 24
    total += c.depth * batch * 2 * (2.0 * d * 6 * d)  # two 6-group ada heads per block
    total += 4.0 * batch * c.depth * n * n * d  # joint attention scores + combine
    # single blocks: per-token qkv(6) + mlp_in(8) + fused out(10) = 24 d^2
    total += c.single_depth * batch * n * d * d * 24
    total += c.single_depth * batch * 2.0 * d * 3 * d  # 3-group ada head
    total += 4.0 * batch * c.single_depth * n * n * d
    pw = c.packed_width
    total += 2.0 * batch * n_img * pw * d * 2  # x_in + final_out
    total += 2.0 * batch * txt_tokens * c.context_dim * d  # ctx_in
    # conditioning MLPs (per batch row): t, pooled, guidance, final_mod
    total += 2.0 * batch * (256 * d + d * d)
    total += 2.0 * batch * (c.pooled_dim * d + d * d)
    if c.guidance:
        total += 2.0 * batch * (256 * d + d * d)
    total += 2.0 * batch * d * 2 * d
    return total
