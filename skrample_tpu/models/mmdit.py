"""A text-conditioned dual-stream diffusion transformer (MMDiT) in pure JAX.

Third reference model family: the SD3/Flux-class conditioned architecture
(arXiv 2403.03206) — image patches and text tokens run as two residual
streams with separate weights that meet in ONE joint attention per block.
The reference library has no model code (SURVEY.md §2.0); its wrappers are
driven by exactly this class of pipeline (Flux / SD3 examples in
`/root/reference/examples/diffusers/wrapper.py`), so this model lets the
FlowModel + FlowShift(Linear) serving stack be exercised end-to-end with
real conditioning and classifier-free guidance instead of an unconditioned
toy.

TPU-native notes:

* Joint attention concatenates the two streams' packed q/k/v along the
  token axis and calls the packed Pallas flash kernel
  (``ops/flash_attention.flash_attention_packed``) — head slices come
  straight out of each stream's qkv matmul output, no transposes, and the
  kernel's block sizes divisor-fit the joint token count (e.g. 1024 image
  + 128 text = 1152 = 9 x 128 tiles as 384-wide blocks).
* Text length is padded/truncated to ``context_tokens`` (a multiple of
  128) at embedding time, the static-shape discipline XLA needs; real
  encoders emit 77 CLIP / 256-512 T5 tokens, and masking is unnecessary
  for *generation* parity because padded keys receive near-zero attention
  through the learned null embedding added at init.
* Conditioning vector = timestep embedding + pooled (mean) text projection,
  the SD3 recipe; it drives every adaLN-zero modulation through the same
  fused Pallas adaLN as the DiT.
* ``param_spec`` extends the megatron tp layout to both streams (qkv/mlp-in
  column-parallel, proj/mlp-out row-parallel), so tp serving shards text
  and image matmuls identically and XLA inserts one all-reduce per
  residual join.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .dit import _adaln, _dense, _dense_init, _remat_wrap, _timestep_embedding


@dataclass(frozen=True)
class MMDiTConfig:
    patch: int = 2
    channels: int = 4
    dim: int = 512
    depth: int = 8
    heads: int = 4
    mlp_ratio: int = 4
    context_dim: int = 512
    "Width of the incoming text-encoder features."
    context_tokens: int = 128
    "Static text-token count (multiple of 128); inputs are padded/truncated."
    compute_dtype: Any = jnp.bfloat16
    attention: str = "flash"
    """``"flash"`` (packed Pallas joint attention), ``"full"`` (einsum
    oracle), ``"ring"`` or ``"ulysses"`` (sequence-parallel exact joint
    attention over the mesh's ``sp_axis`` — both streams' token axes stay
    sp-sharded through the whole residual stream and only the attention
    itself touches ICI; see ``parallel/joint_sp.py``).  Ring and ulysses
    require constructing the :class:`MMDiT` with ``mesh=``."""
    sp_axis: str = "sp"
    remat: bool | str = False
    "Rematerialize each block under ``jax.checkpoint`` (see DiTConfig.remat)."
    pooled_dim: int = 0
    """> 0 switches to the published SD3 conditioning wiring for imported
    checkpoints (``import_weights.sd3_mmdit``): a dedicated pooled-text
    vector input with its own two-layer MLP, a two-layer timestep MLP, and
    per-block modulation reading ``silu(t_emb + pooled_emb)``.  The context
    then passes through verbatim (no learned-null padding; arbitrary static
    token count), so ``context`` AND ``pooled`` become required inputs.
    0 (default) keeps the native wiring: pooled text = mean of the context
    sequence, shared second MLP, learned null context."""
    pos_embed_max: int = 0
    """> 0 adds a position-embedding table over a ``(max, max)`` patch grid,
    center-cropped to the latent's grid at apply time (the SD3 cropped
    positional embedding — one table serves every resolution up to max).
    Initialized to factorized 2-D sinusoids; checkpoint imports overwrite
    it.  0 (default): no positional embedding (the native MMDiT relies on
    the conv-free patch order only)."""
    final_txt_pre_only: bool = False
    """SD3's ``context_pre_only``: the LAST block's text stream contributes
    q/k/v to the joint attention (under a 2-parameter modulation) but is
    never updated — no out-projection, MLP, or gates, since its output is
    discarded after the final block."""
    qk_norm: bool = False
    """SD3.5's per-head RMS normalization of q and k after projection
    (learned (head_dim,) scales, eps 1e-6), applied in place on the fused
    qkv tensor so every attention scheme (flash/full/ring/ulysses) sees
    normalized heads."""
    dual_attention_layers: tuple[int, ...] = ()
    """SD3.5-medium: these block indices run a SECOND self-attention on the
    image stream, fed by its own 3-parameter modulation of the block INPUT
    (one 9-group adaLN head) and added after the joint attention's
    residual."""

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    @property
    def sd3_wiring(self) -> bool:
        return self.pooled_dim > 0


def _sincos_2d(side: int, dim: int) -> jax.Array:
    """Factorized 2-D sinusoidal position table, ``(side * side, dim)``:
    half the features encode the row index, half the column (the standard
    ViT/DiT grid embedding).  Import paths overwrite this with the
    checkpoint's own table."""
    half = dim // 2
    pos = jnp.arange(side, dtype=jnp.float32)
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half // 2, dtype=jnp.float32) / (half // 2))
    args = pos[:, None] * freqs[None]
    axis = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)  # (side, half)
    rows = jnp.broadcast_to(axis[:, None, :], (side, side, half))
    cols = jnp.broadcast_to(axis[None, :, :], (side, side, half))
    return jnp.concatenate([rows, cols], axis=-1).reshape(side * side, dim)


def _stream_init(keys, dim: int, mlp_ratio: int) -> dict:
    return {
        "qkv": _dense_init(next(keys), dim, 3 * dim),
        "proj": _dense_init(next(keys), dim, dim),
        "mlp_in": _dense_init(next(keys), dim, mlp_ratio * dim),
        "mlp_out": _dense_init(next(keys), mlp_ratio * dim, dim),
        "ada": _dense_init(next(keys), dim, 6 * dim, scale=0.0),
    }


class MMDiT:
    "Functional model: ``init`` -> params pytree, ``apply(params, x, t, context)``."

    def __init__(self, config: MMDiTConfig = MMDiTConfig(), mesh: Any = None):
        self.config = config
        self.mesh = mesh
        if config.attention not in ("full", "flash", "ring", "ulysses"):
            raise ValueError(f"unknown attention kind {config.attention!r}")
        if config.attention in ("ring", "ulysses") and mesh is None:
            raise ValueError(
                f"MMDiTConfig(attention={config.attention!r}) needs MMDiT(config, mesh=...) with the sp axis"
            )
        if not config.sd3_wiring and config.context_tokens % 128:
            raise ValueError("context_tokens must be a multiple of 128 (static TPU tiling)")

    def init(self, key: jax.Array) -> dict:
        c = self.config
        patch_dim = c.channels * c.patch * c.patch
        # dual-attention blocks draw 3 extra keys (ada re-init, qkv2, proj2)
        keys = iter(jax.random.split(key, 12 + 10 * c.depth + 3 * len(c.dual_attention_layers)))

        params: dict = {
            "patch_in": _dense_init(next(keys), patch_dim, c.dim),
            "ctx_in": _dense_init(next(keys), c.context_dim, c.dim),
            "t_mlp1": _dense_init(next(keys), 256, c.dim),
            "t_mlp2": _dense_init(next(keys), c.dim, c.dim),
            "final_mod": _dense_init(next(keys), c.dim, 2 * c.dim, scale=0.0),
            "final_out": _dense_init(next(keys), c.dim, patch_dim, scale=0.0),
            "blocks": [],
        }
        if c.sd3_wiring:
            params["pool_mlp1"] = _dense_init(next(keys), c.pooled_dim, c.dim)
            params["pool_mlp2"] = _dense_init(next(keys), c.dim, c.dim)
        else:
            params["ctx_null"] = (
                jax.random.normal(next(keys), (c.context_tokens, c.context_dim), jnp.float32) * 0.02
            )
            params["pool_mlp"] = _dense_init(next(keys), c.context_dim, c.dim)
        if c.pos_embed_max:
            params["pos_embed"] = _sincos_2d(c.pos_embed_max, c.dim)
        for i in range(c.depth):
            pre_only = c.final_txt_pre_only and i == c.depth - 1
            block = {
                "img": _stream_init(keys, c.dim, c.mlp_ratio),
                "txt": {
                    "qkv": _dense_init(next(keys), c.dim, 3 * c.dim),
                    "ada": _dense_init(next(keys), c.dim, 2 * c.dim, scale=0.0),
                }
                if pre_only
                else _stream_init(keys, c.dim, c.mlp_ratio),
            }
            if i in c.dual_attention_layers:
                img = block["img"]
                img["ada"] = _dense_init(next(keys), c.dim, 9 * c.dim, scale=0.0)
                img["qkv2"] = _dense_init(next(keys), c.dim, 3 * c.dim)
                img["proj2"] = _dense_init(next(keys), c.dim, c.dim)
            if c.qk_norm:
                for stream in block.values():
                    stream["q_norm"] = jnp.ones((c.head_dim,), jnp.float32)
                    stream["k_norm"] = jnp.ones((c.head_dim,), jnp.float32)
                if "qkv2" in block["img"]:
                    block["img"]["q_norm2"] = jnp.ones((c.head_dim,), jnp.float32)
                    block["img"]["k_norm2"] = jnp.ones((c.head_dim,), jnp.float32)
            params["blocks"].append(block)
        return params

    def param_spec(self, quantized: bool = False) -> dict:
        "Tensor-parallel PartitionSpecs over mesh axis 'tp', both streams."
        col = {"w": P(None, "tp"), "b": P("tp")}
        row = {"w": P("tp", None), "b": P()}
        rep = {"w": P(), "b": P()}
        if quantized:
            col = {"w_q": {"q": P(None, "tp"), "s": P("tp")}, "b": P("tp")}
            row = {"w_q": {"q": P("tp", None), "s": P()}, "b": P()}
        c = self.config
        stream = {"qkv": col, "proj": row, "mlp_in": col, "mlp_out": row, "ada": rep}
        pre_stream: dict = {"qkv": dict(col), "ada": dict(rep)}
        if c.qk_norm:
            stream = {**stream, "q_norm": P(), "k_norm": P()}
            pre_stream = {**pre_stream, "q_norm": P(), "k_norm": P()}
        spec: dict = {
            "patch_in": rep,
            "ctx_in": rep,
            "t_mlp1": rep,
            "t_mlp2": rep,
            "final_mod": rep,
            "final_out": rep,
            "blocks": [
                {
                    "img": dict(stream)
                    | (
                        {"qkv2": dict(col), "proj2": dict(row)}
                        | ({"q_norm2": P(), "k_norm2": P()} if c.qk_norm else {})
                        if i in c.dual_attention_layers
                        else {}
                    ),
                    "txt": dict(pre_stream)
                    if c.final_txt_pre_only and i == c.depth - 1
                    else dict(stream),
                }
                for i in range(c.depth)
            ],
        }
        if c.sd3_wiring:
            spec["pool_mlp1"] = rep
            spec["pool_mlp2"] = rep
        else:
            spec["ctx_null"] = P()
            spec["pool_mlp"] = rep
        if c.pos_embed_max:
            spec["pos_embed"] = P()
        return spec

    # patchify/unpatchify shared with the DiT layout
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

    def embed_context(self, params: dict, context: jax.Array | None, batch: int) -> jax.Array:
        """(B, M, context_dim) encoder features -> static (B, context_tokens,
        context_dim): truncate or pad with the learned null embedding.
        ``context=None`` is the unconditional branch (all-null)."""
        c = self.config
        if c.sd3_wiring:
            if context is None:
                raise ValueError(
                    "SD3-wired MMDiT has no learned null context: pass the encoded "
                    "empty prompt as the unconditional context"
                )
            return context
        null = jnp.broadcast_to(params["ctx_null"], (batch, c.context_tokens, c.context_dim))
        if context is None:
            return null
        M = context.shape[1]
        if M >= c.context_tokens:
            return context[:, : c.context_tokens]
        return jnp.concatenate([context, null[:, M:]], axis=1)

    def apply(
        self,
        params: dict,
        x: jax.Array,
        t: jax.Array,
        context: jax.Array | None = None,
        pooled: jax.Array | None = None,
    ) -> jax.Array:
        """(B, C, H, W), (B,) timestep, (B, M, context_dim) -> same-shape
        prediction.  ``pooled`` (B, pooled_dim) is required with the SD3
        wiring (``pooled_dim > 0``) and rejected otherwise."""
        c = self.config
        _B, _C, H, W = x.shape
        in_dtype = x.dtype

        img, txt, cond = self._prelude(params, x, t, context, pooled)

        block_fn = _remat_wrap(self._block, c.remat)
        for block in params["blocks"]:
            img, txt = block_fn(block, img, txt, cond)

        return self._finalize(params, img, cond, H, W, in_dtype)

    def _prelude(
        self,
        params: dict,
        x: jax.Array,
        t: jax.Array,
        context: jax.Array | None,
        pooled: jax.Array | None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        "Everything before the block stack: (img tokens, txt tokens, cond)."
        c = self.config
        dtype = c.compute_dtype
        B, _C, H, W = x.shape

        if (pooled is not None) != c.sd3_wiring:
            raise ValueError("pooled= goes with MMDiTConfig(pooled_dim > 0), and is required there")
        if jnp.ndim(t) == 0:
            t = jnp.broadcast_to(t, (B,))
        context = self.embed_context(params, context, B).astype(dtype)

        img = _dense(params["patch_in"], self.patchify(x).astype(dtype), dtype)
        if c.pos_embed_max:
            grid_h, grid_w = H // c.patch, W // c.patch
            table = params["pos_embed"].reshape(c.pos_embed_max, c.pos_embed_max, c.dim)
            top = (c.pos_embed_max - grid_h) // 2
            left = (c.pos_embed_max - grid_w) // 2
            crop = table[top : top + grid_h, left : left + grid_w].reshape(grid_h * grid_w, c.dim)
            img = img + crop.astype(dtype)
        txt = _dense(params["ctx_in"], context, dtype)
        if c.attention in ("ring", "ulysses") and self.mesh is not None:
            # both residual streams stay token-sharded over sp end to end:
            # every dense layer is token-parallel, so only the joint
            # attention's ring hops / all-to-alls touch ICI
            from jax.sharding import NamedSharding

            from ..parallel import batch_axis_of

            sharding = NamedSharding(self.mesh, P(batch_axis_of(self.mesh), c.sp_axis, None))
            img = jax.lax.with_sharding_constraint(img, sharding)
            txt = jax.lax.with_sharding_constraint(txt, sharding)

        # conditioning vector: timestep features + pooled text
        tfeat = _timestep_embedding(t, 256).astype(dtype)
        if c.sd3_wiring:
            # published SD3 wiring: two separate linear-silu-linear MLPs
            # summed; every consumer applies silu(t_emb + pooled_emb), so
            # the silu is taken once here
            temb = _dense(params["t_mlp2"], jax.nn.silu(_dense(params["t_mlp1"], tfeat, dtype)), dtype)
            pemb = _dense(
                params["pool_mlp2"],
                jax.nn.silu(_dense(params["pool_mlp1"], pooled.astype(dtype), dtype)),
                dtype,
            )
            cond = jax.nn.silu(temb + pemb)
        else:
            temb = _dense(params["t_mlp1"], tfeat, dtype)
            pool = _dense(params["pool_mlp"], context.mean(axis=1), dtype)
            cond = jax.nn.silu(_dense(params["t_mlp2"], jax.nn.silu(temb + pool), dtype))
        return img, txt, cond

    def _finalize(self, params: dict, img: jax.Array, cond: jax.Array, H: int, W: int, in_dtype: Any) -> jax.Array:
        "Final modulation + out-projection + unpatchify."
        dtype = self.config.compute_dtype
        shift, scale = jnp.split(_dense(params["final_mod"], cond, dtype), 2, axis=-1)
        img = _adaln(img, shift, scale)
        out = _dense(params["final_out"], img, dtype)
        return self.unpatchify(out, H, W).astype(in_dtype)

    def apply_pipelined(
        self,
        params: dict,
        x: jax.Array,
        t: jax.Array,
        mesh: Any,
        microbatch: int,
        context: jax.Array | None = None,
        pooled: jax.Array | None = None,
        axis: str = "pp",
        batch_axis: str | None = None,
    ) -> jax.Array:
        """Pipeline-parallel forward (GPipe-lite over the ``pp`` axis).

        The ``(img, txt, cond)`` triple streams through the stage ring —
        both residual streams plus the conditioning vector every block's
        modulations read.  Needs uniform blocks: SD3's ``final_txt_pre_only``
        last block and SD3.5-medium's ``dual_attention_layers`` give blocks
        different param structure, which cannot stack stage-major.  See
        :meth:`skrample_tpu.models.DiT.apply_pipelined` for the schedule."""
        from ..parallel.pipeline_stages import pipeline_apply, stack_stages

        c = self.config
        if c.final_txt_pre_only or c.dual_attention_layers:
            raise ValueError("pipeline parallelism needs uniform blocks (no final_txt_pre_only / dual attention)")
        B, _C, H, W = x.shape
        in_dtype = x.dtype
        stages = mesh.shape[axis]
        if B % microbatch:
            raise ValueError(f"batch {B} not divisible into microbatches of {microbatch}")

        img, txt, cond = self._prelude(params, x, t, context, pooled)
        staged = stack_stages(params["blocks"], stages)
        per = c.depth // stages

        def stage_fn(local: dict, carry: tuple[jax.Array, jax.Array, jax.Array]):
            im, tx, cd = carry
            for i in range(per):
                im, tx = self._block(jax.tree.map(lambda leaf: leaf[i], local), im, tx, cd)
            return im, tx, cd

        count = B // microbatch
        as_mb = lambda a: a.reshape(count, microbatch, *a.shape[1:])  # noqa: E731
        img_out, _txt, _cd = pipeline_apply(
            stage_fn, staged, (as_mb(img), as_mb(txt), as_mb(cond)), mesh, axis, batch_axis=batch_axis
        )
        img = img_out.reshape(B, *img_out.shape[2:])
        return self._finalize(params, img, cond, H, W, in_dtype)

    def _joint_attention(self, qkv_img: jax.Array, qkv_txt: jax.Array) -> tuple[jax.Array, jax.Array]:
        "Concat the streams along tokens, attend jointly, split back."
        c = self.config
        N = qkv_img.shape[1]
        D = c.dim
        if c.attention in ("ring", "ulysses"):
            # sequence-parallel: the streams stay separately sp-sharded and
            # the joint sequence is assembled per device inside shard_map
            # (sharding the joint axis would put the stream boundary inside
            # shards and force resharding around every concat/split)
            from ..parallel.joint_sp import joint_sp_attention

            return joint_sp_attention(
                qkv_img, qkv_txt, c.heads, self.mesh, axis=c.sp_axis, scheme=c.attention
            )
        if c.attention == "flash" and c.head_dim % 128 == 0:
            # qkv layout is per-token ([q | k | v] along features), so the
            # JOINT sequence's qkv tensor is one token-axis concat of the
            # two streams' projection outputs — no q/k/v splits at all.
            # The fused entry gives the Pallas forward AND the O(N)
            # logsumexp-recomputation backward (an einsum vjp would store
            # the (B, H, N, N) joint scores — 85 MB at the serving shape —
            # per attention when training).
            from ..ops.flash_attention import flash_attention_qkv

            out = flash_attention_qkv(jnp.concatenate([qkv_img, qkv_txt], axis=1), c.heads)
        else:
            from ..ops.flash_attention import _packed_reference

            def packed(qkv):
                return qkv[..., :D], qkv[..., D : 2 * D], qkv[..., 2 * D :]

            qi, ki, vi = packed(qkv_img)
            qt, kt, vt = packed(qkv_txt)
            q = jnp.concatenate([qi, qt], axis=1)
            k = jnp.concatenate([ki, kt], axis=1)
            v = jnp.concatenate([vi, vt], axis=1)
            out = _packed_reference(q, k, v, c.heads)
        return out[:, :N], out[:, N:]

    def _qk_norm(self, qkv: jax.Array, q_scale: jax.Array, k_scale: jax.Array) -> jax.Array:
        """Per-head RMS-normalize the q and k thirds of a fused qkv tensor.

        Routed through the fused RoPE kernel (``ops/rope.py``) with an
        identity rotation (cos=1, sin=0 — exact): on TPU that is one read +
        one write of the q/k thirds instead of XLA's multi-pass schedule,
        with the v third aliased through untouched; off TPU the jnp
        reference runs, whose identity-rotation arithmetic reduces bitwise
        to plain RMS-norm."""
        from ..ops.rope import fused_rope_qk_norm

        c = self.config
        N = qkv.shape[1]
        cos = jnp.ones((N, c.head_dim // 2), jnp.float32)
        sin = jnp.zeros((N, c.head_dim // 2), jnp.float32)
        return fused_rope_qk_norm(qkv, q_scale, k_scale, cos, sin, c.heads)

    def _self_attention(self, qkv: jax.Array) -> jax.Array:
        "Single-stream attention on a fused qkv tensor (SD3.5 dual attn)."
        c = self.config
        if c.attention == "flash" and c.head_dim % 128 == 0:
            from ..ops.flash_attention import flash_attention_qkv

            return flash_attention_qkv(qkv, c.heads)
        from ..ops.flash_attention import _qkv_reference

        return _qkv_reference(qkv, c.heads)

    def _block(self, block: dict, img: jax.Array, txt: jax.Array, cond: jax.Array) -> tuple[jax.Array, jax.Array]:
        "One dual-stream block: per-stream adaLN-zero, one joint attention."
        c = self.config
        dtype = c.compute_dtype
        txt_pre_only = "proj" not in block["txt"]
        dual = "qkv2" in block["img"]

        mods_i = jnp.split(_dense(block["img"]["ada"], cond, dtype), 9 if dual else 6, axis=-1)
        (si_a, gi_a, ci_a, si_m, gi_m, ci_m) = mods_i[:6]
        if txt_pre_only:
            # SD3 context_pre_only: the text stream only FEEDS this block's
            # joint attention (2-param modulation, no gates) — its output
            # is discarded, so there is no out-projection or MLP to run
            st_a, ct_a = jnp.split(_dense(block["txt"]["ada"], cond, dtype), 2, axis=-1)
        else:
            mods_t = jnp.split(_dense(block["txt"]["ada"], cond, dtype), 6, axis=-1)
            (st_a, gt_a, ct_a, st_m, gt_m, ct_m) = mods_t

        qkv_img = _dense(block["img"]["qkv"], _adaln(img, si_a, ci_a), dtype)
        qkv_txt = _dense(block["txt"]["qkv"], _adaln(txt, st_a, ct_a), dtype)
        if c.qk_norm:
            qkv_img = self._qk_norm(qkv_img, block["img"]["q_norm"], block["img"]["k_norm"])
            qkv_txt = self._qk_norm(qkv_txt, block["txt"]["q_norm"], block["txt"]["k_norm"])
        if dual:
            # the second self-attention modulates the block INPUT (not the
            # post-attention residual), so build its qkv before updating img
            si_a2, gi_a2, ci_a2 = mods_i[6:]
            qkv2 = _dense(block["img"]["qkv2"], _adaln(img, si_a2, ci_a2), dtype)
            if c.qk_norm:
                qkv2 = self._qk_norm(qkv2, block["img"]["q_norm2"], block["img"]["k_norm2"])
        attn_img, attn_txt = self._joint_attention(qkv_img, qkv_txt)
        img = img + gi_a[:, None] * _dense(block["img"]["proj"], attn_img, dtype)
        if dual:
            img = img + gi_a2[:, None] * _dense(block["img"]["proj2"], self._self_attention(qkv2), dtype)

        h = _adaln(img, si_m, ci_m)
        h = _dense(block["img"]["mlp_out"], jax.nn.gelu(_dense(block["img"]["mlp_in"], h, dtype)), dtype)
        img = img + gi_m[:, None] * h
        if txt_pre_only:
            return img, txt

        txt = txt + gt_a[:, None] * _dense(block["txt"]["proj"], attn_txt, dtype)
        h = _adaln(txt, st_m, ct_m)
        h = _dense(block["txt"]["mlp_out"], jax.nn.gelu(_dense(block["txt"]["mlp_in"], h, dtype)), dtype)
        txt = txt + gt_m[:, None] * h
        return img, txt

    def quantize_params(self, params: dict) -> dict:
        "Int8 serving tree, same recipe as :meth:`DiT.quantize_params`."
        from ..ops.quant import quantize_params

        return quantize_params(
            params,
            exclude=frozenset(
                {"ada", "final_mod", "t_mlp1", "t_mlp2", "pool_mlp", "pool_mlp1", "pool_mlp2", "ctx_in"}
            ),
        )

    def as_sampleable(
        self,
        params: dict,
        context: jax.Array | None = None,
        guidance_scale: float = 1.0,
        pooled: jax.Array | None = None,
        uncond_context: jax.Array | None = None,
        uncond_pooled: jax.Array | None = None,
    ):
        """Sampling closure with conditioning bound.

        ``guidance_scale != 1`` runs classifier-free guidance, both branches
        in one batched forward.  The unconditional branch is the learned
        null context natively; with the SD3 wiring there is no learned null,
        so guided sampling requires ``uncond_context``/``uncond_pooled``
        (the encoded empty prompt, the SD3 pipelines' convention)."""
        sd3 = self.config.sd3_wiring

        from .conditioning import doubled_t, guided_mix, per_item

        if context is None or guidance_scale == 1.0:

            def model_fn(x, t, s, a):
                B = x.shape[0]  # single-prompt conditioning serves any batch
                ctx = None if context is None else per_item(context, B, 2)
                pool = None if pooled is None else per_item(pooled, B, 1)
                return self.apply(params, x, t, ctx, pooled=pool)

            return model_fn

        if sd3 and (uncond_context is None or uncond_pooled is None):
            raise ValueError("SD3-wired guidance needs uncond_context= and uncond_pooled=")

        def guided_fn(x, t, s, a):
            B = x.shape[0]
            if sd3:
                ctx_c = per_item(context, B, 2)
                ctx_u = per_item(uncond_context, B, 2)
                pool = jnp.concatenate([per_item(pooled, B, 1), per_item(uncond_pooled, B, 1)])
            else:
                ctx_c = self.embed_context(params, context, B)
                ctx_u = self.embed_context(params, None, B)
                pool = None
            both = self.apply(
                params,
                jnp.concatenate([x, x]),
                doubled_t(t, B),
                jnp.concatenate([ctx_c, ctx_u]),
                pooled=pool,
            )
            return guided_mix(both[:B], both[B:], guidance_scale)

        return guided_fn

    def as_served(self, params: dict, guidance_scale: float = 1.0, per_request_scale: bool = False):
        """Conditioned-serving closure: ``(x, t, sigma, alpha, context)``.

        Unlike :meth:`as_sampleable` (context bound at closure time, one
        executable per prompt), the context here is a TRACED argument —
        ``ServingEngine(conditioned=True)`` passes each batch's stacked
        per-request contexts through it, so one executable serves every
        prompt.  ``context=None`` (baked, not traced) is the unconditional
        branch; with ``guidance_scale != 1`` conditioned batches run
        classifier-free guidance against the learned null context, both
        branches in one doubled-batch forward.

        ``per_request_scale=True`` makes the guidance scale a TRACED
        per-request value too: each request's context becomes the pair
        ``(context, scale)`` (a scalar; the engine stacks it to ``(B,)``),
        and the CFG mix uses each item's own scale — one executable serves
        every (prompt, guidance) combination, the per-request knob the
        diffusers pipelines expose per call.  ``guidance_scale`` is ignored
        in this mode."""

        def model_fn(x, t, sigma, alpha, context=None):
            B = x.shape[0]
            scale = None
            if per_request_scale:
                if context is None:
                    raise ValueError("per_request_scale serving requires context=(context, scale) per request")
                context, scale = context
            if context is None or (scale is None and guidance_scale == 1.0):
                return self.apply(params, x, t, context)
            both = self.apply(
                params,
                jnp.concatenate([x, x]),
                jnp.broadcast_to(t, (2 * B,)) if jnp.ndim(t) == 0 else jnp.concatenate([t, t]),
                jnp.concatenate(
                    [self.embed_context(params, context, B), self.embed_context(params, None, B)]
                ),
            )
            c_out, u_out = both[:B], both[B:]
            if scale is None:
                return u_out + guidance_scale * (c_out - u_out)
            s = jnp.reshape(scale, (B,) + (1,) * (c_out.ndim - 1)).astype(c_out.dtype)
            return u_out + s * (c_out - u_out)

        return model_fn


def mmdit_forward_flops(config: MMDiTConfig, batch: int, h: int, w: int) -> float:
    "Analytic matmul FLOPs of one forward (joint attention counted exactly)."
    c = config
    n_img = (h // c.patch) * (w // c.patch)
    n_txt = c.context_tokens
    n = n_img + n_txt
    d = c.dim
    total = 0.0
    for tokens in (n_img, n_txt):
        # qkv + proj + mlp per block, per stream
        total += c.depth * batch * tokens * d * d * (6 + 2 + 2 * c.mlp_ratio + 2 * c.mlp_ratio)
    total += c.depth * batch * 2 * (2.0 * d * 6 * d)  # ada heads (per batch row, both streams)
    total += 4.0 * batch * c.depth * n * n * d  # joint attention scores + combine
    patch_dim = c.channels * c.patch * c.patch
    total += 2.0 * batch * n_img * patch_dim * d * 2  # patch_in + final_out
    total += 2.0 * batch * n_txt * c.context_dim * d  # ctx_in
    # conditioning pathway (per batch row): pool_mlp, t_mlp1, t_mlp2, final_mod
    total += 2.0 * batch * (c.context_dim * d + 256 * d + d * d + d * 2 * d)
    return total
