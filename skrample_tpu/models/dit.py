"""A compact diffusion transformer (DiT) in pure JAX.

Used as the flagship model for benchmarks and the multi-chip dry runs: the
params are a plain pytree, and :meth:`DiT.param_spec` gives megatron-style
tensor-parallel PartitionSpecs (qkv/mlp-in column-parallel over "tp",
proj/mlp-out row-parallel) so ``jax.jit`` + ``NamedSharding`` lets XLA insert
the all-reduces over ICI.

Design notes for the MXU: all matmuls are batched over (batch x tokens) and
sized in multiples of 128; compute runs in bfloat16 with float32 accumulation
(``preferred_element_type``) and float32 layer norms.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


@dataclass(frozen=True)
class DiTConfig:
    patch: int = 2
    channels: int = 4
    dim: int = 384
    depth: int = 6
    heads: int = 6
    mlp_ratio: int = 4
    compute_dtype: Any = jnp.bfloat16
    attention: str = "full"
    """``"full"`` (plain einsum; the (N, N) score tensor hits HBM),
    ``"flash"`` (single-chip Pallas online-softmax kernel — scores never
    leave VMEM; see ``ops/flash_attention.py``), ``"ring"``
    (sequence-parallel exact attention: K/V blocks rotate over the mesh's
    ``sp_axis`` with ``ppermute`` — 1/S of the K/V and scores memory per
    chip), or ``"ulysses"`` (sequence-parallel via head-sharding
    all-to-alls: each chip runs the flash kernel over the FULL sequence
    for its H/S head shard — two all-to-alls per attention, the cheaper
    scheme when one head's scores fit on-chip; see
    ``parallel/ulysses.py``).  Ring and ulysses require constructing the
    :class:`DiT` with a mesh that has the ``sp_axis``."""
    sp_axis: str = "sp"
    remat: bool | str = False
    """Rematerialize each transformer block under ``jax.checkpoint``
    (``"dots"`` keeps matmul outputs — see ``_remat_wrap``): the
    backward pass recomputes block activations instead of storing them, so
    training activation memory drops from O(depth) residual streams to
    O(1) at ~1/3 extra FLOPs — the standard memory/compute trade for
    training models that do not otherwise fit HBM."""

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads


def _dense_init(key: jax.Array, d_in: int, d_out: int, scale: float | None = None) -> dict:
    scale = scale if scale is not None else 1 / math.sqrt(d_in)
    return {
        "w": jax.random.normal(key, (d_in, d_out), jnp.float32) * scale,
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def _remat_wrap(fn, remat: bool | str, static_argnums: tuple[int, ...] = ()):
    """Wrap a block function per the config's ``remat`` setting: ``True`` is
    full-block recompute (minimum memory), ``"dots"`` saves matmul outputs
    and recomputes only the elementwise chain
    (``dots_with_no_batch_dims_saveable`` — skips re-doing the MXU work at
    ~2x full-remat's activation memory), ``False`` is a no-op."""
    if not remat:
        return fn
    if remat is True:
        policy = None
    elif remat == "dots":
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    else:
        raise ValueError(f"remat must be bool or 'dots', got {remat!r}")
    return jax.checkpoint(fn, policy=policy, static_argnums=static_argnums)


def _dense(params: dict, x: jax.Array, dtype: Any) -> jax.Array:
    if "w_q" in params:  # int8 serving tree from DiT.quantize_params
        from ..ops.quant import dense_int8

        return dense_int8(params, x, dtype)
    return (
        jnp.dot(x, params["w"].astype(dtype), preferred_element_type=jnp.float32) + params["b"]
    ).astype(dtype)


def _layernorm(x: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


def _modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    return x * (1 + scale[:, None]) + shift[:, None]


def _adaln(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """Fused ``modulate(layernorm(x), ...)`` (one HBM pass on TPU).

    The mean/var reductions break XLA's elementwise fusion, so the eager
    composition costs ~380 us of a 2.6 ms DiT-512/8 forward; the Pallas
    kernel (``ops/adaln.py``) does statistics + normalize + affine on one
    VMEM tile.  Falls back to the eager form for untileable shapes."""
    from ..ops.adaln import adaln_modulate

    return adaln_modulate(x, shift, scale)


def _timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    "Sinusoidal features of the (continuous) timestep."
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class DiT:
    "Functional model: ``init`` -> params pytree, ``apply(params, x, t)``."

    def __init__(self, config: DiTConfig = DiTConfig(), mesh: Any = None):
        self.config = config
        self.mesh = mesh
        if config.attention in ("ring", "ulysses") and mesh is None:
            raise ValueError(
                f"DiTConfig(attention={config.attention!r}) needs DiT(config, mesh=...) with the sp axis"
            )
        if config.attention not in ("full", "flash", "ring", "ulysses"):
            raise ValueError(f"unknown attention kind {config.attention!r}")

    def init(self, key: jax.Array) -> dict:
        c = self.config
        patch_dim = c.channels * c.patch * c.patch
        keys = iter(jax.random.split(key, 6 + 7 * c.depth))

        params: dict = {
            "patch_in": _dense_init(next(keys), patch_dim, c.dim),
            "t_mlp1": _dense_init(next(keys), 256, c.dim),
            "t_mlp2": _dense_init(next(keys), c.dim, c.dim),
            "final_mod": _dense_init(next(keys), c.dim, 2 * c.dim, scale=0.0),
            "final_out": _dense_init(next(keys), c.dim, patch_dim, scale=0.0),
            "blocks": [],
        }
        for _ in range(c.depth):
            params["blocks"].append(
                {
                    "qkv": _dense_init(next(keys), c.dim, 3 * c.dim),
                    "proj": _dense_init(next(keys), c.dim, c.dim),
                    "mlp_in": _dense_init(next(keys), c.dim, c.mlp_ratio * c.dim),
                    "mlp_out": _dense_init(next(keys), c.mlp_ratio * c.dim, c.dim),
                    # adaLN-zero: 6 modulation vectors, initialized to zero
                    "ada": _dense_init(next(keys), c.dim, 6 * c.dim, scale=0.0),
                }
            )
        return params

    def param_spec(self, quantized: bool = False) -> dict:
        """Tensor-parallel PartitionSpecs over mesh axis 'tp' (megatron layout).

        With ``quantized=True`` the specs mirror the int8 serving tree from
        :meth:`quantize_params`: the int8 weight shards exactly like its f32
        counterpart and the per-output-channel scale vector follows the
        output dim (so column-parallel scales shard, row-parallel scales
        replicate).  Row-parallel int8 is exact under SPMD: the per-token
        activation max reduces over the sharded feature dim as a collective
        max, and the int32 partial products psum before the elementwise
        rescale — both inserted by XLA from the shardings alone."""
        col = {"w": P(None, "tp"), "b": P("tp")}  # column parallel
        row = {"w": P("tp", None), "b": P()}  # row parallel
        rep = {"w": P(), "b": P()}
        if quantized:
            col = {"w_q": {"q": P(None, "tp"), "s": P("tp")}, "b": P("tp")}
            row = {"w_q": {"q": P("tp", None), "s": P()}, "b": P()}
        c = self.config
        return {
            "patch_in": rep,
            "t_mlp1": rep,
            "t_mlp2": rep,
            "final_mod": rep,
            "final_out": rep,
            "blocks": [
                {"qkv": col, "proj": row, "mlp_in": col, "mlp_out": row, "ada": rep}
                for _ in range(c.depth)
            ],
        }

    def patchify(self, x: jax.Array) -> jax.Array:
        "(B, C, H, W) -> (B, N, patch_dim)"
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

    def apply(self, params: dict, x: jax.Array, t: jax.Array) -> jax.Array:
        "(B, C, H, W), (B,) or scalar timestep -> prediction of the same shape."
        c = self.config
        dtype = c.compute_dtype
        B, _C, H, W = x.shape
        in_dtype = x.dtype

        if jnp.ndim(t) == 0:
            t = jnp.broadcast_to(t, (B,))

        tokens = _dense(params["patch_in"], self.patchify(x).astype(dtype), dtype)
        if c.attention in ("ring", "ulysses") and self.mesh is not None:
            # keep the whole residual stream token-sharded over sp: the dense
            # layers are token-parallel, so only the ring hops / all-to-alls
            # touch ICI
            from jax.sharding import NamedSharding

            from ..parallel import batch_axis_of

            tokens = jax.lax.with_sharding_constraint(
                tokens, NamedSharding(self.mesh, P(batch_axis_of(self.mesh), c.sp_axis, None))
            )

        temb = _timestep_embedding(t, 256)
        temb = _dense(params["t_mlp2"], jax.nn.silu(_dense(params["t_mlp1"], temb.astype(dtype), dtype)), dtype)
        temb = jax.nn.silu(temb)

        block_fn = _remat_wrap(self._block, c.remat)
        for block in params["blocks"]:
            tokens = block_fn(block, tokens, temb)

        shift, scale = jnp.split(_dense(params["final_mod"], temb, dtype), 2, axis=-1)
        tokens = _adaln(tokens, shift, scale)
        out = _dense(params["final_out"], tokens, dtype)
        return self.unpatchify(out, H, W).astype(in_dtype)

    def _block(self, block: dict, tokens: jax.Array, temb: jax.Array) -> jax.Array:
        "One transformer block (adaLN-zero attention + MLP residual)."
        c = self.config
        dtype = c.compute_dtype
        B = tokens.shape[0]
        mods = _dense(block["ada"], temb, dtype)
        (s_attn, g_attn, sc_attn, s_mlp, g_mlp, sc_mlp) = jnp.split(mods, 6, axis=-1)

        h = _adaln(tokens, s_attn, sc_attn)
        qkv = _dense(block["qkv"], h, dtype)
        N = qkv.shape[1]
        if c.attention == "flash" and c.head_dim % 128 == 0:
            # TPU-native head shape: head_dim a multiple of the 128 lane
            # width lets the kernel slice each head's q/k/v straight out
            # of the fused qkv matmul output — no (B, N, H, d) <->
            # (B, H, N, d) transposes, no split copies, and the score
            # matmul contracts at full MXU depth
            from ..ops.flash_attention import flash_attention_qkv

            out = flash_attention_qkv(qkv, c.heads)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, N, c.heads, c.head_dim).transpose(0, 2, 1, 3)
            k = k.reshape(B, N, c.heads, c.head_dim).transpose(0, 2, 1, 3)
            v = v.reshape(B, N, c.heads, c.head_dim).transpose(0, 2, 1, 3)
            if c.attention == "ring":
                from ..parallel.ring_attention import ring_attention

                out = ring_attention(q, k, v, self.mesh, axis=c.sp_axis)
            elif c.attention == "ulysses":
                from ..parallel.ulysses import ulysses_attention

                out = ulysses_attention(q, k, v, self.mesh, axis=c.sp_axis)
            elif c.attention == "flash":
                from ..ops.flash_attention import flash_attention

                out = flash_attention(q, k, v)
            else:
                attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
                attn = jax.nn.softmax(attn / math.sqrt(c.head_dim), axis=-1).astype(dtype)
                out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32).astype(dtype)
            out = out.transpose(0, 2, 1, 3).reshape(B, N, c.dim)
        tokens = tokens + g_attn[:, None] * _dense(block["proj"], out, dtype)

        h = _adaln(tokens, s_mlp, sc_mlp)
        h = _dense(block["mlp_out"], jax.nn.gelu(_dense(block["mlp_in"], h, dtype)), dtype)
        tokens = tokens + g_mlp[:, None] * h
        return tokens

    def apply_pipelined(
        self,
        params: dict,
        x: jax.Array,
        t: jax.Array,
        mesh: Any,
        microbatch: int,
        axis: str = "pp",
        batch_axis: str | None = None,
    ) -> jax.Array:
        """Pipeline-parallel forward: blocks split into ``mesh.shape[axis]``
        consecutive stages, microbatches streamed through with the GPipe-lite
        ring (``parallel/pipeline_stages.py``) — each device materializes
        only ``depth / stages`` blocks, so depth scales past one chip's HBM.

        The carry through the stages is ``(tokens, temb)``: every block needs
        the conditioning vector for its adaLN modulations, so it rides along
        (a (mb, dim) vector — negligible next to the token activations).
        Patchify/temb/final layers are replicated compute (a few %% of the
        FLOPs).  Bit-matches :meth:`apply` up to reduction order; the S-1
        fill/drain bubble amortizes as ``batch / microbatch`` grows."""
        from ..parallel.pipeline_stages import pipeline_apply, stack_stages

        c = self.config
        dtype = c.compute_dtype
        B, _C, H, W = x.shape
        in_dtype = x.dtype
        stages = mesh.shape[axis]
        if B % microbatch:
            raise ValueError(f"batch {B} not divisible into microbatches of {microbatch}")

        if jnp.ndim(t) == 0:
            t = jnp.broadcast_to(t, (B,))

        tokens = _dense(params["patch_in"], self.patchify(x).astype(dtype), dtype)
        temb = _timestep_embedding(t, 256)
        temb = _dense(params["t_mlp2"], jax.nn.silu(_dense(params["t_mlp1"], temb.astype(dtype), dtype)), dtype)
        temb = jax.nn.silu(temb)

        staged = stack_stages(params["blocks"], stages)
        per = c.depth // stages

        def stage_fn(local: dict, carry: tuple[jax.Array, jax.Array]) -> tuple[jax.Array, jax.Array]:
            toks, te = carry
            for i in range(per):
                toks = self._block(jax.tree.map(lambda leaf: leaf[i], local), toks, te)
            return toks, te

        count = B // microbatch
        as_mb = lambda a: a.reshape(count, microbatch, *a.shape[1:])  # noqa: E731
        toks, _ = pipeline_apply(stage_fn, staged, (as_mb(tokens), as_mb(temb)), mesh, axis, batch_axis=batch_axis)
        tokens = toks.reshape(B, *toks.shape[2:])

        shift, scale = jnp.split(_dense(params["final_mod"], temb, dtype), 2, axis=-1)
        tokens = _adaln(tokens, shift, scale)
        out = _dense(params["final_out"], tokens, dtype)
        return self.unpatchify(out, H, W).astype(in_dtype)

    def quantize_params(self, params: dict) -> dict:
        """Int8 serving tree: block qkv/proj/mlp weights become per-channel
        int8 (+ scale vectors) and ``apply`` runs those matmuls on the MXU's
        int8 path with dynamic per-token activation scales — ~2x the bf16
        MXU rate on v5e (see ``ops/quant.py``).  The whole conditioning
        pathway (timestep MLPs + modulation heads) stays f32: its outputs
        gate every residual branch, and at batch-size rows its matmuls are
        latency noise.  Serving only: the int8 tree is not differentiable
        (round/clip), so keep the f32 tree for training and re-quantize
        after updates."""
        from ..ops.quant import quantize_params

        return quantize_params(params, exclude=frozenset({"ada", "final_mod", "t_mlp1", "t_mlp2"}))

    def as_sampleable(self, params: dict):
        "Adapter to the sampling closure signature (x, t, sigma, alpha) -> pred."

        def model_fn(x: jax.Array, t: jax.Array, s: jax.Array, a: jax.Array) -> jax.Array:
            return self.apply(params, x, t)

        return model_fn
