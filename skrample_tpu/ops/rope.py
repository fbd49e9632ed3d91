"""Fused per-head RMS qk-norm + rotary embedding on a packed qkv tensor.

Flux-class blocks RMS-normalize and rotate the q/k thirds of the fused qkv
projection output (reference behavior: diffusers ``FluxTransformer2DModel``'s
``apply_rotary_emb`` with consecutive-pair rotation, cited at
``models/flux.py``).  The pure-jnp version of that pass is elementwise, but
XLA schedules it as several HBM round trips over the (B, N, 3*dim) tensor —
the Flux-scale ablation (`scripts/profile_flux.py`) measured 9.3 ms/fwd
against ~1.7 ms of unavoidable traffic at dim 3072 / 4608 tokens.

The Pallas kernel makes it one read and one write of the q/k thirds:

* grid ``(B, row blocks, 2*heads)`` with the head-group axis INNERMOST, so
  the cos/sin row tiles keep the same block index across consecutive grid
  steps and Pallas skips their re-fetch (one DMA per row block, not per
  head);
* the **v third is never touched**: ``input_output_aliases`` hands the
  input buffer to the output (XLA copies first only if the input has other
  uses), and no grid cell addresses the v feature blocks — zero traffic
  instead of a copy;
* the consecutive-pair rotation is two lane rolls and a parity select —
  exactly the reference's ``(y0*cos - y1*sin, y0*sin + y1*cos)`` arithmetic,
  no gathers, no lane-axis reshapes;
* RMS stats are a lane reduction inside each (rows, head_dim) tile.

Gradients: ``fused_rope_qk_norm`` carries a custom VJP whose backward is the
jnp reference's vjp — the kernel computes the same function, so training
sees exact reference gradients.  Off TPU the reference runs directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _dim0_sharding, _fit_block

_LANE = 128


def rope_qk_norm_reference(
    qkv: jax.Array,
    q_gain: jax.Array,
    k_gain: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    heads: int,
    eps: float = 1e-6,
) -> jax.Array:
    """Pure-jnp oracle (and CPU/backward path).

    ``qkv``: (B, N, 3*heads*d) laid out ``[q | k | v]``; ``cos``/``sin``:
    (N, d // 2) per-pair tables; ``q_gain``/``k_gain``: (d,) RMS gains.
    Matches the pre-kernel ``Flux._prep_qkv`` arithmetic exactly.
    """
    B, N, D3 = qkv.shape
    d = D3 // 3 // heads
    h = qkv.reshape(B, N, 3, heads, d)
    co = cos[None, :, None, :]
    si = sin[None, :, None, :]

    def prep(x: jax.Array, g: jax.Array) -> jax.Array:
        x32 = x.astype(jnp.float32)
        y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps) * g
        pairs = y.reshape(B, N, heads, d // 2, 2)
        y0, y1 = pairs[..., 0], pairs[..., 1]
        out = jnp.stack([y0 * co - y1 * si, y0 * si + y1 * co], axis=-1)
        return out.reshape(x.shape).astype(x.dtype)

    h = jnp.stack([prep(h[:, :, 0], q_gain), prep(h[:, :, 1], k_gain), h[:, :, 2]], axis=2)
    return h.reshape(B, N, D3)


def _rope_kernel(x_ref, cos_ref, sin_ref, gq_ref, gk_ref, o_ref, *, heads: int, eps: float):
    g = pl.program_id(2)
    x = x_ref[0].astype(jnp.float32)  # (block_n, d)
    gain = jnp.where(g < heads, gq_ref[0], gk_ref[0])
    y = x * jax.lax.rsqrt(jnp.mean(x * x, axis=1, keepdims=True) + eps) * gain
    # consecutive-pair rotation: out[2i] = y[2i]*c - y[2i+1]*s,
    # out[2i+1] = y[2i]*s + y[2i+1]*c — the partner lane comes from a roll
    # (wrap-around values land only on lanes where the select rejects them)
    nxt = pltpu.roll(y, y.shape[1] - 1, 1)  # y[:, j+1] at lane j (shift must be non-negative)
    prv = pltpu.roll(y, 1, 1)  # y[:, j-1] at lane j
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    swap = jnp.where(lane % 2 == 0, -nxt, prv)
    o_ref[0] = (y * cos_ref[...] + swap * sin_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "eps", "block_n", "interpret"))
def rope_qk_norm_forward(
    qkv: jax.Array,
    q_gain: jax.Array,
    k_gain: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    heads: int,
    eps: float = 1e-6,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """One-pass kernel; same contract as :func:`rope_qk_norm_reference`.

    Needs ``head_dim % 128 == 0`` and ``N % 128 == 0`` (the caller
    dispatches to the reference otherwise)."""
    B, N, D3 = qkv.shape
    d = D3 // 3 // heads
    if D3 % (3 * heads) or d % _LANE or N % _LANE:
        raise ValueError(f"rope kernel needs head_dim % 128 == 0 and N % 128 == 0, got {qkv.shape} heads={heads}")
    block_n = _fit_block(N, block_n)
    # interleave the per-pair tables to full head_dim: lanes 2i and 2i+1
    # both read entry i — the kernel then needs no lane-axis pair reshape
    cos_full = jnp.repeat(cos.astype(jnp.float32), 2, axis=-1)
    sin_full = jnp.repeat(sin.astype(jnp.float32), 2, axis=-1)

    x_spec = pl.BlockSpec((1, block_n, d), lambda b, i, g: (b, i, g), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((block_n, d), lambda b, i, g: (i, 0), memory_space=pltpu.VMEM)
    gain_spec = pl.BlockSpec((1, d), lambda b, i, g: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_rope_kernel, heads=heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, N, D3), qkv.dtype),
        grid=(B, N // block_n, 2 * heads),  # v feature blocks are never addressed
        in_specs=[x_spec, row_spec, row_spec, gain_spec, gain_spec],
        out_specs=x_spec,
        input_output_aliases={0: 0},  # untouched v blocks keep the input values
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(qkv, cos_full, sin_full, q_gain.reshape(1, d).astype(jnp.float32), k_gain.reshape(1, d).astype(jnp.float32))


@functools.cache
def _rope_spmd(heads: int, eps: float, interpret: bool):
    """SPMD rule: qkv's batch dim shards, every other operand (gains, rope
    tables) is replicated — the generic ``_batch_parallel`` helper can't be
    used here because it assumes all args carry batch at dim 0."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def fn(qkv, gq, gk, cos, sin):
        return rope_qk_norm_forward(qkv, gq, gk, cos, sin, heads, eps, interpret=interpret)

    cp = custom_partitioning(fn)

    def partition(mesh, arg_shapes, result_shape):
        arg0 = arg_shapes[0].sharding
        out = _dim0_sharding(arg0, 3)
        args = (out,) + tuple(NamedSharding(arg0.mesh, P(*([None] * len(a.shape)))) for a in arg_shapes[1:])
        return mesh, fn, out, args

    def infer(mesh, arg_shapes, shape):
        return _dim0_sharding(arg_shapes[0].sharding, 3)

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b n e, q, k, n c, n c -> b n e",
        need_replication_factors=("n", "e", "q", "k", "c"),
    )
    return jax.jit(cp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _rope_vjp(qkv, q_gain, k_gain, cos, sin, heads: int, eps: float):
    return _rope_spmd(heads, eps, jax.default_backend() != "tpu")(qkv, q_gain, k_gain, cos, sin)


def _rope_fwd(qkv, q_gain, k_gain, cos, sin, heads, eps):
    return _rope_vjp(qkv, q_gain, k_gain, cos, sin, heads, eps), (qkv, q_gain, k_gain, cos, sin)


def _rope_bwd(heads, eps, residuals, g):
    qkv, q_gain, k_gain, cos, sin = residuals
    _, vjp = jax.vjp(lambda a, gq, gk: rope_qk_norm_reference(a, gq, gk, cos, sin, heads, eps), qkv, q_gain, k_gain)
    return (*vjp(g), None, None)


_rope_vjp.defvjp(_rope_fwd, _rope_bwd)


def fused_rope_qk_norm(
    qkv: jax.Array,
    q_gain: jax.Array,
    k_gain: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    heads: int,
    eps: float = 1e-6,
) -> jax.Array:
    """RMS qk-norm + RoPE over the q/k thirds of a fused qkv tensor.

    Trace-time dispatch: the Pallas one-pass kernel on TPU when the shape
    tiles (head_dim and N multiples of 128), the jnp reference otherwise.
    Gradients are the reference's exact vjp either way."""
    B, N, D3 = qkv.shape
    d = D3 // 3 // heads if heads and D3 % 3 == 0 else 0
    if jax.default_backend() != "tpu" or not d or D3 % (3 * heads) or d % _LANE or N % _LANE:
        return rope_qk_norm_reference(qkv, q_gain, k_gain, cos, sin, heads, eps)
    return _rope_vjp(qkv, q_gain, k_gain, cos, sin, heads, eps)
