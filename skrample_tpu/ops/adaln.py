"""Fused adaLN modulation (layernorm + shift/scale) as a Pallas TPU kernel.

The DiT applies ``modulate(layernorm(tokens), shift, scale)`` twice per
transformer block plus once at the head — 17 times per forward at depth 8.
The ablation profiler (``scripts/profile_dit.py``) attributes ~380 us of the
~2.6 ms forward to these: the mean/var reductions break XLA's elementwise
fusion, so the token stream makes several float32 HBM round-trips per call.
This kernel does the whole thing in one read + one write per token tile:
statistics, normalization and the affine modulation all happen on a VMEM
tile in float32, and only the input dtype touches HBM.

Semantics match ``models/dit.py``'s ``_modulate(_layernorm(x), shift, scale)``
bit-for-bit up to reduction order: layernorm over the last axis in float32
with eps 1e-6 and no learned ln params (adaLN-zero supplies the affine), then
``y * (1 + scale[:, None]) + shift[:, None]``.

The reference library has no model layer (SURVEY.md §2.0); this op belongs to
the TPU-native model extension.

Gradients: ``jax.custom_vjp`` whose backward differentiates the eager
composition — same memory as a remat'd layernorm, exact to reduction order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_EPS = 1e-6


def adaln_reference(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    "Eager composition: the kernel's oracle and backward body."
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + _EPS)
    y = y * (1.0 + scale.astype(jnp.float32)[:, None]) + shift.astype(jnp.float32)[:, None]
    return y.astype(x.dtype)


def _adaln_kernel(x_ref, shift_ref, scale_ref, o_ref):
    # shift/scale arrive viewed (B, 1, D) so their (1, 1, D) block satisfies
    # Mosaic's tiling rule (a (1, D) block of a (B, D) array does not, and
    # dynamic sublane indexing can't be proven aligned)
    x32 = x_ref[0].astype(jnp.float32)  # (block_n, D)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    centered = x32 - mean
    var = jnp.mean(centered * centered, axis=1, keepdims=True)
    y = centered * jax.lax.rsqrt(var + _EPS)
    y = y * (1.0 + scale_ref[0].astype(jnp.float32)) + shift_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def adaln_forward(
    x: jax.Array, shift: jax.Array, scale: jax.Array, block_n: int = 256, interpret: bool = False
) -> jax.Array:
    """``(B, N, D), (B, D), (B, D) -> (B, N, D)`` in one HBM pass.

    ``D`` must be a multiple of 128 (the full feature row lives on the lane
    axis of one tile so the mean/var reduction is a single in-register pass);
    ``N`` must divide by ``block_n``."""
    B, N, D = x.shape
    block_n = min(block_n, N)
    if D % _LANE or N % block_n:
        raise ValueError(f"adaln kernel needs D % 128 == 0 and N % block_n == 0, got {x.shape}, block_n={block_n}")
    mod_spec = pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _adaln_kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        grid=(B, N // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            mod_spec,
            mod_spec,
        ],
        out_specs=pl.BlockSpec((1, block_n, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, shift.reshape(B, 1, D), scale.reshape(B, 1, D))


def _adaln_bwd_kernel(x_ref, g_ref, scale_ref, dx_ref, dsh_ref, dsc_ref):
    """One-pass adaLN backward: recompute the row statistics, emit dx for
    this token tile and accumulate dshift/dscale across tiles (the (1, 1, D)
    output blocks stay resident in VMEM while the grid walks the token axis
    and flush once per batch row)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dsh_ref[0] = jnp.zeros_like(dsh_ref[0])
        dsc_ref[0] = jnp.zeros_like(dsc_ref[0])

    x32 = x_ref[0].astype(jnp.float32)  # (block_n, D)
    g32 = g_ref[0].astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    centered = x32 - mean
    var = jnp.mean(centered * centered, axis=1, keepdims=True)
    inv_std = jax.lax.rsqrt(var + _EPS)
    xhat = centered * inv_std

    dxhat = g32 * (1.0 + scale_ref[0].astype(jnp.float32))
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx_ref[0] = ((dxhat - m1 - xhat * m2) * inv_std).astype(dx_ref.dtype)

    dsh_ref[0] += jnp.sum(g32, axis=0, keepdims=True)
    dsc_ref[0] += jnp.sum(g32 * xhat, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def adaln_backward(
    x: jax.Array, g: jax.Array, scale: jax.Array, block_n: int = 256, interpret: bool = False
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """``(dx, dshift, dscale)`` from the upstream cotangent ``g``.

    One read of x and g, one write of dx, per-(B,D) reductions accumulated
    in VMEM — the eager vjp costs ~0.73 ms of the 8 ms train step across
    the DiT's 17 call sites (scripts/profile_train.py); this kernel does
    the whole backward at streaming bandwidth."""
    B, N, D = x.shape
    block_n = min(block_n, N)
    if D % _LANE or N % block_n:
        raise ValueError(f"adaln backward needs D % 128 == 0 and N % block_n == 0, got {x.shape}")
    tile = pl.BlockSpec((1, block_n, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    dx, dsh, dsc = pl.pallas_call(
        _adaln_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
        ),
        grid=(B, N // block_n),
        in_specs=[tile, tile, row],
        out_specs=(tile, row, row),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, g, scale.reshape(B, 1, D))
    return dx, dsh.reshape(B, D), dsc.reshape(B, D)


def _adaln_local(x: jax.Array, shift: jax.Array, scale: jax.Array, interpret: bool) -> jax.Array:
    "Kernel on one shard: adapt block_n to the (possibly shard-local) N."
    _B, N, D = x.shape
    block_n = next((b for b in (256, 128, 64, 32, 16, 8) if N % b == 0), None)
    if D % _LANE or block_n is None:
        return adaln_reference(x, shift, scale)
    return adaln_forward(x, shift, scale, block_n=block_n, interpret=interpret)


@functools.cache
def _adaln_spmd(interpret: bool):
    """SPMD wrapper: batch AND token axes shard (the op is per-token), the
    feature axis must be replicated (the mean/var reduce over it).  Without
    this, XLA replicates the opaque pallas custom call — which would also
    forcibly gather ring/sp-sharded token axes."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def fn(x, shift, scale):
        return _adaln_local(x, shift, scale, interpret)

    cp = custom_partitioning(fn)

    def _shardings(x_sharding):
        spec = getattr(x_sharding, "spec", None)
        batch = spec[0] if spec is not None and len(spec) else None
        token = spec[1] if spec is not None and len(spec) > 1 else None
        mesh = x_sharding.mesh
        x_s = NamedSharding(mesh, P(batch, token, None))
        mod_s = NamedSharding(mesh, P(batch, None))
        return x_s, mod_s

    def partition(mesh, arg_shapes, result_shape):
        x_s, mod_s = _shardings(arg_shapes[0].sharding)
        return mesh, fn, x_s, (x_s, mod_s, mod_s)

    def infer(mesh, arg_shapes, shape):
        return _shardings(arg_shapes[0].sharding)[0]

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b n d, b d, b d -> b n d",
        need_replication_factors=("d",),
    )
    return jax.jit(cp)


@jax.custom_vjp
def _adaln_vjp(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    return _adaln_spmd(jax.default_backend() != "tpu")(x, shift, scale)


def _adaln_fwd(x, shift, scale):
    return _adaln_vjp(x, shift, scale), (x, shift, scale)


def _adaln_bwd_local(x: jax.Array, g: jax.Array, scale: jax.Array, interpret: bool):
    _B, N, D = x.shape
    # VMEM cap: the kernel holds ~5 f32 temporaries + 3 io tiles per block
    # (~24 B/elem); at D=3072 an unconditional block of 256 tokens is 16.2 MB
    # of scoped vmem — past the 16 MB limit (measured: Flux-width adaLN
    # backward under the "dots" remat policy).  Budget 12 MB.
    max_block = (12 * 2**20) // (24 * D)
    block_n = next((b for b in (256, 128, 64, 32, 16, 8) if N % b == 0 and b <= max_block), None)
    if D % _LANE or block_n is None:
        _, vjp = jax.vjp(lambda xx, sc: adaln_reference(xx, jnp.zeros_like(sc), sc), x, scale)
        dx, dsc = vjp(g)
        return dx, jnp.sum(g.astype(jnp.float32), axis=1), dsc.astype(jnp.float32)
    return adaln_backward(x, g, scale, block_n=block_n, interpret=interpret)


@functools.cache
def _adaln_bwd_spmd(interpret: bool):
    """SPMD wrapper for the backward kernel: batch shards, token and feature
    axes replicated (dshift/dscale reduce over tokens — a sharded token axis
    would need a cross-shard reduction the single-chip kernel doesn't do, so
    the partitioner gathers instead; sp-model training keeps correctness)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def fn(x, g, scale):
        return _adaln_bwd_local(x, g, scale, interpret)

    cp = custom_partitioning(fn)

    def _shard(named, ndim):
        spec = getattr(named, "spec", None)
        batch = spec[0] if spec is not None and len(spec) else None
        return NamedSharding(named.mesh, P(batch, *([None] * (ndim - 1))))

    def partition(mesh, arg_shapes, result_shape):
        s0 = arg_shapes[0].sharding
        return (
            mesh,
            fn,
            (_shard(s0, 3), _shard(s0, 2), _shard(s0, 2)),
            (_shard(s0, 3), _shard(s0, 3), _shard(s0, 2)),
        )

    def infer(mesh, arg_shapes, shape):
        s0 = arg_shapes[0].sharding
        return (_shard(s0, 3), _shard(s0, 2), _shard(s0, 2))

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b n d, b n d, b d -> b n d, b d, b d",
        need_replication_factors=("n", "d"),
    )
    return jax.jit(cp)


def _adaln_bwd(residuals, g):
    x, shift, scale = residuals
    if jax.default_backend() != "tpu":
        # eager vjp off-TPU: interpret-mode kernels would slow CPU tests;
        # the kernel is covered by direct interpret-mode equivalence tests
        _, vjp = jax.vjp(adaln_reference, x, shift, scale)
        return vjp(g)
    dx, dsh, dsc = _adaln_bwd_spmd(False)(x, g, scale)
    return dx, dsh.astype(shift.dtype), dsc.astype(scale.dtype)


_adaln_vjp.defvjp(_adaln_fwd, _adaln_bwd)


def adaln_modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """Fused ``modulate(layernorm(x), shift, scale)`` with exact gradients.

    Shapes the kernel can't tile fall back to the eager composition
    (trace-time dispatch; shapes are static under jit); under a sharded jit
    the op partitions over batch and token axes (see ``_adaln_spmd``), and
    a shard-local token count the kernel can't tile falls back per-shard."""
    _B, N, D = x.shape
    if D % _LANE or all(N % b for b in (256, 128, 64, 32, 16, 8)):
        return adaln_reference(x, shift, scale)
    return _adaln_vjp(x, shift, scale)
