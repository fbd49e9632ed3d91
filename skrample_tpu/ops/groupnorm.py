"""Fused GroupNorm(+affine)(+SiLU) for channels-last activations as a
Pallas kernel.

The UNet ablation profiler (``scripts/profile_unet.py``) attributes 742 us
of the 2147 us base=128 forward (35%) to GroupNorm: the grouped mean/var
reductions break XLA's elementwise fusion, so every norm makes multiple
float32 HBM round-trips, and the following SiLU is yet another pass.  A
UNet activation slice per batch element is small — (H*W, C) is at most a
couple of MB at latent resolutions — so this kernel loads the whole slice
into VMEM once, computes the grouped statistics, normalizes, applies the
optional learned affine and SiLU, and writes once: one read + one write of
the input dtype total.

Grouped statistics on the lane axis: channels live on the 128-wide lane
dimension, and a group's 8-32 channels do not align with any vector tile.
Instead of lane-axis reshapes the kernel reduces rows to per-channel
sums (a fast sublane reduction) and then applies a constant ``(C, C)``
group-averaging matrix on the MXU — ``M[i, j] = 1/(N * C/g)`` when i and j
share a group — which both reduces channel sums to group means AND
broadcasts them back per channel in a single tiny matmul.  Variance uses
the centered two-pass form (matching the eager ``x.var``'s numerics, not
the catastrophic-cancellation-prone ``E[x^2] - mu^2``).

Affine semantics: imported checkpoint families (AutoencoderKL, the
conditional UNet) carry learned scale/bias; these apply IN FLOAT32 before
the optional SiLU inside the kernel, so bf16 activations round exactly
once — matching the eager NCHW path's numerics.  ``eps`` follows the
caller's family convention (1e-6 VAE/UNet, 1e-5 conditional UNet).

Gradients: ``jax.custom_vjp`` whose backward differentiates the eager
composition (including d/dscale and d/dbias — the affine is trainable) —
same memory as a remat'd groupnorm, exact to reduction order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_EPS = 1e-6
# per-sample f32 working set cap for the whole-slice kernel (VMEM is ~16 MB/core)
_MAX_SLICE_BYTES = 6 * 1024 * 1024


def groupnorm_reference(
    x: jax.Array,
    groups: int,
    fuse_silu: bool = False,
    eps: float = _EPS,
    scale: jax.Array | None = None,
    bias: jax.Array | None = None,
) -> jax.Array:
    "(B, N, C) eager oracle: f32 grouped norm (+ affine) (+ SiLU)."
    B, N, C = x.shape
    x32 = x.astype(jnp.float32).reshape(B, N, groups, C // groups)
    mean = x32.mean((1, 3), keepdims=True)
    var = x32.var((1, 3), keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(B, N, C)
    if scale is not None:
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if fuse_silu:
        y = jax.nn.silu(y)
    return y.astype(x.dtype)


def groupnorm_eager_bign(
    x: jax.Array,
    groups: int,
    fuse_silu: bool = False,
    eps: float = _EPS,
    scale: jax.Array | None = None,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Three-HBM-pass eager grouped norm for slices too big for the kernel.

    The centered reference is 4+ passes (mean reduce, then a centered
    variance reduce that DEPENDS on the mean, then normalize): at the video
    VAE's finest decode level ((16, 512*512, 64) — far past the whole-slice
    kernel's VMEM cap) that eager chain was 45% of decode time.  Here the
    sum and sum-of-squares reduce in ONE pass (sibling multi-output fusion —
    neither depends on the other), and normalize(+affine)(+SiLU) is the
    second read + only write: 3 passes total, the floor for any
    separately-computed norm.  Variance is the uncentered ``E[x^2] - mu^2``
    in f32 — fine for post-conv activation scales (|x| ~ O(10)); the
    whole-slice kernel keeps the centered form, and bf16 output rounding
    swallows the f32 stat difference (tested).

    Stats reduce over N per CHANNEL first — (B, C) — and only then combine
    channels into groups on the tiny (B, C) array: no lane-axis reshapes of
    the big tensor (the layout trap the whole-slice kernel's group-matmul
    also avoids)."""
    B, N, C = x.shape
    cg = C // groups
    x32 = x.astype(jnp.float32)
    s1 = jnp.sum(x32, axis=1)  # (B, C); fuses with s2 into one input pass
    s2 = jnp.sum(x32 * x32, axis=1)
    gs1 = s1.reshape(B, groups, cg).sum(-1)  # tiny group combine
    gs2 = s2.reshape(B, groups, cg).sum(-1)
    cnt = float(N * cg)
    mean = gs1 / cnt
    var = jnp.maximum(gs2 / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, axis=-1)[:, None, :]  # (B, 1, C)
    inv_c = jnp.repeat(inv, cg, axis=-1)[:, None, :]
    y = (x32 - mean_c) * inv_c
    if scale is not None:
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if fuse_silu:
        y = y * jax.lax.logistic(y)
    return y.astype(x.dtype)


def _group_matrix(C: int, groups: int, N: int) -> np.ndarray:
    "M[i, j] = 1/(N * C/g) iff channel i and j share a group: sums -> broadcast means."
    c = C // groups
    M = np.zeros((C, C), np.float32)
    for g in range(groups):
        M[g * c : (g + 1) * c, g * c : (g + 1) * c] = 1.0 / (N * c)
    return M


def _groupnorm_kernel(x_ref, m_ref, s_ref, b_ref, o_ref, *, fuse_silu: bool, eps: float, affine: bool):
    x32 = x_ref[0].astype(jnp.float32)  # (N, C)
    M = m_ref[...]  # (C, C) group-averaging matrix
    ch_sum = jnp.sum(x32, axis=0, keepdims=True)  # (1, C) sublane reduce
    mean = jax.lax.dot(ch_sum, M, preferred_element_type=jnp.float32)  # (1, C): group mean per channel
    centered = x32 - mean
    ch_sq = jnp.sum(centered * centered, axis=0, keepdims=True)
    var = jax.lax.dot(ch_sq, M, preferred_element_type=jnp.float32)
    y = centered * jax.lax.rsqrt(var + eps)
    if affine:
        y = y * s_ref[...] + b_ref[...]  # (1, C) f32, before any SiLU
    if fuse_silu:
        y = y * jax.lax.logistic(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "fuse_silu", "interpret", "eps", "affine"))
def groupnorm_forward(
    x: jax.Array,
    groups: int,
    fuse_silu: bool = False,
    interpret: bool = False,
    eps: float = _EPS,
    scale: jax.Array | None = None,
    bias: jax.Array | None = None,
    affine: bool | None = None,
) -> jax.Array:
    """``(B, N, C) -> (B, N, C)`` grouped norm (+affine) (+SiLU) in one HBM pass.

    ``C`` must be a multiple of 128 and divisible by ``groups``; the whole
    ``(N, C)`` slice of one batch element must fit the f32 VMEM budget
    (callers gate on :func:`fits_kernel`)."""
    B, N, C = x.shape
    if C % _LANE or C % groups:
        raise ValueError(f"groupnorm kernel needs C % 128 == 0 and C % groups == 0, got C={C}, groups={groups}")
    affine = (scale is not None) if affine is None else affine
    s = jnp.ones((1, C), jnp.float32) if scale is None else scale.astype(jnp.float32).reshape(1, C)
    b = jnp.zeros((1, C), jnp.float32) if bias is None else bias.astype(jnp.float32).reshape(1, C)
    M = jnp.asarray(_group_matrix(C, groups, N))
    return pl.pallas_call(
        functools.partial(_groupnorm_kernel, fuse_silu=fuse_silu, eps=eps, affine=affine),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x, M, s, b)


def fits_kernel(n: int, c: int) -> bool:
    "Whole-slice f32 working set (x32 + centered + out) within the VMEM cap."
    return 3 * 4 * n * c <= _MAX_SLICE_BYTES and c % _LANE == 0


@functools.cache
def _groupnorm_spmd(groups: int, fuse_silu: bool, interpret: bool, eps: float, affine: bool):
    """SPMD wrapper: the batch axis shards; token and channel axes (and the
    tiny affine vectors) must be replicated — statistics reduce over both.
    Without this XLA replicates the opaque pallas custom call under a
    sharded jit."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def fn(x, s, b):
        return groupnorm_forward(x, groups, fuse_silu, interpret, eps, s, b, affine=affine)

    cp = custom_partitioning(fn)

    def _shard(named):
        spec = getattr(named, "spec", None)
        batch = spec[0] if spec is not None and len(spec) else None
        return NamedSharding(named.mesh, P(batch, None, None))

    def _rep(named, ndim=1):
        return NamedSharding(named.mesh, P(*([None] * ndim)))

    def partition(mesh, arg_shapes, result_shape):
        s = _shard(arg_shapes[0].sharding)
        reps = tuple(_rep(a.sharding, len(a.shape)) for a in arg_shapes[1:])
        return mesh, fn, (s, *reps), s

    def infer(mesh, arg_shapes, shape):
        return _shard(arg_shapes[0].sharding)

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b n c, c, c -> b n c",
        need_replication_factors=("n", "c"),
    )
    return jax.jit(cp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _groupnorm_vjp(
    x: jax.Array, scale: jax.Array, bias: jax.Array, groups: int, fuse_silu: bool, eps: float, affine: bool
) -> jax.Array:
    return _groupnorm_spmd(groups, fuse_silu, jax.default_backend() != "tpu", eps, affine)(x, scale, bias)


def _groupnorm_fwd(x, scale, bias, groups, fuse_silu, eps, affine):
    return _groupnorm_vjp(x, scale, bias, groups, fuse_silu, eps, affine), (x, scale, bias)


def _groupnorm_bwd(groups, fuse_silu, eps, affine, res, g):
    x, scale, bias = res

    def ref(xx, ss, bb):
        return groupnorm_reference(
            xx, groups, fuse_silu, eps, ss if affine else None, bb if affine else None
        )

    _, vjp = jax.vjp(ref, x, scale, bias)
    return vjp(g)


_groupnorm_vjp.defvjp(_groupnorm_fwd, _groupnorm_bwd)


def groupnorm_cl(
    x: jax.Array,
    groups: int,
    fuse_silu: bool = False,
    eps: float = _EPS,
    scale: jax.Array | None = None,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Fused grouped norm (+learned affine) (+SiLU) over a channels-last
    ``(B, H, W, C)`` or ``(B, N, C)`` activation, with exact gradients
    (including d/dscale, d/dbias).

    Off-TPU and for shapes outside the kernel's envelope this is the eager
    composition (trace-time dispatch; shapes are static under jit), so CPU
    runs stay bit-identical to the NCHW path.  The affine applies in f32
    before the SiLU — one rounding to the activation dtype total."""
    shape = x.shape
    B, C = shape[0], shape[-1]
    n = x.size // (B * C)
    if jax.default_backend() != "tpu" or not fits_kernel(n, C) or C % groups:
        # slices past the kernel's VMEM envelope take the 3-pass eager path
        # on TPU (uncentered f32 stats; the video VAE's finest decode levels
        # live here); CPU stays the centered reference, bit-identical to the
        # NCHW path
        big = jax.default_backend() == "tpu" and not fits_kernel(n, C) and C % groups == 0
        fn = groupnorm_eager_bign if big else groupnorm_reference
        y = fn(x.reshape(B, n, C), groups, fuse_silu, eps, scale, bias)
        return y.reshape(shape)
    affine = scale is not None
    s = jnp.ones((C,), jnp.float32) if scale is None else scale
    b = jnp.zeros((C,), jnp.float32) if bias is None else bias
    return _groupnorm_vjp(x.reshape(B, n, C), s, b, groups, fuse_silu, eps, affine).reshape(shape)
