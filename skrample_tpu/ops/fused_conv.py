"""Norm-into-conv fused kernels for the video VAE's bandwidth-bound decode.

The round-4 attribution (BASELINE.md video rows) showed causal VideoVAE
decode at 12.3% MFU with GroupNorm alone taking 45% of the time — and each
GN pass already running at ~85% of HBM peak.  The fix is FEWER passes, not
faster ones: this module removes the norm as a standalone HBM pass
entirely.

Two Pallas kernels, both of which

* apply ``GroupNorm -> SiLU`` **on their input read** — the normalized
  tensor never exists in HBM.  The (mean, 1/sigma) statistics arrive as a
  tiny per-(sample[, frame]) side input;
* emit the **raw channel statistics of their own output** (sum and
  sum-of-squares per channel) from the output epilogue — so the NEXT
  fused conv can normalize on ITS input read without any stats pass.
  ``finalize_group_stats`` turns raw sums into per-channel (mean, 1/sigma)
  under the caller's group count (an O(C) op);
* optionally add a residual input in the epilogue (the resblock skip),
  BEFORE the stats are taken — the stats describe the tensor the next
  GroupNorm actually sees.

Kernels:

* :func:`conv3x3_gn_silu` — spatial SAME conv on channels-last
  ``(N, H, W, C)``.  The grid walks (sample, row-tile); the halo arrives
  as two 1-row sliver BlockSpecs with edge-clamped index maps (manual DMA
  is out: Mosaic requires DMA slice offsets on the tiled dims to be
  tile-aligned, which a 1-column shift or a 64-lane array cannot satisfy),
  the kernel normalizes, masks the SAME-padding border to zero *after*
  the norm (matching ``conv(gn_silu(x))``, whose conv pads the normalized
  tensor), and accumulates the nine taps as shifted
  ``(Th*(W+2), C) @ (C, Co)`` matmuls on the MXU.
* :func:`tconv_causal_gn_silu` — the causal temporal conv
  (``models/video_vae._tconv`` semantics) on ``(B, T, S, C)`` with frames
  resident per block: taps become frame-shifted matmuls of one flattened
  ``(T*Ts, C)`` buffer with a zero left-pad (causality), and the
  decoder's frame-repeat upsample folds into the input read
  (``repeat_in=2``) instead of a ``jnp.repeat`` HBM pass.

Gradients: ``jax.custom_vjp`` differentiating the eager composition, the
same recipe as ``ops/groupnorm.py`` — decode is the serving-critical path;
training (``VideoVAE.loss``) gets exact-to-reduction-order grads at remat
cost.

Reference anchor: the reference drives exactly this workload shape through
its wrappers (5-D latents ride untouched, /root/reference/tests/
diffusers_pipes.py:221) but ships no pixel bridge; the fused decode is the
TPU-native completion of that gap (SURVEY §2.0's build consequence: Pallas
where XLA's lowering loses — XLA cannot fuse producers into conv operands).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 6 * 1024 * 1024


# ---------------------------------------------------------------------------
# statistics plumbing


def channel_stats(x: jax.Array, sample_dims: int = 1) -> jax.Array:
    """Raw per-channel stats of ``x`` with XLA: ``(..., 2, C)`` [sum, sumsq].

    ``sample_dims`` leading dims index the statistics domain (1 for
    ``(N, ..., C)`` spatial tensors, 2 for ``(B, T, ..., C)`` temporal
    ones).  One read of ``x``, tiny write — used to seed the stats chain at
    tensors produced by non-fused ops (the decoder's in_conv)."""
    lead = x.shape[:sample_dims]
    C = x.shape[-1]
    x32 = x.reshape(*lead, -1, C).astype(jnp.float32)
    return jnp.stack([x32.sum(-2), (x32 * x32).sum(-2)], axis=-2)


def finalize_group_stats(
    raw: jax.Array,
    groups: int,
    count: int,
    eps: float = 1e-6,
    scale: jax.Array | None = None,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Raw ``(..., 2, C)`` [sum, sumsq] -> ``(..., 2, C)`` [mean, inv].

    ``count`` is the number of elements each channel's sums ran over (the
    spatial extent); group statistics pool ``C // groups`` adjacent
    channels, and mean/inv broadcast back per channel — all on an O(C)
    tensor.  Variance is the uncentered f32 form (see
    ``groupnorm_eager_bign``).

    A learned GroupNorm affine (AutoencoderKL checkpoints) FOLDS into the
    pair — ``(x - mean)*inv*g + b == (x - mean')*inv'`` with
    ``inv' = inv*g`` and ``mean' = mean - b/inv'`` — so the fused kernels
    apply it for free.  Pass the per-channel ``scale``/``bias``."""
    C = raw.shape[-1]
    cg = C // groups
    lead = raw.shape[:-2]
    g1 = raw[..., 0, :].reshape(*lead, groups, cg).sum(-1)
    g2 = raw[..., 1, :].reshape(*lead, groups, cg).sum(-1)
    n = float(count * cg)
    mean = g1 / n
    var = jnp.maximum(g2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    rep = lambda a: jnp.repeat(a, cg, axis=-1)  # noqa: E731
    mean_c, inv_c = rep(mean), rep(inv)
    if scale is not None:
        inv_a = inv_c * scale.astype(jnp.float32)
        mean_c = mean_c - bias.astype(jnp.float32) / inv_a
        inv_c = inv_a
    return jnp.stack([mean_c, inv_c], axis=-2)


def _normalize_silu(x32: jax.Array, mean: jax.Array, inv: jax.Array) -> jax.Array:
    y = (x32 - mean) * inv
    return y * jax.lax.logistic(y)


# ---------------------------------------------------------------------------
# spatial 3x3 fused conv


def _conv3x3_kernel(
    x_ref,
    top_ref,
    bot_ref,
    w_ref,
    b_ref,
    stats_ref,
    res_ref,
    o_ref,
    os_ref,
    *,
    H: int,
    W: int,
    C: int,
    Co: int,
    Th: int,
    apply_gn: bool,
    has_residual: bool,
):
    ht = pl.program_id(1)
    dtype = x_ref.dtype

    # -- halo assembly, all in the VALUE domain (no manual DMA: Mosaic
    # requires DMA slice offsets/sizes on the tiled dims to be tile-aligned,
    # which a 1-column shift or a 64-lane array cannot satisfy).  The two
    # 1-row halo slivers arrive via their own BlockSpecs whose index maps
    # CLAMP at the image edge (see _conv3x3_fused); the absolute-row mask
    # below zeroes the duplicated content there, so clamping is harmless.
    # Window rows: [ht*Th - 1, ht*Th + Th + 1), plus one extra zero row so
    # every dy's (Th+1)-row flatten slab is in bounds (its content only
    # ever reaches discarded border outputs).
    window = jnp.concatenate([top_ref[0], x_ref[0], bot_ref[0]], axis=0)  # (Th+2, W, C)
    r0 = ht * Th - 1

    mean = stats_ref[0, 0].astype(jnp.float32)
    inv = stats_ref[0, 1].astype(jnp.float32)
    w32 = window.astype(jnp.float32)
    y = _normalize_silu(w32, mean, inv) if apply_gn else w32
    rio = jax.lax.broadcasted_iota(jnp.int32, (Th + 2, W, 1), 0) + r0
    y = jnp.where((rio >= 0) & (rio < H), y, 0.0).astype(dtype)
    # two zero-pad columns at the END: they double as the LEFT pad of the
    # next row's w=0 tap once flattened (see the slice offsets below)
    y = jnp.concatenate([y, jnp.zeros((Th + 2, 2, C), dtype)], axis=1)
    y = jnp.concatenate([y, jnp.zeros((1, W + 2, C), dtype)], axis=0)  # (Th+3, W+2, C)

    # -- nine taps as shifted flat matmuls; SAME padding = zero AFTER norm.
    # ONE padded flat buffer serves all nine taps (per-dy copies blew the
    # Mosaic value stack at the fine levels): output q = h*(W+2) + w
    # (w in [0, W)) with tap (dy, dx) reads flat position
    # (dy+1)*(W+2) + q + dx - 1 of [one zero row ++ the flattened window].
    flat = jnp.concatenate([jnp.zeros((W + 2, C), dtype), y.reshape((Th + 3) * (W + 2), C)], axis=0)
    acc = jnp.zeros((Th * (W + 2), Co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            base = (dy + 1) * (W + 2) + dx - 1
            acc += jax.lax.dot_general(
                flat[base : base + Th * (W + 2)],
                w_ref[dy, dx].astype(dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    out = (acc + b_ref[0].astype(jnp.float32)).reshape(Th, W + 2, Co)[:, :W]
    if has_residual:
        out = out + res_ref[0].astype(jnp.float32)
    outc = out.astype(o_ref.dtype)
    o_ref[0] = outc

    # -- epilogue: raw channel stats of the (rounded) output for the next GN
    @pl.when(ht == 0)
    def _():
        os_ref[...] = jnp.zeros_like(os_ref)

    o32 = outc.astype(jnp.float32)
    os_ref[0, 0, :] += jnp.sum(o32, axis=(0, 1))
    os_ref[0, 1, :] += jnp.sum(o32 * o32, axis=(0, 1))


def _pick_th(H: int, W: int, C: int, Co: int, itemsize: int) -> int:
    """Largest row tile whose Mosaic value stack fits scoped VMEM.

    Empirically calibrated on-chip: the (Th=32, W=128, C=Co=64, bf16)
    instance reported a 16.3 MB scoped allocation — ~32x the naive
    Th*W*C*itemsize block size (double-buffered in/out/residual blocks,
    the f32 normalize copy, the padded flat buffer, the f32 accumulator,
    and Mosaic's inability to alias across the concats).  The single
    shared flat buffer cut several copies; the multiplier below keeps a
    conservative margin under the 16 MB scoped limit."""
    per_row = 24 * W * max(C, Co) * max(itemsize, 2)
    for th in (64, 32, 16, 8, 4, 2):
        if H % th:
            continue
        if th * per_row <= 13 * 1024 * 1024:
            return th
    return 0


def conv3x3_ref(x, w, b, stats, residual, apply_gn: bool):
    "Eager oracle: conv(gn_silu(x)) + b (+ residual), plus raw output stats."
    dtype = x.dtype
    if apply_gn:
        mean = stats[:, None, None, 0, :]
        inv = stats[:, None, None, 1, :]
        xin = _normalize_silu(x.astype(jnp.float32), mean, inv).astype(dtype)
    else:
        xin = x
    out = jax.lax.conv_general_dilated(
        xin,
        w.astype(dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = out + b.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    outc = out.astype(dtype)
    return outc, channel_stats(outc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _conv3x3_fused(x, w, b, stats, residual, apply_gn: bool, has_residual: bool, interpret: bool):
    N, H, W, C = x.shape
    Co = w.shape[-1]
    Th = _pick_th(H, W, C, Co, x.dtype.itemsize)
    if Th == 0:
        return conv3x3_ref(x, w, b, stats, residual if has_residual else None, apply_gn)
    res = residual
    rt, rw = (Th, W) if has_residual else (1, 1)
    # halo slivers: 1-row blocks at (ht*Th - 1) and ((ht+1)*Th), index maps
    # CLAMPED into range — the kernel's absolute-row mask zeroes the
    # duplicated edge content, so clamping is exact
    top_spec = pl.BlockSpec((1, 1, W, C), lambda n, h: (n, jnp.maximum(h * Th - 1, 0), 0, 0))
    bot_spec = pl.BlockSpec((1, 1, W, C), lambda n, h: (n, jnp.minimum((h + 1) * Th, H - 1), 0, 0))
    out, raw = pl.pallas_call(
        functools.partial(
            _conv3x3_kernel, H=H, W=W, C=C, Co=Co, Th=Th, apply_gn=apply_gn, has_residual=has_residual
        ),
        grid=(N, H // Th),
        in_specs=[
            pl.BlockSpec((1, Th, W, C), lambda n, h: (n, h, 0, 0)),
            top_spec,
            bot_spec,
            pl.BlockSpec((3, 3, C, Co), lambda n, h: (0, 0, 0, 0)),
            pl.BlockSpec((1, Co), lambda n, h: (0, 0)),
            pl.BlockSpec((1, 2, C), lambda n, h: (n, 0, 0)),
            pl.BlockSpec((1, rt, rw, Co), lambda n, h: (n, h, 0, 0) if rt > 1 else (n, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Th, W, Co), lambda n, h: (n, h, 0, 0)),
            pl.BlockSpec((1, 2, Co), lambda n, h: (n, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W, Co), x.dtype),
            jax.ShapeDtypeStruct((N, 2, Co), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x, x, x, w, b.reshape(1, Co), stats, res)
    return out, raw


def _conv3x3_fwd(x, w, b, stats, residual, apply_gn, has_residual, interpret):
    out = _conv3x3_fused(x, w, b, stats, residual, apply_gn, has_residual, interpret)
    return out, (x, w, b, stats, residual)


def _conv3x3_bwd(apply_gn, has_residual, interpret, saved, g):
    x, w, b, stats, residual = saved

    def ref(xx, ww, bb, ss, rr):
        return conv3x3_ref(xx, ww, bb, ss, rr if has_residual else None, apply_gn)

    _, vjp = jax.vjp(ref, x, w, b, stats, residual)
    dx, dw, db, ds, dr = vjp(g)
    if not has_residual:
        dr = jnp.zeros_like(residual)
    return dx, dw, db, ds, dr


_conv3x3_fused.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv3x3_gn_silu(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    stats: jax.Array | None = None,
    residual: jax.Array | None = None,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused ``conv3x3(SAME)( silu(groupnorm(x)) ) + b (+ residual)``.

    ``x``: channels-last ``(N, H, W, C)``.  ``w``: HWIO ``(3, 3, C, Co)``.
    ``stats``: per-sample per-channel ``(N, 2, C)`` f32 [mean, inv] from
    :func:`finalize_group_stats` — pass ``None`` to skip the input norm
    (plain conv with a stats epilogue).  Returns ``(out, raw_stats)`` where
    ``raw_stats`` is ``(N, 2, Co)`` [sum, sumsq] of the output — feed it to
    the next call via :func:`finalize_group_stats`.  Falls back to the
    eager composition off-TPU shapes the tile picker rejects."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, _H, _W, C = x.shape
    Co = w.shape[-1]
    apply_gn = stats is not None
    if stats is None:
        stats = jnp.zeros((N, 2, C), jnp.float32)
    has_residual = residual is not None
    res = residual if has_residual else jnp.zeros((N, 1, 1, Co), x.dtype)
    return _conv3x3_fused(x, w, b, stats, res, apply_gn, has_residual, interpret)


# ---------------------------------------------------------------------------
# causal temporal fused conv


def _tconv_kernel(
    x_ref,
    w_ref,
    b_ref,
    stats_ref,
    res_ref,
    o_ref,
    os_ref,
    *,
    k: int,
    T_in: int,
    rep: int,
    Ts: int,
    C: int,
    Co: int,
    apply_gn: bool,
    has_residual: bool,
):
    st = pl.program_id(1)
    dtype = x_ref.dtype
    T = T_in * rep

    x32 = x_ref[0].astype(jnp.float32)  # (T_in, Ts, C)
    if apply_gn:
        mean = stats_ref[0, :, 0, :][:, None, :]  # (T_in, 1, C)
        inv = stats_ref[0, :, 1, :][:, None, :]
        y = _normalize_silu(x32, mean, inv)
    else:
        y = x32
    y = y.astype(dtype)
    if rep > 1:
        # frame-repeat upsample folded into the read: out frame j reads j//rep
        y = jnp.broadcast_to(y[:, None], (T_in, rep, Ts, C)).reshape(T, Ts, C)

    # causal left pad in the FRAME axis: k-1 zero frames, then taps become
    # aligned row-shifted matmuls of one flat (T*Ts, C) buffer
    flat = y.reshape(T * Ts, C)
    buf = jnp.concatenate([jnp.zeros(((k - 1) * Ts, C), dtype), flat], axis=0)
    acc = jnp.zeros((T * Ts, Co), jnp.float32)
    for i in range(k):
        acc += jax.lax.dot_general(
            buf[i * Ts : i * Ts + T * Ts],
            w_ref[i].astype(dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = (acc + b_ref[0].astype(jnp.float32)).reshape(T, Ts, Co)
    if has_residual:
        out = out + res_ref[0].astype(jnp.float32)
    outc = out.astype(o_ref.dtype)
    o_ref[0] = outc

    @pl.when(st == 0)
    def _():
        os_ref[...] = jnp.zeros_like(os_ref)

    o32 = outc.astype(jnp.float32)
    os_ref[0, :, 0, :] += jnp.sum(o32, axis=1)
    os_ref[0, :, 1, :] += jnp.sum(o32 * o32, axis=1)


def _pick_ts(S: int, T: int, k: int, C: int, Co: int, itemsize: int) -> int:
    """Largest site tile whose Mosaic value stack fits scoped VMEM — the
    same conservative empirical multiplier as :func:`_pick_th` (double-
    buffered blocks, f32 normalize copy, padded flat, f32 accumulator)."""
    per_site = 24 * (T + k) * max(C, Co) * max(itemsize, 2)
    for ts in (2048, 1024, 512, 256, 128, 64):
        if S % ts:
            continue
        if ts * per_site <= 13 * 1024 * 1024:
            return ts
    return 0


def tconv_causal_ref(x, w, b, stats, residual, apply_gn: bool, rep: int):
    "Eager oracle mirroring models/video_vae._tconv on (B, T, S, C)."
    dtype = x.dtype
    if apply_gn:
        mean = stats[:, :, None, 0, :]
        inv = stats[:, :, None, 1, :]
        xin = _normalize_silu(x.astype(jnp.float32), mean, inv).astype(dtype)
    else:
        xin = x
    if rep > 1:
        xin = jnp.repeat(xin, rep, axis=1)
    k = w.shape[0]
    T = xin.shape[1]
    xp = jnp.pad(xin, ((0, 0), (k - 1, 0), (0, 0), (0, 0)))
    out = None
    for i in range(k):
        tap = jax.lax.dynamic_slice_in_dim(xp, i, T, axis=1)
        part = jnp.einsum("btsc,cd->btsd", tap, w[i].astype(dtype), preferred_element_type=jnp.float32)
        out = part if out is None else out + part
    out = out + b.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    outc = out.astype(dtype)
    return outc, channel_stats(outc, sample_dims=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _tconv_fused(x, w, b, stats, residual, apply_gn: bool, has_residual: bool, rep: int, interpret: bool):
    B, T_in, S, C = x.shape
    k, _, Co = w.shape
    T = T_in * rep
    Ts = _pick_ts(S, T, k, C, Co, x.dtype.itemsize)
    if Ts == 0:
        return tconv_causal_ref(x, w, b, stats, residual if has_residual else None, apply_gn, rep)
    res = residual
    rs = Ts if has_residual else 1
    out, raw = pl.pallas_call(
        functools.partial(
            _tconv_kernel,
            k=k,
            T_in=T_in,
            rep=rep,
            Ts=Ts,
            C=C,
            Co=Co,
            apply_gn=apply_gn,
            has_residual=has_residual,
        ),
        grid=(B, S // Ts),
        in_specs=[
            pl.BlockSpec((1, T_in, Ts, C), lambda bb, s: (bb, 0, s, 0)),
            pl.BlockSpec((k, C, Co), lambda bb, s: (0, 0, 0)),
            pl.BlockSpec((1, Co), lambda bb, s: (0, 0)),
            pl.BlockSpec((1, T_in, 2, C), lambda bb, s: (bb, 0, 0, 0)),
            pl.BlockSpec((1, T, rs, Co), lambda bb, s: (bb, 0, s, 0) if rs > 1 else (bb, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, T, Ts, Co), lambda bb, s: (bb, 0, s, 0)),
            pl.BlockSpec((1, T, 2, Co), lambda bb, s: (bb, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, S, Co), x.dtype),
            jax.ShapeDtypeStruct((B, T, 2, Co), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x, w, b.reshape(1, Co), stats, res)
    return out, raw


def _tconv_fwd(x, w, b, stats, residual, apply_gn, has_residual, rep, interpret):
    out = _tconv_fused(x, w, b, stats, residual, apply_gn, has_residual, rep, interpret)
    return out, (x, w, b, stats, residual)


def _tconv_bwd(apply_gn, has_residual, rep, interpret, saved, g):
    x, w, b, stats, residual = saved

    def ref(xx, ww, bb, ss, rr):
        return tconv_causal_ref(xx, ww, bb, ss, rr if has_residual else None, apply_gn, rep)

    _, vjp = jax.vjp(ref, x, w, b, stats, residual)
    dx, dw, db, ds, dr = vjp(g)
    if not has_residual:
        dr = jnp.zeros_like(residual)
    return dx, dw, db, ds, dr


_tconv_fused.defvjp(_tconv_fwd, _tconv_bwd)


def tconv_causal_gn_silu(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    stats: jax.Array | None = None,
    residual: jax.Array | None = None,
    repeat_in: int = 1,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused causal temporal conv: ``tconv( silu(groupnorm(x)) ) (+ residual)``.

    ``x``: ``(B, T, S, C)`` (callers flatten spatial dims into S).  ``w``:
    ``(k, C, Co)``.  ``stats``: ``(B, T, 2, C)`` f32 [mean, inv] per
    (sample, frame) — GroupNorm here is per-frame, preserving causality.
    ``repeat_in=2`` folds the decoder's frame-repeat temporal upsample into
    the input read (requires ``stats=None``, matching the decoder's un-normed
    ``tup``).  Returns ``(out, raw_stats)`` with ``raw_stats``
    ``(B, T*repeat_in, 2, Co)``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if repeat_in > 1 and stats is not None:
        raise ValueError("repeat_in > 1 is the un-normed tup path; stats must be None")
    B, T_in, _S, C = x.shape
    Co = w.shape[-1]
    apply_gn = stats is not None
    if stats is None:
        stats = jnp.zeros((B, T_in, 2, C), jnp.float32)
    has_residual = residual is not None
    res = residual if has_residual else jnp.zeros((B, T_in * repeat_in, 1, Co), x.dtype)
    return _tconv_fused(x, w, b, stats, res, apply_gn, has_residual, repeat_in, interpret)
