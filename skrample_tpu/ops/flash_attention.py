"""Flash attention (forward) as a Pallas TPU kernel.

The DiT's full attention materializes a ``(B, H, N, N)`` float32 score tensor
in HBM — at the serving benchmark's shape (B=4, H=8, N=1024) that is ~134 MB
written and re-read per transformer block, and the forward pass is
bandwidth-bound on it.  This kernel computes ``softmax(Q K^T / sqrt(d)) V``
with the online-softmax recurrence so scores only ever exist as one
``(block_q, block_k)`` tile in VMEM.

Reference semantics: the attention math itself mirrors the plain-einsum path
in ``models/dit.py`` (which is the equivalence oracle in
``tests/test_ops.py``); the reference library has no attention or model code
(SURVEY.md §2.0 — the model layer is a TPU-native extension).

Design (after jax.experimental.pallas.ops.tpu.flash_attention, re-derived):

* grid = (B*H, N_q/block_q, N_kv/block_k) with the KV dimension innermost
  and ``arbitrary`` (it is the softmax reduction); batch*head and Q tiles
  are ``parallel`` so the scheduler may spread them over megacores.
* running max ``m``, normalizer ``l`` and the **unnormalized** accumulator
  live in VMEM scratch, persisting across KV tiles of one Q tile; the
  division by ``l`` happens once on the final KV tile (lazy normalization).
* scores and all statistics are float32 regardless of the input dtype;
  the ``P @ V`` matmul casts P back to the value dtype for the MXU with a
  float32 ``preferred_element_type`` accumulator.
* ``block_k`` is fixed at 128 so the score tile width matches the lane
  count and the (block_q, 128) statistics tiles line up with it.

No masking: diffusion-transformer attention is bidirectional and unpadded
(token counts are multiples of 128 for every patch grid the models emit).

Gradients: the fused-qkv entry (:func:`flash_attention_qkv`, the model
path) runs a Pallas backward on TPU — score tiles recomputed in VMEM from
the forward's saved logsumexp, so attention memory is O(N) in training too
(the einsum vjp it replaces stores the (B, H, N, N) probabilities).  The
transposed entry (:func:`flash_attention`, the d<128 fallback) keeps the
einsum-vjp backward: exact, same footprint as a remat'd full attention.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _fit_block(n: int, target: int) -> int:
    """Largest multiple of 128 that divides ``n`` and is <= ``target``.

    The tuned defaults (bq512/bk1024) assume power-of-two token counts;
    joint-attention token axes (image + text, e.g. 1024 + 128 = 1152) need
    a divisor fit so the grid tiles exactly.  For ``n`` not a multiple of
    128 this bottoms out at 128 and the caller's divisibility check fires."""
    b = min(target, n)
    b -= b % _LANE
    while b > _LANE and n % b:
        b -= _LANE
    return max(b, _LANE)


_FULL_KV_ROW_MAX = 2048
_FULL_ROW_N_MAX = 5120
_SCORE_TILE_BUDGET = 6 << 20  # f32 score-tile bytes for the one-pass path


def _pick_blocks(n: int, block_q: int, block_k: int | None) -> tuple[int, int]:
    """Resolve ``(block_q, block_k)`` for token count ``n``.

    ``block_k=None`` (the auto default) prefers the one-pass full-row
    softmax whenever the f32 score tile fits VMEM comfortably, shrinking
    ``block_q`` to keep ``block_q * n * 4`` under the budget — measured at
    the Flux joint shape (N=4608, d=128, bf16): bq256/full-row 1804 us
    (0.73 of peak) vs the divisor-fit online path's bq512/bk1536 2238 us
    (0.59); bq1024/bk1536 2098, bq512/bk2304 2438, bq512/full-row 2019.
    The online recurrence pays per-tile max/alpha corrections on the VPU
    while the MXU idles, so one pass wins wherever it fits.  Explicit
    ``block_k`` requests keep the historical divisor-fit behavior so both
    kernel paths stay reachable (tests, tuning)."""
    bq = _fit_block(n, block_q)
    if block_k is None:
        # Single (N, N) tile beats every multi-tile split when it fits: one
        # grid step per (batch, head) removes all tile-stepping overhead.
        # Measured (v5e bf16, slope-timed): h=20 N=1024 d=128 84 -> 57 us
        # (0.68 -> 0.96 padded MFU); DiT-serve B4 h4 N1024 73 -> 58 us;
        # MMDiT joint N=1152 a wash within noise — no regression observed.
        if n % _LANE == 0 and n * n * 4 <= _SCORE_TILE_BUDGET:
            return n, n
        if n <= _FULL_ROW_N_MAX and n % _LANE == 0:
            full_bq = bq  # largest divisor block whose score tile fits the budget
            while full_bq > _LANE and full_bq * n * 4 > _SCORE_TILE_BUDGET:
                full_bq = _fit_block(n, full_bq - _LANE)
            if full_bq * n * 4 <= _SCORE_TILE_BUDGET:
                return full_bq, n
        block_k = 1024
    return bq, _fit_kv_block(n, block_k)


def _fit_kv_block(n: int, target: int) -> int:
    """KV-axis block fit: prefer the whole row over shrunken tiles.

    The measured tuning table (see :func:`flash_attention_forward`) shows
    large KV blocks win decisively — a full row drops the online-softmax
    scratch entirely, and small tiles pay more in grid stepping than they
    save (the MMDiT profiler measured the 384-wide divisor fit at N=1152
    running 2.3x slower per attention than the N=1024 full-row path).  So:
    honor an exact caller request, otherwise take the LARGEST 128-multiple
    divisor of ``n`` within the VMEM budget (a (512, 2048) f32 score tile is
    4 MB) even when it exceeds ``target`` — e.g. N=1152 -> 1152 (full row,
    one pass), N=4224 -> 1408 — and bottom out at 128 only when no larger
    divisor exists (then the caller's divisibility check still holds)."""
    if n <= target or n % target == 0:
        return min(target, n)
    b = min(n, _FULL_KV_ROW_MAX)
    b -= b % _LANE
    while b > _LANE and n % b:
        b -= _LANE
    return max(b, _LANE)


_NEG_INF = float("-inf")
_LOG2E = 1.4426950408889634  # scores are computed in the log2 domain: folding
_LN2 = 0.6931471805599453  # log2(e) into the score scale turns every exp into
# a native exp2 — one fewer VPU pass over each (block_q, block_k) tile (exp
# lowers as exp2(x * log2e), and the softmax shift makes the fold exact:
# exp2((s - m) in log2 units) equals exp(s - m) in natural units, so p, l and
# the outputs are the same values; only the saved max changes units, and the
# logsumexp converts back with one per-row multiply).


def attention_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Plain-einsum attention, (B, H, N, d) -> (B, H, N, d).

    The oracle for the Pallas kernel and the backward-pass body."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale: float, kv_blocks: int, kv_dim: int = 2):
    kv_i = pl.program_id(kv_dim)

    @pl.when(kv_i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)
    # scores tile, f32 on the MXU: (block_q, block_k)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * (scale * _LOG2E)  # log2-domain scores (see _LOG2E note)

    m_prev = m_ref[:, :1]  # (block_q, 1): lane 0 holds the running max
    l_prev = l_ref[:, :1]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)  # correction for prior tiles
    p = jnp.exp2(s - m_next)  # (block_q, block_k)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:, :1] = m_next
    l_ref[:, :1] = l_next

    v = v_ref[0]  # (block_k, d)
    o_curr = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + o_curr

    @pl.when(kv_i == kv_blocks - 1)
    def _store():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _softmax_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Single-KV-block case: the whole row of scores fits one VMEM tile, so
    plain max/exp/sum replaces the online recurrence (no scratch, one pass)."""
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * (scale * _LOG2E)
    p = jnp.exp2(s - jnp.max(s, axis=1, keepdims=True))
    v = v_ref[0]
    # lazy normalization: divide the (block_q, d) output, not the (block_q, N) tile
    o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.sum(p, axis=1, keepdims=True)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention_forward(
    q: jax.Array, k: jax.Array, v: jax.Array, block_q: int = 512, block_k: int | None = None, interpret: bool = False
) -> jax.Array:
    """(B, H, N, d) x3 -> (B, H, N, d) without materializing (N, N) scores.

    ``N`` must divide by ``block_q`` and ``block_k`` (both clamped to ``N``),
    which must divide by 128; ``d`` is unconstrained (the compiler pads the
    lane dimension when d < 128).  Large KV blocks amortize grid overhead —
    the (block_q, block_k) f32 score tile is the VMEM budget to watch
    (512 x 1024 x 4 = 2 MB); when one KV block covers the whole row the
    kernel drops the online-softmax scratch entirely.

    Defaults measured on a v5e at (4, 8, 1024, 64) bf16: 113 us/attention
    vs 397 us for the einsum path (3.5x) — bq512/bk1024 beat bq256 (152),
    bq1024 (122), and bk512 (288); a first cut with bq256/bk128 was
    *slower* than einsum (857) because 1024 tiny grid cells paid more in
    grid stepping than they saved in HBM traffic."""
    B, H, N, d = q.shape
    block_q, block_k = _pick_blocks(N, block_q, block_k)
    if N % block_q or N % block_k or block_q % _LANE or block_k % _LANE:
        raise ValueError(f"token count {N} must divide by block_q={block_q} and block_k={block_k} (multiples of 128)")

    bh = B * H
    qf = q.reshape(bh, N, d)
    kf = k.reshape(bh, N, d)
    vf = v.reshape(bh, N, d)
    kv_blocks = N // block_k

    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    if kv_blocks == 1:
        kernel = functools.partial(_softmax_kernel, scale=1.0 / math.sqrt(d))
        scratch = []
    else:
        kernel = functools.partial(_flash_kernel, scale=1.0 / math.sqrt(d), kv_blocks=kv_blocks)
        scratch = [
            pltpu.VMEM((block_q, _LANE), jnp.float32),  # running max m
            pltpu.VMEM((block_q, _LANE), jnp.float32),  # running normalizer l
            pltpu.VMEM((block_q, d), jnp.float32),  # unnormalized output accumulator
        ]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, N, d), q.dtype),
        grid=(bh, N // block_q, kv_blocks),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, N, d)


@functools.partial(jax.jit, static_argnames=("heads", "block_q", "block_k", "interpret"))
def flash_attention_packed_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    block_q: int = 512,
    block_k: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention on the **packed** ``(B, N, heads*d)`` layout.

    The transpose-based entry point costs four ``(B, N, H, d) <-> (B, H, N, d)``
    HBM round-trips per attention (the profiler attributed ~50 us/block of the
    DiT forward to them).  Here the head axis never materializes: the grid
    carries a head dimension and each BlockSpec slices head ``h``'s lane range
    ``[h*d, (h+1)*d)`` straight out of the packed projection output, so the
    kernel consumes the qkv matmul's layout as-is and writes the layout the
    output projection wants.

    Requires ``d = dim // heads`` to be a multiple of 128 so every head slice
    is lane-tile aligned — the TPU-native head shape (d=128 also runs the
    score matmul at full 128-deep MXU contraction; d=64 caps it at half).
    Callers with other head widths use :func:`flash_attention`.
    """
    B, N, D = q.shape
    d = D // heads
    if D % heads or d % _LANE:
        raise ValueError(f"packed layout needs head_dim {d} to be a multiple of {_LANE} (dim {D}, heads {heads})")
    block_q, block_k = _pick_blocks(N, block_q, block_k)
    if N % block_q or N % block_k or block_q % _LANE or block_k % _LANE:
        raise ValueError(f"token count {N} must divide by block_q={block_q} and block_k={block_k} (multiples of 128)")

    kv_blocks = N // block_k
    q_spec = pl.BlockSpec((1, block_q, d), lambda b, h, i, j: (b, i, h), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, d), lambda b, h, i, j: (b, j, h), memory_space=pltpu.VMEM)
    if kv_blocks == 1:
        kernel = functools.partial(_softmax_kernel, scale=1.0 / math.sqrt(d))
        scratch = []
    else:
        kernel = functools.partial(_flash_kernel, scale=1.0 / math.sqrt(d), kv_blocks=kv_blocks, kv_dim=3)
        scratch = [
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
        grid=(B, heads, N // block_q, kv_blocks),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("heads", "block_q", "block_k", "interpret"))
def flash_attention_qkv_forward(
    qkv: jax.Array,
    heads: int,
    block_q: int = 512,
    block_k: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Packed flash attention straight off the fused qkv projection.

    ``qkv`` is the ``(B, N, 3*H*d)`` output of the fused qkv matmul, laid out
    ``[q | k | v]`` on the feature axis with heads packed inside each third
    (exactly what ``W_qkv = [W_q | W_k | W_v]`` produces).  Splitting that
    into three arrays costs three HBM copies of the token stream per block;
    here the same array is passed three times and the q/k/v BlockSpecs index
    disjoint lane ranges of it, so the kernel reads the matmul output
    in place.  Same tiling constraints as
    :func:`flash_attention_packed_forward`; returns ``(B, N, H*d)``."""
    B, N, D3 = qkv.shape
    D = D3 // 3
    d = D // heads
    if D3 % 3 or D % heads or d % _LANE:
        raise ValueError(f"qkv layout needs head_dim {d} to be a multiple of {_LANE} (packed dim {D3}, heads {heads})")
    block_q, block_k = _pick_blocks(N, block_q, block_k)
    if N % block_q or N % block_k or block_q % _LANE or block_k % _LANE:
        raise ValueError(f"token count {N} must divide by block_q={block_q} and block_k={block_k} (multiples of 128)")

    kv_blocks = N // block_k
    # block index units on the feature axis are d-wide: head h of q sits at
    # block h, of k at block heads+h, of v at block 2*heads+h
    q_spec = pl.BlockSpec((1, block_q, d), lambda b, h, i, j: (b, i, h), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, d), lambda b, h, i, j: (b, j, heads + h), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, block_k, d), lambda b, h, i, j: (b, j, 2 * heads + h), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, block_q, d), lambda b, h, i, j: (b, i, h), memory_space=pltpu.VMEM)
    if kv_blocks == 1:
        kernel = functools.partial(_softmax_kernel, scale=1.0 / math.sqrt(d))
        scratch = []
    else:
        kernel = functools.partial(_flash_kernel, scale=1.0 / math.sqrt(d), kv_blocks=kv_blocks, kv_dim=3)
        scratch = [
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
        grid=(B, heads, N // block_q, kv_blocks),
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=out_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)


def _qkv_reference(qkv: jax.Array, heads: int) -> jax.Array:
    "Split-then-einsum attention on the fused qkv layout: oracle/backward."
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return _packed_reference(q, k, v, heads)


# --- flash backward (training path) -----------------------------------------
#
# The einsum-vjp backward re-materializes the (N, N) score matrix in HBM.
# These kernels recompute score tiles in VMEM from the forward's saved
# logsumexp instead (the standard flash backward):
#
#   delta_i = rowsum(dO_i * O_i)              (eager, one fused HBM pass)
#   P_ij    = exp(s_ij - lse_i)               (recomputed per tile)
#   dV_j    = sum_i P_ij^T dO_i
#   dS_ij   = P_ij * (dO_i . V_j - delta_i)
#   dQ_i    = scale * sum_j dS_ij K_j
#   dK_j    = scale * sum_i dS_ij^T Q_i
#
# dQ iterates KV blocks per Q tile; dK/dV iterate Q blocks per KV tile.
# lse/delta ride in (B, H, N, 1) layout so their (1, 1, block, 1) blocks
# satisfy Mosaic's tiling rule.


def _softmax_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float):
    "Single-KV-block forward that also stores the row logsumexp."
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * (scale * _LOG2E)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0]
    o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)
    lse_ref[0, 0] = m * _LN2 + jnp.log(l)  # back to natural-log units


def _flash_lse_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *, scale: float, kv_blocks: int, kv_dim: int
):
    "Online-softmax forward that also stores the row logsumexp."
    _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, scale=scale, kv_blocks=kv_blocks, kv_dim=kv_dim)

    @pl.when(pl.program_id(kv_dim) == kv_blocks - 1)
    def _store_lse():
        lse_ref[0, 0] = m_ref[:, :1] * _LN2 + jnp.log(l_ref[:, :1])  # max is in log2 units


@functools.partial(jax.jit, static_argnames=("heads", "block_q", "block_k", "interpret"))
def flash_attention_qkv_forward_lse(
    qkv: jax.Array,
    heads: int,
    block_q: int = 512,
    block_k: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    "Like :func:`flash_attention_qkv_forward` but also returns lse (B, H, N, 1) f32."
    B, N, D3 = qkv.shape
    D = D3 // 3
    d = D // heads
    if D3 % 3 or D % heads or d % _LANE:
        raise ValueError(f"qkv layout needs head_dim {d} to be a multiple of {_LANE}")
    block_q, block_k = _pick_blocks(N, block_q, block_k)
    if N % block_q or N % block_k or block_q % _LANE or block_k % _LANE:
        raise ValueError(f"token count {N} must divide by block_q={block_q} and block_k={block_k}")

    kv_blocks = N // block_k
    q_spec = pl.BlockSpec((1, block_q, d), lambda b, h, i, j: (b, i, h), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, d), lambda b, h, i, j: (b, j, heads + h), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, block_k, d), lambda b, h, i, j: (b, j, 2 * heads + h), memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM)
    if kv_blocks == 1:
        kernel = functools.partial(_softmax_lse_kernel, scale=1.0 / math.sqrt(d))
        scratch = []
    else:
        kernel = functools.partial(_flash_lse_kernel, scale=1.0 / math.sqrt(d), kv_blocks=kv_blocks, kv_dim=3)
        scratch = [
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
    o, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
            jax.ShapeDtypeStruct((B, heads, N, 1), jnp.float32),
        ),
        grid=(B, heads, N // block_q, kv_blocks),
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=(q_spec, lse_spec),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return o, lse


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref, *, scale, kv_blocks):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * (scale * _LOG2E)
    p = jnp.exp2(s - lse_ref[0, 0] * _LOG2E)  # (bq, bk), rows already normalized
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0])
    acc_ref[:] += jax.lax.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)

    @pl.when(j == kv_blocks - 1)
    def _store():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, scale, q_blocks
):
    i = pl.program_id(3)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * (scale * _LOG2E)
    p = jnp.exp2(s - lse_ref[0, 0] * _LOG2E)
    # dV_j += P^T dO  and  dK_j += dS^T Q: contract over the q-block axis
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0])
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == q_blocks - 1)
    def _store():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "block_q", "block_k", "interpret"))
def flash_attention_qkv_backward(
    qkv: jax.Array,
    o: jax.Array,
    lse: jax.Array,
    g: jax.Array,
    heads: int,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """dL/d(qkv) from the forward's saved output and logsumexp.

    Score tiles are recomputed in VMEM — the (N, N) matrix never exists in
    HBM, so training-path attention memory is O(N) like the forward (the
    einsum-vjp fallback it replaces stores the (B, H, N, N) probabilities:
    64 MB per attention at the serving shape).  Speed is a secondary win
    (~1.25-1.4x over the einsum vjp at B4 H4 N1024 d128 bf16, scalar-
    reduced long-scan slopes); block defaults from the measured sweep:
    bq512/bk1024 202 us, bq512/bk512 244, bq256/bk512 299, bq256/bk256 488
    per backward."""
    B, N, D3 = qkv.shape
    D = D3 // 3
    d = D // heads
    block_q = _fit_block(N, block_q)
    block_k = _fit_kv_block(N, block_k)
    scale = 1.0 / math.sqrt(d)

    delta = (g.astype(jnp.float32) * o.astype(jnp.float32)).reshape(B, N, heads, d).sum(-1)
    delta = delta.transpose(0, 2, 1)[..., None]  # (B, H, N, 1)

    q_spec = lambda sel: pl.BlockSpec((1, block_q, d), lambda b, h, i, j, s=sel: (b, [i, j][s], h), memory_space=pltpu.VMEM)  # noqa: E731
    row_spec = lambda sel: pl.BlockSpec(  # noqa: E731
        (1, 1, block_q, 1), lambda b, h, i, j, s=sel: (b, h, [i, j][s], 0), memory_space=pltpu.VMEM
    )

    def kv_spec(third: int, sel: int):
        return pl.BlockSpec(
            (1, block_k, d), lambda b, h, i, j: (b, [i, j][sel], third * heads + h), memory_space=pltpu.VMEM
        )

    common = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, kv_blocks=N // block_k),
        out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
        grid=(B, heads, N // block_q, N // block_k),
        in_specs=[q_spec(0), kv_spec(1, 1), kv_spec(2, 1), q_spec(0), row_spec(0), row_spec(0)],
        out_specs=q_spec(0),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        **common,
    )(qkv, qkv, qkv, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, q_blocks=N // block_q),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
            jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
        ),
        # grid axis 2 walks KV tiles, axis 3 (innermost) walks Q tiles
        grid=(B, heads, N // block_k, N // block_q),
        in_specs=[q_spec(1), kv_spec(1, 0), kv_spec(2, 0), q_spec(1), row_spec(1), row_spec(1)],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda b, h, i, j: (b, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, h, i, j: (b, i, h), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32), pltpu.VMEM((block_k, d), jnp.float32)],
        **common,
    )(qkv, qkv, qkv, g, lse, delta)

    return jnp.concatenate([dq, dk, dv], axis=-1)


# --- SPMD partitioning -------------------------------------------------------
#
# Under a sharded jit, XLA treats a pallas_call as an opaque custom call and
# replicates it — a dp-sharded batch would be all-gathered through every
# attention.  custom_partitioning teaches the partitioner that these kernels
# are embarrassingly parallel over dim 0 (batch) and need everything else
# replicated (full attention mixes all tokens; token sharding is ring
# attention's job, `parallel/ring_attention.py`).  Each per-shard lowering
# just re-invokes the kernel on the shard-local batch.


def _dim0_sharding(named, ndim: int):
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    spec = getattr(named, "spec", None)
    batch = spec[0] if spec is not None and len(spec) else None
    return NamedSharding(named.mesh, P(batch, *([None] * (ndim - 1))))


def _batch_parallel(fn, rule: str, need_replication: tuple[str, ...], out_ndims):
    """Wrap ``fn`` (array args -> array or tuple) so dim 0 shards and every
    other dimension is replicated.  ``out_ndims`` is an int or tuple of ints
    (rank per result) used to build the result shardings."""
    from jax.experimental.custom_partitioning import custom_partitioning

    cp = custom_partitioning(fn)
    many = isinstance(out_ndims, tuple)

    def _results(mesh_sharding):
        if many:
            return tuple(_dim0_sharding(mesh_sharding, nd) for nd in out_ndims)
        return _dim0_sharding(mesh_sharding, out_ndims)

    def partition(mesh, arg_shapes, result_shape):
        arg0 = arg_shapes[0].sharding
        arg_shardings = tuple(_dim0_sharding(arg0, len(a.shape)) for a in arg_shapes)
        return mesh, fn, _results(arg0), arg_shardings

    def infer(mesh, arg_shapes, shape):
        return _results(arg_shapes[0].sharding)

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=need_replication,
    )
    return jax.jit(cp)


@functools.cache
def _qkv_fwd_spmd(heads: int, interpret: bool):
    return _batch_parallel(
        lambda qkv: flash_attention_qkv_forward(qkv, heads, interpret=interpret),
        "b n e -> b n f",
        ("n", "e", "f"),
        3,
    )


@functools.cache
def _qkv_fwd_lse_spmd(heads: int, interpret: bool):
    return _batch_parallel(
        lambda qkv: flash_attention_qkv_forward_lse(qkv, heads, interpret=interpret),
        "b n e -> b n f, b h n u",
        ("n", "e", "f", "h", "u"),
        (3, 4),
    )


@functools.cache
def _qkv_bwd_spmd(heads: int, interpret: bool):
    return _batch_parallel(
        lambda qkv, o, lse, g: flash_attention_qkv_backward(qkv, o, lse, g, heads, interpret=interpret),
        "b n e, b n f, b h n u, b n f -> b n e",
        ("n", "e", "f", "h", "u"),
        3,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _flash_qkv_vjp(qkv: jax.Array, heads: int) -> jax.Array:
    return _qkv_fwd_spmd(heads, jax.default_backend() != "tpu")(qkv)


def _flash_qkv_fwd(qkv, heads):
    if jax.default_backend() == "tpu":
        o, lse = _qkv_fwd_lse_spmd(heads, False)(qkv)
        return o, (qkv, o, lse)
    # off-TPU: interpret-mode kernels would make CPU tests crawl; einsum vjp
    # is exact and the kernels are covered by direct interpret-mode tests
    return _flash_qkv_vjp(qkv, heads), (qkv, None, None)


def _flash_qkv_bwd(heads, residuals, g):
    qkv, o, lse = residuals
    if o is None:
        _, vjp = jax.vjp(lambda a: _qkv_reference(a, heads), qkv)
        return vjp(g)
    return (_qkv_bwd_spmd(heads, False)(qkv, o, lse, g),)


_flash_qkv_vjp.defvjp(_flash_qkv_fwd, _flash_qkv_bwd)


def flash_attention_qkv(qkv: jax.Array, heads: int) -> jax.Array:
    """Fused-qkv flash attention with exact gradients.

    ``(B, N, 3*H*d) -> (B, N, H*d)`` — no head transposes and no q/k/v
    split copies.  Falls back to split + einsum for shapes the kernel can't
    tile (trace-time dispatch; shapes are static under jit)."""
    B, N, D3 = qkv.shape
    if D3 % (3 * heads) or (D3 // 3 // heads) % _LANE or N % _LANE:
        return _qkv_reference(qkv, heads)
    return _flash_qkv_vjp(qkv, heads)


def _packed_reference(q: jax.Array, k: jax.Array, v: jax.Array, heads: int) -> jax.Array:
    "Einsum attention on the packed layout: the packed kernel's oracle/backward."
    B, N, D = q.shape
    d = D // heads

    def split(x):
        return x.reshape(B, N, heads, d).transpose(0, 2, 1, 3)

    out = attention_reference(split(q), split(k), split(v))
    return out.transpose(0, 2, 1, 3).reshape(B, N, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_packed_vjp(q: jax.Array, k: jax.Array, v: jax.Array, heads: int) -> jax.Array:
    return flash_attention_packed_forward(q, k, v, heads, interpret=jax.default_backend() != "tpu")


def _flash_packed_fwd(q, k, v, heads):
    return _flash_packed_vjp(q, k, v, heads), (q, k, v)


def _flash_packed_bwd(heads, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda a, b, c: _packed_reference(a, b, c, heads), q, k, v)
    return vjp(g)


_flash_packed_vjp.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def flash_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array, heads: int) -> jax.Array:
    """Packed-layout flash attention with exact gradients.

    ``(B, N, heads*d) x3 -> (B, N, heads*d)`` — no head transposes anywhere
    on the forward path.  Falls back to the einsum reference for shapes the
    kernel can't tile (trace-time dispatch; shapes are static under jit)."""
    B, N, D = q.shape
    if D % heads or (D // heads) % _LANE or N % _LANE:
        return _packed_reference(q, k, v, heads)
    return _flash_packed_vjp(q, k, v, heads)


def _pairs_softmax_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Two d=64 heads per 128-lane tile, one-pass softmax each.

    A 64-deep contraction can never fill the 128-wide systolic array — the
    MXU cycles here equal the zero-padded path's (documented structural
    ≤0.5 ceiling, BASELINE.md SDXL rows).  What pairing buys is the MEMORY
    side: the kernel reads the packed (B, N, heads*64) projections as-is
    and writes the same layout back, where the padded path materializes a
    2x-size zero-padded q/k/v in HBM (pallas custom calls don't fuse the
    pad away) and a 2x padded output that then round-trips a slice."""
    q = q_ref[0]  # (block_q, 128): heads (2h, 2h+1) side by side
    k = k_ref[0]  # (N, 128)
    v = v_ref[0]
    halves = []
    for h in range(2):
        qh = q[:, 64 * h : 64 * (h + 1)]
        kh = k[:, 64 * h : 64 * (h + 1)]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * (scale * _LOG2E)
        p = jnp.exp2(s - jnp.max(s, axis=1, keepdims=True))
        vh = v[:, 64 * h : 64 * (h + 1)]
        o = jax.lax.dot(p.astype(vh.dtype), vh, preferred_element_type=jnp.float32)
        halves.append(o / jnp.sum(p, axis=1, keepdims=True))
    o_ref[0] = jnp.concatenate(halves, axis=1).astype(o_ref.dtype)


def pairs_kernel_fits(N: int, heads: int, d: int) -> bool:
    "Shapes the head-pair kernel tiles: even d=64 heads, one-pass row budget."
    return (
        d == 64
        and heads % 2 == 0
        and N % _LANE == 0
        and 2 * _LANE * N * 4 <= _SCORE_TILE_BUDGET  # bq=128 floor still fits
    )


@functools.partial(jax.jit, static_argnames=("heads", "block_q", "interpret"))
def flash_attention_pairs_forward(
    q: jax.Array, k: jax.Array, v: jax.Array, heads: int, block_q: int = 512, interpret: bool = False
) -> jax.Array:
    """d=64 head-PAIR attention on the packed ``(B, N, heads*64)`` layout.

    Grid (batch, head-pair, q-tile); each cell holds the pair's full K/V
    rows (N*128*2B — 1 MB at N=4096) and runs two one-pass softmaxes.
    ``block_q`` shrinks until the two (block_q, N) f32 score tiles fit the
    VMEM budget.  Requires :func:`pairs_kernel_fits`."""
    B, N, D = q.shape
    d = D // heads
    if not pairs_kernel_fits(N, heads, d) or D % _LANE:
        raise ValueError(f"pairs kernel needs even d=64 heads and tileable N, got heads={heads}, d={d}, N={N}")
    bq = _fit_block(N, block_q)
    while bq > _LANE and 2 * bq * N * 4 > _SCORE_TILE_BUDGET:
        bq = _fit_block(N, bq - _LANE)
    q_spec = pl.BlockSpec((1, bq, 2 * 64), lambda b, h, i: (b, i, h), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, N, 2 * 64), lambda b, h, i: (b, 0, h), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_pairs_softmax_kernel, scale=1.0 / math.sqrt(d)),
        out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
        grid=(B, heads // 2, N // bq),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_pairs_vjp(q, k, v, heads):
    return flash_attention_pairs_forward(q, k, v, heads, interpret=jax.default_backend() != "tpu")


def _flash_pairs_fwd(q, k, v, heads):
    return _flash_pairs_vjp(q, k, v, heads), (q, k, v)


def _flash_pairs_bwd(heads, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda a, b, c: _packed_reference(a, b, c, heads), q, k, v)
    return vjp(g)


_flash_pairs_vjp.defvjp(_flash_pairs_fwd, _flash_pairs_bwd)


def flash_attention_pairs(q: jax.Array, k: jax.Array, v: jax.Array, heads: int) -> jax.Array:
    """Head-pair d=64 packed attention with exact gradients; falls back to
    the einsum reference for shapes the kernel can't tile (trace-time)."""
    B, N, D = q.shape
    if D % heads or not pairs_kernel_fits(N, heads, D // heads):
        return _packed_reference(q, k, v, heads)
    return _flash_pairs_vjp(q, k, v, heads)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Flash attention with exact gradients.

    Forward: the Pallas kernel on TPU, interpret-mode elsewhere (so CPU tests
    execute the same kernel code).  Backward: ``jax.vjp`` of the einsum
    reference — the score matrix exists only inside the backward pass, which
    is the same footprint a remat'd full attention would have.

    Token counts that don't tile into 128-wide lanes (tiny debug grids) fall
    back to the einsum path; shapes are static under jit, so the dispatch is
    trace-time."""
    if q.shape[2] % _LANE:
        return attention_reference(q, k, v)
    return _flash_vjp(q, k, v)


def _softmax_stats_kernel(q_ref, k_ref, v_ref, o_ref, mo_ref, lo_ref, *, scale: float):
    """Single-KV-block softmax that also emits the row statistics (max,
    normalizer) so a caller can fold blocks together — the kernel for one
    hop of ring attention."""
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * scale
    m = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0]
    o = jax.lax.dot((p / l).astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)
    mo_ref[0] = jnp.broadcast_to(m, (m.shape[0], _LANE))
    lo_ref[0] = jnp.broadcast_to(l, (l.shape[0], _LANE))


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention_block_stats(
    q: jax.Array, k: jax.Array, v: jax.Array, block_q: int = 512, interpret: bool | None = None
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One attention *block*: softmax(q k^T / sqrt(d)) v over the given K/V
    plus the row statistics needed to merge with other blocks.

    Returns ``(o, m, l)``: block-normalized output (B, H, Nq, d), row max m
    and normalizer l, both (B, H, Nq) float32.  ``softmax_merge`` folds a
    sequence of such results into exact global attention — this is the inner
    op of ring attention (the K/V block that just arrived over ICI is
    attended without its (Nq, Nkv) scores ever reaching HBM).

    Shapes that don't tile into lanes fall back to the einsum path.  The
    whole K/V block is one VMEM tile, so per-hop block lengths are bounded
    by VMEM (~a few thousand tokens at d=64 bf16); ``interpret=None`` picks
    interpret mode automatically off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, Nq, d = q.shape
    Nk = k.shape[2]
    block_q = min(block_q, Nq)
    if Nq % block_q or block_q % _LANE or Nk % _LANE:
        scale = 1.0 / math.sqrt(d)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1)
        p = jnp.exp(s - m[..., None])
        l = jnp.sum(p, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", (p / l[..., None]).astype(v.dtype), v, preferred_element_type=jnp.float32)
        return o.astype(q.dtype), m, l

    bh = B * H
    qf = q.reshape(bh, Nq, d)
    kf = k.reshape(bh, Nk, d)
    vf = v.reshape(bh, Nk, d)
    kernel = functools.partial(_softmax_stats_kernel, scale=1.0 / math.sqrt(d))
    stat_spec = pl.BlockSpec((1, block_q, _LANE), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    o, m, l = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bh, Nq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, Nq, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((bh, Nq, _LANE), jnp.float32),
        ),
        grid=(bh, Nq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            stat_spec,
            stat_spec,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return o.reshape(B, H, Nq, d), m[:, :, 0].reshape(B, H, Nq), l[:, :, 0].reshape(B, H, Nq)


def softmax_merge(
    state: tuple[jax.Array, jax.Array, jax.Array], block: tuple[jax.Array, jax.Array, jax.Array]
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fold one ``(o, m, l)`` block result into a running ``(acc, peak,
    total)`` state (acc unnormalized float32).  After folding every block,
    the exact attention output is ``acc / total[..., None]``."""
    acc, peak, total = state
    o_blk, m_blk, l_blk = block
    peak_next = jnp.maximum(peak, m_blk)
    r_old = jnp.exp(peak - peak_next)
    r_new = jnp.exp(m_blk - peak_next)
    total_next = total * r_old + l_blk * r_new
    acc_next = acc * r_old[..., None] + o_blk.astype(jnp.float32) * (l_blk * r_new)[..., None]
    return acc_next, peak_next, total_next


@jax.custom_vjp
def _flash_vjp(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    return flash_attention_forward(q, k, v, interpret=jax.default_backend() != "tpu")


def _flash_fwd(q, k, v):
    return _flash_vjp(q, k, v), (q, k, v)


def _flash_bwd(residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(attention_reference, q, k, v)
    return vjp(g)


_flash_vjp.defvjp(_flash_fwd, _flash_bwd)
