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

Gradients: :func:`flash_attention` carries a ``jax.custom_vjp`` whose
backward re-runs the plain einsum attention under ``jax.vjp`` — exact, and
the forward never stores the score matrix.  Training-path memory therefore
matches a remat'd full attention; a Pallas backward kernel would only
change speed, not results.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_NEG_INF = float("-inf")


def attention_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Plain-einsum attention, (B, H, N, d) -> (B, H, N, d).

    The oracle for the Pallas kernel and the backward-pass body."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale: float, kv_blocks: int):
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k=128, d)
    # scores tile, f32 on the MXU: (block_q, 128)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * scale

    m_prev = m_ref[:]  # (block_q, 128): every lane holds the same running max
    l_prev = l_ref[:]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)  # lanes stay uniform
    alpha = jnp.exp(m_prev - m_next)  # correction for prior tiles
    p = jnp.exp(s - m_next)  # (block_q, 128)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:] = m_next
    l_ref[:] = l_next

    v = v_ref[0]  # (128, d)
    o_curr = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha[:, :1] + o_curr

    @pl.when(kv_i == kv_blocks - 1)
    def _store():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention_forward(
    q: jax.Array, k: jax.Array, v: jax.Array, block_q: int = 256, interpret: bool = False
) -> jax.Array:
    """(B, H, N, d) x3 -> (B, H, N, d) without materializing (N, N) scores.

    ``N`` must divide by ``block_q`` and by 128; ``d`` is unconstrained (the
    compiler pads the lane dimension when d < 128)."""
    B, H, N, d = q.shape
    block_q = min(block_q, N)
    block_k = _LANE
    if N % block_q or N % block_k:
        raise ValueError(f"token count {N} must divide by block_q={block_q} and {block_k}")

    bh = B * H
    qf = q.reshape(bh, N, d)
    kf = k.reshape(bh, N, d)
    vf = v.reshape(bh, N, d)
    kv_blocks = N // block_k

    kernel = functools.partial(_flash_kernel, scale=1.0 / math.sqrt(d), kv_blocks=kv_blocks)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, N, d), q.dtype),
        grid=(bh, N // block_q, kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANE), jnp.float32),  # running max m
            pltpu.VMEM((block_q, _LANE), jnp.float32),  # running normalizer l
            pltpu.VMEM((block_q, d), jnp.float32),  # unnormalized output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, N, d)


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
