"""The fused device-side sampler update.

One denoise step of any table-compiled sampler is

    ``outs = W @ stack([x, o, ring..., noise])``

an elementwise multi-FMA over the latent with a tiny ``(rows, width)``
weight matrix.  The op is purely memory-bound; XLA fuses the tensordot into
a single pass, and a Pallas kernel is provided for the latency-critical
single-step path on TPU (weights live in SMEM, latent tiles stream through
VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def fused_step(weights: jax.Array, stack: jax.Array) -> jax.Array:
    """``(rows, K) @ (K, *latent) -> (rows, *latent)`` — the update FMA.

    ``stack`` is the basis stack ``[x, o, ring..., noise]`` along axis 0.
    Written as an explicit VPU multiply-add chain (K and rows are tiny,
    static) rather than a matmul: keeps full input precision — the TPU MXU
    would otherwise run f32 at reduced default precision — and fuses into a
    single memory pass."""
    rows, K = weights.shape
    w = weights.astype(stack.dtype)
    outs = []
    for r in range(rows):
        acc = stack[0] * w[r, 0]
        for k in range(1, K):
            acc = acc + stack[k] * w[r, k]
        outs.append(acc)
    return jnp.stack(outs)


# --- Pallas variant --------------------------------------------------------

_LANE = 128


def _fused_kernel(weights_ref, stack_ref, out_ref):
    # weights: (rows, K) in SMEM; stack block: (K, bm, LANE); out block: (rows, bm, LANE)
    stack = stack_ref[:]
    rows = out_ref.shape[0]
    K = stack.shape[0]
    for r in range(rows):  # static unroll: rows is 1 or 3
        acc = stack[0] * weights_ref[r, 0]
        for k in range(1, K):  # static unroll: K <= ~15
            acc = acc + stack[k] * weights_ref[r, k]
        out_ref[r] = acc


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_step_pallas(
    weights: jax.Array, stack: jax.Array, block_rows: int = 256, interpret: bool = False
) -> jax.Array:
    """Pallas TPU version of :func:`fused_step` for 2D-reshapeable stacks.

    ``stack``: (K, *latent).  Latent is flattened and padded to (M, 128)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = stack.shape[0]
    rows = weights.shape[0]
    latent_shape = stack.shape[1:]
    numel = 1
    for d in latent_shape:
        numel *= d

    m = -(-numel // _LANE)  # ceil to lanes
    m_pad = -(-m // block_rows) * block_rows
    flat = jnp.reshape(stack, (K, numel))
    flat = jnp.pad(flat, ((0, 0), (0, m_pad * _LANE - numel)))
    flat = jnp.reshape(flat, (K, m_pad, _LANE))

    grid = (m_pad // block_rows,)
    out = pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, m_pad, _LANE), stack.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((K, block_rows, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, block_rows, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(weights.astype(stack.dtype), flat)

    return jnp.reshape(jnp.reshape(out, (rows, m_pad * _LANE))[:, :numel], (rows, *latent_shape))
