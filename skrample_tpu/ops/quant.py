"""Int8 serving path: dynamic-activation x static-weight quantized matmul.

TPU v5e's MXU runs int8 x int8 -> int32 at ~2x its bf16 FLOP rate
(394 vs 197 TOP/s), so for compute-bound serving matmuls an int8 path is
the only lever left once the bf16 chain sits at peak.  XLA lowers
``lax.dot_general`` on int8 operands with ``preferred_element_type=int32``
straight onto the MXU's int8 mode — no Pallas needed; the surrounding
rescale is elementwise and fuses.

Scheme (the standard W8A8 "dynamic" recipe, e.g. SmoothQuant's per-token
variant):

* weights: symmetric per-output-channel int8, quantized once ahead of time
  (``quantize_weight``) — the scale vector rides along in the params tree;
* activations: symmetric per-token int8, scales computed on the fly from
  the running tensor (one max-reduce per matmul — cheap on the VPU and it
  makes the path calibration-free);
* accumulation in int32, rescale in f32: ``y = (x_q @ w_q) * (s_x s_w) + b``.

Per-matmul relative error on the DiT's weight/activation distributions is
~1e-2 (tested in ``tests/test_quant.py``); end-to-end cosine similarity vs
the bf16 forward stays >0.99 at DiT-512/8 scale.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def quantize_weight(w: jax.Array) -> dict[str, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a (K, N) weight.

    Returns ``{"q": int8 (K, N), "s": f32 (N,)}`` with ``q * s ~= w``.
    """
    w = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    s = jnp.where(s == 0, 1.0, s)  # all-zero column (zero-init layers)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def quantize_activation(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-token (last-axis) int8 quantization, computed on the fly.

    Returns ``(x_q int8, s_x f32)`` with ``x_q * s_x ~= x`` and ``s_x``
    shaped like ``x`` with the last axis reduced to 1.
    """
    x32 = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _quant_rows_kernel(x_ref, q_ref, s_ref):
    x32 = x_ref[...].astype(jnp.float32)  # (block_r, D)
    m = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
    s = jnp.where(m == 0, 1.0, m / 127.0)
    q_ref[...] = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    s_ref[...] = s


@functools.partial(jax.jit, static_argnames=("block_r", "interpret"))
def quantize_rows(x2: jax.Array, block_r: int = 256, interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """One-pass per-row int8 quantization of a ``(R, D)`` tensor.

    XLA schedules the dynamic-quant epilogue as two HBM passes over ``x``
    (a max-reduce producing the scales, then the divide/round/cast — the
    dot can't fuse its operand), so at DiT-512/8 serving shapes the
    epilogue costs as much traffic as the int8 matmul saves.  Here the max
    and the quantize happen on one VMEM tile: one read of ``x``, one int8
    write, one (R, 1) scale write.

    ``D`` must be a multiple of 128 and ``R`` of ``block_r``
    (:func:`quantize_activation` falls back to the XLA path otherwise)."""
    R, D = x2.shape
    block_r = min(block_r, R)
    if D % _LANE or R % block_r:
        raise ValueError(f"quantize_rows needs D % 128 == 0 and R % block_r == 0, got {x2.shape}")
    return pl.pallas_call(
        _quant_rows_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, D), jnp.int8),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ),
        grid=(R // block_r,),
        in_specs=[pl.BlockSpec((block_r, D), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((block_r, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2)


def _quant_rows_local(x2: jax.Array, interpret: bool) -> tuple[jax.Array, jax.Array]:
    "Kernel on one shard: adapt block_r to the (possibly shard-local) R."
    R, D = x2.shape
    # VMEM cap: the kernel's scoped allocation holds the input block, its f32
    # cast, and the int8 output (double-buffered), ~7 bytes/element.  Keep
    # block_r * D under 1M elements so wide matrices (Flux's 12288-wide fused
    # qkv/mlp at dim 3072) stay under the 16MB scoped-VMEM limit; at DiT
    # widths the cap leaves the original 256-row blocks untouched.
    cap = (1 << 20) // max(D, 1)
    block_r = next((b for b in (256, 128, 64, 32, 16, 8) if b <= cap and R % b == 0), None)
    if D % _LANE or block_r is None:
        q, s = quantize_activation(x2)
        return q, s
    return quantize_rows(x2, block_r=block_r, interpret=interpret)


@functools.cache
def _quant_rows_spmd(interpret: bool):
    """SPMD wrapper: the row axis shards (per-row op), the feature axis must
    be replicated (the max reduces over it).  Without this XLA replicates
    the opaque pallas custom call under a sharded jit."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def fn(x2):
        q, s = _quant_rows_local(x2, interpret)
        return q, s.reshape(-1)  # (R,): a literal-1 axis can't be named in the sharding rule

    cp = custom_partitioning(fn)

    def _shardings(x_sharding):
        spec = getattr(x_sharding, "spec", None)
        row = spec[0] if spec is not None and len(spec) else None
        mesh = x_sharding.mesh
        return NamedSharding(mesh, P(row, None)), NamedSharding(mesh, P(row))

    def partition(mesh, arg_shapes, result_shape):
        x_s, s_s = _shardings(arg_shapes[0].sharding)
        return mesh, fn, (x_s, s_s), (x_s,)

    def infer(mesh, arg_shapes, shape):
        return _shardings(arg_shapes[0].sharding)

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="r d -> r d, r",
        need_replication_factors=("d",),
    )
    return jax.jit(cp)


def dense_int8(params: dict, x: jax.Array, dtype: Any) -> jax.Array:
    """``x @ w + b`` with the matmul on the MXU's int8 path.

    ``params`` is ``{"w_q": {"q", "s"}, "b"}`` as produced by
    :func:`quantize_params`.  The contraction accumulates in int32; both
    scale vectors fold into one elementwise multiply that XLA fuses into
    the epilogue.
    """
    wq = params["w_q"]
    D = x.shape[-1]
    R = x.size // D
    if jax.default_backend() == "tpu" and D % _LANE == 0 and R % 8 == 0:
        # one-pass Pallas quantize; the reshape keeps a sharded batch axis
        # on the row dim, and the SPMD wrapper shards the kernel over it
        q2, s2 = _quant_rows_spmd(False)(x.reshape(R, D))
        x_q = q2.reshape(x.shape)
        s_x = s2.reshape(*x.shape[:-1], 1)
    else:
        x_q, s_x = quantize_activation(x)
    acc = jax.lax.dot_general(
        x_q,
        wq["q"],
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * wq["s"])
    return (y + params["b"]).astype(dtype)


def quantize_params(params: Any, *, min_size: int = 1 << 14, exclude: frozenset[str] = frozenset()) -> Any:
    """Rewrite a params pytree for int8 serving.

    Every ``{"w", "b"}`` dense leaf-dict whose weight has at least
    ``min_size`` elements becomes ``{"w_q": {"q", "s"}, "b"}``; smaller
    ones (timestep MLPs, patch projections) stay f32 — they are latency
    noise — as does any dict key named in ``exclude`` (the DiT excludes
    its adaLN modulation heads: their outputs gate residual branches, so
    quantization error there is multiplicative on everything downstream,
    and at batch-size rows the matmul is latency noise anyway).  Model
    ``apply`` functions dispatch on the presence of ``"w_q"`` (see
    ``models/dit.py::_dense``), so the quantized tree drops into the same
    code path.
    """
    if isinstance(params, dict):
        if set(params) == {"w", "b"} and params["w"].ndim == 2:
            if params["w"].size >= min_size:
                return {"w_q": quantize_weight(params["w"]), "b": params["b"]}
            return params
        return {
            k: v if k in exclude else quantize_params(v, min_size=min_size, exclude=exclude)
            for k, v in params.items()
        }
    if isinstance(params, list):
        return [quantize_params(v, min_size=min_size, exclude=exclude) for v in params]
    return params
