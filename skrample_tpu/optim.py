"""Memory-efficient optimizers: 8-bit block-quantized AdamW.

The reference library has no training story (SURVEY.md section 2.0); this
repo's training path (examples/train_flow_matching.py, bench training rows)
uses plain optax.  That is fine until the model stops fitting: Adam keeps
two float32 moment tensors per parameter, so a 1.31B-param Flux-scale tree
needs ~10.5 GB of optimizer state alone — more than half a 16 GB v5e before
a single activation is allocated.

``adamw8bit`` stores both moments as int8 with per-block (default 256
elements) float32 scales, the approach of "8-bit Optimizers via Block-wise
Quantization" (Dettmers et al., arXiv 2110.02861), re-designed for TPU/XLA:

* instead of a 256-entry dynamic-tree codebook looked up per element (a
  gather — the wrong op for the VPU), the code is an *analytic power law*:
  the first moment stores ``cbrt(m / s_block)`` and the second stores
  ``(v / s_block) ** 0.25``, each rounded to 8 bits.  Dequantize is a cube
  / fourth power — pure elementwise, so the whole
  dequantize -> moment update -> requantize chain fuses with the gradient
  into ONE pass over HBM, with no lookup tables in the hot loop.  The power
  law serves the same purpose as the dynamic tree: near-zero values (most
  of a moment tensor) get far finer steps than a linear code.
* block scales are the block absmax, stored f32 (1.6% overhead at block
  256); an all-zero block scales by 1 so zeros round-trip exactly.
* leaves smaller than ``min_quant_size`` (norm gains, biases — tiny and
  precision-sensitive) stay in float32, as in the original paper.

State memory is ~2.03 bytes/param (vs Adam's 8), and the update's HBM
traffic drops from 16 bytes/param (read+write two f32 moments) to ~4.
Accuracy: the quantization error acts as noise on the *moments*, not the
weights; ``tests/test_optim8.py`` pins trajectory agreement with float32
AdamW and equal-quality convergence on a real (tiny-DiT flow-matching)
objective.

For fully-bf16 parameter training the module also ships
:func:`stochastic_round_bf16` / :func:`apply_updates_sr`: the weight add
runs in f32 and rounds to bf16 stochastically (expected value exact), so
late-training updates below half a bf16 ULP — which round-to-nearest
silently drops — still integrate over steps.  8-bit moments + bf16 SR
params is ~4 bytes/param of params+moments vs Adam's 12, the difference
between a 1.31B Flux fine-tune fitting on one 16 GB v5e or not.

Drop-in: returns an ``optax.GradientTransformation``, so it composes with
``optax.apply_updates``, schedules (pass a callable learning rate), and the
existing examples.  For sharded trees note the moment leaves are stored
flattened into ``(blocks, block)`` — under pjit, XLA propagates a usable
sharding through the reshape, but the moments do not mirror the parameter
sharding layout the way optax's do.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "AdamW8State",
    "Moment8",
    "MomentF32",
    "adamw8bit",
    "apply_updates_sr",
    "optimizer_state_bytes",
    "stochastic_round_bf16",
]


class Moment8(NamedTuple):
    "Quantized per-leaf Adam state: int8 codes + per-block f32 scales."

    mq: jax.Array  # int8 (blocks, block) — cbrt-coded first moment
    ms: jax.Array  # f32  (blocks, 1)    — first-moment block absmax
    vq: jax.Array  # int8 (blocks, block) — fourth-root-coded second moment
    vs: jax.Array  # f32  (blocks, 1)    — second-moment block max


class MomentF32(NamedTuple):
    "Full-precision per-leaf state for small (< min_quant_size) leaves."

    m: jax.Array
    v: jax.Array


class AdamW8State(NamedTuple):
    count: jax.Array  # int32 step counter (bias correction)
    moments: Any  # params-shaped tree of Moment8 | MomentF32


def _pack(x: jax.Array, block: int) -> jax.Array:
    "Flatten to (blocks, block) f32, zero-padded to a block multiple."
    flat = x.astype(jnp.float32).reshape(-1)
    pad = (-flat.size) % block
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.float32)])
    return flat.reshape(-1, block)


def _unpack(x: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    n = 1
    for d in shape:
        n *= d
    return x.reshape(-1)[:n].reshape(shape)


def _quant_signed(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    "(codes, scales): codes are round(127 * cbrt(x / blockabsmax))."
    s = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    s = jnp.where(s == 0, 1.0, s)
    q = jnp.round(127.0 * jnp.cbrt(x / s)).astype(jnp.int8)
    return q, s


def _dequant_signed(q: jax.Array, s: jax.Array) -> jax.Array:
    t = q.astype(jnp.float32) * jnp.float32(1.0 / 127.0)
    return t * t * t * s  # odd power keeps the sign


def _quant_pos(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    "(codes, scales) for non-negative x: round(127 * (x / blockmax)^(1/4))."
    s = jnp.max(x, axis=1, keepdims=True)
    s = jnp.where(s == 0, 1.0, s)
    q = jnp.round(127.0 * jnp.sqrt(jnp.sqrt(x / s))).astype(jnp.int8)
    return q, s


def _dequant_pos(q: jax.Array, s: jax.Array) -> jax.Array:
    t = q.astype(jnp.float32) * jnp.float32(1.0 / 127.0)
    t2 = t * t
    return t2 * t2 * s


def stochastic_round_bf16(key: jax.Array, x: jax.Array) -> jax.Array:
    """Round float32 ``x`` to bfloat16 stochastically: up or down with
    probability proportional to the distance to each neighbor, so the
    *expected* value is ``x`` exactly (round-to-nearest instead loses every
    update smaller than half a ULP — at bf16's 8 significand bits that is
    any update under ~0.4% of the weight, which is most of late training).

    One uint32 add on the raw bits: bf16 is the top 16 bits of an f32, so
    adding uniform 16-bit noise below the cut and truncating implements the
    exact SR probabilities (the standard TPU trick — bf16 hardware here has
    no SR mode, but the VPU does this at full elementwise throughput).
    Non-finite inputs pass through unperturbed.
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    noise = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    rounded = jax.lax.bitcast_convert_type((bits + noise) & jnp.uint32(0xFFFF0000), jnp.float32)
    rounded = jnp.where(jnp.isfinite(x), rounded, x)
    return rounded.astype(jnp.bfloat16)


def apply_updates_sr(params: Any, updates: Any, key: jax.Array) -> Any:
    """``optax.apply_updates`` with stochastic rounding into low-precision
    parameters: the add happens in float32 and bfloat16 leaves are rounded
    with :func:`stochastic_round_bf16` (per-leaf independent streams folded
    from ``key``).  Full-precision leaves take the plain add.

    Pass a fresh key every step (e.g. ``fold_in(key, step)``): SR's
    unbiasedness is across steps — reusing one key correlates the rounding
    noise and reintroduces drift.  With this + :func:`adamw8bit`
    (``cast_updates=False``) a model trains entirely in bf16 params at
    f32-like quality: ~4 bytes/param of params+moments vs f32 Adam's 12.
    """
    leaves, treedef = jax.tree.flatten(params)
    up_leaves = jax.tree.leaves(updates)
    out = []
    for i, (p, u) in enumerate(zip(leaves, up_leaves, strict=True)):
        s = p.astype(jnp.float32) + u.astype(jnp.float32)
        if p.dtype == jnp.bfloat16:
            out.append(stochastic_round_bf16(jax.random.fold_in(key, i), s))
        else:
            out.append(s.astype(p.dtype))
    return jax.tree.unflatten(treedef, out)


def adamw8bit(
    learning_rate: float | Callable[[jax.Array], jax.Array],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-4,
    block: int = 256,
    min_quant_size: int = 4096,
    cast_updates: bool = True,
) -> optax.GradientTransformation:
    """AdamW with int8 block-quantized moments (~2 bytes/param of state).

    Semantics match ``optax.adamw`` (decoupled weight decay, bias-corrected
    moments); the only difference is the moments round-trip through the
    8-bit block code between steps.  Leaves with fewer than
    ``min_quant_size`` elements keep exact float32 moments.

    ``cast_updates=False`` returns float32 updates regardless of the param
    dtype — pair with :func:`apply_updates_sr` for bf16-param training
    (casting a tiny update to bf16 *before* the add is exactly the
    precision loss SR exists to avoid).
    """

    def _is_small(p: jax.Array) -> bool:
        return p.size < min_quant_size

    def init(params: Any) -> AdamW8State:
        def leaf(p: jax.Array) -> Moment8 | MomentF32:
            if _is_small(p):
                z = jnp.zeros(p.shape, jnp.float32)
                return MomentF32(z, z)
            packed = _pack(jnp.zeros(p.shape, jnp.float32), block)
            q8 = jnp.zeros(packed.shape, jnp.int8)
            s = jnp.ones((packed.shape[0], 1), jnp.float32)
            return Moment8(q8, s, q8, s)

        return AdamW8State(jnp.zeros((), jnp.int32), jax.tree.map(leaf, params))

    def update(grads: Any, state: AdamW8State, params: Any = None) -> tuple[Any, AdamW8State]:
        if params is None:
            raise ValueError("adamw8bit requires params (decoupled weight decay)")
        count = state.count + 1
        cf = count.astype(jnp.float32)
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        # bias corrections folded into scalars so the leaf pass is pure FMA
        c1 = 1.0 - jnp.power(jnp.float32(b1), cf)
        c2 = 1.0 - jnp.power(jnp.float32(b2), cf)

        def leaf(g: jax.Array, p: jax.Array, mom: Moment8 | MomentF32) -> tuple[jax.Array, Any]:
            gf = g.astype(jnp.float32)
            if isinstance(mom, MomentF32):
                m = b1 * mom.m + (1.0 - b1) * gf
                v = b2 * mom.v + (1.0 - b2) * gf * gf
                step = (m / c1) / (jnp.sqrt(v / c2) + eps)
                new_mom: Any = MomentF32(m, v)
            else:
                gp = _pack(gf, block)
                m = b1 * _dequant_signed(mom.mq, mom.ms) + (1.0 - b1) * gp
                v = b2 * _dequant_pos(mom.vq, mom.vs) + (1.0 - b2) * gp * gp
                step = _unpack((m / c1) / (jnp.sqrt(v / c2) + eps), g.shape)
                new_mom = Moment8(*_quant_signed(m), *_quant_pos(v))
            upd = -lr * (step + weight_decay * p.astype(jnp.float32))
            if cast_updates:
                upd = upd.astype(p.dtype)
            return upd, new_mom

        out = jax.tree.map(leaf, grads, params, state.moments)
        picker = lambda i: jax.tree.map(lambda o: o[i], out, is_leaf=lambda x: isinstance(x, tuple))  # noqa: E731
        return picker(0), AdamW8State(count, picker(1))

    return optax.GradientTransformation(init, update)


def optimizer_state_bytes(state: Any) -> int:
    "Total bytes held by an optimizer state tree (any optax/optim state)."
    return sum(leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(state) if hasattr(leaf, "dtype"))
