"""Train the text -> image stack jointly: TextEncoder + MMDiT, conditioned
flow matching with classifier-free-guidance dropout.

The standard conditional-diffusion recipe, end to end in this framework:

* prompts go through :class:`ByteTokenizer` + :class:`TextEncoder`; the
  encoder trains jointly with the denoiser (freeze it by moving ``"enc"``
  out of the grad tree if you bring pretrained weights — e.g. via
  ``models.clip_text_encoder``).
* 10% of batch rows drop their context to the MMDiT's learned null
  embedding (CFG dropout), which is what makes
  ``as_served(..., guidance_scale>1)`` meaningful at serving time.
* one jitted ``lax.scan`` epoch: loss + grads + adamw in a single
  dispatch; optional (dp, tp) sharding — both models ship megatron
  PartitionSpecs and XLA inserts the collectives from the shardings alone.

Synthetic prompt/image pairs keep it hermetic; swap `DATA`/`make_batch`
for a real loader.

Run: python examples/train_text_to_image.py [--steps 60] [--dp 2 --tp 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from skrample_tpu.models import (
    ByteTokenizer,
    MMDiT,
    MMDiTConfig,
    TextEncoder,
    TextEncoderConfig,
)

PROMPTS = [
    f"a {style} of a {subject}"
    for style in ("photo", "painting", "sketch", "sculpture")
    for subject in ("cat", "fox", "city", "mountain", "river", "paper crane", "bowl of ramen", "robot")
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--size", type=int, default=16, help="latent H=W")
    ap.add_argument("--cfg-dropout", type=float, default=0.1)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    args = ap.parse_args()

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    enc = TextEncoder(TextEncoderConfig(dim=args.dim, depth=2, heads=2, max_tokens=128, compute_dtype=dtype))
    mmdit = MMDiT(
        MMDiTConfig(dim=args.dim, depth=2, heads=2, context_dim=args.dim, compute_dtype=dtype, attention="full")
    )
    params = {"enc": enc.init(jax.random.PRNGKey(0)), "mmdit": mmdit.init(jax.random.PRNGKey(1))}

    mesh = None
    if args.dp * args.tp > 1:
        from jax.sharding import Mesh, NamedSharding

        mesh = Mesh(np.asarray(jax.devices()[: args.dp * args.tp]).reshape(args.dp, args.tp), ("dp", "tp"))
        spec = {"enc": enc.param_spec(), "mmdit": mmdit.param_spec()}
        params = jax.tree.map(
            lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
            params,
            spec,
            is_leaf=lambda v: isinstance(v, jax.Array | np.ndarray),
        )

    # hermetic paired data: each prompt owns a fixed random "image" latent
    ids = jnp.asarray(ByteTokenizer().batch(PROMPTS, 128))
    images = jax.random.normal(jax.random.PRNGKey(42), (len(PROMPTS), 4, args.size, args.size), jnp.float32)

    def loss_fn(p, idx, noise, sigma, drop):
        feats = enc.apply(p["enc"], ids[idx])
        ctx = mmdit.embed_context(p["mmdit"], feats, idx.shape[0])
        null = mmdit.embed_context(p["mmdit"], None, idx.shape[0])
        ctx = jnp.where(drop[:, None, None], null, ctx)  # CFG dropout rows

        x0 = images[idx]
        s = sigma[:, None, None, None]
        xt = (1 - s) * x0 + s * noise  # linear interpolant
        pred = mmdit.apply(p["mmdit"], xt, sigma * 1000.0, ctx)
        return jnp.mean((pred - (noise - x0)) ** 2)  # velocity target

    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    def train_step(carry, key):
        p, o = carry
        kb, kn, kt, kd = jax.random.split(key, 4)
        idx = jax.random.randint(kb, (args.batch,), 0, len(PROMPTS))
        noise = jax.random.normal(kn, (args.batch, 4, args.size, args.size), jnp.float32)
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            noise = jax.lax.with_sharding_constraint(noise, NamedSharding(mesh, P("dp")))
        sigma = jax.random.uniform(kt, (args.batch,), minval=1e-3, maxval=1.0)
        drop = jax.random.bernoulli(kd, args.cfg_dropout, (args.batch,))
        loss, grads = jax.value_and_grad(loss_fn)(p, idx, noise, sigma, drop)
        updates, o = opt.update(grads, o, p)
        return (optax.apply_updates(p, updates), o), loss

    @jax.jit
    def epoch(p, o, key):
        return jax.lax.scan(train_step, (p, o), jax.random.split(key, args.steps))

    t0 = time.perf_counter()
    ctx = mesh if mesh is not None else _null()
    with ctx:
        (params, opt_state), losses = epoch(params, opt_state, jax.random.PRNGKey(2))
        losses = np.asarray(losses)
    dt = time.perf_counter() - t0
    print(f"{args.steps} joint steps in {dt:.2f}s ({dt / args.steps * 1e3:.2f} ms/step incl. compile)")
    k = max(1, args.steps // 4)
    first, last = float(losses[:k].mean()), float(losses[-k:].mean())
    print(f"loss (mean of {k}) {first:.4f} -> {last:.4f}")
    assert np.isfinite(losses).all()
    assert last < first, "conditioned flow-matching loss should decrease"


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
