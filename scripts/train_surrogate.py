#!/usr/bin/env python
"""Train the committed quality-search surrogate.

A small flow-matching DiT trained on a *synthetic but structured* image
distribution (soft ellipse blobs + oriented stripe fields on gradient
backgrounds).  The resulting checkpoint gives the tableau quality search a
real learned vector field to integrate — solver quality differences show up
as perceptual (SSIM) differences in the decoded images, which random-weight
nets cannot provide.

Limitations (documented, deliberate): 1.2M params, 32x32 single-channel
images, synthetic data.  This calibrates *relative* solver quality; absolute
rankings on SD-class models may differ.

Writes ``skrample_tpu/models/assets/surrogate_flow_32.npz``.
"""

from __future__ import annotations

import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu.models import DiT, DiTConfig

RES = 32
CONFIG = DiTConfig(patch=2, channels=1, dim=128, depth=3, heads=4, compute_dtype=jnp.float32)
OUT = pathlib.Path(__file__).resolve().parent.parent / "skrample_tpu" / "models" / "assets" / "surrogate_flow_32.npz"


def synth_batch(key: jax.Array, batch: int) -> jax.Array:
    "Structured synthetic images in [-1, 1]: blobs + stripes + gradients."
    kg, kb, ks, km = jax.random.split(key, 4)
    yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, RES), jnp.linspace(-1, 1, RES), indexing="ij")

    def one(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        # gradient background
        gdir = jax.random.normal(k1, (2,))
        img = 0.3 * (gdir[0] * xx + gdir[1] * yy)
        # two soft elliptical blobs
        for kk in jax.random.split(k2, 2):
            c = jax.random.uniform(kk, (2,), minval=-0.6, maxval=0.6)
            s = jax.random.uniform(jax.random.fold_in(kk, 1), (2,), minval=0.08, maxval=0.35)
            amp = jax.random.uniform(jax.random.fold_in(kk, 2), (), minval=-1.0, maxval=1.0)
            img = img + amp * jnp.exp(-(((xx - c[0]) / s[0]) ** 2 + ((yy - c[1]) / s[1]) ** 2))
        # oriented stripes
        theta = jax.random.uniform(k3, (), minval=0, maxval=jnp.pi)
        freq = jax.random.uniform(k4, (), minval=2.0, maxval=8.0)
        phase = jax.random.uniform(k5, (), minval=0, maxval=2 * jnp.pi)
        stripes = jnp.sin(freq * (jnp.cos(theta) * xx + jnp.sin(theta) * yy) * jnp.pi + phase)
        img = img + 0.4 * stripes
        return jnp.tanh(img)

    return jax.vmap(one)(jax.random.split(kg, batch))[:, None]  # (B, 1, H, W)


def main(steps: int = 4000, batch: int = 128, lr: float = 2e-4) -> None:
    import optax

    model = DiT(CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adamw(optax.cosine_decay_schedule(lr, steps), weight_decay=1e-4)
    opt_state = opt.init(params)

    def loss_fn(params, key):
        kd, kn, kt = jax.random.split(key, 3)
        x0 = synth_batch(kd, batch)
        noise = jax.random.normal(kn, x0.shape, jnp.float32)
        sigma = jax.random.uniform(kt, (batch,), minval=1e-3, maxval=1.0)
        s = sigma[:, None, None, None]
        xt = (1 - s) * x0 + s * noise
        target = noise - x0  # flow velocity (u-prediction)
        pred = model.apply(params, xt, sigma * 1000.0)
        return jnp.mean((pred - target) ** 2)

    @jax.jit
    def train_chunk(params, opt_state, key, n=50):
        def body(carry, k):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, k)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), jax.random.split(key, n))
        return params, opt_state, losses.mean()

    key = jax.random.PRNGKey(7)
    t0 = time.time()
    for chunk in range(steps // 50):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_chunk(params, opt_state, sub)
        if chunk % 8 == 0:
            print(f"step {chunk * 50:5d}  loss {float(loss):.4f}  ({time.time() - t0:.0f}s)", flush=True)

    from skrample_tpu.models import save_params

    save_params(OUT, params)
    print(f"saved {OUT} ({OUT.stat().st_size / 1e6:.1f} MB), final loss {float(loss):.4f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4000)
