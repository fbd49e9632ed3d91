#!/usr/bin/env python
"""Train the committed quality-search surrogates.

Two families, so tableau rankings are not single-model artifacts:

* ``flow`` (default) — a small flow-matching DiT (u-prediction on the linear
  flow schedule), the round-2 surrogate.
* ``eps`` — a UNet trained with epsilon-prediction on the VP ``Scaled``
  schedule: the closest offline analogue to the SD1.5 regime the
  reference's EES tableaux were tuned in (conv UNet, noise-prediction,
  cosine-ish VP noise levels).

Both train on a *synthetic but structured* image distribution (soft ellipse
blobs + oriented stripe fields on gradient backgrounds).  The resulting
checkpoints give the tableau quality search real learned vector fields to
integrate — solver quality differences show up as perceptual (SSIM)
differences in the decoded images, which random-weight nets cannot provide.

Limitations (documented, deliberate): ~1-2M params, 32x32 single-channel
images, synthetic data.  This calibrates *relative* solver quality; absolute
rankings on SD-class models may differ.

Writes ``skrample_tpu/models/assets/surrogate_flow_32.npz`` /
``surrogate_eps_unet_32.npz``.

Usage: python scripts/train_surrogate.py [steps] [flow|eps]
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


def main(steps: int = 4000, batch: int = 128, lr: float = 2e-4, family: str = "flow") -> None:
    import optax

    if family == "flow":
        model = DiT(CONFIG)
        out_path = OUT
    else:  # eps: UNet + VP Scaled schedule (the SD regime, in miniature)
        from skrample_tpu import scheduling
        from skrample_tpu.models import UNet, UNetConfig

        model = UNet(UNetConfig(channels=1, base=32, levels=3, groups=8, compute_dtype=jnp.float32))
        out_path = OUT.parent / "surrogate_eps_unet_32.npz"
        # (timestep, normalized sigma, alpha) lookup for traced continuous t
        vp_table = jnp.asarray(scheduling.Scaled().points_np(np.linspace(1e-4, 1.0, 1024)), jnp.float32)

    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adamw(optax.cosine_decay_schedule(lr, steps), weight_decay=1e-4)
    opt_state = opt.init(params)

    def loss_fn(params, key):
        kd, kn, kt = jax.random.split(key, 3)
        x0 = synth_batch(kd, batch)
        noise = jax.random.normal(kn, x0.shape, jnp.float32)
        if family == "flow":
            sigma = jax.random.uniform(kt, (batch,), minval=1e-3, maxval=1.0)
            s = sigma[:, None, None, None]
            xt = (1 - s) * x0 + s * noise
            target = noise - x0  # flow velocity (u-prediction)
            pred = model.apply(params, xt, sigma * 1000.0)
        else:
            idx = jax.random.randint(kt, (batch,), 0, vp_table.shape[0])
            point = vp_table[idx]  # (B, 3): timestep, sigma, alpha
            s = point[:, 1][:, None, None, None]
            a = point[:, 2][:, None, None, None]
            xt = a * x0 + s * noise
            target = noise  # epsilon-prediction
            pred = model.apply(params, xt, point[:, 0])
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

    save_params(out_path, params)
    print(f"saved {out_path} ({out_path.stat().st_size / 1e6:.1f} MB), final loss {float(loss):.4f}")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 4000,
        family=sys.argv[2] if len(sys.argv) > 2 else "flow",
    )
